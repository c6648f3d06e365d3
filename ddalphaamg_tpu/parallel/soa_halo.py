"""Distributed SoA fast path: the fused Pallas Dslash inside shard_map.

VERDICT r1 item 3 / reference d_plus_clover_PRECISION comm overlap
(src/dirac_generic.c:188-262, ghost_sendrecv_PRECISION
src/ghost_generic.c:171-265): the production TPU layout [dof.., T, Z, M]
fuses M = Y*X, so multi-chip decomposition happens along t/z.  Each shard
runs the UNMODIFIED local Pallas (or XLA SoA) kernel -- which wraps T/Z
periodically within the shard -- and then applies face corrections:

  forward  (+mu face, local t = T_l-1):  the kernel consumed the shard's own
    first slice (local wrap) where it needed the +mu neighbor's first slice.
    Correction = -U(1-gamma) [phi_recv - phi_wrap], a half-spinor's worth of
    face data over the wire (the reference's prn compression).
  backward (-mu face, local t = 0):  the kernel consumed its own last-slice
    U^H (1+gamma) phi where it needed the -mu neighbor's.  Each shard
    computes w = U^H (1+gamma) phi on its last slice and ships it (+mu),
    exactly the reference's pre-multiplied prp buffer trick
    (src/ghost_generic.c:99-104) -- again a half-spinor per face site.

Since corrections are face-sized and independent per direction, XLA is free
to overlap the ppermutes with the bulk kernel (the reference's
comm/compute overlap, without hand-scheduling)."""

from __future__ import annotations



import jax

import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from .halo import _shard_map
from .. import cplx
from ..gamma import get_basis
from .mesh import AXES, soa_spec

SOA_T_AXIS, SOA_Z_AXIS = -3, -2


def _slice_axis(a, axis, start, stop):
    idx = [slice(None)] * (a.re.ndim if cplx.is_split(a) else a.ndim)
    idx[axis] = slice(start, stop)
    idx = tuple(idx)
    if cplx.is_split(a):
        return cplx.CArray(a.re[idx], a.im[idx])
    return a[idx]


def _ppermute(a, name, perm):
    f = lambda x: lax.ppermute(x, name, perm)
    if cplx.is_split(a):
        return cplx.CArray(f(a.re), f(a.im))
    return f(a)


def _add_slice(out, axis, start, stop, contrib):
    idx = [slice(None)] * (out.re.ndim if cplx.is_split(out) else out.ndim)
    idx[axis] = slice(start, stop)
    idx = tuple(idx)
    if cplx.is_split(out):
        return cplx.CArray(out.re.at[idx].add(contrib.re),
                           out.im.at[idx].add(contrib.im))
    return out.at[idx].add(contrib)


def _project(phi, mu, basis, sign):
    """[4,3,...] SoA field -> half-spinor rows [(2,3),...] as a list."""
    co, val = basis.co, basis.val
    return [phi[s] + cplx.phase_mul(val[mu, s], phi[int(co[mu, s])], sign)
            for s in (0, 1)]


def _su3(u, h):
    """u [3,3,face...] x h list of [3,face...] -> list of [3,face...] rows."""
    out = []
    for s in (0, 1):
        rows = []
        for a in range(3):
            acc = None
            for b in range(3):
                t = cplx.cmul(u[a, b], h[s][b])
                acc = t if acc is None else acc + t
            rows.append(acc)
        out.append(cplx.stack(rows, axis=0))
    return out


def _su3_dag(u, h):
    out = []
    for s in (0, 1):
        rows = []
        for a in range(3):
            acc = None
            for b in range(3):
                t = cplx.cmul(cplx.conj(u[b, a]), h[s][b])
                acc = t if acc is None else acc + t
            rows.append(acc)
        out.append(cplx.stack(rows, axis=0))
    return out


def _reconstruct(hf, mu, basis, sign):
    """Lift half-spinor rows (list of 2 [3,face...]) to a [4,3,face...]
    contribution: rows {0,1} = -hf, rows {2,3} = -sign*val*hf[co]."""
    co, val = basis.co, basis.val
    rows = [-hf[0], -hf[1]]
    for s in (2, 3):
        rows.append(cplx.phase_mul(val[mu, s], hf[int(co[mu, s])], -sign))
    return cplx.stack(rows, axis=0)


def _local_dslash(stencil_local, lattice_local, use_pallas):
    from ..operators import fast
    from ..operators.stencil import _cached_pallas_dslash, _cached_rollers

    if use_pallas:
        fn = _cached_pallas_dslash(lattice_local, None, False)

        def apply_(s, v):
            return fn(s.links, s.cdiag, s.coff, v)
        return apply_

    def apply_(s, v):
        roll = _cached_rollers(lattice_local, str(s.links.re.dtype))
        return fast.d_plus_clover_soa(s.links, s.clover, v, roll)
    return apply_


def _face_corrections(s, phi, out, mesh_shape, basis):
    """Add the T/Z boundary corrections described in the module docstring."""
    for mu, axis in ((0, SOA_T_AXIS), (1, SOA_Z_AXIS)):
        n = mesh_shape[AXES[mu]]
        if n == 1:
            continue
        name = AXES[mu]
        size = phi.re.shape[axis]
        u = s.links[mu]                       # [3,3,T,Z,M] local
        # ---- forward correction on the last local slice ----
        first = _slice_axis(phi, axis, 0, 1)
        recv = _ppermute(first, name, [((j + 1) % n, j) for j in range(n)])
        delta = recv - first
        h = _project(delta, mu, basis, -1.0)
        u_last = _slice_axis(u, axis, size - 1, size)
        contrib = _reconstruct(_su3(u_last, h), mu, basis, -1.0)
        out = _add_slice(out, axis, size - 1, size, contrib)
        # ---- backward correction on the first local slice ----
        phi_last = _slice_axis(phi, axis, size - 1, size)
        w_own = _su3_dag(u_last, _project(phi_last, mu, basis, +1.0))
        w_own = cplx.stack([w_own[0], w_own[1]], axis=0)  # [2,3,face]
        recv_w = _ppermute(w_own, name, [((j - 1) % n, j) for j in range(n)])
        dw = recv_w - w_own
        contrib = _reconstruct([dw[0], dw[1]], mu, basis, +1.0)
        out = _add_slice(out, axis, 0, 1, contrib)
    return out


def soa_dslash_shmap(mesh, stencil, phi, basis_name=None):
    """full_op of a WilsonStencilSoA over a (t, z)-sharded mesh: local fused
    kernel + half-spinor face corrections.  phi: SoA [4,3,T,Z,M].

    Thin compatibility wrapper over the production dispatch
    (parallel/shard_ops.wilson_sharded, which every stencil op routes
    through when a mesh is attached)."""
    import dataclasses

    from .shard_ops import wilson_sharded
    if mesh.shape["y"] > 1 or mesh.shape["x"] > 1:
        raise ValueError("SoA layout shards along t/z only")
    return wilson_sharded(dataclasses.replace(stencil, mesh=mesh),
                          phi, "full")
