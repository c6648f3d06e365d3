"""TPU fast path: structure-of-arrays stencils with a fused lattice-minor axis.

Why: XLA:TPU tiles the two minormost dims of every array to (8, 128)
sublanes x lanes.  The logical [T,Z,Y,X, spin, color] layout puts (4, 3) in
the tiles -> 57x physical padding and ~1% VPU lane utilization (measured).
The TPU-native layout is dof-major with the lattice flattened into the
minor axes:

    spinor  [4, 3, T, Z, M]     M = Y * X   (re/im as cplx.CArray parts)
    links   [4, 3, 3, T, Z, M]
    clover  [2, 6, 6, T, Z, M]

With M a multiple of 128 (e.g. Y = X = 16 -> M = 256) tiling is exact: all
stencil arithmetic becomes fused whole-lattice VPU multiply-adds at full
lane utilization.  Neighbor access:
    T, Z : jnp.roll on axes -3 / -2 (major dims -- cheap slice+concat)
    Y    : jnp.roll by +-X on the fused axis (y*X + x indexing wraps y
           within each (t,z) plane exactly)
    X    : two fused-axis rolls blended by an x-boundary mask (no reshape,
           no relayout):
             x -> x+1 : where(x == X-1, roll(a, X-1), roll(a, -1))
             x -> x-1 : where(x == 0,   roll(a, -(X-1)), roll(a, +1))

The math is identical to operators/wilson.py (same reference conventions);
tests pin SoA == logical-layout results.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..gamma import get_basis

T, Z, Y, X = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# layout conversion (host/setup time)
# ---------------------------------------------------------------------------

def spinor_to_soa(phi):
    """[T,Z,Y,X,4,3] -> [4,3,T,Z,Y*X]."""
    t, z, y, x = phi.shape[:4]
    return _transpose(phi, (4, 5, 0, 1, 2, 3)).reshape(4, 3, t, z, y * x)


def _transpose(a, axes):
    if cplx.is_split(a):
        return cplx.CArray(jnp.transpose(a.re, axes), jnp.transpose(a.im, axes))
    return jnp.transpose(a, axes)


def spinor_from_soa(phi, lattice):
    """[4,3,T,Z,Y*X] -> [T,Z,Y,X,4,3]."""
    t, z, y, x = lattice
    a = phi.reshape(4, 3, t, z, y, x)
    return _transpose(a, (2, 3, 4, 5, 0, 1))


def links_to_soa(links):
    """[4,T,Z,Y,X,3,3] -> [4,3,3,T,Z,Y*X]."""
    _, t, z, y, x = links.shape[:5]
    return _transpose(links, (0, 5, 6, 1, 2, 3, 4)).reshape(4, 3, 3, t, z, y * x)


def clover_to_soa(clov):
    """[T,Z,Y,X,2,6,6] -> [2,6,6,T,Z,Y*X]."""
    t, z, y, x = clov.shape[:4]
    return _transpose(clov, (4, 5, 6, 0, 1, 2, 3)).reshape(2, 6, 6, t, z, y * x)


# ---------------------------------------------------------------------------
# fused-minor rolls
# ---------------------------------------------------------------------------

def _xmask(lattice, which: str, rdtype):
    """[M] mask over the fused (y, x) axis: 1.0 where x == X-1 / x == 0.

    Kept as NUMPY so closures built inside a jit trace don't capture traced
    constants (each trace lifts the numpy array as its own constant)."""
    y, x = lattice[2], lattice[3]
    m = np.zeros((y, x), dtype=np.dtype(rdtype))
    if which == "last":
        m[:, x - 1] = 1.0
    else:
        m[:, 0] = 1.0
    return m.reshape(y * x)


def make_rollers(lattice, rdtype=jnp.float32):
    """Returns roll(a, shift, mu) for SoA arrays [..., T, Z, M]."""
    xn = lattice[3]
    mask_last = _xmask(lattice, "last", rdtype)
    mask_first = _xmask(lattice, "first", rdtype)

    def _r(a, shift, axis):
        return cplx.roll(a, shift, axis) if cplx.is_split(a) else jnp.roll(a, shift, axis)

    def roll(a, shift, mu):
        if mu == T:
            return _r(a, shift, -3)
        if mu == Z:
            return _r(a, shift, -2)
        if mu == Y:
            return _r(a, shift * xn, -1)
        # X direction on the fused minor axis
        if shift == -1:  # fetch a[x+1]
            main = _r(a, -1, -1)
            wrap = _r(a, xn - 1, -1)
            return main + (wrap - main) * mask_last
        if shift == 1:   # fetch a[x-1]
            main = _r(a, 1, -1)
            wrap = _r(a, -(xn - 1), -1)
            return main + (wrap - main) * mask_first
        raise ValueError(shift)

    return roll


# ---------------------------------------------------------------------------
# SoA Wilson-clover operator
# ---------------------------------------------------------------------------

def _cmadd(acc_r, acc_i, ar, ai, br, bi, sign=1.0):
    """acc += sign * (a * b) for complex components (4-mult elementwise)."""
    if sign > 0:
        return (acc_r + (ar * br - ai * bi), acc_i + (ar * bi + ai * br))
    return (acc_r - (ar * br - ai * bi), acc_i - (ar * bi + ai * br))


def clover_apply_soa(clov, phi):
    """eta[s,c'] = sum_j C[chir, i, j] phi_chir[j]; phi [4,3,T,Z,M]."""
    outs_r, outs_i = [], []
    cr, ci = clov.re, clov.im
    pr, pi = phi.re, phi.im
    for chir in range(2):
        for i in range(6):
            s, a = 2 * chir + i // 3, i % 3
            acc_r = 0.0
            acc_i = 0.0
            for j in range(6):
                t, b = 2 * chir + j // 3, j % 3
                acc_r, acc_i = _cmadd(acc_r, acc_i,
                                      cr[chir, i, j], ci[chir, i, j],
                                      pr[t, b], pi[t, b])
            outs_r.append(acc_r)
            outs_i.append(acc_i)
    sh = phi.re.shape
    return cplx.CArray(jnp.stack(outs_r).reshape(4, 3, *sh[2:]),
                       jnp.stack(outs_i).reshape(4, 3, *sh[2:]))


def _phase_rows(val: complex, row: cplx.CArray, sign: float = 1.0):
    return cplx.phase_mul(val, row, sign)


def dslash_hopping_soa(links, phi, roll, basis_name=None, dirs=(T, Z, Y, X),
                       parts=("f", "b")):
    """Hopping term on SoA fields; identical math to wilson.dslash_hopping.
    parts selects the forward ("f": -U (1-gamma) phi(x+mu)) and/or backward
    ("b": -U^H(x-mu) (1+gamma) phi(x-mu)) halves -- the Galerkin face
    pieces need them separately (galerkin_piece "Df"/"Db")."""
    basis = get_basis(basis_name) if basis_name else get_basis()
    co, val = basis.co, basis.val
    eta_r = [[0.0] * 3 for _ in range(4)]
    eta_i = [[0.0] * 3 for _ in range(4)]

    def add(s, a, contrib, sign=1.0):
        if sign > 0:
            eta_r[s][a] = eta_r[s][a] + contrib.re
            eta_i[s][a] = eta_i[s][a] + contrib.im
        else:
            eta_r[s][a] = eta_r[s][a] - contrib.re
            eta_i[s][a] = eta_i[s][a] - contrib.im

    for mu in dirs:
        u = links[mu]  # [3,3,T,Z,M]
        if "f" in parts:
            # ---- forward: -U (1 - gamma) phi(x+mu) ----
            phi_f = roll(phi, -1, mu)
            # project rows 0,1: h[s] = phi_f[s] - val[mu,s] phi_f[co[mu,s]]
            h = [phi_f[s] - _phase_rows(val[mu, s], phi_f[int(co[mu, s])])
                 for s in (0, 1)]  # each [3,T,Z,M]
            # U h  (color matvec, rows 0,1)
            hf = []
            for s in (0, 1):
                for a in range(3):
                    acc = None
                    for b in range(3):
                        term = cplx.cmul(u[a, b], h[s][b])
                        acc = term if acc is None else acc + term
                    hf.append(acc)
            # lift: rows 0,1: -=; rows 2,3: += val[mu,s]*hf[co[mu,s]]
            for s in (0, 1):
                for a in range(3):
                    add(s, a, hf[3 * s + a], -1.0)
            for s in (2, 3):
                cs = int(co[mu, s])
                for a in range(3):
                    add(s, a, _phase_rows(val[mu, s], hf[3 * cs + a]), +1.0)

        if "b" in parts:
            # ---- backward: -U^H(x-mu) (1 + gamma) phi(x-mu) ----
            hb_in = [phi[s] + _phase_rows(val[mu, s], phi[int(co[mu, s])])
                     for s in (0, 1)]
            hb = []
            for s in (0, 1):
                for a in range(3):
                    acc = None
                    for b in range(3):
                        term = cplx.cmul(cplx.conj(u[b, a]), hb_in[s][b])
                        acc = term if acc is None else acc + term
                    hb.append(roll(acc, 1, mu))
            for s in (0, 1):
                for a in range(3):
                    add(s, a, hb[3 * s + a], -1.0)
            for s in (2, 3):
                cs = int(co[mu, s])
                for a in range(3):
                    add(s, a, _phase_rows(val[mu, s], hb[3 * cs + a]), -1.0)

    sh = phi.re.shape
    out_r = jnp.stack([jnp.stack([eta_r[s][a] for a in range(3)]) for s in range(4)])
    out_i = jnp.stack([jnp.stack([eta_i[s][a] for a in range(3)]) for s in range(4)])
    return cplx.CArray(out_r.reshape(4, 3, *sh[2:]), out_i.reshape(4, 3, *sh[2:]))


def d_plus_clover_soa(links, clov, phi, roll, basis_name=None):
    return clover_apply_soa(clov, phi) + dslash_hopping_soa(
        links, phi, roll, basis_name)


def gamma5_soa(phi):
    """gamma5 in SoA layout: negate spin rows 0,1 (axis 0)."""
    return cplx.concatenate([-phi[0:2], phi[2:4]], axis=0)


def lattice_mask_to_soa(mask: np.ndarray, rdtype=jnp.float32) -> jnp.ndarray:
    """[T,Z,Y,X] site mask -> [T,Z,M] (broadcasts against SoA fields from
    the trailing axes)."""
    t, z, y, x = mask.shape
    return jnp.asarray(np.asarray(mask, dtype=np.float64).reshape(t, z, y * x),
                       dtype=rdtype)


