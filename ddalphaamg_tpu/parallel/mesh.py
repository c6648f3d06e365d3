"""Device mesh construction and sharding helpers.

Reference analog: cart_define / neighbor_define (src/ghost.c:24-72) build the
4D MPI process grid from global/local lattice ratios.  Here the grid is a
jax Mesh with axes ("t","z","y","x"); the "process grid dims" are chosen by
factor_devices() unless given explicitly, and neighbor relationships are
implicit in lax.ppermute rings / XLA collective-permutes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import cplx

AXES = ("t", "z", "y", "x")

# logical layouts: spinor [T,Z,Y,X,4,3], links [4,T,Z,Y,X,3,3],
# clover [T,Z,Y,X,2,6,6]
SPINOR_SPEC = P("t", "z", "y", "x", None, None)
LINKS_SPEC = P(None, "t", "z", "y", "x", None, None)
CLOVER_SPEC = P("t", "z", "y", "x", None, None, None)


def factor_devices(n: int, lattice=None) -> tuple:
    """Split n devices into 4 mesh dims (t,z,y,x), preferring dims that
    divide the lattice (reference: np = prod(global/local lattice))."""
    dims = [1, 1, 1, 1]
    i = 0
    while n > 1:
        for p in (2, 3, 5, 7):
            if n % p == 0:
                # pick the next axis whose lattice extent is divisible
                for k in range(4):
                    ax = (i + k) % 4
                    if lattice is None or lattice[ax] % (dims[ax] * p) == 0:
                        dims[ax] *= p
                        i = ax + 1
                        break
                else:
                    dims[i % 4] *= p
                    i += 1
                n //= p
                break
        else:
            dims[i % 4] *= n
            n = 1
    return tuple(dims)


def make_solver_mesh(n_devices: int | None = None, dims: tuple | None = None,
                     devices=None, lattice=None) -> Mesh:
    """4D solver mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    if dims is None:
        dims = factor_devices(len(devices), lattice)
    arr = np.array(devices).reshape(dims)
    return Mesh(arr, axis_names=AXES)


def _put(x, sharding):
    if cplx.is_split(x):
        return cplx.CArray(jax.device_put(x.re, sharding),
                           jax.device_put(x.im, sharding))
    return jax.device_put(x, sharding)


def shard_spinor(mesh: Mesh, phi, spec: P = SPINOR_SPEC):
    return _put(phi, NamedSharding(mesh, spec))


def shard_links(mesh: Mesh, U):
    """Shard a raw gauge field [4,T,Z,Y,X,3,3] over the mesh."""
    return _put(U, NamedSharding(mesh, LINKS_SPEC))


def shard_operator(mesh: Mesh, op):
    """Shard a WilsonOperator's links/clover over the mesh."""
    return type(op)(
        _put(op.links, NamedSharding(mesh, LINKS_SPEC)),
        _put(op.clover, NamedSharding(mesh, CLOVER_SPEC)),
    )


def replicate(mesh: Mesh, x):
    """Replicated sharding -- the coarse-level 'gathering' analog: the tiny
    coarse problem lives redundantly on every device (SURVEY 2.14.4)."""
    return _put(x, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# production hierarchy sharding (reference: the operator/vector distribution
# that cart_define + ghost_alloc + gathering_PRECISION_setup establish,
# src/ghost.c:47, src/gathering_generic.c:44-209)
# ---------------------------------------------------------------------------

# SoA fast-path layouts fuse M = Y*X into one minor axis (operators/fast.py),
# so SoA fields shard along t/z only; meshes with y/x extents > 1 must use
# the logical layout at depth 0.
SOA_SPINOR_SPEC = P(None, None, "t", "z", None)


def site_spec(mesh: Mesh, lattice, lead: int = 0, trail: int = 0) -> P:
    """PartitionSpec for an array [(lead dims), T, Z, Y, X, (trail dims)].
    Lattice dims not divisible by their mesh extent stay replicated."""
    names = [ax if lattice[mu] % mesh.shape[ax] == 0 and mesh.shape[ax] > 1
             else None for mu, ax in enumerate(AXES)]
    return P(*([None] * lead + names + [None] * trail))


def soa_spec(mesh: Mesh, lattice, lead: int = 0) -> P:
    """PartitionSpec for an SoA array [(lead dims), T, Z, M]."""
    names = [ax if lattice[mu] % mesh.shape[ax] == 0 and mesh.shape[ax] > 1
             else None for mu, ax in enumerate(AXES[:2])]
    return P(*([None] * lead + names + [None]))


def packed_block_spec(mesh: Mesh, lattice, layout: str) -> P:
    """PartitionSpec for packed coarse block tensors
    (operators/pallas_coarse.py): "t" [9, T, d*d, ZM] shards T only;
    "tz" [9, T, Z, d*d, M] shards T and Z."""
    names = [ax if lattice[mu] % mesh.shape[ax] == 0 and mesh.shape[ax] > 1
             else None for mu, ax in enumerate(AXES[:2])]
    if layout == "t":
        return P(None, names[0], None, None)
    return P(None, names[0], names[1], None, None)


def shard_stencil(mesh: Mesh, s):
    """Shard a level stencil's fields over the mesh (4D domain
    decomposition).  Returns a stencil of the same type.  For coarse levels
    pass `replicated=True` via replicate_stencil instead."""
    import dataclasses
    from ..operators.stencil import (CoarseStencil, CoarseStencilSoA,
                                     WilsonStencil, WilsonStencilSoA)
    lat = s.geom.lattice

    def put(x, spec):
        return _put(x, NamedSharding(mesh, spec))

    def _soa_mesh(stencil):
        """The mesh a sharded SoA stencil's ops should shard_map over: the
        solver mesh when any t/z axis actively shards, else None (ops run
        the plain local path).  Schwarz blocks must divide the per-device
        sub-lattice so block-restricted ops stay zero-communication
        (parallel/shard_ops.py)."""
        from .shard_ops import active_axes, local_lattice
        if not active_axes(mesh, lat):
            return None
        loc = local_lattice(mesh, lat)
        blk = stencil.geom.block
        assert all(blk[mu] <= 1 or loc[mu] % blk[mu] == 0 for mu in range(4)), (
            f"Schwarz block {blk} does not divide the local lattice {loc} "
            f"(mesh {dict(mesh.shape)}): block ops would cross shards")
        return mesh

    if isinstance(s, CoarseStencilSoA):
        if mesh.shape["y"] > 1 or mesh.shape["x"] > 1:
            raise ValueError(
                "SoA coarse layout fuses Y*X; use coarse_layout='logical' "
                f"for meshes with y/x extents > 1 (mesh {dict(mesh.shape)})")
        # an actively z-sharded mesh needs Z as an unfused packed axis
        z_active = mesh.shape["z"] > 1 and lat[1] % mesh.shape["z"] == 0
        if z_active and s.layout != "tz":
            s = s.relayout("tz")
        pk_spec = packed_block_spec(mesh, lat, s.layout)
        return dataclasses.replace(
            s,
            Pk=put(s.Pk, pk_spec),
            Pk_inv=put(s.Pk_inv, pk_spec),
            fwd_m=put(s.fwd_m, soa_spec(mesh, lat, lead=1)),
            bwd_m=put(s.bwd_m, soa_spec(mesh, lat, lead=1)),
            even=put(s.even, soa_spec(mesh, lat)),
            odd=put(s.odd, soa_spec(mesh, lat)),
            mesh=_soa_mesh(s),
        )

    if isinstance(s, WilsonStencilSoA):
        if mesh.shape["y"] > 1 or mesh.shape["x"] > 1:
            raise ValueError(
                "SoA fine layout fuses Y*X; use fine_layout='logical' for "
                f"meshes with y/x extents > 1 (mesh {dict(mesh.shape)})")
        return dataclasses.replace(
            s,
            links=put(s.links, soa_spec(mesh, lat, lead=3)),
            links_intra=put(s.links_intra, soa_spec(mesh, lat, lead=3)),
            clover=put(s.clover, soa_spec(mesh, lat, lead=3)),
            clover_inv=put(s.clover_inv, soa_spec(mesh, lat, lead=3)),
            cdiag=put(s.cdiag, soa_spec(mesh, lat, lead=2)),
            coff=put(s.coff, soa_spec(mesh, lat, lead=2)),
            cdiag_inv=put(s.cdiag_inv, soa_spec(mesh, lat, lead=2)),
            coff_inv=put(s.coff_inv, soa_spec(mesh, lat, lead=2)),
            even=put(s.even, soa_spec(mesh, lat)),
            odd=put(s.odd, soa_spec(mesh, lat)),
            mesh=_soa_mesh(s),
        )
    if isinstance(s, WilsonStencil):
        return dataclasses.replace(
            s,
            links=put(s.links, site_spec(mesh, lat, lead=1, trail=2)),
            links_intra=put(s.links_intra, site_spec(mesh, lat, lead=1, trail=2)),
            clover=put(s.clover, site_spec(mesh, lat, trail=3)),
            clover_inv=put(s.clover_inv, site_spec(mesh, lat, trail=3)),
            even=put(s.even, site_spec(mesh, lat, trail=2)),
            odd=put(s.odd, site_spec(mesh, lat, trail=2)),
        )
    if isinstance(s, CoarseStencil):
        return dataclasses.replace(
            s,
            A=put(s.A, site_spec(mesh, lat, trail=2)),
            Df=put(s.Df, site_spec(mesh, lat, lead=1, trail=2)),
            Db=put(s.Db, site_spec(mesh, lat, lead=1, trail=2)),
            Df_intra=put(s.Df_intra, site_spec(mesh, lat, lead=1, trail=2)),
            Db_intra=put(s.Db_intra, site_spec(mesh, lat, lead=1, trail=2)),
            A_inv=put(s.A_inv, site_spec(mesh, lat, trail=2)),
            even=put(s.even, site_spec(mesh, lat, trail=1)),
            odd=put(s.odd, site_spec(mesh, lat, trail=1)),
        )
    raise TypeError(type(s))


def replicate_stencil(mesh: Mesh, s):
    """Fully replicate a (coarse) stencil -- the coarsest-level 'gathering'
    analog: every device redundantly holds and solves the tiny problem.
    mesh stays None on the stencil: its ops run the plain local path."""
    import dataclasses
    fields = {f.name: replicate(mesh, getattr(s, f.name))
              for f in dataclasses.fields(s)
              if f.name not in ("geom", "mesh")
              and getattr(s, f.name) is not None
              and not isinstance(getattr(s, f.name), (bool, str, int, float))}
    return dataclasses.replace(s, **fields)


def shard_field(mesh: Mesh, v, lattice, soa: bool = False):
    """Shard a level field: logical [T,Z,Y,X,dof...] or SoA [dof..,T,Z,M]."""
    if soa:
        nd = (v.re.ndim if cplx.is_split(v) else v.ndim)
        return _put(v, NamedSharding(mesh, soa_spec(mesh, lattice, lead=nd - 3)))
    nd = (v.re.ndim if cplx.is_split(v) else v.ndim)
    return _put(v, NamedSharding(mesh, site_spec(mesh, lattice, trail=nd - 4)))


def shard_stacked_field(mesh: Mesh, tvs, lattice, soa: bool = False):
    """Shard a stack of level fields [N, field...] (e.g. test vectors)."""
    nd = (tvs.re.ndim if cplx.is_split(tvs) else tvs.ndim)
    if soa:
        spec = soa_spec(mesh, lattice, lead=nd - 3)
    else:
        spec = site_spec(mesh, lattice, lead=1, trail=nd - 5)
    return _put(tvs, NamedSharding(mesh, spec))


def shard_interpolation(mesh: Mesh, Pmat, coarse_lattice):
    """P [Tc,Zc,Yc,Xc, 2, N, m]: shard over coarse-site dims (aggregates are
    sharding-aligned with the fine field when coarsening divides the local
    extent), replicating any non-divisible dim."""
    return _put(Pmat, NamedSharding(mesh, site_spec(mesh, coarse_lattice, trail=3)))
