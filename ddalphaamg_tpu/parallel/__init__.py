"""Multi-device domain decomposition (the reference's MPI layer, rebuilt
TPU-native).

The reference parallelizes by 4D spatial domain decomposition over an
MPI Cartesian grid (src/ghost.c:47, src/ghost_generic.c) with half-spinor
compressed halo exchange.  Here the process grid is a `jax.sharding.Mesh`
with axes ("t","z","y","x") over ICI, and there are two equivalent compute
paths:

  * GSPMD: shard arrays with `shard_operator`/`shard_spinor` and call the
    ordinary operators under jit -- XLA inserts collective-permutes for the
    stencil rolls and psums for reductions automatically.
  * shard_map: `dslash_shmap` does the halo exchange explicitly with
    lax.ppermute of half-spinor faces (the reference's
    ghost_sendrecv_PRECISION, src/ghost_generic.c:171-265, including its
    half-spinor compression trick, :99-104), leaving XLA free to overlap
    the face transfers with interior compute.

The reference's "gathering" (coarse levels on rank subsets,
src/gathering_generic.c) maps to replicating the tiny coarse problems
across the mesh: coarse arrays carry a replicated sharding, so coarse
solves run redundantly on every device with zero communication.
"""

from .mesh import (
    factor_devices,
    make_solver_mesh,
    shard_operator,
    shard_spinor,
    shard_links,
    replicate,
    shard_stencil,
    shard_stacked_field,
    replicate_stencil,
    shard_field,
    shard_interpolation,
    site_spec,
    soa_spec,
    SPINOR_SPEC,
    LINKS_SPEC,
    CLOVER_SPEC,
    SOA_SPINOR_SPEC,
)
from .halo import dslash_shmap, halo_exchange_shift
from .soa_halo import soa_dslash_shmap

__all__ = [
    "factor_devices", "make_solver_mesh", "shard_operator", "shard_spinor",
    "shard_links", "replicate", "shard_stencil", "replicate_stencil",
    "shard_field", "shard_stacked_field", "shard_interpolation",
    "site_spec", "soa_spec",
    "SPINOR_SPEC", "LINKS_SPEC", "CLOVER_SPEC", "SOA_SPINOR_SPEC",
    "dslash_shmap", "halo_exchange_shift", "soa_dslash_shmap",
]
