"""Explicit halo-exchange Dslash under shard_map.

Reference analog: ghost_sendrecv_PRECISION / ghost_wait_PRECISION
(src/ghost_generic.c:171-345) and the comm/compute-overlapped apply in
d_plus_clover_PRECISION (src/dirac_generic.c:159-278).  Two reference tricks
carry over exactly:

  * half-spinor compression (src/ghost_generic.c:99-104): what crosses the
    wire is not the 4-spinor but the 2-spinor face data -- forward hops send
    the (1-gamma_mu)-projected field, backward hops send the already
    U^H-multiplied projected field, halving halo bytes;
  * comm/compute overlap: each direction's face ppermute is issued
    independently of the interior arithmetic of the other directions, so the
    XLA scheduler can overlap collective-permutes with compute (the
    reference interleaves MPI_Isend/Irecv with the mu-loop).

Boundary conditions: global (anti-)periodicity lives in the link phases
(applied at gauge-read time), so the exchange ring is always periodic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

_shard_map = getattr(jax, "shard_map", None)
if _shard_map is None:  # pragma: no cover (older jax)
    from jax.experimental.shard_map import shard_map as _shard_map

from .. import cplx
from ..gamma import get_basis
from ..operators.wilson import (
    _project, _reconstruct, _su3_mul, _su3_mul_dag, clover_apply,
)
from .mesh import AXES, SPINOR_SPEC, LINKS_SPEC, CLOVER_SPEC


def _tmap(f, x):
    """Apply f to each real plane of a (possibly split) array."""
    if cplx.is_split(x):
        return cplx.CArray(f(x.re), f(x.im))
    return f(x)


def _slice_dim(x, mu, start, stop):
    idx = (slice(None),) * mu + (slice(start, stop),)
    return x[idx]


def _concat(parts, mu):
    if cplx.is_split(parts[0]):
        return cplx.concatenate(parts, axis=mu)
    return jnp.concatenate(parts, axis=mu)


def halo_exchange_shift(x, shift: int, mu: int, axis_size: int):
    """Periodic neighbor fetch x(site + (-shift)*e_mu) across shards.

    shift=-1 fetches the +mu neighbor (the local roll(x, -1, mu)); only the
    one-site face crosses the wire.  Must run inside shard_map."""
    name = AXES[mu]
    if axis_size == 1:
        return cplx.roll(x, shift, mu) if cplx.is_split(x) else jnp.roll(x, shift, mu)
    n = axis_size
    size = x.re.shape[mu] if cplx.is_split(x) else x.shape[mu]
    if shift == -1:
        face = _slice_dim(x, mu, 0, 1)  # my first slice -> -mu neighbor
        perm = [((j + 1) % n, j) for j in range(n)]
        recv = _tmap(lambda a: lax.ppermute(a, name, perm), face)
        return _concat([_slice_dim(x, mu, 1, size), recv], mu)
    if shift == 1:
        face = _slice_dim(x, mu, size - 1, size)  # my last slice -> +mu neighbor
        perm = [((j - 1) % n, j) for j in range(n)]
        recv = _tmap(lambda a: lax.ppermute(a, name, perm), face)
        return _concat([recv, _slice_dim(x, mu, 0, size - 1)], mu)
    raise ValueError(shift)


def _dslash_local(links, clover, phi, mesh_shape, basis_name):
    """Per-shard Wilson-clover apply with explicit face exchange."""
    basis = get_basis(basis_name) if basis_name else get_basis()
    eta = clover_apply(clover, phi)
    for mu in range(4):
        axis_size = mesh_shape[AXES[mu]]
        # forward: -U(x) (1-gamma) phi(x+mu); the *projected* field is
        # shifted, so only 2-spinor faces cross the wire
        half = _project(phi, mu, basis, -1.0)
        h_shift = halo_exchange_shift(half, -1, mu, axis_size)
        eta = eta + _reconstruct(_su3_mul(links[mu], h_shift), mu, basis, -1.0)
        # backward: -U^H(x-mu) (1+gamma) phi(x-mu); the U^H-multiplied
        # projected field is shifted (reference prp buffer contents)
        w = _su3_mul_dag(links[mu], _project(phi, mu, basis, +1.0))
        w_shift = halo_exchange_shift(w, 1, mu, axis_size)
        eta = eta + _reconstruct(w_shift, mu, basis, +1.0)
    return eta


def dslash_shmap(mesh, op, phi, basis_name=None):
    """D phi over a 4D device mesh with explicit half-spinor halo exchange.

    op's links/clover and phi may be sharded or not -- shard_map partitions
    by the canonical specs (mesh.py).  Returns eta with phi's sharding."""
    mesh_shape = dict(mesh.shape)
    fn = _shard_map(
        partial(_dslash_local, mesh_shape=mesh_shape, basis_name=basis_name),
        mesh=mesh,
        in_specs=(LINKS_SPEC, CLOVER_SPEC, SPINOR_SPEC),
        out_specs=SPINOR_SPEC,
    )
    return fn(op.links, op.clover, phi)
