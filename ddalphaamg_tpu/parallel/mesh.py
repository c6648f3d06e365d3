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
