"""Fused Pallas coarse-operator kernel.

The coarse-level apply A v + sum_mu (Df roll + Db roll) is the multigrid
cycle's HBM hotspot: 9 dense d x d blocks per site (d = 2 N_tv) are read per
apply while fields are ~d x smaller -- the TPU analog of the reference's
AoSoA-vectorized coarse kernels (src/sse_coarse_operator_generic.c:28-230,
cgemv microkernels src/blas_vectorized.h:31-71).

Design:
  * the 9 stencil terms are STACKED into one packed tensor
    [9, T, d*d (j-major), ZM] (pack_blocks), read exactly once per apply;
  * the 8 neighbor fields are precomputed by XLA rolls (field-sized, ~5% of
    the block bytes) and stacked [9, T, d, ZM] -- so the kernel is a pure
    contraction with no in-kernel neighbor logic, and the same kernel serves
    full_op/block_op/hop under any halo scheme (the sharded path feeds
    ppermute-fetched faces, parallel/shard_ops.py);
  * grid (T, 9), k innermost: the output block [d, ZM] stays resident in
    VMEM while the 9 terms accumulate into it; a fori_loop over j does
    out[i, :] += B[i, j] * v[j, :] as full-lane VPU multiply-adds
    ([d, ZM] tiles, ZM = Z*Y*X fused -> lane-exact whenever ZM % 128 == 0,
    the reference's "pad 2N to SIMD width" trick applied to the lattice
    axis instead, where there is no padding waste at all);
  * blocks may be stored bf16 (CoarseStencilSoA.compress analog): widened
    to f32 in VMEM at multiply time, halving HBM block traffic.

Layouts (split-complex re/im planes throughout):
    packed blocks [9, T, d*d, ZM]   row j*d+i of term k at time t
    fields in     [9, T, d, ZM]     (v and its 8 shifted copies)
    out           [T, d, ZM]        (transposed back to [d, T, Z, M] outside)
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cplx


def pack_blocks(Bs: cplx.CArray) -> cplx.CArray:
    """[9, d, d, T, Z, M] stacked stencil blocks -> [9, T, d*d, ZM] with
    rows ordered j-major (row j*d + i), so column j of every block is one
    contiguous [d, ZM] sublane run."""
    nine, d, _, t, z, m = Bs.shape

    def f(a):
        a = jnp.transpose(a, (0, 3, 2, 1, 4, 5))       # [9, T, j, i, Z, M]
        return a.reshape(nine, t, d * d, z * m)

    return cplx.CArray(f(Bs.re), f(Bs.im))


def fields_to_rows(vs: cplx.CArray):
    """[9, d, T, Z, M] stacked fields -> [9, T, d, ZM]."""
    nine, d, t, z, m = vs.shape

    def f(a):
        return jnp.transpose(a, (0, 2, 1, 3, 4)).reshape(nine, t, d, z * m)

    return cplx.CArray(f(vs.re), f(vs.im))


def _kernel(d, out_init, b_re, b_im, v_re, v_im, o_re, o_im):
    k = pl.program_id(1)

    def body(j, acc):
        ar, ai = acc
        br = b_re[0, 0, pl.ds(j * d, d), :]
        bi = b_im[0, 0, pl.ds(j * d, d), :]
        if br.dtype != jnp.float32:
            br = br.astype(jnp.float32)
            bi = bi.astype(jnp.float32)
        vr = v_re[0, 0, pl.ds(j, 1), :]                      # [1, ZM]
        vi = v_im[0, 0, pl.ds(j, 1), :]
        return (ar + br * vr - bi * vi, ai + br * vi + bi * vr)

    zero = jnp.zeros(o_re.shape[1:], jnp.float32)
    acc = jax.lax.fori_loop(0, d, body, (zero, zero))

    @pl.when(k == 0)
    def _():
        o_re[0] = acc[0]
        o_im[0] = acc[1]

    @pl.when(k != 0)
    def _():
        o_re[0] = o_re[0] + acc[0]
        o_im[0] = o_im[0] + acc[1]


@functools.lru_cache(maxsize=None)
def build_coarse_apply(lattice, d, nterms=9, interpret=None):
    """Returns fn(packed_blocks, stacked_fields) -> out [d, T, Z, M].

    packed_blocks: CArray [nterms, T, d*d, ZM] (pack_blocks), f32 or bf16;
    stacked_fields: CArray [nterms, d, T, Z, M] (v + its shifted copies, in
    the same term order as the blocks)."""
    t, z, y, x = lattice
    zm = z * y * x
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    _i0 = partial(jnp.asarray, dtype=jnp.int32)

    def _g(i):
        return jax.lax.convert_element_type(i, jnp.int32)

    b_blk = pl.BlockSpec((1, 1, d * d, zm),
                         lambda ti, k: (_g(k), _g(ti), _i0(0), _i0(0)),
                         memory_space=pltpu.VMEM)
    v_blk = pl.BlockSpec((1, 1, d, zm),
                         lambda ti, k: (_g(k), _g(ti), _i0(0), _i0(0)),
                         memory_space=pltpu.VMEM)
    o_blk = pl.BlockSpec((1, d, zm),
                         lambda ti, k: (_g(ti), _i0(0), _i0(0)),
                         memory_space=pltpu.VMEM)

    nsites = t * zm
    call = pl.pallas_call(
        partial(_kernel, d, None),
        grid=(t, nterms),
        in_specs=[b_blk, b_blk, v_blk, v_blk],
        out_specs=(o_blk, o_blk),
        out_shape=(jax.ShapeDtypeStruct((t, d, zm), jnp.float32),
                   jax.ShapeDtypeStruct((t, d, zm), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=8 * nterms * d * d * nsites,
            bytes_accessed=nterms * d * d * nsites * 8 + 3 * d * nsites * 8,
            transcendentals=0),
        interpret=interpret,
    )

    def apply_fn(packed, vs):
        rows = fields_to_rows(vs)
        o_re, o_im = call(packed.re, packed.im, rows.re, rows.im)
        out = cplx.CArray(o_re, o_im)                   # [T, d, ZM]
        return cplx.CArray(
            jnp.transpose(o_re, (1, 0, 2)).reshape(d, t, z, y * x),
            jnp.transpose(o_im, (1, 0, 2)).reshape(d, t, z, y * x))

    return apply_fn
