"""Fused coarse-operator apply on packed stencil blocks.

The coarse-level apply A v + sum_mu (Df roll + Db roll) is the multigrid
cycle's HBM hotspot: 9 dense d x d blocks per site (d = 2 N_tv) are read
per apply while fields are ~d x smaller -- the TPU analog of the
reference's AoSoA-vectorized coarse kernels
(src/sse_coarse_operator_generic.c:28-230, cgemv microkernels
src/blas_vectorized.h:31-71).

Packed storage (the load-bearing trick): XLA:TPU tiles the two minormost
dims of every array to (8, 128); the natural dof-major layout
[d, d, T, Z, M] has minor dims (Z, M) with M = Y*X = 64 on an 8^4 level, so
HALF of every HBM line is tiling padding.  Packing the 9 stencil terms as

    "t"  layout: [9, T, d*d, ZM]   (rows j-major: row j*d + i),  ZM = Z*Y*X
    "tz" layout: [9, T, Z, d*d, M] (when the mesh shards z: Z must stay an
                                    unfused, shardable axis)

makes the minor dims (d*d, ZM) = (1024, 512)-class -- tiling-exact, so the
blocks stream at full HBM bandwidth and are read EXACTLY once per apply.
Measured (8^4, d=32, chained): packed Pallas f32 0.378 ms vs dof-major
einsum path 1.55 ms; bf16 0.191 ms (~840 GB/s, the chip's HBM roofline)
vs 0.625 ms.

The kernel itself is a pure masked contraction: the 8 neighbor fields are
precomputed by XLA rolls (or ppermute halo fetches under shard_map --
parallel/shard_ops.py) and stacked with v into [9, d, T, Z, M]; block-
restricted operators (SAP) multiply per-direction intra-block masks into
the shifted FIELDS, never into the blocks, so one packed tensor serves
full_op / block_op / hop / hop_intra / self_op (term slicing k0:k1 skips
unread terms entirely).
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


def _amap(f, a):
    """Apply an array function to a split CArray's planes or to a plain
    (complex) array."""
    if cplx.is_split(a):
        return cplx.CArray(f(a.re), f(a.im))
    return f(a)


def pack_blocks(Bs_logical, layout: str):
    """[9, T, Z, Y, X, i, j] stacked logical blocks -> packed tensor."""
    nine, t, z, y, x, d, _ = Bs_logical.shape

    def f(a):
        if layout == "t":
            # -> [9, T, j, i, Z, Y, X] -> [9, T, d*d, ZM]
            a = jnp.transpose(a, (0, 1, 6, 5, 2, 3, 4))
            return a.reshape(nine, t, d * d, z * y * x)
        # -> [9, T, Z, j, i, Y, X] -> [9, T, Z, d*d, M]
        a = jnp.transpose(a, (0, 1, 2, 6, 5, 3, 4))
        return a.reshape(nine, t, z, d * d, y * x)

    return _amap(f, Bs_logical)


def unpack_blocks(Pk, lattice, layout: str):
    """Packed tensor -> [9, T, Z, Y, X, i, j] logical blocks (Galerkin /
    inspection path; inverse of pack_blocks)."""
    t, z, y, x = lattice
    nine = Pk.shape[0]

    def f(a):
        if layout == "t":
            d = int(np.sqrt(a.shape[2]))
            a = a.reshape(nine, t, d, d, z, y, x)      # [9,T,j,i,Z,Y,X]
            return jnp.transpose(a, (0, 1, 4, 5, 6, 3, 2))
        d = int(np.sqrt(a.shape[3]))
        a = a.reshape(nine, t, z, d, d, y, x)          # [9,T,Z,j,i,Y,X]
        return jnp.transpose(a, (0, 1, 2, 5, 6, 4, 3))

    return _amap(f, Pk)


def fields_to_rows(vs, layout: str):
    """[k, d, T, Z, M] stacked fields -> kernel row layout
    ("t": [k, T, d, ZM]; "tz": [k, T, Z, d, M])."""
    k, d, t, z, m = vs.shape

    def f(a):
        if layout == "t":
            return jnp.transpose(a, (0, 2, 1, 3, 4)).reshape(k, t, d, z * m)
        return jnp.transpose(a, (0, 2, 3, 1, 4))

    return _amap(f, vs)


def _kernel_t(d, b_re, b_im, v_re, v_im, o_re, o_im):
    # the j-loop is UNROLLED at trace time: d is static, static VMEM slice
    # starts lower to the cheapest mosaic form, and a traced fori_loop
    # inside the kernel hits an unsupported-i64 lowering recursion under
    # x64 mode (jax 0.9 _convert_helper)
    k = pl.program_id(2)
    ar = jnp.zeros(o_re.shape[1:], jnp.float32)
    ai = ar
    for j in range(d):
        br = b_re[0, 0, pl.ds(j * d, d), :]
        bi = b_im[0, 0, pl.ds(j * d, d), :]
        if br.dtype != jnp.float32:
            br = br.astype(jnp.float32)
            bi = bi.astype(jnp.float32)
        vr = v_re[0, 0, pl.ds(j, 1), :]                 # [1, ZM]
        vi = v_im[0, 0, pl.ds(j, 1), :]
        ar = ar + br * vr - bi * vi
        ai = ai + br * vi + bi * vr

    @pl.when(k == 0)
    def _():
        o_re[0] = ar
        o_im[0] = ai

    @pl.when(k != 0)
    def _():
        o_re[0] = o_re[0] + ar
        o_im[0] = o_im[0] + ai


def _kernel_tz(d, b_re, b_im, v_re, v_im, o_re, o_im):
    k = pl.program_id(3)
    ar = jnp.zeros(o_re.shape[2:], jnp.float32)
    ai = ar
    for j in range(d):
        br = b_re[0, 0, 0, pl.ds(j * d, d), :]
        bi = b_im[0, 0, 0, pl.ds(j * d, d), :]
        if br.dtype != jnp.float32:
            br = br.astype(jnp.float32)
            bi = bi.astype(jnp.float32)
        vr = v_re[0, 0, 0, pl.ds(j, 1), :]              # [1, M]
        vi = v_im[0, 0, 0, pl.ds(j, 1), :]
        ar = ar + br * vr - bi * vi
        ai = ai + br * vi + bi * vr

    @pl.when(k == 0)
    def _():
        o_re[0, 0] = ar
        o_im[0, 0] = ai

    @pl.when(k != 0)
    def _():
        o_re[0, 0] = o_re[0, 0] + ar
        o_im[0, 0] = o_im[0, 0] + ai


def _minor_chunk(total: int, d: int) -> int:
    """Largest lane-aligned chunk of the minor axis whose double-buffered
    block-pair working set (re+im of one d*d x chunk stencil block) stays
    within ~8 MiB of the 16 MiB scoped VMEM: at 16 TVs (d=32) the whole
    axis fits in one chunk (the r3 kernel), at 28 TVs (d=56) the un-chunked
    block pair is ~26 MiB and Mosaic refuses to compile (measured VMEM OOM
    at d=56, zm=512)."""
    budget = 8 * 1024 * 1024
    c = total
    while c > 128 and c % 2 == 0 and 2 * 2 * (d * d * c * 4) > budget:
        c //= 2
    return c


@functools.lru_cache(maxsize=None)
def _build_call(lattice, d, nterms, layout, interpret):
    t, z, y, x = lattice
    _i0 = partial(jnp.asarray, dtype=jnp.int32)

    def _g(i):
        return jax.lax.convert_element_type(i, jnp.int32)

    nsites = t * z * y * x
    cost = pl.CostEstimate(
        flops=8 * nterms * d * d * nsites,
        bytes_accessed=nterms * d * d * nsites * 8 + 3 * d * nsites * 8,
        transcendentals=0)

    if layout == "t":
        zm = z * y * x
        c = _minor_chunk(zm, d)
        nc = zm // c
        b_blk = pl.BlockSpec((1, 1, d * d, c),
                             lambda ti, zi, k: (_g(k), _g(ti), _i0(0), _g(zi)),
                             memory_space=pltpu.VMEM)
        v_blk = pl.BlockSpec((1, 1, d, c),
                             lambda ti, zi, k: (_g(k), _g(ti), _i0(0), _g(zi)),
                             memory_space=pltpu.VMEM)
        o_blk = pl.BlockSpec((1, d, c),
                             lambda ti, zi, k: (_g(ti), _i0(0), _g(zi)),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_kernel_t, d), grid=(t, nc, nterms),
            in_specs=[b_blk, b_blk, v_blk, v_blk],
            out_specs=(o_blk, o_blk),
            out_shape=(jax.ShapeDtypeStruct((t, d, zm), jnp.float32),
                       jax.ShapeDtypeStruct((t, d, zm), jnp.float32)),
            cost_estimate=cost, interpret=interpret)

    m = y * x
    c = _minor_chunk(m, d)
    nc = m // c
    b_blk = pl.BlockSpec((1, 1, 1, d * d, c),
                         lambda ti, zi, mi, k: (_g(k), _g(ti), _g(zi),
                                                _i0(0), _g(mi)),
                         memory_space=pltpu.VMEM)
    v_blk = pl.BlockSpec((1, 1, 1, d, c),
                         lambda ti, zi, mi, k: (_g(k), _g(ti), _g(zi),
                                                _i0(0), _g(mi)),
                         memory_space=pltpu.VMEM)
    o_blk = pl.BlockSpec((1, 1, d, c),
                         lambda ti, zi, mi, k: (_g(ti), _g(zi), _i0(0),
                                                _g(mi)),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_tz, d), grid=(t, z, nc, nterms),
        in_specs=[b_blk, b_blk, v_blk, v_blk],
        out_specs=(o_blk, o_blk),
        out_shape=(jax.ShapeDtypeStruct((t, z, d, m), jnp.float32),
                   jax.ShapeDtypeStruct((t, z, d, m), jnp.float32)),
        cost_estimate=cost, interpret=interpret)


def apply_packed(Pk: cplx.CArray, vs: cplx.CArray, lattice, layout: str,
                 use_pallas: bool, interpret=None) -> cplx.CArray:
    """out[i, x] = sum_{k, j} Pk[k][i, j, x] * vs[k, j, x_k].

    Pk: packed blocks (pack_blocks, possibly a leading-axis term slice,
    f32 or bf16); vs: [k, d, T, Z, M] stacked (shifted, possibly masked)
    fields.  Returns [d, T, Z, M]."""
    t, z, y, x = lattice
    nterms, d = vs.shape[0], vs.shape[1]
    split = cplx.is_split(vs)
    rows = fields_to_rows(vs, layout)
    if use_pallas:
        assert split, "the Pallas coarse kernel runs on split-complex operands"
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        call = _build_call(tuple(lattice), d, nterms, layout, bool(interpret))
        out = cplx.CArray(*call(Pk.re, Pk.im, rows.re, rows.im))
    else:
        # XLA fallback on the same packed layout (CPU test path): one
        # contraction over (k, j); the packed->square reshape is free
        if layout == "t":
            eq = "ktjiz,ktjz->tiz"
            shp = (nterms, t, d, d, z * y * x)
        else:
            eq = "ktzjim,ktzjm->tzim"
            shp = (nterms, t, z, d, d, y * x)
        pk5 = _amap(lambda a: a.reshape(shp), Pk)
        if split and pk5.re.dtype != rows.re.dtype:
            pk5 = pk5.astype_real(rows.re.dtype)
        out = cplx.einsum(eq, pk5, rows)
    if layout == "t":
        return _amap(lambda a: jnp.transpose(
            a.reshape(t, d, z, y * x), (1, 0, 2, 3)), out)
    return _amap(lambda a: jnp.transpose(a, (2, 0, 1, 3)), out)
