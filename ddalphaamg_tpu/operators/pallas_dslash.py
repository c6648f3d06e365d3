"""Fused Pallas Dslash kernel: the whole Wilson-clover apply in one pass.

Reference parity: this computes exactly `d_plus_clover_PRECISION`
(reference src/dirac_generic.c:159-278, flop model src/init_generic.c:58-60)
in the split-complex SoA layout of operators/fast.py:

    spinor  [4, 3, T, Z, M]      M = Y * X   (re / im separate f32 planes)
    links   [4, 3, 3, T, Z, M]
    clover  packed Hermitian, see pack_clover()

Kernel design (TPU):
  * grid over T; each program computes one t-slice of the output.
  * phi enters through three BlockSpec views (t-1, t, t+1  mod nT) so the
    T-direction "halo" is just the Mosaic pipeline fetching adjacent slices;
    Z/Y/X neighbor access is a roll *inside* the VMEM block (Z = sublane
    roll, Y = lane roll by X, X = two lane rolls blended by a boundary mask
    -- the same fused-minor trick as operators/fast.py).
  * T-direction links are fetched at t and t-1 (the backward hop needs
    U_T(x-T)); Z/Y/X links only at t.
  * the clover term is stored packed (6+6 real diagonals, 15+15 complex
    upper triangles per chirality) -- half the HBM bytes of the dense
    [2,6,6] block used by the reference's `_ORDINARY` layout
    (src/operator_generic.c:84-90) and exactly its 42-entry storage model.

HBM traffic per site: 96 (phi, read once per slice-triple amortized 3x),
links 288 + 72 (linkT re-fetch), packed clover 288, out 96 -- vs the
XLA-fusion path which materializes rolled half-spinor temporaries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cplx
from ..gamma import get_basis

T, Z, Y, X = 0, 1, 2, 3

# upper-triangle pair order for the packed 6x6 Hermitian clover blocks
PAIRS = tuple((i, j) for i in range(6) for j in range(i + 1, 6))


# ---------------------------------------------------------------------------
# setup-time packing
# ---------------------------------------------------------------------------

def pack_clover(clov_soa):
    """[2,6,6,T,Z,M] Hermitian blocks -> (diag [2,6,T,Z,M] f32,
    off CArray [2,15,T,Z,M]).  42 real entries/site/chirality, the
    reference's storage count (src/operator_generic.c:84-90)."""
    diag = jnp.stack([clov_soa.re[:, i, i] for i in range(6)], axis=1)
    off_re = jnp.stack([clov_soa.re[:, i, j] for (i, j) in PAIRS], axis=1)
    off_im = jnp.stack([clov_soa.im[:, i, j] for (i, j) in PAIRS], axis=1)
    return diag, cplx.CArray(off_re, off_im)


# ---------------------------------------------------------------------------
# in-kernel complex helpers (split re/im pairs)
# ---------------------------------------------------------------------------

def _pmul(val: complex, x, sign=1.0):
    """(re, im) <- sign * val * x for a compile-time complex phase val."""
    xr, xi = x
    vr, vi = float(np.real(val)) * sign, float(np.imag(val)) * sign
    if vi == 0.0:
        if vr == 1.0:
            return (xr, xi)
        if vr == -1.0:
            return (-xr, -xi)
        return (vr * xr, vr * xi)
    if vr == 0.0:
        if vi == 1.0:
            return (-xi, xr)
        if vi == -1.0:
            return (xi, -xr)
        return (-vi * xi, vi * xr)
    return (vr * xr - vi * xi, vr * xi + vi * xr)


def _cmul(a, b):
    ar, ai = a
    br, bi = b
    return (ar * br - ai * bi, ar * bi + ai * br)


def _cmul_conj(a, b):
    """conj(a) * b."""
    ar, ai = a
    br, bi = b
    return (ar * br + ai * bi, ar * bi - ai * br)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1])


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _clover_kernel(p0_re, p0_im, cdiag, coff_re, coff_im, out_re, out_im):
    """Clover-only apply (self-coupling / factorized-inverse application --
    the reference's SSE clover / site-inverse kernels, src/sse_dirac.c and
    block_diag_oo_inv, src/sse_oddeven_generic.c:208)."""
    p0 = [[(p0_re[s, a, 0], p0_im[s, a, 0]) for a in range(3)] for s in range(4)]
    for chir in range(2):
        comp = [p0[2 * chir + i // 3][i % 3] for i in range(6)]
        acc = [(cdiag[chir, i, 0] * comp[i][0],
                cdiag[chir, i, 0] * comp[i][1]) for i in range(6)]
        for k, (i, j) in enumerate(PAIRS):
            c = (coff_re[chir, k, 0], coff_im[chir, k, 0])
            acc[i] = _add(acc[i], _cmul(c, comp[j]))
            acc[j] = _add(acc[j], _cmul_conj(c, comp[i]))
        for i in range(6):
            s, a = 2 * chir + i // 3, i % 3
            out_re[s, a, 0] = acc[i][0]
            out_im[s, a, 0] = acc[i][1]


def _dslash_kernel(lattice, basis_name, mode, *refs):
    """mode: 'full' (clover + hopping), 'hop' (hopping only -- the SAP
    block hopping kernels, src/sse_oddeven_generic.c:27-302)."""
    if mode == "full":
        (pm_re, pm_im, p0_re, p0_im, pp_re, pp_im,
         ut_re, ut_im, utm_re, utm_im, uzyx_re, uzyx_im,
         cdiag, coff_re, coff_im,
         mask_last_ref, mask_first_ref, out_re, out_im) = refs
    else:
        (pm_re, pm_im, p0_re, p0_im, pp_re, pp_im,
         ut_re, ut_im, utm_re, utm_im, uzyx_re, uzyx_im,
         mask_last_ref, mask_first_ref, out_re, out_im) = refs
        cdiag = coff_re = coff_im = None
    basis = get_basis(basis_name) if basis_name else get_basis()
    co, val = basis.co, basis.val
    xn = lattice[3]

    # slices: drop the singleton T axis
    p0 = [[(p0_re[s, a, 0], p0_im[s, a, 0]) for a in range(3)] for s in range(4)]
    pm = [[(pm_re[s, a, 0], pm_im[s, a, 0]) for a in range(3)] for s in range(4)]
    pp = [[(pp_re[s, a, 0], pp_im[s, a, 0]) for a in range(3)] for s in range(4)]

    # x-boundary masks come in as f32 inputs: in-kernel iota + dtype
    # promotion trips a tracing bug under x64, and constant inputs are
    # fetched once by the pipeline anyway
    mask_last = mask_last_ref[...]
    mask_first = mask_first_ref[...]

    def _roll2(a, shift, axis):
        """Circular shift via the native Mosaic roll (jnp.roll's index math
        generates 64-bit ops under x64 that Mosaic cannot legalize).
        pltpu.roll requires a nonnegative shift."""
        ndim = a.ndim
        ax = axis % ndim
        n = a.shape[ax]
        # shift must be i32: a python int becomes an i64 constant under x64,
        # which tpu.dynamic_rotate rejects
        return pltpu.roll(a, jnp.int32(shift % n), ax)

    def roll_zyx(x, shift, mu):
        """Periodic neighbor fetch within the (Z, M) slice."""
        xr, xi = x
        if mu == Z:
            return (_roll2(xr, shift, -2), _roll2(xi, shift, -2))
        if mu == Y:
            return (_roll2(xr, shift * xn, -1), _roll2(xi, shift * xn, -1))
        # X: blend a unit lane-roll with the wrap-around roll
        if shift == -1:   # fetch a[x+1]
            mask = mask_last
            main = (_roll2(xr, -1, -1), _roll2(xi, -1, -1))
            wrap = (_roll2(xr, xn - 1, -1), _roll2(xi, xn - 1, -1))
        else:             # fetch a[x-1]
            mask = mask_first
            main = (_roll2(xr, 1, -1), _roll2(xi, 1, -1))
            wrap = (_roll2(xr, -(xn - 1), -1), _roll2(xi, -(xn - 1), -1))
        return (main[0] + (wrap[0] - main[0]) * mask,
                main[1] + (wrap[1] - main[1]) * mask)

    # ---- clover: eta = C phi, packed Hermitian blocks ----
    eta = [[None] * 3 for _ in range(4)]
    if mode == "full":
        for chir in range(2):
            comp = [p0[2 * chir + i // 3][i % 3] for i in range(6)]
            acc = [(cdiag[chir, i, 0] * comp[i][0],
                    cdiag[chir, i, 0] * comp[i][1]) for i in range(6)]
            for k, (i, j) in enumerate(PAIRS):
                c = (coff_re[chir, k, 0], coff_im[chir, k, 0])
                acc[i] = _add(acc[i], _cmul(c, comp[j]))
                acc[j] = _add(acc[j], _cmul_conj(c, comp[i]))
            for i in range(6):
                eta[2 * chir + i // 3][i % 3] = acc[i]
    else:
        zero = p0[0][0][0] * 0.0
        for s in range(4):
            for a in range(3):
                eta[s][a] = (zero, zero)

    def u_at(mu_local, which):
        """3x3 link matrix entries as (re, im) pairs."""
        if which == "t":
            return [[(ut_re[a, b, 0], ut_im[a, b, 0]) for b in range(3)]
                    for a in range(3)]
        if which == "tm":
            return [[(utm_re[a, b, 0], utm_im[a, b, 0]) for b in range(3)]
                    for a in range(3)]
        return [[(uzyx_re[mu_local, a, b, 0], uzyx_im[mu_local, a, b, 0])
                 for b in range(3)] for a in range(3)]

    for mu in (T, Z, Y, X):
        # ---------- forward hop: eta -= U(x) (1 - gamma_mu) phi(x + mu) ----
        if mu == T:
            phi_f = pp
            u = u_at(None, "t")
        else:
            phi_f = [[roll_zyx(p0[s][a], -1, mu) for a in range(3)]
                     for s in range(4)]
            u = u_at(mu - 1, "zyx")
        # project upper half: h[s] = phi_f[s] - val * phi_f[co]
        h = [[_sub(phi_f[s][b], _pmul(val[mu, s], phi_f[int(co[mu, s])][b]))
              for b in range(3)] for s in (0, 1)]
        # color matvec hf = U h
        hf = [[None] * 3 for _ in range(2)]
        for s in range(2):
            for a in range(3):
                acc = _cmul(u[a][0], h[s][0])
                acc = _add(acc, _cmul(u[a][1], h[s][1]))
                acc = _add(acc, _cmul(u[a][2], h[s][2]))
                hf[s][a] = acc
        for s in (0, 1):
            for a in range(3):
                eta[s][a] = _sub(eta[s][a], hf[s][a])
        for s in (2, 3):
            cs = int(co[mu, s])
            for a in range(3):
                eta[s][a] = _add(eta[s][a], _pmul(val[mu, s], hf[cs][a]))

        # ---------- backward hop: eta -= U^H(x-mu) (1 + gamma_mu) phi(x-mu)
        if mu == T:
            phi_b, ub = pm, u_at(None, "tm")
        else:
            phi_b, ub = p0, u  # compute locally, then roll the result
        hb_in = [[_add(phi_b[s][b], _pmul(val[mu, s], phi_b[int(co[mu, s])][b]))
                  for b in range(3)] for s in (0, 1)]
        hb = [[None] * 3 for _ in range(2)]
        for s in range(2):
            for a in range(3):
                acc = _cmul_conj(ub[0][a], hb_in[s][0])
                acc = _add(acc, _cmul_conj(ub[1][a], hb_in[s][1]))
                acc = _add(acc, _cmul_conj(ub[2][a], hb_in[s][2]))
                if mu != T:
                    acc = roll_zyx(acc, 1, mu)
                hb[s][a] = acc
        for s in (0, 1):
            for a in range(3):
                eta[s][a] = _sub(eta[s][a], hb[s][a])
        for s in (2, 3):
            cs = int(co[mu, s])
            for a in range(3):
                eta[s][a] = _sub(eta[s][a], _pmul(val[mu, s], hb[cs][a]))

    for s in range(4):
        for a in range(3):
            out_re[s, a, 0] = eta[s][a][0]
            out_im[s, a, 0] = eta[s][a][1]


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def build_dslash(lattice, basis_name=None, interpret=False, mode="full"):
    """Returns the fused apply in SoA layout.  Call signature by mode:
        'full':   fn(links_soa, cdiag, coff, phi) -> clover + hopping
        'hop':    fn(links_soa, phi)              -> hopping only
        'clover': fn(cdiag, coff, phi)            -> clover (self) only
    links_soa: CArray [4,3,3,T,Z,M]; cdiag f32 [2,6,T,Z,M];
    coff CArray [2,15,T,Z,M]; phi CArray [4,3,T,Z,M].
    The hop/clover variants are the TPU analogs of the reference's SSE
    block-hopping and site-clover(-inverse) kernels
    (src/sse_oddeven_generic.c:27-302, sse_dirac.c)."""
    nt, nz = lattice[0], lattice[1]
    m = lattice[2] * lattice[3]

    # All index-map return values must be i32: python-int literals become
    # i64 constants under x64, which Mosaic cannot legalize.
    _i0 = partial(jnp.asarray, dtype=jnp.int32)

    def _tmod(t, off):
        """(t + off) mod nt via lax.rem on int32 (jnp's % promotion machinery
        breaks inside index-map tracing under x64)."""
        i = jax.lax.convert_element_type(t, jnp.int32)
        return jax.lax.rem(i + jnp.int32(off + nt), jnp.int32(nt))

    def _ti32(t):
        return jax.lax.convert_element_type(t, jnp.int32)

    def sb(off):
        return pl.BlockSpec(
            (4, 3, 1, nz, m),
            partial(lambda t, o: (_i0(0), _i0(0), _tmod(t, o), _i0(0), _i0(0)),
                    o=off),
            memory_space=pltpu.VMEM)

    def lb(off):
        return pl.BlockSpec(
            (3, 3, 1, nz, m),
            partial(lambda t, o: (_i0(0), _i0(0), _tmod(t, o), _i0(0), _i0(0)),
                    o=off),
            memory_space=pltpu.VMEM)

    lzyx = pl.BlockSpec(
        (3, 3, 3, 1, nz, m),
        lambda t: (_i0(0), _i0(0), _i0(0), _ti32(t), _i0(0), _i0(0)),
        memory_space=pltpu.VMEM)
    cdiag_blk = pl.BlockSpec(
        (2, 6, 1, nz, m),
        lambda t: (_i0(0), _i0(0), _ti32(t), _i0(0), _i0(0)),
        memory_space=pltpu.VMEM)
    coff_blk = pl.BlockSpec(
        (2, 15, 1, nz, m),
        lambda t: (_i0(0), _i0(0), _ti32(t), _i0(0), _i0(0)),
        memory_space=pltpu.VMEM)
    mask_blk = pl.BlockSpec((nz, m), lambda t: (_i0(0), _i0(0)),
                            memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (4, 3, 1, nz, m),
        lambda t: (_i0(0), _i0(0), _ti32(t), _i0(0), _i0(0)),
        memory_space=pltpu.VMEM)

    # masks stay NUMPY: build_dslash may run inside a jit trace (lru-cached),
    # and numpy operands are lifted as per-trace constants safely
    xn = lattice[3]
    col = np.arange(m, dtype=np.int64) % xn
    mask_last_arr = np.ascontiguousarray(
        np.broadcast_to((col == xn - 1).astype(np.float32), (nz, m)))
    mask_first_arr = np.ascontiguousarray(
        np.broadcast_to((col == 0).astype(np.float32), (nz, m)))

    nsites = nt * nz * m
    out_shape = (jax.ShapeDtypeStruct((4, 3, nt, nz, m), jnp.float32),
                 jax.ShapeDtypeStruct((4, 3, nt, nz, m), jnp.float32))

    if mode == "clover":
        call = pl.pallas_call(
            _clover_kernel,
            grid=(nt,),
            in_specs=[sb(0), sb(0), cdiag_blk, coff_blk, coff_blk],
            out_specs=(out_blk, out_blk),
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=552 * nsites,
                bytes_accessed=(96 + 42 * 4 * 2 + 96) * nsites,
                transcendentals=0),
            interpret=interpret,
        )

        def apply_clover(cdiag, coff, phi):
            out_re, out_im = call(phi.re, phi.im, cdiag, coff.re, coff.im)
            return cplx.CArray(out_re, out_im)

        return apply_clover

    kernel = partial(_dslash_kernel, tuple(lattice), basis_name, mode)
    # reference flop models, src/init_generic.c:58-60
    flops_site = 1920 if mode == "full" else 1368
    bytes_site = (96 * 3 + 72 * 2 + 27 * 8 + 96
                  + (42 * 4 * 2 if mode == "full" else 0))

    specs = [sb(-1), sb(-1), sb(0), sb(0), sb(1), sb(1),
             lb(0), lb(0), lb(-1), lb(-1),
             lzyx, lzyx]
    if mode == "full":
        specs += [cdiag_blk, coff_blk, coff_blk]
    specs += [mask_blk, mask_blk]

    call = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=specs,
        out_specs=(out_blk, out_blk),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_site * nsites,
            bytes_accessed=bytes_site * nsites,
            transcendentals=0),
        interpret=interpret,
    )

    if mode == "full":
        def apply_fn(links_soa, cdiag, coff, phi):
            ut = links_soa[T]
            uzyx = cplx.CArray(links_soa.re[1:], links_soa.im[1:])
            out_re, out_im = call(phi.re, phi.im, phi.re, phi.im,
                                  phi.re, phi.im,
                                  ut.re, ut.im, ut.re, ut.im,
                                  uzyx.re, uzyx.im,
                                  cdiag, coff.re, coff.im,
                                  mask_last_arr, mask_first_arr)
            return cplx.CArray(out_re, out_im)

        return apply_fn

    def apply_hop(links_soa, phi):
        ut = links_soa[T]
        uzyx = cplx.CArray(links_soa.re[1:], links_soa.im[1:])
        out_re, out_im = call(phi.re, phi.im, phi.re, phi.im, phi.re, phi.im,
                              ut.re, ut.im, ut.re, ut.im,
                              uzyx.re, uzyx.im,
                              mask_last_arr, mask_first_arr)
        return cplx.CArray(out_re, out_im)

    return apply_hop
