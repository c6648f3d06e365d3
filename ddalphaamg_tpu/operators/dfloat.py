"""Double-float (two-float32) arithmetic and the extended-precision
Wilson-clover residual for TPU.

Why: the reference's outer FGMRES runs in double precision
(src/linsolve.c:153, fgmres_MP) and converges to relative residual 1e-10.
TPU v5e executes no f64 HLOs at all, and f32 residual computation floors the
achievable relative residual at ~1e-7 (the rounding of the operator apply
itself).  The TPU-native substitute is double-float ("double-single")
arithmetic: every scalar is an unevaluated sum hi + lo of two f32 with
|lo| <= ulp(hi)/2, giving ~49 bits of significand -- enough for 1e-10 with
headroom.  Only the ONCE-PER-RESTART true-residual computation and solution
accumulation run in double-float; all Krylov/multigrid inner work stays f32.

Algorithms: Dekker (1971) / Knuth two_sum; Veltkamp splitting for the
product error term (no FMA dependence -- XLA:TPU does not expose a reliable
f32 fma for this).  See Hida/Li/Bailey "Library for Double-Double and
Quad-Double Arithmetic" for the add2/mul2 forms used.

Complex fields are (re, im) double-float pairs: a CDF carries 4 f32 arrays.
The Dslash below mirrors operators/fast.py's SoA layout [dof.., T, Z, M] so
the same rollers apply; the operator (links/clover) is stored as CDF built
from the f64 host-side values, so the residual targets the *f64-accurate*
operator, not its f32 rounding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..gamma import get_basis

# 2^12 + 1 (f32: 24-bit significand).  NUMPY scalar, not jnp: a module-
# level device scalar gets captured as a committed constant in every jit
# that touches df arithmetic, and lowering then fetches it d2h -- which
# fails outright when the device is memory-tight (measured at 32^4).
_SPLITTER = np.float32(4097.0)


# ---------------------------------------------------------------------------
# real double-float primitives (elementwise over jnp arrays)
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """a + b = s + e exactly (Knuth, 6 flops)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """a + b = s + e exactly, assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """a * b = p + e exactly via Veltkamp splitting (17 flops, no fma)."""
    p = a * b
    aa = _SPLITTER * a
    a_hi = aa - (aa - a)
    a_lo = a - a_hi
    bb = _SPLITTER * b
    b_hi = bb - (bb - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


class DF(NamedTuple):
    """Unevaluated sum hi + lo of two f32 arrays."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def df(hi, lo=None) -> DF:
    hi = jnp.asarray(hi, jnp.float32)
    return DF(hi, jnp.zeros_like(hi) if lo is None else jnp.asarray(lo, jnp.float32))


def df_from64(a: np.ndarray) -> DF:
    """Exact f64 -> double-float conversion (hi = rounding, lo = remainder)."""
    a = np.asarray(a, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def df_to64(a: DF) -> np.ndarray:
    return np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)


def add2(x: DF, y: DF) -> DF:
    """Accurate df + df (Knuth/QD accurate version, ~20 flops)."""
    s, e = two_sum(x.hi, y.hi)
    t, f = two_sum(x.lo, y.lo)
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    s, e = quick_two_sum(s, e)
    return DF(s, e)


def sub2(x: DF, y: DF) -> DF:
    return add2(x, DF(-y.hi, -y.lo))


def mul2(x: DF, y: DF) -> DF:
    """df * df (~25 flops)."""
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    p, e = quick_two_sum(p, e)
    return DF(p, e)


def scale2(x: DF, c: float) -> DF:
    """df * exact f32 constant c (powers of two / +-1 stay exact)."""
    return DF(x.hi * jnp.float32(c), x.lo * jnp.float32(c))


# ---------------------------------------------------------------------------
# complex double-float
# ---------------------------------------------------------------------------

class CDF(NamedTuple):
    re: DF
    im: DF

    def __add__(self, o):
        return CDF(add2(self.re, o.re), add2(self.im, o.im))

    def __sub__(self, o):
        return CDF(sub2(self.re, o.re), sub2(self.im, o.im))

    def __neg__(self):
        return CDF(DF(-self.re.hi, -self.re.lo), DF(-self.im.hi, -self.im.lo))


def cdf_from_carray(a: cplx.CArray) -> CDF:
    """f32 CArray -> CDF with zero low parts."""
    return CDF(df(a.re), df(a.im))


def cdf_hi(a: CDF) -> cplx.CArray:
    """Round to f32 CArray (the hi parts)."""
    return cplx.CArray(a.re.hi, a.im.hi)


def cdf_from64(a: np.ndarray) -> CDF:
    """Exact complex128 numpy -> CDF."""
    return CDF(df_from64(np.ascontiguousarray(a.real)),
               df_from64(np.ascontiguousarray(a.imag)))


def cdf_to64(a: CDF) -> np.ndarray:
    return df_to64(a.re) + 1j * df_to64(a.im)


def cmul(a: CDF, b: CDF) -> CDF:
    return CDF(sub2(mul2(a.re, b.re), mul2(a.im, b.im)),
               add2(mul2(a.re, b.im), mul2(a.im, b.re)))


def cmul_conj_a(a: CDF, b: CDF) -> CDF:
    """conj(a) * b."""
    return CDF(add2(mul2(a.re, b.re), mul2(a.im, b.im)),
               sub2(mul2(a.re, b.im), mul2(a.im, b.re)))


def phase_mul(val: complex, a: CDF, sign: float = 1.0) -> CDF:
    """Multiply by a compile-time phase from the gamma bases.  All bases in
    gamma.py use unit phases (+-1, +-i), which are exact -- handled by
    component swaps; a general phase falls back to df products."""
    vr, vi = float(np.real(val)) * sign, float(np.imag(val)) * sign
    if vi == 0.0 and vr in (1.0, -1.0):
        return a if vr > 0 else -a
    if vr == 0.0 and vi in (1.0, -1.0):
        # (i*vi) * (re + i im) = -vi*im + i vi*re
        if vi > 0:
            return CDF(DF(-a.im.hi, -a.im.lo), a.re)
        return CDF(a.im, DF(-a.re.hi, -a.re.lo))
    c = CDF(df(jnp.float32(vr)), df(jnp.float32(vi)))
    return cmul(c, a)


def _tree_roll(a: CDF, shift, axis) -> CDF:
    r = lambda x: jnp.roll(x, shift, axis)
    return CDF(DF(r(a.re.hi), r(a.re.lo)), DF(r(a.im.hi), r(a.im.lo)))


def _where(mask, a: CDF, b: CDF) -> CDF:
    w = lambda x, y: jnp.where(mask, x, y)
    return CDF(DF(w(a.re.hi, b.re.hi), w(a.re.lo, b.re.lo)),
               DF(w(a.im.hi, b.im.hi), w(a.im.lo, b.im.lo)))


def make_rollers_df(lattice):
    """SoA neighbor fetch for CDF fields [.., T, Z, M] (operators/fast.py
    layout; X handled with a boundary-select on the fused minor axis)."""
    xn = lattice[3]
    y = lattice[2]
    last = np.zeros((y, xn), dtype=bool)
    last[:, xn - 1] = True
    first = np.zeros((y, xn), dtype=bool)
    first[:, 0] = True
    # NUMPY masks: device-array closures become program constants that jax
    # must fetch d2h at trace time -- on a full device even that staging
    # copy dies with ResourceExhausted (measured at 32^4)
    mask_last = last.reshape(y * xn)
    mask_first = first.reshape(y * xn)

    def roll(a: CDF, shift, mu):
        if mu == 0:
            return _tree_roll(a, shift, -3)
        if mu == 1:
            return _tree_roll(a, shift, -2)
        if mu == 2:
            return _tree_roll(a, shift * xn, -1)
        if shift == -1:
            return _where(mask_last, _tree_roll(a, xn - 1, -1),
                          _tree_roll(a, -1, -1))
        if shift == 1:
            return _where(mask_first, _tree_roll(a, -(xn - 1), -1),
                          _tree_roll(a, 1, -1))
        raise ValueError(shift)

    return roll


# ---------------------------------------------------------------------------
# double-float Wilson-clover apply (SoA layout)
# ---------------------------------------------------------------------------

class WilsonDF(NamedTuple):
    """Operator data in CDF SoA layout: links [4,3,3,T,Z,M],
    clover [2,6,6,T,Z,M] (built from the f64 host-side operator, so the
    residual targets the exact operator)."""

    links: CDF
    clover: CDF


def build_wilson_df(op64_links: np.ndarray, op64_clover: np.ndarray,
                    lattice) -> WilsonDF:
    """From complex128 logical-layout links [4,T,Z,Y,X,3,3] and clover
    [T,Z,Y,X,2,6,6] (operators/fast.py layout conversions, done host-side)."""
    t, z, y, x = lattice
    links = np.transpose(op64_links, (0, 5, 6, 1, 2, 3, 4)).reshape(
        4, 3, 3, t, z, y * x)
    clov = np.transpose(op64_clover, (4, 5, 6, 0, 1, 2, 3)).reshape(
        2, 6, 6, t, z, y * x)
    return WilsonDF(cdf_from64(links), cdf_from64(clov))


def spinor_to_soa_df(phi: CDF, lattice) -> CDF:
    """logical [T,Z,Y,X,4,3] CDF -> SoA [4,3,T,Z,M] CDF."""
    t, z, y, x = lattice
    f = lambda a: jnp.transpose(a, (4, 5, 0, 1, 2, 3)).reshape(4, 3, t, z, y * x)
    return CDF(DF(f(phi.re.hi), f(phi.re.lo)), DF(f(phi.im.hi), f(phi.im.lo)))


def spinor_from_soa_df(phi: CDF, lattice) -> CDF:
    t, z, y, x = lattice
    f = lambda a: jnp.transpose(a.reshape(4, 3, t, z, y, x), (2, 3, 4, 5, 0, 1))
    return CDF(DF(f(phi.re.hi), f(phi.re.lo)), DF(f(phi.im.hi), f(phi.im.lo)))


def _idx(a: CDF, i) -> CDF:
    return CDF(DF(a.re.hi[i], a.re.lo[i]), DF(a.im.hi[i], a.im.lo[i]))


def clover_apply_df(clov: CDF, phi: CDF) -> CDF:
    """eta[chir,i] = sum_j C[chir,i,j] phi[chir,j]; SoA dof layout
    (operators/fast.py clover_apply_soa in double-float)."""
    outs = []
    for chir in range(2):
        for i in range(6):
            acc = None
            for j in range(6):
                s, b = 2 * chir + j // 3, j % 3
                t = cmul(_idx(clov, (chir, i, j)), _idx(phi, (s, b)))
                acc = t if acc is None else acc + t
            outs.append(acc)
    return _stack_soa(outs, phi)


def _stack_soa(rows, like: CDF) -> CDF:
    """12 per-site CDF rows -> [4,3,T,Z,M] CDF."""
    sh = like.re.hi.shape[2:]

    def st(sel):
        return jnp.stack([sel(r) for r in rows]).reshape(4, 3, *sh)

    return CDF(DF(st(lambda r: r.re.hi), st(lambda r: r.re.lo)),
               DF(st(lambda r: r.im.hi), st(lambda r: r.im.lo)))


def dslash_hopping_df(links: CDF, phi: CDF, roll, basis_name=None,
                      dirs=(0, 1, 2, 3)) -> CDF:
    """Hopping term in double-float; mirrors fast.dslash_hopping_soa
    (same reference conventions, src/dirac_generic.c:159-278).  `dirs`
    restricts to a direction subset (the per-direction residual programs
    for memory-tight large lattices)."""
    basis = get_basis(basis_name) if basis_name else get_basis()
    co, val = basis.co, basis.val
    eta = [[None] * 3 for _ in range(4)]

    def add(s, a, contrib, sign=1.0):
        c = contrib if sign > 0 else -contrib
        eta[s][a] = c if eta[s][a] is None else eta[s][a] + c

    for mu in dirs:
        u = _idx(links, mu)  # [3,3,T,Z,M]
        # forward: -U (1 - gamma) phi(x+mu)
        phi_f = roll(phi, -1, mu)
        h = [_idx(phi_f, (s,)) - phase_mul(val[mu, s], _idx(phi_f, (int(co[mu, s]),)))
             for s in (0, 1)]
        hf = []
        for s in (0, 1):
            for a in range(3):
                acc = None
                for b in range(3):
                    t = cmul(_idx(u, (a, b)), _idx(h[s], (b,)))
                    acc = t if acc is None else acc + t
                hf.append(acc)
        for s in (0, 1):
            for a in range(3):
                add(s, a, hf[3 * s + a], -1.0)
        for s in (2, 3):
            cs = int(co[mu, s])
            for a in range(3):
                add(s, a, phase_mul(val[mu, s], hf[3 * cs + a]), +1.0)

        # backward: -U^H(x-mu) (1 + gamma) phi(x-mu)
        hb_in = [_idx(phi, (s,)) + phase_mul(val[mu, s], _idx(phi, (int(co[mu, s]),)))
                 for s in (0, 1)]
        hb = []
        for s in (0, 1):
            for a in range(3):
                acc = None
                for b in range(3):
                    t = cmul_conj_a(_idx(u, (b, a)), _idx(hb_in[s], (b,)))
                    acc = t if acc is None else acc + t
                hb.append(roll(acc, 1, mu))
        for s in (0, 1):
            for a in range(3):
                add(s, a, hb[3 * s + a], -1.0)
        for s in (2, 3):
            cs = int(co[mu, s])
            for a in range(3):
                add(s, a, phase_mul(val[mu, s], hb[3 * cs + a]), -1.0)

    return _stack_soa([eta[s][a] for s in range(4) for a in range(3)], phi)


def d_plus_clover_df(wdf: WilsonDF, phi: CDF, roll, basis_name=None) -> CDF:
    return clover_apply_df(wdf.clover, phi) + dslash_hopping_df(
        wdf.links, phi, roll, basis_name)


# ---------------------------------------------------------------------------
# reductions / axpy in double-float
# ---------------------------------------------------------------------------

def norm2_df(a: CDF) -> DF:
    """||a||^2 as a df scalar (df products, df summation tree)."""
    n1 = _sum_df(mul2(a.re, a.re))
    n2 = _sum_df(mul2(a.im, a.im))
    return add2(n1, n2)


def _sum_df(x: DF) -> DF:
    """Sum all elements of a df array with a compensated pairwise tree."""
    hi = x.hi.reshape(-1)
    lo = x.lo.reshape(-1)
    n = hi.shape[0]
    # pad to a power of two with zeros
    m = 1 << int(np.ceil(np.log2(max(n, 1))))
    if m != n:
        hi = jnp.concatenate([hi, jnp.zeros(m - n, hi.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros(m - n, lo.dtype)])
    cur = DF(hi, lo)
    while cur.hi.shape[0] > 1:
        half = cur.hi.shape[0] // 2
        cur = add2(DF(cur.hi[:half], cur.lo[:half]),
                   DF(cur.hi[half:], cur.lo[half:]))
    return DF(cur.hi[0], cur.lo[0])


def axpy_df(x: CDF, z: cplx.CArray) -> CDF:
    """x + z with z an f32 CArray (the inner-solve correction)."""
    return x + cdf_from_carray(z)


import functools


@functools.lru_cache(maxsize=None)
def build_outer_fns(lattice):
    """Jitted outer-loop building blocks for the df-precision driver,
    cached per lattice so repeated solves never recompile.

    returns (residual, extract_r32, axpy_logical):
      residual(wdf, b_cdf, x_cdf) -> (r_cdf, rn2[2])   rn2 = (hi, lo) pair
      extract_r32(r_cdf) -> logical f32 CArray          (inner-solve rhs)
      axpy_logical(x_cdf, z_logical_f32) -> x_cdf
    """
    from . import fast

    roll = make_rollers_df(lattice)
    big = int(np.prod(lattice)) > 200_000

    if not big:
        @jax.jit
        def residual(wdf: WilsonDF, b_cdf: CDF, x_cdf: CDF):
            r = b_cdf - d_plus_clover_df(wdf, x_cdf, roll)
            n2 = norm2_df(r)
            return r, jnp.stack([n2.hi, n2.lo])
    else:
        # large lattices: the one-program residual's df-expanded temporaries
        # (each spinor intermediate is 4 f32 planes) exceed the free HBM
        # next to the resident hierarchy; run clover + each hop direction +
        # the norm as separate programs with a df-accumulated r
        @jax.jit
        def _res_clover(wdf: WilsonDF, b_cdf: CDF, x_cdf: CDF):
            return b_cdf - clover_apply_df(wdf.clover, x_cdf)

        @functools.partial(jax.jit, static_argnames=("mu",))
        def _res_hop(wdf: WilsonDF, acc: CDF, x_cdf: CDF, mu: int):
            return acc - dslash_hopping_df(wdf.links, x_cdf, roll,
                                           dirs=(mu,))

        @jax.jit
        def _res_norm(r: CDF):
            n2 = norm2_df(r)
            return jnp.stack([n2.hi, n2.lo])

        def residual(wdf: WilsonDF, b_cdf: CDF, x_cdf: CDF):
            r = _res_clover(wdf, b_cdf, x_cdf)
            for mu in range(4):
                r = _res_hop(wdf, r, x_cdf, mu)
            return r, _res_norm(r)

    @jax.jit
    def extract_r32(r_cdf: CDF):
        return fast.spinor_from_soa(cdf_hi(r_cdf), lattice)

    @jax.jit
    def axpy_logical(x_cdf: CDF, z_logical):
        return x_cdf + cdf_from_carray(fast.spinor_to_soa(z_logical))

    return residual, extract_r32, axpy_logical
