"""Split-complex arrays: the TPU-native complex representation.

The TPU runtime in this environment does not execute complex-dtype ops at
all (every complex HLO fails with UNIMPLEMENTED at run time, and complex
arrays cannot cross the host boundary).  The TPU-native representation is a
pair of real arrays (re, im) -- `CArray` -- with complex arithmetic expanded
manually; contractions use the 3-multiplication (Karatsuba) form so einsums
cost 3 real MXU contractions instead of 4.

Every helper in this module dispatches on type: given ordinary jnp complex
arrays it falls through to the corresponding jnp op, so the same solver code
runs in "complex mode" (CPU: complex64/128, convenient and exactly matching
the parity tests) and "split mode" (TPU or CPU: a pytree of two real
arrays).  Real-valued arrays (masks, scales) multiply either representation
transparently.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class _AtSetter:
    def __init__(self, arr: "CArray", idx):
        self._arr = arr
        self._idx = idx

    def set(self, val):
        val = as_carray(val)
        return CArray(self._arr.re.at[self._idx].set(val.re),
                      self._arr.im.at[self._idx].set(val.im))

    def add(self, val):
        val = as_carray(val)
        return CArray(self._arr.re.at[self._idx].add(val.re),
                      self._arr.im.at[self._idx].add(val.im))

    def multiply(self, val):
        if isinstance(val, CArray) or np.iscomplexobj(np.asarray(val)):
            val = as_carray(val)
            old = self._arr[self._idx]
            new = cmul(old, val)
            return self[self._idx].set(new)  # pragma: no cover
        return CArray(self._arr.re.at[self._idx].multiply(val),
                      self._arr.im.at[self._idx].multiply(val))


class _At:
    def __init__(self, arr: "CArray"):
        self._arr = arr

    def __getitem__(self, idx):
        return _AtSetter(self._arr, idx)


class CArray(NamedTuple):
    """A complex array as two real arrays (a JAX pytree)."""

    re: jnp.ndarray
    im: jnp.ndarray

    # --- array-protocol conveniences ---
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def rdtype(self):
        return self.re.dtype

    @property
    def dtype(self):
        # the part dtype; used by generic code for precision decisions
        return self.re.dtype

    @property
    def at(self):
        return _At(self)

    def __getitem__(self, idx):
        return CArray(self.re[idx], self.im[idx])

    def reshape(self, *shape):
        return CArray(self.re.reshape(*shape), self.im.reshape(*shape))

    def transpose(self, *axes):
        return CArray(self.re.transpose(*axes), self.im.transpose(*axes))

    def ravel(self):
        return CArray(self.re.ravel(), self.im.ravel())

    def astype_real(self, rdtype):
        return CArray(self.re.astype(rdtype), self.im.astype(rdtype))

    def astype(self, dtype):
        """Accepts complex or real dtypes; parts get the real counterpart."""
        rdtype = np.zeros((), np.dtype(dtype)).real.dtype
        return CArray(self.re.astype(rdtype), self.im.astype(rdtype))

    # --- arithmetic ---
    def __add__(self, o):
        o = as_carray(o)
        return CArray(self.re + o.re, self.im + o.im)

    def __sub__(self, o):
        o = as_carray(o)
        return CArray(self.re - o.re, self.im - o.im)

    def __neg__(self):
        return CArray(-self.re, -self.im)

    def __mul__(self, o):
        if isinstance(o, CArray):
            return cmul(self, o)
        o = np.asarray(o) if np.isscalar(o) else o
        if np.iscomplexobj(o):
            return cmul(self, as_carray(o))
        return CArray(self.re * o, self.im * o)

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, CArray):
            d = o.re * o.re + o.im * o.im
            return CArray((self.re * o.re + self.im * o.im) / d,
                          (self.im * o.re - self.re * o.im) / d)
        if np.iscomplexobj(np.asarray(o) if np.isscalar(o) else o):
            return self.__truediv__(as_carray(o))
        return CArray(self.re / o, self.im / o)


def as_carray(x) -> CArray:
    """Convert numpy/jnp complex (or real) arrays / scalars to CArray."""
    if isinstance(x, CArray):
        return x
    if isinstance(x, (int, float)) or (np.isscalar(x) and not np.iscomplexobj(x)):
        return CArray(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    if np.isscalar(x) and np.iscomplexobj(x):
        return CArray(jnp.asarray(np.real(x)), jnp.asarray(np.imag(x)))
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        return CArray(jnp.asarray(np.ascontiguousarray(x.real)),
                      jnp.asarray(np.ascontiguousarray(x.imag)))
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x):
        return CArray(jnp.real(x), jnp.imag(x))
    # real array: zero imaginary part
    xa = jnp.asarray(x)
    return CArray(xa, jnp.zeros_like(xa))


def is_split(x) -> bool:
    return isinstance(x, CArray)


def to_numpy(x) -> np.ndarray:
    if isinstance(x, CArray):
        return np.asarray(x.re).astype(np.complex128) + 1j * np.asarray(x.im)
    return np.asarray(x)


# ---------------------------------------------------------------------------
# dispatching ops: work on CArray OR plain jnp complex arrays
# ---------------------------------------------------------------------------

def conj(a):
    if isinstance(a, CArray):
        return CArray(a.re, -a.im)
    return jnp.conj(a)


def cmul(a: CArray, b: CArray) -> CArray:
    return CArray(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)


def einsum(spec: str, a, b, karatsuba: bool = True, precision=None):
    """Complex einsum.  For CArray operands: 3 real einsums (Karatsuba).

    precision is forwarded to jnp.einsum.  On TPU the DEFAULT f32
    contraction runs ONE bf16 pass through the MXU (~2e-3 relative
    rounding per product) -- fine for preconditioner-internal math, but
    a Krylov recurrence built on such contractions floors the true
    residual reduction of an f32 sweep near 1e-3 (measured on the rough
    16^4 headline problem; the reference's plain-C f32 kernels have no
    such floor).  Solve-critical call sites pass precision="highest"
    (6-pass true-f32 MXU) and karatsuba=False (the Karatsuba imag part
    m3-m1-m2 adds cancellation on top of the MXU rounding); those
    matvecs are skinny and HBM-bound, so the extra passes are free."""
    if not (isinstance(a, CArray) or isinstance(b, CArray)):
        return jnp.einsum(spec, a, b, precision=precision)
    a, b = as_carray(a), as_carray(b)
    if karatsuba:
        m1 = jnp.einsum(spec, a.re, b.re, precision=precision)
        m2 = jnp.einsum(spec, a.im, b.im, precision=precision)
        m3 = jnp.einsum(spec, a.re + a.im, b.re + b.im, precision=precision)
        return CArray(m1 - m2, m3 - m1 - m2)
    return CArray(jnp.einsum(spec, a.re, b.re, precision=precision)
                  - jnp.einsum(spec, a.im, b.im, precision=precision),
                  jnp.einsum(spec, a.re, b.im, precision=precision)
                  + jnp.einsum(spec, a.im, b.re, precision=precision))


def roll(a, shift, axis):
    if isinstance(a, CArray):
        return CArray(jnp.roll(a.re, shift, axis), jnp.roll(a.im, shift, axis))
    return jnp.roll(a, shift, axis)


def zeros_like(a):
    if isinstance(a, CArray):
        return CArray(jnp.zeros_like(a.re), jnp.zeros_like(a.im))
    return jnp.zeros_like(a)


def zeros(shape, like):
    """Zeros with the representation/precision of `like`."""
    if isinstance(like, CArray):
        return CArray(jnp.zeros(shape, like.re.dtype), jnp.zeros(shape, like.re.dtype))
    return jnp.zeros(shape, like.dtype)


def stack(xs, axis=0):
    if isinstance(xs[0], CArray):
        return CArray(jnp.stack([x.re for x in xs], axis),
                      jnp.stack([x.im for x in xs], axis))
    return jnp.stack(xs, axis)


def concatenate(xs, axis=0):
    if isinstance(xs[0], CArray):
        return CArray(jnp.concatenate([x.re for x in xs], axis),
                      jnp.concatenate([x.im for x in xs], axis))
    return jnp.concatenate(xs, axis)


def moveaxis(a, src, dst):
    if isinstance(a, CArray):
        return CArray(jnp.moveaxis(a.re, src, dst), jnp.moveaxis(a.im, src, dst))
    return jnp.moveaxis(a, src, dst)


def phase_mul(val: complex, a, out_sign: float = 1.0):
    """(out_sign * val) * a for a compile-time complex scalar val.
    Zero components are dropped at trace time (val in {+-1, +-i} stays 1 op)."""
    vr, vi = float(np.real(val)) * out_sign, float(np.imag(val)) * out_sign
    if isinstance(a, CArray):
        if vi == 0.0:
            return CArray(vr * a.re, vr * a.im)
        if vr == 0.0:
            return CArray(-vi * a.im, vi * a.re)
        return CArray(vr * a.re - vi * a.im, vr * a.im + vi * a.re)
    return complex(vr, vi) * a


def norm2(a):
    """sum |a|^2 as a real scalar (device array)."""
    if isinstance(a, CArray):
        return jnp.sum(a.re * a.re) + jnp.sum(a.im * a.im)
    return jnp.sum(jnp.abs(a) ** 2).real


def vdot(a, b):
    """<a, b> = sum conj(a) b; returns (re, im) real pair for CArray, or a
    complex scalar for jnp arrays."""
    if isinstance(a, CArray):
        re = jnp.sum(a.re * b.re) + jnp.sum(a.im * b.im)
        im = jnp.sum(a.re * b.im) - jnp.sum(a.im * b.re)
        return CArray(re, im)
    return jnp.vdot(a, b)


def sum_dof(a, axes):
    """Sum over trailing dof axes; returns CArray/complex field."""
    if isinstance(a, CArray):
        return CArray(a.re.sum(axis=axes), a.im.sum(axis=axes))
    return a.sum(axis=axes)


def real(a):
    return a.re if isinstance(a, CArray) else a.real


def imag(a):
    return a.im if isinstance(a, CArray) else a.imag


def abs2(a):
    if isinstance(a, CArray):
        return a.re * a.re + a.im * a.im
    return jnp.abs(a) ** 2


# ---------------------------------------------------------------------------
# small-matrix linear algebra via the real embedding
# ---------------------------------------------------------------------------

def inv(a):
    """Batched inverse of complex [..., d, d] blocks.

    CArray path: embed M = R + iI as [[R, -I], [I, R]] (a ring isomorphism),
    invert the real 2d x 2d blocks, extract the (re, im) of the inverse.
    """
    if not isinstance(a, CArray):
        return jnp.linalg.inv(a)
    d = a.shape[-1]
    top = jnp.concatenate([a.re, -a.im], axis=-1)
    bot = jnp.concatenate([a.im, a.re], axis=-1)
    emb = jnp.concatenate([top, bot], axis=-2)
    embi = jnp.linalg.inv(emb)
    # embedding of M^{-1} is [[R', -I'], [I', R']]
    return CArray(embi[..., :d, :d], embi[..., d:, :d])


def matmul(a, b):
    """2-D complex matrix product for (possibly split) matrices."""
    if not isinstance(a, CArray):
        return a @ b
    return CArray(a.re @ b.re - a.im @ b.im, a.re @ b.im + a.im @ b.re)


def inv_blocked(M: "CArray", max_real_lu: int = 8192, newton: int = 1):
    """Inverse of a LARGE split-complex [n, n] matrix via 2x2 block
    Schur-complement recursion.

    Why: XLA:TPU's LU factorization streams [n, 128] panels through scoped
    VMEM; at n_real = 14336 (the 28-test-vector coarsest Schur complement's
    real embedding) the panel workspace is 21 MB > the 16 MB limit and the
    compile fails outright.  Halving recursively keeps every LU's embedding
    within `max_real_lu` while the glue -- Schur complement and assembly --
    is plain MXU matmuls:

        inv [[A,B],[C,D]] = [[Ai + AiB Si CAi, -AiB Si],
                             [-Si CAi,          Si     ]],
        S = D - C Ai B,  Ai = inv(A),  Si = inv(S).

    This is block-LU without inter-block pivoting (XLA pivots within the
    leaf LUs), so `newton` Newton refinement steps X <- X + X(I - M X) at
    the top square the f32 residual -- ample for the coarsest-level direct
    solve, whose GCR alternative is only asked for 5e-2.
    """
    n = M.re.shape[0]
    if 2 * n <= max_real_lu:
        return inv(M)

    def blk(r0, r1, c0, c1):
        return CArray(M.re[r0:r1, c0:c1], M.im[r0:r1, c0:c1])

    h = n // 2
    A, B = blk(0, h, 0, h), blk(0, h, h, n)
    C, D = blk(h, n, 0, h), blk(h, n, h, n)
    # refine at EVERY level: with newton only at the top, leaf errors
    # compound multiplicatively through the Schur glue (measured 0.021
    # per-column residual at 3 recursion levels vs 1.2e-4 with per-level
    # refinement; matmul cost is negligible next to the leaf LUs)
    Ai = inv_blocked(A, max_real_lu, newton=max(newton, 1))
    AiB = matmul(Ai, B)
    CAi = matmul(C, Ai)
    S = D - matmul(C, AiB)
    Si = inv_blocked(S, max_real_lu, newton=max(newton, 1))
    X12 = -matmul(AiB, Si)
    X11 = Ai - matmul(X12, CAi)
    X21 = -matmul(Si, CAi)
    X = CArray(jnp.block([[X11.re, X12.re], [X21.re, Si.re]]),
               jnp.block([[X11.im, X12.im], [X21.im, Si.im]]))
    for _ in range(newton):
        R = matmul(M, X)
        R = CArray((jnp.eye(n, dtype=R.re.dtype) - R.re), -R.im)
        X = X + matmul(X, R)
    return X


def herm_inv(a):
    """Batched inverse of HERMITIAN [..., d, d] blocks via Cholesky
    factorization (reference selfcoupling_cholesky_decomposition_PRECISION,
    src/oddeven_generic.c:24-117: the clover self-coupling is LL^H-factored
    per site).  Numerically stronger than a general LU inverse for the
    Hermitian (positive-definite in the physical mass range) clover blocks;
    the explicit inverse is still formed so applications remain one batched
    matmul (MXU-friendly) instead of sequential triangular solves.

    The input is re-Hermitized first so construction rounding cannot break
    the factorization.
    """
    from jax.scipy.linalg import solve_triangular
    if not isinstance(a, CArray):
        ah = 0.5 * (a + jnp.conj(jnp.swapaxes(a, -1, -2)))
        d = a.shape[-1]
        L = jnp.linalg.cholesky(ah)
        eye = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype), a.shape)
        l_inv = solve_triangular(L, eye, lower=True)
        return jnp.conj(jnp.swapaxes(l_inv, -1, -2)) @ l_inv
    # CArray: the real embedding [[R,-I],[I,R]] of a Hermitian M is
    # symmetric, and positive definite iff M is -- Cholesky applies directly
    d = a.shape[-1]
    re = 0.5 * (a.re + jnp.swapaxes(a.re, -1, -2))
    im = 0.5 * (a.im - jnp.swapaxes(a.im, -1, -2))
    top = jnp.concatenate([re, -im], axis=-1)
    bot = jnp.concatenate([im, re], axis=-1)
    emb = jnp.concatenate([top, bot], axis=-2)
    from jax.scipy.linalg import solve_triangular as _st
    L = jnp.linalg.cholesky(emb)
    eye = jnp.broadcast_to(jnp.eye(2 * d, dtype=emb.dtype), emb.shape)
    l_inv = _st(L, eye, lower=True)
    embi = jnp.swapaxes(l_inv, -1, -2) @ l_inv
    return CArray(embi[..., :d, :d], embi[..., d:, :d])


def block_qr(a, passes: int = 2):
    """Thin QR with orthonormal columns for batched [..., m, n] blocks.

    jnp path: jnp.linalg.qr with column-phase fixing.
    CArray path: column-wise classical Gram-Schmidt with double
    projection (CGS-2 -- at least the orthogonality of the reference's
    double-orthogonalization MGS, src/setup_generic.c:291-296) under a
    fori_loop; `passes` is accepted for API compatibility (CGS-2 already
    subsumes the passes=2 reorthogonalization).  Returns Q only.
    """
    if not isinstance(a, CArray):
        q, r = jnp.linalg.qr(a)
        d = jnp.diagonal(r, axis1=-2, axis2=-1)
        absd = jnp.where(jnp.abs(d) == 0, 1.0, jnp.abs(d))
        phase = jnp.where(jnp.abs(d) > 0, d / absd, 1.0)
        return q * jnp.conj(phase)[..., None, :]
    # Column-by-column classical Gram-Schmidt with double projection
    # (CGS-2, numerically equivalent to modified GS with reorthogonali-
    # zation) as a fori_loop whose body is ONE batched einsum pair
    # against the zero-padded already-built basis: zero columns of Q
    # contribute zero coefficients, so no masking is needed (the
    # solvers/fgmres._orthogonalize trick).  The previous per-(k,j)-pair
    # unrolled MGS emitted O(n^2) whole-field reduction steps -- 378 at
    # n=28 test vectors -- and the resulting XLA program sat in backend
    # compile for >30 minutes at 16^4 (the r5 cold-cache killer).
    # Projections run at true-f32 MXU precision: basis orthonormality is
    # setup QUALITY (P^H P = I), not preconditioner-internal arithmetic.
    n = a.shape[-1]
    q0 = CArray(jnp.zeros_like(a.re), jnp.zeros_like(a.im))

    def _col(mat, k):
        return CArray(jax.lax.dynamic_slice_in_dim(mat.re, k, 1, axis=-1),
                      jax.lax.dynamic_slice_in_dim(mat.im, k, 1, axis=-1))

    def body(k, Q):
        v = _col(a, k)                               # [..., m, 1]
        for _ in range(2):
            h = einsum("...mn,...mk->...nk", conj(Q), v,
                       karatsuba=False, precision="highest")
            v = v - einsum("...mn,...nk->...mk", Q, h,
                           karatsuba=False, precision="highest")
        nrm = jnp.sqrt(jnp.sum(v.re * v.re + v.im * v.im,
                               axis=-2, keepdims=True))
        inv = 1.0 / jnp.where(nrm == 0, 1.0, nrm)
        v = CArray(v.re * inv, v.im * inv)
        return CArray(
            jax.lax.dynamic_update_slice_in_dim(Q.re, v.re, k, axis=-1),
            jax.lax.dynamic_update_slice_in_dim(Q.im, v.im, k, axis=-1))

    return jax.lax.fori_loop(0, n, body, q0)
