"""Fully device-side flexible GCR (GMRES-equivalent) for coarse-level and
K-cycle solves.

Why GCR and not the host FGMRES here: the reference runs its coarse GMRES
iterations on the CPU where the "host" and the compute are the same device
(src/linsolve_generic.c:219).  On TPU a host-driven Krylov loop pays a
dispatch round-trip per iteration, and the coarsest level runs tens of
iterations per V-cycle -- so coarse solves must be a single compiled
program.  GCR with an orthonormalized W = A·Q basis is mathematically
equivalent to GMRES in exact arithmetic (same minimal-residual iterates),
is naturally flexible (the reference's fgcr_PRECISION,
src/linsolve_generic.c:1032, is the same algorithm), and needs no
Hessenberg/Givens scalar recurrences -- everything is batched vector math
under lax.fori_loop with an early-convergence freeze.

All state is jax arrays; no host synchronization anywhere.  Works on
split-complex CArray and native complex vectors.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .. import cplx


def _creal_dot(a, b):
    """<a, b> as an (re, im) pair of real scalars."""
    v = cplx.vdot(a, b)
    return cplx.real(v), cplx.imag(v)


def _match_repr(v, like):
    """Coerce v to `like`'s complex representation (split CArray vs
    native complex) -- preconditioners are representation-agnostic at
    their boundary (e.g. the non-SoA SAP returns native complex while
    the df-plain outer iterates split f32)."""
    if cplx.is_split(like) and not cplx.is_split(v):
        return cplx.as_carray(v)
    if not cplx.is_split(like) and cplx.is_split(v):
        return jax.lax.complex(v.re, v.im)
    return v


def _cax(alpha_re, alpha_im, v):
    """(alpha_re + i alpha_im) * v for a (possibly split) vector."""
    if cplx.is_split(v):
        return cplx.CArray(alpha_re * v.re - alpha_im * v.im,
                           alpha_re * v.im + alpha_im * v.re)
    return jax.lax.complex(alpha_re, alpha_im) * v


def device_gcr(apply_op: Callable, b, m: int, tol: float,
               n_restarts: int = 1, prec: Optional[Callable] = None,
               x0=None, aux_zero=None):
    """Solve A x = b to ||r|| < tol ||b|| with restarted flexible GCR.

    apply_op(v) -> A v; prec(v) -> (z, aux) or z (flexible right
    preconditioner; aux lets nested cycles report their coarse iteration
    counts up through the loop carry).  aux_zero: the additive identity of
    the preconditioner's aux (default scalar f32 0; pass e.g.
    jnp.zeros(3, f32) when prec reports a counter vector).

    Returns (x, iters, relres2, prec_aux_sum): all device values; iters is
    the number of *active* iterations performed (f32), relres2 the final
    squared relative residual.
    """
    zero = jnp.float32(0.0) if aux_zero is None else aux_zero
    shape = b.shape

    def unflat(v):
        return v.reshape(*shape)

    def p(v):
        if prec is None:
            return v, zero
        out = prec(v)
        # CArray is itself a NamedTuple: only a genuine (z, aux) pair
        # unpacks (a bare split field would wrongly split into (re, im))
        if isinstance(out, tuple) and not isinstance(out, cplx.CArray):
            return out
        return out, zero

    bnorm2 = cplx.norm2(b)
    bnorm2 = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    x = cplx.zeros_like(b) if x0 is None else x0
    tol2 = jnp.asarray(tol, bnorm2.dtype) ** 2

    def basis_zeros():
        flat = b.reshape(-1)
        if cplx.is_split(b):
            return cplx.CArray(jnp.zeros((m, flat.re.shape[0]), flat.re.dtype),
                               jnp.zeros((m, flat.re.shape[0]), flat.re.dtype))
        return jnp.zeros((m, flat.shape[0]), flat.dtype)

    def restart(carry, _):
        x, iters, aux_sum = carry
        r = b - apply_op(x)
        W = basis_zeros()   # orthonormal A*Q directions
        Q = basis_zeros()   # search directions (same scaling as W)

        def body(st):
            j, x, r, W, Q, iters, aux_sum = st
            q, aux = p(r)
            q = _match_repr(q, r)
            w = _match_repr(apply_op(q), r)
            wf, qf = w.reshape(-1), q.reshape(-1)
            rf = r.reshape(-1)
            # orthogonalize w against previous (zero rows contribute zero).
            # precision="highest": these einsums ARE the Krylov recurrence
            # -- at the TPU's default one-pass-bf16 f32 contraction the
            # basis updates inject ~2e-3 relative noise per iteration and
            # the true residual reduction of a whole f32 sweep floors near
            # 1e-3 (measured; see cplx.einsum).  True-f32 passes restore
            # the reference's plain-f32 sweep quality.
            h = cplx.einsum("in,n->i", cplx.conj(W), wf,
                            karatsuba=False, precision="highest")
            wf = wf - cplx.einsum("i,in->n", h, W,
                                  karatsuba=False, precision="highest")
            qf = qf - cplx.einsum("i,in->n", h, Q,
                                  karatsuba=False, precision="highest")
            wn2 = cplx.norm2(wf)
            inv = jax.lax.rsqrt(jnp.where(wn2 == 0, 1.0, wn2))
            wf = wf * inv
            qf = qf * inv
            W = W.at[j].set(wf)
            Q = Q.at[j].set(qf)
            # residual minimization step: alpha = <w, r>
            ar, ai = _creal_dot(wf, rf)
            x = x + unflat(_cax(ar, ai, qf))
            r = r - unflat(_cax(ar, ai, wf))
            return (j + 1, x, r, W, Q, iters + 1.0, aux_sum + aux)

        def cond(st):
            # early exit: a converged solve STOPS (a frozen fori_loop would
            # keep paying full preconditioner+operator cost for the rest of
            # the m iterations -- measured 96% coarse-time fraction at 16^4
            # before this)
            j, x, r, W, Q, iters, aux_sum = st
            return jnp.logical_and(j < m, cplx.norm2(r) >= tol2 * bnorm2)

        j0 = jnp.int32(0)
        j, x, r, W, Q, iters, aux_sum = jax.lax.while_loop(
            cond, body, (j0, x, r, W, Q, iters, aux_sum))
        return (x, iters, aux_sum), cplx.norm2(r)

    carry = (x, jnp.float32(0.0), zero)
    if n_restarts == 1:
        carry, rn2 = restart(carry, None)
    else:
        carry, rn2s = jax.lax.scan(restart, carry, None, length=n_restarts)
        rn2 = rn2s[-1]
    x, iters, aux_sum = carry
    return x, iters, rn2 / bnorm2, aux_sum
