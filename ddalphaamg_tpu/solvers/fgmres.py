"""Restarted flexible GMRES (FGMRES), right-preconditioned.

Rebuild of the reference fgmres_PRECISION (src/linsolve_generic.c:219-413):
  * classical Gram-Schmidt Arnoldi with a single global reduction per step
    (the reference's process_multi_inner_product + one MPI_Allreduce,
    src/linsolve_generic.c:820-851) -- on TPU this is ONE batched matmul
    V^H w over the stacked basis, an MXU op, with the cross-device psum
    inserted by XLA when the vectors are sharded;
  * Givens-rotation QR update of the Hessenberg matrix
    (qr_update_PRECISION, src/linsolve_generic.c:898-941);
  * convergence on |gamma_{j+1}| / ||r_0|| < tol, divergence guard at 1e5
    (src/linsolve_generic.c:330-335);
  * solution via backward substitution over the preconditioned basis Z
    (compute_solution_PRECISION, src/linsolve_generic.c:943-982).

Structure: the big vector operations (operator apply, preconditioner,
orthogonalization) are jitted device code with static shapes; the tiny
Hessenberg/Givens scalar algebra runs on the host in float64, which both
matches the reference's double-precision small-matrix math and keeps the
device graph free of O(m^2) scalar work.

Representation-generic: vectors may be jnp complex arrays or split-complex
cplx.CArray pairs (the TPU path); only real scalars cross the host boundary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..utils import device_get_complex, device_put_complex, host_float


@dataclass
class FGMRESResult:
    x: object
    iterations: int
    relres: float
    converged: bool
    resvec: list  # approximate relative residual after each iteration
    relres_true: float = -1.0  # exact residual recompute (FGMRES_RESTEST)


@jax.jit
def _orthogonalize(V, w):
    """One classical-Gram-Schmidt step against the (zero-padded) basis V.

    V: [m+1, n] buffer whose rows >= j are zero; w: [n].
    Returns (w_orth, h) with h = V^H w (zero rows give zero coefficients,
    so no masking is needed) and w_orth = w - V^T h.
    """
    h = cplx.einsum("in,n->i", cplx.conj(V), w,
                    karatsuba=False, precision="highest")
    w = w - cplx.einsum("i,in->n", h, V,
                        karatsuba=False, precision="highest")
    return w, h


@jax.jit
def _orthogonalize_fused(V, w):
    """Single-reduction Arnoldi step (reference SINGLE_ALLREDUCE_ARNOLDI,
    src/linsolve_generic.c:668-738): compute h = V^H w and ||w||^2 in the
    SAME fused program -- one device dispatch / one sharded psum instead of
    two -- and let the host derive the post-orthogonalization norm by
    Pythagoras, ||w - V h||^2 = ||w||^2 - sum |h_i|^2 (exact for an
    orthonormal basis).  Returns (w_orth, h, ||w||^2).

    Opt-in (like the reference's compile flag): in f32 working precision
    the derived norm carries ~sqrt(m)*eps_32 relative error, which
    mis-normalizes V[j+1] and compounds classical-Gram-Schmidt
    orthogonality loss -- measured on the 4^4 method-4 solve it stagnates
    the convergence (20 -> 55 iterations).  Use where the basis is f64 or
    tolerances are loose; production TPU solves use the device-restart GCR
    which has no per-step host reduction at all."""
    h = cplx.einsum("in,n->i", cplx.conj(V), w,
                    karatsuba=False, precision="highest")
    n2 = cplx.norm2(w)
    w = w - cplx.einsum("i,in->n", h, V,
                        karatsuba=False, precision="highest")
    return w, h, n2


@jax.jit
def _orthogonalize_fused2(V, w):
    """Fused Arnoldi step, TPU-mesh form of the reference's reduction
    batching (SINGLE_ALLREDUCE_ARNOLDI intent, src/linsolve_generic.c:668):
    h = V^H w, the orthogonalized w, AND its exact norm^2 all inside ONE
    device program.  On the TPU the host dispatch (~26 ms on a relay) is
    the latency unit the reference's MPI_Allreduce corresponds to -- this
    variant pays ONE dispatch per Arnoldi step instead of two, while the
    norm stays the exactly-computed one (two chained psums inside the
    program under a mesh), so iteration counts are unchanged BY
    CONSTRUCTION -- no Pythagoras cancellation risk (the measured f32
    failure mode of _orthogonalize_fused)."""
    h = cplx.einsum("in,n->i", cplx.conj(V), w,
                    karatsuba=False, precision="highest")
    w = w - cplx.einsum("i,in->n", h, V,
                        karatsuba=False, precision="highest")
    return w, h, cplx.norm2(w)


@jax.jit
def _norm2(w):
    return cplx.norm2(w)


def _norm(w) -> float:
    return float(np.sqrt(host_float(_norm2(w))))


@jax.jit
def _axpy_basis(x, y, basis):
    """x + sum_i y[i] * basis[i]."""
    return x + cplx.einsum("i,in->n", y, basis,
                           karatsuba=False, precision="highest")


def fgmres(
    apply_op: Callable,
    b,
    x0=None,
    preconditioner: Optional[Callable] = None,
    tol: float = 1e-10,
    restart_length: int = 50,
    max_restarts: int = 20,
    reorthogonalize: bool = False,
    print_residuals: bool = False,
    restest: bool = False,
    single_reduce=False,
) -> FGMRESResult:
    """Solve apply_op(x) = b to relative residual `tol`.

    apply_op / preconditioner map a vector (any array shape) to a vector of
    the same shape; preconditioning is flexible right preconditioning
    (x = x0 + Z y with Z[j] = M(V[j])).

    single_reduce:
      False        -- two dispatches per Arnoldi step (orthogonalize; norm).
      "fused"      -- ONE dispatch per step with the exact norm computed
                      inside the same program (iterations unchanged by
                      construction; the production default under a mesh).
      True / "pythagoras" -- the reference's literal single-REDUCTION
                      variant (norm derived on the host); opt-in only: in
                      f32 the derived norm stagnates CGS (measured 20->55
                      iterations on the 4^4 method-4 solve).
    """
    b = device_put_complex(b)
    shape = b.shape
    split = cplx.is_split(b)
    n = int(np.prod(shape))
    bf = b.ravel()

    def op_flat(v):
        return apply_op(v.reshape(*shape)).ravel()

    prec_flat = None
    if preconditioner is not None:
        def prec_flat(v):
            return preconditioner(v.reshape(*shape)).ravel()

    m = restart_length
    x = cplx.zeros((n,), like=bf) if x0 is None else device_put_complex(x0).ravel()
    have_x0 = x0 is not None

    def put_like(arr_np):
        """host complex -> device vector in b's representation/precision."""
        if split:
            rd = bf.re.dtype
            return cplx.CArray(jnp.asarray(arr_np.real, rd), jnp.asarray(arr_np.imag, rd))
        return device_put_complex(arr_np, dtype=bf.dtype, split=False)

    norm_r0 = None
    resvec: list[float] = []
    total_iters = 0
    converged = False
    diverged = False
    gamma_jp1 = 1.0

    for ol in range(max_restarts):
        if ol == 0 and not have_x0:
            r = bf
        else:
            r = bf - op_flat(x)
        gamma0 = _norm(r)
        if norm_r0 is None:
            norm_r0 = gamma0
            if norm_r0 == 0.0:
                return FGMRESResult(x.reshape(*shape), 0, 0.0, True, [])
        if gamma0 / norm_r0 < tol:
            converged = True
            gamma_jp1 = gamma0
            break

        # Arnoldi buffers: basis V, preconditioned basis Z (device), small
        # Hessenberg/Givens state (host, float64).
        V = cplx.zeros((m + 1, n), like=bf)
        Z = cplx.zeros((m, n), like=bf) if prec_flat is not None else None
        V = V.at[0].set(r * (1.0 / gamma0))
        H = np.zeros((m + 1, m), dtype=np.complex128)
        cs = np.zeros(m, dtype=np.complex128)
        sn = np.zeros(m, dtype=np.complex128)
        gamma = np.zeros(m + 1, dtype=np.complex128)
        gamma[0] = gamma0

        j_used = -1
        for j in range(m):
            total_iters += 1
            vj = V[j]
            if prec_flat is not None:
                # the preconditioner may run in lower precision (reference
                # mixed_precision 1); the Krylov basis stays in b's dtype
                zj = prec_flat(vj)
                if split:
                    zj = zj.astype(bf.re.dtype)
                else:
                    zj = zj.astype(bf.dtype)
                Z = Z.at[j].set(zj)
                w = op_flat(zj)
            else:
                w = op_flat(vj)

            if single_reduce == "fused" and not reorthogonalize:
                # one dispatch: orthogonalization + exact norm in the same
                # device program (two chained psums under a mesh)
                w, h, hn2 = _orthogonalize_fused2(V, w)
                h_host = device_get_complex(h).astype(np.complex128)
                hnorm = float(np.sqrt(max(host_float(hn2), 0.0)))
            elif single_reduce and not reorthogonalize:
                # one device roundtrip: [V^H w, ||w||^2] together, norm of
                # the orthogonalized vector by Pythagoras on the host
                w, h, wn2 = _orthogonalize_fused(V, w)
                h_host = device_get_complex(h).astype(np.complex128)
                wn2_f = float(host_float(wn2))
                hn2 = wn2_f - float(np.sum(np.abs(h_host) ** 2))
                if hn2 > 1e-4 * wn2_f:
                    hnorm = float(np.sqrt(hn2))
                else:
                    # severe cancellation (w nearly in span V): the derived
                    # norm is untrustworthy at working precision --
                    # recompute it exactly (second reduction, rare)
                    hnorm = _norm(w)
            else:
                w, h = _orthogonalize(V, w)
                h_host = device_get_complex(h).astype(np.complex128)
                if reorthogonalize:
                    w, h2 = _orthogonalize(V, w)
                    h_host = h_host + device_get_complex(h2).astype(np.complex128)
                hnorm = _norm(w)
            H[: j + 1, j] = h_host[: j + 1]
            H[j + 1, j] = hnorm
            if hnorm > 1e-15:
                V = V.at[j + 1].set(w * (1.0 / hnorm))
            j_used = j

            if abs(H[j + 1, j]) <= tol / 10:
                # happy breakdown (reference src/linsolve_generic.c:336-341)
                converged = True
                gamma_jp1 = 0.0
                break

            # Givens QR update (host, double)
            for i in range(j):
                beta = -sn[i] * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = np.conj(cs[i]) * H[i, j] + np.conj(sn[i]) * H[i + 1, j]
                H[i + 1, j] = beta
            beta = np.sqrt(abs(H[j, j]) ** 2 + abs(H[j + 1, j]) ** 2)
            sn[j] = H[j + 1, j] / beta
            cs[j] = H[j, j] / beta
            gamma[j + 1] = -sn[j] * gamma[j]
            gamma[j] = np.conj(cs[j]) * gamma[j]
            H[j, j] = beta
            H[j + 1, j] = 0.0

            gamma_jp1 = abs(gamma[j + 1])
            rel = gamma_jp1 / norm_r0
            resvec.append(rel)
            if print_residuals:
                print(f"| approx. rel. res. after {total_iters:6d} iterations: {rel:e} |")
            if rel < tol:
                converged = True
                break
            if rel > 1e5:
                diverged = True
                break

        # compute solution update x += Z y (or V y without preconditioning)
        if j_used >= 0:
            y = np.zeros(m, dtype=np.complex128)
            for i in range(j_used, -1, -1):
                y[i] = gamma[i]
                for k in range(i + 1, j_used + 1):
                    y[i] -= H[i, k] * y[k]
                y[i] /= H[i, i]
            basis = Z if prec_flat is not None else V[:m]
            x = _axpy_basis(x, put_like(y), basis)

        if converged or diverged:
            break

    relres = float(gamma_jp1) / norm_r0 if norm_r0 else 0.0
    relres_true = -1.0
    if restest and norm_r0:
        # exact residual recompute (reference FGMRES_RESTEST,
        # src/linsolve_generic.c:351-356, on by default in Makefile:34)
        relres_true = _norm(bf - op_flat(x)) / norm_r0
    return FGMRESResult(x.reshape(*shape), total_iters, relres,
                        converged and not diverged, resvec,
                        relres_true=relres_true)


def _to_rdtype(v, rdtype):
    """Cast a vector (CArray or complex jnp array) to a real-part dtype."""
    if cplx.is_split(v):
        return v.astype_real(rdtype)
    return v.astype(jnp.complex128 if rdtype == jnp.float64 else jnp.complex64)


def fgmres_mp(
    apply_op,
    b,
    x0=None,
    preconditioner: Optional[Callable] = None,
    tol: float = 1e-10,
    restart_length: int = 10,
    max_restarts: int = 100,
    inner_rdtype=jnp.float32,
    outer_rdtype=jnp.float64,
    print_residuals: bool = False,
    single_reduce=False,
) -> FGMRESResult:
    """Mixed-precision restarted FGMRES (reference fgmres_MP,
    src/linsolve.c:153-314).

    Outer loop in double: the true residual r = b - D x, the solution
    accumulation x += Z y, and the Hessenberg/Givens recurrences (host
    float64, as in fgmres()).  Inner loop in float: the Krylov basis V, the
    preconditioned basis Z, the operator applies inside the Arnoldi step,
    and the preconditioner.  Every restart is a precision refresh — the f32
    Arnoldi stalls near 1e-7, the f64 restart residual re-anchors it (the
    reference's trans_float/trans_back_float boundary, src/linsolve.c:230-246).

    On TPU f64 is software-emulated, so it is touched exactly once per
    restart (one operator apply + one axpy) — the Arnoldi hot loop stays f32.

    apply_op(v) must preserve the precision of v: it is called with f64
    vectors for the restart residual and f32 vectors inside Arnoldi.
    """
    b = device_put_complex(b)
    shape = b.shape
    split = cplx.is_split(b)
    n = int(np.prod(shape))
    bf = _to_rdtype(b.ravel(), outer_rdtype)

    def op_flat(v):
        return apply_op(v.reshape(*shape)).ravel()

    prec_flat = None
    if preconditioner is not None:
        def prec_flat(v):
            return preconditioner(v.reshape(*shape)).ravel()

    m = restart_length
    if x0 is None:
        x = cplx.zeros((n,), like=bf) if split else jnp.zeros(
            (n,), dtype=jnp.complex128 if outer_rdtype == jnp.float64 else jnp.complex64)
        have_x0 = False
    else:
        x = _to_rdtype(device_put_complex(x0).ravel(), outer_rdtype)
        have_x0 = True

    def put_inner(arr_np):
        if split:
            return cplx.CArray(jnp.asarray(arr_np.real, inner_rdtype),
                               jnp.asarray(arr_np.imag, inner_rdtype))
        cd = jnp.complex128 if inner_rdtype == jnp.float64 else jnp.complex64
        return device_put_complex(arr_np, dtype=cd, split=False)

    norm_r0 = None
    resvec: list[float] = []
    total_iters = 0
    converged = False
    diverged = False
    relres = 1.0

    for ol in range(max_restarts):
        # ---- outer (double): true residual, precision refresh ----
        r = bf if (ol == 0 and not have_x0) else bf - op_flat(x)
        gamma0 = _norm(r)
        if norm_r0 is None:
            norm_r0 = gamma0
            if norm_r0 == 0.0:
                return FGMRESResult(x.reshape(*shape), 0, 0.0, True, [])
        relres = gamma0 / norm_r0
        if relres < tol:
            converged = True
            break

        # ---- inner (float): Arnoldi ----
        v0 = _to_rdtype(r * (1.0 / gamma0), inner_rdtype)
        V = cplx.zeros((m + 1, n), like=v0) if split else jnp.zeros(
            (m + 1, n), dtype=v0.dtype)
        V = V.at[0].set(v0)
        Z = cplx.zeros((m, n), like=v0) if (split and prec_flat is not None) \
            else (jnp.zeros((m, n), dtype=v0.dtype) if prec_flat is not None else None)
        H = np.zeros((m + 1, m), dtype=np.complex128)
        cs = np.zeros(m, dtype=np.complex128)
        sn = np.zeros(m, dtype=np.complex128)
        gamma = np.zeros(m + 1, dtype=np.complex128)
        gamma[0] = gamma0

        j_used = -1
        for j in range(m):
            total_iters += 1
            vj = V[j]
            if prec_flat is not None:
                zj = _to_rdtype(prec_flat(vj), inner_rdtype)
                Z = Z.at[j].set(zj)
                w = op_flat(zj)
            else:
                w = op_flat(vj)
            w = _to_rdtype(w, inner_rdtype)

            if single_reduce == "fused":
                # one dispatch per Arnoldi step (see fgmres): exact norm
                w, h, hn2 = _orthogonalize_fused2(V, w)
                h_host = device_get_complex(h).astype(np.complex128)
                hnorm = float(np.sqrt(max(host_float(hn2), 0.0)))
            else:
                w, h = _orthogonalize(V, w)
                h_host = device_get_complex(h).astype(np.complex128)
                hnorm = _norm(w)
            H[: j + 1, j] = h_host[: j + 1]
            H[j + 1, j] = hnorm
            if hnorm > 1e-15:
                V = V.at[j + 1].set(w * (1.0 / hnorm))
            j_used = j

            # happy breakdown: still run the pending Givens rotations below
            # so the back-substitution sees a consistent upper-triangular
            # column j (H[j+1,j]~0 makes the new rotation a near-identity)
            happy = abs(H[j + 1, j]) <= tol / 10

            for i in range(j):
                beta = -sn[i] * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = np.conj(cs[i]) * H[i, j] + np.conj(sn[i]) * H[i + 1, j]
                H[i + 1, j] = beta
            beta = np.sqrt(abs(H[j, j]) ** 2 + abs(H[j + 1, j]) ** 2)
            if beta > 0:
                sn[j] = H[j + 1, j] / beta
                cs[j] = H[j, j] / beta
                gamma[j + 1] = -sn[j] * gamma[j]
                gamma[j] = np.conj(cs[j]) * gamma[j]
                H[j, j] = beta
                H[j + 1, j] = 0.0
            if happy:
                converged = True
                break

            rel = abs(gamma[j + 1]) / norm_r0
            resvec.append(rel)
            if print_residuals:
                print(f"| approx. rel. res. after {total_iters:6d} iterations: {rel:e} |")
            if rel < tol:
                converged = True
                break
            if rel > 1e5:
                diverged = True
                break

        # ---- outer (double): accumulate solution update ----
        if j_used >= 0:
            y = np.zeros(m, dtype=np.complex128)
            for i in range(j_used, -1, -1):
                y[i] = gamma[i]
                for k in range(i + 1, j_used + 1):
                    y[i] -= H[i, k] * y[k]
                y[i] /= H[i, i]
            basis = Z if prec_flat is not None else V[:m]
            update = cplx.einsum("i,in->n", put_inner(y), basis,
                                 karatsuba=False, precision="highest")
            x = x + _to_rdtype(update, outer_rdtype)
        if diverged:
            break
        # converged from the inner estimate still gets one more outer
        # residual check at the top of the loop (FGMRES_RESTEST analog)
        if converged:
            converged = False  # re-verify with the true double residual

    if not converged and not diverged and norm_r0:
        relres = _norm(bf - op_flat(x)) / norm_r0
        converged = relres < tol
    return FGMRESResult(x.reshape(*shape), total_iters, relres,
                        converged and not diverged, resvec)
