"""Gauge-field utilities: plaquette, field strength, clover term, SU(3) tools.

TPU-native formulation: every quantity is computed on whole-lattice arrays
with jnp.roll for neighbor access (periodic; anti-periodic time signs are
baked into the links at load time, see io.py), so XLA sees a handful of
large batched 3x3 complex matmuls instead of per-site loops.

Conventions mirror the reference implementation:
  * plaquette Q and Qdiff: reference src/dirac.c:304-371 (Q = sum of the
    four plaquettes in the (mu,nu) plane around x, scaled by 1/16;
    Qdiff_{mu nu} = Q_{mu nu} - Q_{nu mu} = Q - Q^dagger).
  * clover site matrix (reference src/dirac.c:24-58, 374-402):
        C(x) = (4 + m0) I_12  -  csw * sum_{mu<nu} (gamma_mu gamma_nu) (x) Qdiff_{mu nu}(x)
    which is block-diagonal over the two chiralities (spins {0,1} / {2,3});
    we store it dense as [T,Z,Y,X, 2, 6, 6] Hermitian blocks
    (block index = 3*spin_within_block + color).
  * average plaquette normalized to [0, 3] (reference src/dirac.c:568-622).

U layout everywhere: [4, T, Z, Y, X, 3, 3] with direction order (T,Z,Y,X).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import cplx
from .gamma import get_basis

T, Z, Y, X = 0, 1, 2, 3


def _roll(a, shift: int, mu: int):
    """Roll a lattice-indexed array along direction mu (lattice axes lead).

    shift=-1 brings a[x+mu] to site x; shift=+1 brings a[x-mu]."""
    return cplx.roll(a, shift, mu)


def dag(a):
    if cplx.is_split(a):
        return cplx.CArray(jnp.swapaxes(a.re, -1, -2), -jnp.swapaxes(a.im, -1, -2))
    return jnp.conj(jnp.swapaxes(a, -1, -2))


def _mm(*ms):
    # precision="highest": these SU(3) products BUILD the stored clover
    # entries (clover_Q chains three of them per leaf, 24 leaves summed).
    # At the TPU default one-bf16-pass matmul precision the stored f32
    # clover carried ~1e-2 accumulated rounding -- the f32 stencil then
    # disagreed with the exact host-built double-float operator by 1e-2
    # and every df outer sweep's TRUE reduction floored there (measured
    # 1.4e-2/sweep on rough16; docs/iteration_parity.md).  Build cost is
    # one-off per set_conf.
    out = ms[0]
    for m in ms[1:]:
        out = cplx.einsum("...ij,...jk->...ik", out, m,
                          karatsuba=False, precision="highest")
    return out


def plaquette_field(U: jnp.ndarray, mu: int, nu: int) -> jnp.ndarray:
    """P_{mu nu}(x) = U_mu(x) U_nu(x+mu) U_mu(x+nu)^H U_nu(x)^H, [T,Z,Y,X,3,3]."""
    Umu, Unu = U[mu], U[nu]
    return _mm(Umu, _roll(Unu, -1, mu), dag(_roll(Umu, -1, nu)), dag(Unu))


@jax.jit
def average_plaquette(U) -> jnp.ndarray:
    """Average plaquette normalized to [0, 3] (reference convention).

    TPU note: computed in a dof-major relayout [mu, 3, 3, T, Z, Y, X] so
    each 3x3 link product is 27 full-lane VPU multiply-adds over the
    lattice instead of 65k MXU matmuls padded 3 -> 128 (site-major was
    measured at 220 s for one 16^4 evaluation on the chip; dof-major is
    milliseconds)."""
    def tocm(a):        # [..., T,Z,Y,X, 3, 3] -> [..., 3, 3, T,Z,Y,X]
        nd = a.ndim
        return jnp.transpose(a, tuple(range(nd - 6)) + (nd - 2, nd - 1)
                             + tuple(range(nd - 6, nd - 2)))

    Ud = cplx.CArray(tocm(U.re), tocm(U.im)) if cplx.is_split(U) else tocm(U)

    def dagm(a):
        if cplx.is_split(a):
            return cplx.CArray(jnp.swapaxes(a.re, 0, 1),
                               -jnp.swapaxes(a.im, 0, 1))
        return jnp.conj(jnp.swapaxes(a, 0, 1))

    def mm(a, b):
        return cplx.einsum("ij...,jk...->ik...", a, b)

    total = 0.0
    for mu in range(4):
        for nu in range(mu + 1, 4):
            Umu, Unu = Ud[mu], Ud[nu]
            p = mm(mm(Umu, cplx.roll(Unu, -1, 2 + mu)),
                   mm(dagm(cplx.roll(Umu, -1, 2 + nu)), dagm(Unu)))
            total = total + jnp.einsum("ii...->...", cplx.real(p)).sum()
    vol = np.prod(U.shape[1:5])
    return total / (6.0 * vol)


def clover_Q(U: jnp.ndarray, mu: int, nu: int) -> jnp.ndarray:
    """Q_{mu nu}(x) = 1/16 * (sum of the 4 plaquette leaves in the (mu,nu)
    plane attached to x).  Mirrors reference src/dirac.c:304-355."""
    Umu, Unu = U[mu], U[nu]
    Umu_m = _roll(Umu, 1, mu)                  # U_mu(x - mu)
    Unu_m = _roll(Unu, 1, mu)                  # U_nu(x - mu)
    Umu_n = _roll(Umu, 1, nu)                  # U_mu(x - nu)
    Unu_n = _roll(Unu, 1, nu)                  # U_nu(x - nu)
    Umu_mn = _roll(Umu_m, 1, nu)               # U_mu(x - mu - nu)
    Unu_mn = _roll(Unu_m, 1, nu)               # U_nu(x - mu - nu)
    # leaf 1: (mu, nu)
    p1 = _mm(Umu, _roll(Unu, -1, mu), dag(_roll(Umu, -1, nu)), dag(Unu))
    # leaf 2: (nu, -mu)
    p2 = _mm(Unu, dag(_roll(Umu_m, -1, nu)), dag(Unu_m), Umu_m)
    # leaf 3: (-mu, -nu)
    p3 = _mm(dag(Umu_m), dag(Unu_mn), Umu_mn, Unu_n)
    # leaf 4: (-nu, mu)
    p4 = _mm(dag(Unu_n), Umu_n, _roll(_roll(Unu, -1, mu), 1, nu), dag(Umu))
    return (p1 + p2 + p3 + p4) / 16.0


def clover_Qdiff(U: jnp.ndarray, mu: int, nu: int) -> jnp.ndarray:
    """Qdiff_{mu nu} = Q_{mu nu} - Q_{nu mu} = Q - Q^dagger (anti-Hermitian)."""
    q = clover_Q(U, mu, nu)
    return q - dag(q)


def compute_clover(U: jnp.ndarray, m0: float, csw: float,
                   basis_name: str | None = None) -> jnp.ndarray:
    """Build the clover term as two dense Hermitian 6x6 chirality blocks.

    Returns clover[T,Z,Y,X, 2, 6, 6] with
      C = (4 + m0) I_12 - csw * sum_{mu<nu} (gamma_mu gamma_nu) (x) Qdiff_{mu nu}.
    With csw == 0 the result is just the diagonal shift (kept dense so the
    apply path is uniform).  Reference: src/dirac.c:24-58, 374-402.

    Runs as ONE jitted program (m0 is traced, so mass changes reuse the
    compile): the eager form was hundreds of per-primitive dispatches --
    ~560 s of set_conf time at 16^4 on a ~27 ms-dispatch TPU relay.
    """
    rdt = U.re.dtype if cplx.is_split(U) else np.zeros(
        (), np.dtype(U.dtype)).real.dtype
    return _compute_clover_jit(U, jnp.asarray(m0, rdt), float(csw),
                               basis_name)


@partial(jax.jit, static_argnums=(2, 3))
def _compute_clover_jit(U, m0, csw: float, basis_name):
    basis = get_basis(basis_name) if basis_name else get_basis()
    lat = U.shape[1:5]
    split = cplx.is_split(U)
    if split:
        rdtype = U.re.dtype
        base = jnp.broadcast_to((4.0 + m0) * jnp.eye(6, dtype=rdtype),
                                (*lat, 2, 6, 6)).astype(rdtype)
        clover = cplx.CArray(base, jnp.zeros_like(base))
    else:
        cdtype = U.dtype
        eye6 = jnp.eye(6, dtype=cdtype)
        clover = jnp.broadcast_to((4.0 + m0) * eye6, (*lat, 2, 6, 6)).astype(cdtype)
    if csw != 0.0:
        acc = None
        for mu in range(4):
            for nu in range(mu + 1, 4):
                sig = basis.sigma_munu(mu, nu)  # 4x4, chiral-block-diagonal
                qd = clover_Qdiff(U, mu, nu)    # [T,Z,Y,X,3,3]
                # per-chirality 2x2 spin blocks, kron'd with the 3x3 color matrix:
                # out[(s,i),(t,j)] = sig_blk[s,t] * qd[i,j]
                blk = np.stack([sig[0:2, 0:2], sig[2:4, 2:4]])  # [2(chir), 2, 2]
                if split:
                    blk_dev = cplx.CArray(jnp.asarray(blk.real, dtype=U.re.dtype),
                                          jnp.asarray(blk.imag, dtype=U.re.dtype))
                else:
                    blk_dev = jnp.asarray(blk, dtype=U.dtype)
                k = cplx.einsum("cst,...ij->...csitj", blk_dev, qd)
                k = k.reshape(*lat, 2, 6, 6)
                acc = k if acc is None else acc + k
        clover = clover - csw * acc
    return clover


# ---------------------------------------------------------------------------
# host-side (numpy, complex128) mirrors -- used to build the f64-accurate
# operator for the TPU double-float residual (operators/dfloat.py): TPU v5e
# executes no f64 HLOs, so exact operator entries must come from the host.
# Same math as above; kept in lockstep with compute_clover.
# ---------------------------------------------------------------------------

def _roll_np(a, shift, mu):
    return np.roll(a, shift, axis=mu)


def _dag_np(a):
    return np.conj(np.swapaxes(a, -1, -2))


def _mm_np(*ms):
    out = ms[0]
    for m in ms[1:]:
        out = np.einsum("...ij,...jk->...ik", out, m)
    return out


def clover_Q_np(U: np.ndarray, mu: int, nu: int) -> np.ndarray:
    Umu, Unu = U[mu], U[nu]
    Umu_m = _roll_np(Umu, 1, mu)
    Unu_m = _roll_np(Unu, 1, mu)
    Umu_n = _roll_np(Umu, 1, nu)
    Unu_n = _roll_np(Unu, 1, nu)
    Umu_mn = _roll_np(Umu_m, 1, nu)
    Unu_mn = _roll_np(Unu_m, 1, nu)
    p1 = _mm_np(Umu, _roll_np(Unu, -1, mu), _dag_np(_roll_np(Umu, -1, nu)), _dag_np(Unu))
    p2 = _mm_np(Unu, _dag_np(_roll_np(Umu_m, -1, nu)), _dag_np(Unu_m), Umu_m)
    p3 = _mm_np(_dag_np(Umu_m), _dag_np(Unu_mn), Umu_mn, Unu_n)
    p4 = _mm_np(_dag_np(Unu_n), Umu_n, _roll_np(_roll_np(Unu, -1, mu), 1, nu), _dag_np(Umu))
    return (p1 + p2 + p3 + p4) / 16.0


def compute_clover_np(U: np.ndarray, m0: float, csw: float,
                      basis_name: str | None = None) -> np.ndarray:
    """Host complex128 clover [T,Z,Y,X,2,6,6]; same convention as
    compute_clover (reference src/dirac.c:24-58, 374-402)."""
    basis = get_basis(basis_name) if basis_name else get_basis()
    U = np.asarray(U, np.complex128)
    lat = U.shape[1:5]
    clover = np.broadcast_to((4.0 + m0) * np.eye(6, dtype=np.complex128),
                             (*lat, 2, 6, 6)).copy()
    if csw != 0.0:
        acc = np.zeros((*lat, 2, 6, 6), dtype=np.complex128)
        for mu in range(4):
            for nu in range(mu + 1, 4):
                sig = basis.sigma_munu(mu, nu)
                q = clover_Q_np(U, mu, nu)
                qd = q - _dag_np(q)
                blk = np.stack([sig[0:2, 0:2], sig[2:4, 2:4]])
                k = np.einsum("cst,...ij->...csitj", blk, qd)
                acc += k.reshape(*lat, 2, 6, 6)
        clover = clover - csw * acc
    return clover


def unit_gauge(lattice, dtype=jnp.complex128) -> jnp.ndarray:
    """Unit (free-field) configuration (reference analog: conf/random/unit_conf.c)."""
    eye = jnp.eye(3, dtype=dtype)
    return jnp.broadcast_to(eye, (4, *lattice, 3, 3)).astype(dtype)


def random_gauge(lattice, key=None, seed: int = 0, dtype=jnp.complex128) -> jnp.ndarray:
    """Haar-random SU(3) configuration via QR of complex Gaussians
    (reference analog: conf/random/random_conf.c)."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    ka, kb = jax.random.split(key)
    shape = (4, *lattice, 3, 3)
    rdtype = np.zeros((), np.dtype(dtype)).real.dtype  # stay in the target precision
    z = jax.lax.complex(jax.random.normal(ka, shape, dtype=rdtype),
                        jax.random.normal(kb, shape, dtype=rdtype)).astype(dtype)
    q, r = jnp.linalg.qr(z)
    d = jnp.diagonal(r, axis1=-2, axis2=-1)
    q = q * jnp.conj(d / jnp.abs(d))[..., None, :]   # Haar phase fix (U(3))
    det = jnp.linalg.det(q)                          # |det| = 1
    return q * jnp.conj(det ** (1.0 / 3.0))[..., None, None]  # project to SU(3)


def _det3(m: cplx.CArray) -> cplx.CArray:
    """Determinant of split-complex [..., 3, 3] blocks."""
    def mul(a, b):
        return cplx.cmul(a, b)

    def at(i, j):
        return m[..., i, j]

    cof0 = mul(at(1, 1), at(2, 2)) - mul(at(1, 2), at(2, 1))
    cof1 = mul(at(1, 0), at(2, 2)) - mul(at(1, 2), at(2, 0))
    cof2 = mul(at(1, 0), at(2, 1)) - mul(at(1, 1), at(2, 0))
    return mul(at(0, 0), cof0) - mul(at(0, 1), cof1) + mul(at(0, 2), cof2)


def random_gauge_split(lattice, key=None, seed: int = 0,
                       rdtype=jnp.float32) -> cplx.CArray:
    """Haar-random SU(3) configuration in split-complex form (no complex
    HLOs: MGS orthonormalization + explicit determinant phase removal).
    This is the TPU-executable analog of random_gauge."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    ka, kb = jax.random.split(key)
    shape = (4, *lattice, 3, 3)
    z = cplx.CArray(jax.random.normal(ka, shape, dtype=rdtype),
                    jax.random.normal(kb, shape, dtype=rdtype))
    q = cplx.block_qr(z)                 # orthonormal columns (U(3) up to phases)
    det = _det3(q)                       # unit-modulus complex
    theta = jnp.arctan2(det.im, det.re)
    ph = cplx.CArray(jnp.cos(-theta / 3.0)[..., None, None],
                     jnp.sin(-theta / 3.0)[..., None, None])
    return cplx.cmul(q, ph)
