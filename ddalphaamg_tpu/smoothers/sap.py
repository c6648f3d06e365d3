"""Red-black multiplicative Schwarz (SAP) smoother, TPU-native.

Reference: src/schwarz_generic.c (red_black_schwarz_PRECISION, :1260-1430)
with block solvers local_minres_PRECISION (src/linsolve_generic.c:985-1029)
and block_solve_oddeven_PRECISION (src/oddeven_generic.c:1332-1362).

TPU redesign:
  * A Schwarz block's Dirac operator is the global operator with all
    block-crossing links zeroed -- so "solve every same-color block at once"
    is ONE whole-lattice masked stencil apply; blocks never materialize as a
    batch dimension.  This replaces the reference's per-block site loops and
    its 8-class communication schedule (an MPI-overlap artifact): under
    sharding the masked stencil's rolls become the halo exchange.
  * Block-local inner products in the MinRes iteration are per-block
    reductions: reshape to the block grid, sum over block-interior axes,
    broadcast back.
  * The multiplicative residual update (the reference's latest_iter /
    n_boundary_op bookkeeping) is replaced by the mathematically identical
    global update r <- r - D delta with the FULL operator after each color.

Exactness note: for a given residual, the per-block update delta computed
here is identical (up to fp rounding) to the reference's; iteration counts
match the reference's SAP ground truth (tests/ground_truth).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import Geometry
from ..operators.wilson import WilsonOperator, clover_apply, dslash_hopping
from ..operators.oddeven import parity_masks


def intra_block_link_mask(geom: Geometry) -> np.ndarray:
    """[4,T,Z,Y,X,1,1] float mask; 0 where U_mu(x) crosses a block boundary
    (i.e. x is on the block's upper mu face)."""
    masks = []
    for mu in range(4):
        coord = np.arange(geom.lattice[mu])
        keep = (coord % geom.block[mu]) != (geom.block[mu] - 1)
        shape = [1, 1, 1, 1]
        shape[mu] = geom.lattice[mu]
        masks.append(np.broadcast_to(keep.reshape(shape), geom.lattice).astype(np.float64))
    return np.stack(masks)[..., None, None]


def color_masks(geom: Geometry) -> tuple[np.ndarray, np.ndarray]:
    """Site-level (red, black) masks [T,Z,Y,X,1,1] from the block coloring."""
    bp = geom.block_parity  # [Tb,Zb,Yb,Xb]
    site = bp
    for mu in range(4):
        site = np.repeat(site, geom.block[mu], axis=mu)
    site = site[..., None, None].astype(np.float64)
    return 1.0 - site, site  # red = parity 0


def _block_sum(a: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    """Sum a real/complex scalar field [T,Z,Y,X] per Schwarz block -> [Tb,Zb,Yb,Xb]."""
    gt, gz, gy, gx = geom.block_grid
    bt, bz, by, bx = geom.block
    return a.reshape(gt, bt, gz, bz, gy, by, gx, bx).sum(axis=(1, 3, 5, 7))


def _block_broadcast(a: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    """Inverse broadcast of _block_sum: [Tb,Zb,Yb,Xb] -> [T,Z,Y,X,1,1]."""
    for mu in range(4):
        a = jnp.repeat(a, geom.block[mu], axis=mu)
    return a[..., None, None]


class SchwarzPreconditioner:
    """SAP preconditioner/smoother.

    Parameters mirror the reference ini keys: block (block lattice),
    block_iter (MinRes steps per block solve), cycles (preconditioner
    cycles / post-smooth iterations), odd_even (use the block odd-even Schur
    solver, reference `odd even preconditioning`).
    """

    def __init__(self, op: WilsonOperator, geom: Geometry, block_iter: int = 4,
                 cycles: int = 1, odd_even: bool = True, dtype=jnp.complex64):
        self.geom = geom
        self.block_iter = block_iter
        self.cycles = cycles
        self.odd_even = odd_even
        self.dtype = dtype
        rdtype = jnp.zeros((), dtype).real.dtype

        self.op = op.astype(dtype)
        self.links_intra = self.op.links * jnp.asarray(
            intra_block_link_mask(geom), dtype=rdtype)
        red, black = color_masks(geom)
        self.red = jnp.asarray(red, dtype=rdtype)
        self.black = jnp.asarray(black, dtype=rdtype)
        if odd_even:
            even, odd = parity_masks(geom.lattice, dtype=rdtype)
            self.even, self.odd = even, odd
            self.clover_inv = jnp.linalg.inv(self.op.clover)
        self._apply = jax.jit(self._smooth_zero_guess)
        self._apply_res = jax.jit(self._smooth_with_guess)

    # ---- block-local operators (masked whole-lattice stencils) ----

    def _block_op(self, v):
        """Block Dirac operator: clover + intra-block hopping."""
        return clover_apply(self.op.clover, v) + dslash_hopping(self.links_intra, v)

    def _full_op(self, v):
        return clover_apply(self.op.clover, v) + dslash_hopping(self.op.links, v)

    def _diag_inv(self, v, mask):
        lat = v.shape[:4]
        ph = (mask * v).reshape(*lat, 2, 6)
        out = jnp.einsum("...cij,...cj->...ci", self.clover_inv, ph)
        return out.reshape(*lat, 4, 3)

    def _block_schur(self, v):
        """Per-block Schur complement on even sites (block odd-even)."""
        ve = self.even * v
        out = self.even * clover_apply(self.op.clover, ve)
        t = self._diag_inv(dslash_hopping(self.links_intra, ve), self.odd)
        return out - self.even * dslash_hopping(self.links_intra, t)

    # ---- block solvers, batched over all blocks of one color ----

    def _alpha(self, Dr, r):
        """Per-block alpha = <Dr, r> / <Dr, Dr>, broadcast back to sites."""
        num = _block_sum(jnp.sum(jnp.conj(Dr) * r, axis=(-2, -1)), self.geom)
        den = _block_sum(jnp.sum(jnp.abs(Dr) ** 2, axis=(-2, -1)), self.geom)
        alpha = num / jnp.where(den == 0, 1.0, den)
        return _block_broadcast(alpha, self.geom)

    def _minres(self, r, block_op):
        """local_minres on every block at once (zero blocks stay zero)."""
        delta = jnp.zeros_like(r)
        for _ in range(self.block_iter):
            Dr = block_op(r)
            a = self._alpha(Dr, r)
            delta = delta + a * r
            r = r - a * Dr
        return delta

    def _block_solve(self, r):
        """Approximate block solve of blockD delta = r (r masked to one color)."""
        if not self.odd_even:
            return self._minres(r, self._block_op)
        # block odd-even Schur solve (block_solve_oddeven_PRECISION)
        d_o1 = self._diag_inv(r, self.odd)
        r_e = self.even * (r - dslash_hopping(self.links_intra, d_o1))
        d_e = self._minres(r_e, self._block_schur)
        d_o = self._diag_inv(r - dslash_hopping(self.links_intra, self.even * d_e), self.odd)
        return self.even * d_e + d_o

    # ---- SAP sweeps ----

    def _sweep(self, x, r, skip_last_update: bool):
        for k in range(self.cycles):
            for i, mask in enumerate((self.red, self.black)):
                delta = self._block_solve(mask * r)
                x = x + delta
                if skip_last_update and k == self.cycles - 1 and i == 1:
                    break
                r = r - self._full_op(delta)
        return x, r

    def _smooth_zero_guess(self, eta):
        x = jnp.zeros_like(eta)
        x, _ = self._sweep(x, eta, skip_last_update=True)
        return x

    def _smooth_with_guess(self, eta, x):
        r = eta - self._full_op(x)
        x, _ = self._sweep(x, r, skip_last_update=True)
        return x

    # ---- public API ----

    def __call__(self, eta):
        """Preconditioner application M(eta) ~ D^{-1} eta from zero guess."""
        return self._apply(eta.astype(self.dtype))

    def smooth(self, eta, x):
        """Post-smoothing with initial guess x (reference smoother _RES path)."""
        return self._apply_res(eta.astype(self.dtype), x.astype(self.dtype))
