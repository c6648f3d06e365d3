"""Configuration tools (reference conf/ directory):
  * unit / random gauge-configuration generators
    (conf/random/unit_conf.c:137, conf/random/random_conf.c:137)
  * config splitter for multi-file IO (conf/split/split_conf.c:256)
  * format converters binary <-> LIME/ILDG (lime_io.c analog)
  * DDHMC -> DDalphaAMG converter (conf/convert/DDHMC2DDalphaAMG.c:34)

CLI:  python -m ddalphaamg_tpu.tools <unit|random|split|tolime|tobin|fromddhmc> ...
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import io as dio
from . import lime as dlime


def random_su3(rng, shape) -> np.ndarray:
    """Haar-ish random SU(3): QR of a complex Ginibre matrix, phase-fixed
    to det = 1."""
    a = rng.normal(size=(*shape, 3, 3)) + 1j * rng.normal(size=(*shape, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.diagonal(r, axis1=-2, axis2=-1)
    q = q * (d / np.abs(d))[..., None, :]       # Haar measure on U(3)
    det = np.linalg.det(q)                       # a phase
    return q / (det ** (1.0 / 3))[..., None, None]   # project to SU(3)


def _plaquette(U: np.ndarray) -> float:
    """Average plaquette normalized to [0,3] (reference calc_plaq,
    src/dirac.c:568).  Pure numpy: the tools run host-only (the TPU relay
    cannot transfer complex arrays)."""
    total = 0.0
    count = 0
    for mu in range(4):
        for nu in range(mu + 1, 4):
            p = np.einsum("...ab,...bc,...dc,...ed->...ae",
                          U[mu], np.roll(U[nu], -1, axis=mu),
                          np.conj(np.roll(U[mu], -1, axis=nu)),
                          np.conj(U[nu]), optimize=True)
            total += np.einsum("...aa->...", p).real.sum()
            count += U[mu, ..., 0, 0].size
    return total / count


def make_unit_conf(path: str, lattice) -> float:
    U = np.zeros((4, *lattice, 3, 3), dtype=np.complex128)
    U[..., 0, 0] = U[..., 1, 1] = U[..., 2, 2] = 1.0
    dio.write_gauge_field(path, U, plaquette=3.0, anti_periodic=False)
    return 3.0


def make_random_conf(path: str, lattice, seed: int = 0,
                     epsilon: float = 1.0) -> float:
    """Random config; epsilon < 1 interpolates toward the unit config
    (hot/cold mix as in the reference generator)."""
    rng = np.random.default_rng(seed)
    U = random_su3(rng, (4, *lattice))
    if epsilon < 1.0:
        eye = np.eye(3, dtype=np.complex128)
        A = eye + epsilon * (U - eye)
        q, r = np.linalg.qr(A)
        d = np.diagonal(r, axis1=-2, axis2=-1)
        U = q * (d / np.abs(d))[..., None, :]
    plaq = _plaquette(U)
    dio.write_gauge_field(path, U, plaquette=plaq, anti_periodic=False)
    return plaq


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="ddalphaamg_tpu config tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("unit", help="write a unit gauge configuration")
    p.add_argument("path")
    p.add_argument("lattice", type=int, nargs=4, metavar=("T", "Z", "Y", "X"))

    p = sub.add_parser("random", help="write a random gauge configuration")
    p.add_argument("path")
    p.add_argument("lattice", type=int, nargs=4, metavar=("T", "Z", "Y", "X"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epsilon", type=float, default=1.0)

    p = sub.add_parser("split", help="split a config into per-process files")
    p.add_argument("input")
    p.add_argument("output_prefix")
    p.add_argument("procs", type=int, nargs=4, metavar=("PT", "PZ", "PY", "PX"))

    p = sub.add_parser("tolime", help="convert binary config to LIME/ILDG")
    p.add_argument("input")
    p.add_argument("output")

    p = sub.add_parser("tobin", help="convert LIME/ILDG config to binary")
    p.add_argument("input")
    p.add_argument("output")

    p = sub.add_parser("fromddhmc",
                       help="convert a DDHMC-layout config to DDalphaAMG binary")
    p.add_argument("input")
    p.add_argument("output")

    args = ap.parse_args(argv)
    if args.cmd == "unit":
        plaq = make_unit_conf(args.path, tuple(args.lattice))
        print(f"wrote unit config {args.path}, plaquette {plaq:.13f}")
    elif args.cmd == "random":
        plaq = make_random_conf(args.path, tuple(args.lattice),
                                seed=args.seed, epsilon=args.epsilon)
        print(f"wrote random config {args.path}, plaquette {plaq:.13f}")
    elif args.cmd == "split":
        names = dio.split_gauge_field(args.input, args.output_prefix,
                                      tuple(args.procs))
        print(f"wrote {len(names)} files: {names[0]} ...")
    elif args.cmd == "tolime":
        U, plaq = dio.read_gauge_field(args.input, anti_periodic=False)
        dlime.write_gauge_field(args.output, U, plaq, anti_periodic=False)
        print(f"wrote {args.output} (ILDG), plaquette {plaq:.13f}")
    elif args.cmd == "tobin":
        U, plaq = dlime.read_gauge_field(args.input, anti_periodic=False)
        dio.write_gauge_field(args.output, U, plaq, anti_periodic=False)
        print(f"wrote {args.output} (binary), plaquette {plaq:.13f}")
    elif args.cmd == "fromddhmc":
        U, plaq = dio.read_gauge_field_ddhmc(args.input, anti_periodic=False)
        dio.write_gauge_field(args.output, U, plaq, anti_periodic=False)
        print(f"wrote {args.output} (binary), plaquette {plaq:.13f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
