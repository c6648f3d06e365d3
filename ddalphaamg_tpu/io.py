"""Gauge-configuration and vector IO.

Reads/writes the DDalphaAMG binary gauge format (reference: src/io.c:459-560,
layout documented in doc/user_doc.tex:112-146):

    int32[4]   global lattice extents (T, Z, Y, X)
    float64    average plaquette of the configuration (normalized to [0, 3])
    float64[...]  for each site in lexicographic (T slowest ... X fastest)
                  order: 4 directions (T, Z, Y, X) x 3 x 3 row-major complex
                  SU(3) matrices as interleaved (re, im) doubles

Byte order is little-endian (the reference's BIG_ENDIAN_CNFG build flag
byte-swaps; we auto-detect via a sanity check on the extents).

Anti-periodic boundary conditions in time are applied here by negating the
T-direction links on the last global T-slice (reference: src/io.c:538-544),
so every downstream stencil is purely periodic.
"""

from __future__ import annotations

import numpy as np

T, Z, Y, X = 0, 1, 2, 3


def read_gauge_field(path: str, anti_periodic: bool = True):
    """Read a DDalphaAMG binary config.

    Returns:
      U: complex128 [4, T, Z, Y, X, 3, 3] gauge links, U[mu, t,z,y,x] = U_mu(x),
         with the anti-periodic sign already applied if requested.
      header_plaquette: float, the average plaquette stored in the file
         header (normalized to [0, 3] as in the reference).
    """
    with open(path, "rb") as f:
        raw = f.read()
    dims = np.frombuffer(raw, dtype="<i4", count=4)
    if not all(0 < d <= 4096 for d in dims):
        dims = np.frombuffer(raw, dtype=">i4", count=4)
        if not all(0 < d <= 4096 for d in dims):
            raise ValueError(f"{path}: cannot parse lattice extents")
        endian = ">"
    else:
        endian = "<"
    lt, lz, ly, lx = (int(d) for d in dims)
    plaq = float(np.frombuffer(raw, dtype=f"{endian}f8", count=1, offset=16)[0])
    nsite = lt * lz * ly * lx
    expected = nsite * 4 * 18
    data = np.frombuffer(raw, dtype=f"{endian}f8", count=expected, offset=24)
    if data.size != expected:
        raise ValueError(f"{path}: truncated gauge field")
    links = data.reshape(lt, lz, ly, lx, 4, 3, 3, 2)
    U = (links[..., 0] + 1j * links[..., 1]).astype(np.complex128)
    U = np.ascontiguousarray(np.moveaxis(U, 4, 0))  # [4, T, Z, Y, X, 3, 3]
    if anti_periodic:
        U = U.copy()
        U[T, -1] = -U[T, -1]
    return U, plaq


def write_gauge_field(path: str, U: np.ndarray, plaquette: float,
                      anti_periodic: bool = True) -> None:
    """Write a gauge field in DDalphaAMG binary format (inverse of read)."""
    U = np.asarray(U)
    if anti_periodic:
        U = U.copy()
        U[T, -1] = -U[T, -1]  # undo the baked-in sign before writing
    _, lt, lz, ly, lx, _, _ = U.shape
    site_major = np.moveaxis(U, 0, 4)  # [T,Z,Y,X,4,3,3]
    flat = np.empty((lt, lz, ly, lx, 4, 3, 3, 2), dtype="<f8")
    flat[..., 0] = site_major.real
    flat[..., 1] = site_major.imag
    with open(path, "wb") as f:
        f.write(np.array([lt, lz, ly, lx], dtype="<i4").tobytes())
        f.write(np.array([plaquette], dtype="<f8").tobytes())
        f.write(flat.tobytes())


def read_vector(path: str, lattice, dof: int = 12) -> np.ndarray:
    """Read a spinor/test-vector file (reference: src/io.c:704-951 layout:
    lexicographic TZYX site order, dof complex128 per site)."""
    lt, lz, ly, lx = lattice
    n = lt * lz * ly * lx * dof
    data = np.fromfile(path, dtype="<f8", count=2 * n)
    v = data[0::2] + 1j * data[1::2]
    return v.reshape(lt, lz, ly, lx, dof)


def write_vector(path: str, v: np.ndarray) -> None:
    v = np.asarray(v)
    flat = np.empty(v.size * 2, dtype="<f8")
    flat[0::2] = v.real.ravel()
    flat[1::2] = v.imag.ravel()
    flat.tofile(path)
