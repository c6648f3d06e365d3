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

    .h5/.hdf5 paths dispatch to the HDF5 variant.
    """
    if _is_hdf5_path(path):
        return read_gauge_field_hdf5(path, anti_periodic=anti_periodic)
    try:
        from . import native
        nat = native.read_gauge_field(path, anti_periodic=anti_periodic)
    except Exception:
        nat = None
    if nat is not None:
        re, im, plaq = nat
        return re + 1j * im, plaq

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
    """Write a gauge field in DDalphaAMG binary format (inverse of read).
    .h5/.hdf5 paths dispatch to the HDF5 variant."""
    if _is_hdf5_path(path):
        return write_gauge_field_hdf5(path, U, plaquette,
                                      anti_periodic=anti_periodic)
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


def write_gauge_field_hdf5(path: str, U: np.ndarray, plaquette: float,
                           anti_periodic: bool = True) -> None:
    """HDF5 gauge configuration (reference HAVE_HDF5 gauge io,
    src/io.c:703-...): a 'configuration' dataset in the site-major binary
    layout [T,Z,Y,X,4,3,3,(re,im)] with lattice/plaquette attributes.
    Requires h5py."""
    try:
        import h5py
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("HDF5 gauge IO requires h5py") from e
    U = np.asarray(U)
    if anti_periodic:
        U = U.copy()
        U[T, -1] = -U[T, -1]  # undo the baked-in sign before writing
    _, lt, lz, ly, lx, _, _ = U.shape
    site_major = np.moveaxis(U, 0, 4)
    flat = np.empty((lt, lz, ly, lx, 4, 3, 3, 2), dtype="<f8")
    flat[..., 0] = site_major.real
    flat[..., 1] = site_major.imag
    with h5py.File(path, "w") as f:
        ds = f.create_dataset("configuration", data=flat)
        ds.attrs["lattice"] = np.array([lt, lz, ly, lx], np.int32)
        ds.attrs["plaquette"] = float(plaquette)


def read_gauge_field_hdf5(path: str, anti_periodic: bool = True):
    """Read an HDF5 gauge configuration (inverse of write_gauge_field_hdf5).
    Returns (U [4,T,Z,Y,X,3,3] complex128 with the anti-periodic sign
    applied, header plaquette)."""
    try:
        import h5py
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("HDF5 gauge IO requires h5py") from e
    with h5py.File(path, "r") as f:
        ds = f["configuration"]
        flat = np.asarray(ds)
        plaq = float(ds.attrs.get("plaquette", 0.0))
    U = (flat[..., 0] + 1j * flat[..., 1]).astype(np.complex128)
    U = np.ascontiguousarray(np.moveaxis(U, 4, 0))
    if anti_periodic:
        U = U.copy()
        U[T, -1] = -U[T, -1]
    return U, plaq


def _skip_header(f) -> None:
    """Skip an optional '<header>\\n ... </header>\\n' text preamble
    (reference vector_io, src/io.c:733-745)."""
    first = f.readline()
    if first != b"<header>\n":
        f.seek(0)
        return
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated <header> block")
        if line == b"</header>\n":
            return


def _header_text(fields: dict | None) -> bytes:
    lines = ["<header>"]
    for k, v in (fields or {}).items():
        lines.append(f"\t{k}: {v}")
    lines.append("</header>\n")
    return "\n".join(lines).encode()


def read_vector(path: str, lattice, dof: int = 12) -> np.ndarray:
    """Read a spinor/test-vector file (reference: src/io.c:704-951 layout:
    optional text header, then lexicographic TZYX site order, dof complex128
    per site, native little-endian)."""
    lt, lz, ly, lx = lattice
    n = lt * lz * ly * lx * dof
    with open(path, "rb") as f:
        _skip_header(f)
        data = np.fromfile(f, dtype="<f8", count=2 * n)
    v = data[0::2] + 1j * data[1::2]
    return v.reshape(lt, lz, ly, lx, dof)


def write_vector(path: str, v: np.ndarray, header: dict | None = None) -> None:
    v = np.asarray(v)
    flat = np.empty(v.size * 2, dtype="<f8")
    flat[0::2] = v.real.ravel()
    flat[1::2] = v.imag.ravel()
    with open(path, "wb") as f:
        if header is not None:
            f.write(_header_text(header))
        f.write(flat.tobytes())


def _is_hdf5_path(path: str) -> bool:
    return str(path).endswith((".h5", ".hdf5"))


def write_test_vectors_hdf5(path: str, tvs: np.ndarray,
                            header: dict | None = None) -> None:
    """HDF5 test-vector checkpoint (reference HAVE_HDF5 vector_io,
    src/io.c:32-370: an `eigenmodes` group with one `eigenmode<i>` dataset
    per vector plus scalar attributes).  Requires h5py."""
    try:
        import h5py
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("HDF5 test-vector IO requires h5py") from e
    tvs = np.asarray(tvs, np.complex128)
    with h5py.File(path, "w") as f:
        grp = f.create_group("eigenmodes")
        for k, v in (header or {}).items():
            grp.attrs[k] = v
        grp.attrs["vectors"] = tvs.shape[0]
        for i in range(tvs.shape[0]):
            flat = np.empty((*tvs.shape[1:], 2), dtype="<f8")
            flat[..., 0] = tvs[i].real
            flat[..., 1] = tvs[i].imag
            grp.create_dataset(f"eigenmode{i}", data=flat)


def read_test_vectors_hdf5(path: str, lattice, n: int,
                           dof: int = 12) -> np.ndarray:
    try:
        import h5py
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("HDF5 test-vector IO requires h5py") from e
    lt, lz, ly, lx = lattice
    with h5py.File(path, "r") as f:
        grp = f["eigenmodes"]
        out = []
        for i in range(n):
            d = np.asarray(grp[f"eigenmode{i}"])
            out.append((d[..., 0] + 1j * d[..., 1]).reshape(lt, lz, ly, lx, dof))
    return np.stack(out)


def read_test_vectors(path: str, lattice, n: int, dof: int = 12,
                      single_file: bool = True) -> np.ndarray:
    """Test-vector checkpoint read (reference vector_io_single_file,
    src/io.c:951-1124; per-vector files src/setup_generic.c:131-162;
    `.h5`/`.hdf5` paths use the HDF5 layout, src/io.c HAVE_HDF5).

    single_file: one file with a mandatory header then n vectors
    back-to-back; otherwise per-vector files `path.XX`."""
    if _is_hdf5_path(path):
        return read_test_vectors_hdf5(path, lattice, n, dof)
    lt, lz, ly, lx = lattice
    per = lt * lz * ly * lx * dof
    if single_file:
        with open(path, "rb") as f:
            _skip_header(f)
            data = np.fromfile(f, dtype="<f8", count=2 * per * n)
        if data.size != 2 * per * n:
            raise ValueError(f"{path}: expected {n} vectors")
        v = data[0::2] + 1j * data[1::2]
        return v.reshape(n, lt, lz, ly, lx, dof)
    return np.stack([read_vector(f"{path}.{i:02d}", lattice, dof)
                     for i in range(n)])


def write_test_vectors(path: str, tvs: np.ndarray, single_file: bool = True,
                       header: dict | None = None) -> None:
    """Test-vector checkpoint write (inverse of read_test_vectors)."""
    tvs = np.asarray(tvs)
    if _is_hdf5_path(path):
        write_test_vectors_hdf5(path, tvs, header)
        return
    if single_file:
        flat = np.empty(tvs.size * 2, dtype="<f8")
        flat[0::2] = tvs.real.ravel()
        flat[1::2] = tvs.imag.ravel()
        with open(path, "wb") as f:
            f.write(_header_text({"vectors": tvs.shape[0], **(header or {})}))
            f.write(flat.tobytes())
        return
    for i in range(tvs.shape[0]):
        write_vector(f"{path}.{i:02d}", tvs[i])


def _proc_postfix(coords) -> str:
    """Per-rank filename postfix (reference read_conf_multi, src/io.c:599)."""
    return f".pt{coords[T]}pz{coords[Z]}py{coords[Y]}px{coords[X]}"


def split_gauge_field(path_in: str, path_out: str, proc_grid) -> list[str]:
    """Split a single-file config into per-process files (the reference's
    conf/split/split_conf.c tool).  proc_grid: processes per dimension."""
    U, plaq = read_gauge_field(path_in, anti_periodic=False)
    _, lt, lz, ly, lx = U.shape[:5]
    pt, pz, py, px = proc_grid
    ll = (lt // pt, lz // pz, ly // py, lx // px)
    names = []
    for c in np.ndindex(pt, pz, py, px):
        sl = tuple(slice(c[mu] * ll[mu], (c[mu] + 1) * ll[mu]) for mu in range(4))
        name = path_out + _proc_postfix(c)
        _write_gauge_block(name, (lt, lz, ly, lx), U[(slice(None),) + sl], plaq)
        names.append(name)
    return names


def _write_gauge_block(path, global_lattice, Ublock, plaquette):
    site_major = np.moveaxis(np.asarray(Ublock), 0, 4)
    flat = np.empty((*site_major.shape, 2), dtype="<f8")
    flat[..., 0] = site_major.real
    flat[..., 1] = site_major.imag
    with open(path, "wb") as f:
        f.write(np.array(global_lattice, dtype="<i4").tobytes())
        f.write(np.array([plaquette], dtype="<f8").tobytes())
        f.write(flat.tobytes())


def read_gauge_field_multi(path: str, proc_grid, anti_periodic: bool = True):
    """Read a multi-file config `path.pt%dpz%dpy%dpx%d` (reference
    read_conf_multi, src/io.c:566-700)."""
    pt, pz, py, px = proc_grid
    U = None
    plaq = None
    for c in np.ndindex(pt, pz, py, px):
        with open(path + _proc_postfix(c), "rb") as f:
            raw = f.read()
        dims = np.frombuffer(raw, dtype="<i4", count=4)
        lt, lz, ly, lx = (int(d) for d in dims)
        plaq = float(np.frombuffer(raw, dtype="<f8", count=1, offset=16)[0])
        ll = (lt // pt, lz // pz, ly // py, lx // px)
        n = int(np.prod(ll)) * 4 * 18
        data = np.frombuffer(raw, dtype="<f8", count=n, offset=24)
        blk = data.reshape(*ll, 4, 3, 3, 2)
        blk = np.moveaxis(blk[..., 0] + 1j * blk[..., 1], 4, 0)
        if U is None:
            U = np.zeros((4, lt, lz, ly, lx, 3, 3), dtype=np.complex128)
        sl = tuple(slice(c[mu] * ll[mu], (c[mu] + 1) * ll[mu]) for mu in range(4))
        U[(slice(None),) + sl] = blk
    if anti_periodic:
        U[T, -1] = -U[T, -1]
    return U, plaq


def read_gauge_field_ddhmc(path: str, anti_periodic: bool = True):
    """Read a DDHMC-layout gauge configuration (reference converter
    conf/convert/DDHMC2DDalphaAMG.c:34-95).

    DDHMC stores, after the same [4 x int32, float64 plaquette] header,
    8 row-major complex SU(3) matrices per ODD site (t+z+y+x odd) in
    lexicographic site order, direction order +T,-T,+Z,-Z,+Y,-Y,+X,-X.
    The -mu matrix is the +mu link of the site's -mu (even) neighbor, so
    odd sites' records cover every link exactly once.

    Returns (U [4,T,Z,Y,X,3,3] complex128, header plaquette), same
    conventions as read_gauge_field.
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
    lat = tuple(int(d) for d in dims)
    plaq = float(np.frombuffer(raw, dtype=f"{endian}f8", count=1, offset=16)[0])
    nsite = int(np.prod(lat))
    assert nsite % 2 == 0, "DDHMC layout requires an even site count"
    expected = (nsite // 2) * 8 * 18
    data = np.frombuffer(raw, dtype=f"{endian}f8", count=expected, offset=24)
    if data.size != expected:
        raise ValueError(f"{path}: truncated DDHMC gauge field")
    rec = data.reshape(nsite // 2, 8, 3, 3, 2)
    rec = rec[..., 0] + 1j * rec[..., 1]          # [n_odd, 8, 3, 3]

    coords = np.indices(lat).reshape(4, -1)        # lexicographic TZYX
    odd = coords.sum(axis=0) % 2 == 1
    oc = coords[:, odd]                            # [4, n_odd]
    U = np.empty((4, *lat, 3, 3), dtype=np.complex128)
    for mu in range(4):
        U[(mu, *oc)] = rec[:, 2 * mu]
        nc = oc.copy()
        nc[mu] = (nc[mu] - 1) % lat[mu]            # -mu neighbor (even site)
        U[(mu, *nc)] = rec[:, 2 * mu + 1]
    if anti_periodic:
        U[T, -1] = -U[T, -1]
    return U, plaq


def write_gauge_field_ddhmc(path: str, U: np.ndarray, plaquette: float,
                            anti_periodic: bool = True) -> None:
    """Write a gauge field in the DDHMC layout (inverse of
    read_gauge_field_ddhmc; used for converter round-trip tests)."""
    U = np.asarray(U)
    if anti_periodic:
        U = U.copy()
        U[T, -1] = -U[T, -1]
    lat = U.shape[1:5]
    nsite = int(np.prod(lat))
    coords = np.indices(lat).reshape(4, -1)
    odd = coords.sum(axis=0) % 2 == 1
    oc = coords[:, odd]
    rec = np.empty((nsite // 2, 8, 3, 3), dtype=np.complex128)
    for mu in range(4):
        rec[:, 2 * mu] = U[(mu, *oc)]
        nc = oc.copy()
        nc[mu] = (nc[mu] - 1) % lat[mu]
        rec[:, 2 * mu + 1] = U[(mu, *nc)]
    flat = np.empty((*rec.shape, 2), dtype="<f8")
    flat[..., 0] = rec.real
    flat[..., 1] = rec.imag
    with open(path, "wb") as f:
        f.write(np.array(lat, dtype="<i4").tobytes())
        f.write(np.array([plaquette], dtype="<f8").tobytes())
        f.write(flat.tobytes())
