// Native gauge/vector IO for ddalphaamg_tpu.
//
// Rebuild of the reference's C IO layer (src/io.c:459-560 streaming gauge
// reader, :704-1124 vector IO): buffered streaming reads, endianness
// handling, and layout conversion from the file's site-major
// [T,Z,Y,X][mu][3][3] interleaved-complex order to the framework's
// direction-major split re/im planes [4][T,Z,Y,X][3][3] -- done here in C++
// because the conversion is the hot loop of configuration loading on the
// host (one pass, no temporaries, ~GB/s; the numpy fallback materializes
// intermediate transposed copies).
//
// Exposed as a plain C ABI consumed via ctypes (ddalphaamg_tpu/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

inline void bswap64(double* p, size_t n) {
  auto* u = reinterpret_cast<uint64_t*>(p);
  for (size_t i = 0; i < n; ++i) u[i] = __builtin_bswap64(u[i]);
}

inline void bswap32(int32_t* p, size_t n) {
  auto* u = reinterpret_cast<uint32_t*>(p);
  for (size_t i = 0; i < n; ++i) u[i] = __builtin_bswap32(u[i]);
}

struct FileCloser {
  FILE* f;
  ~FileCloser() { if (f) fclose(f); }
};

}  // namespace

extern "C" {

// Reads the 24-byte header. dims: int32[4] (T,Z,Y,X); plaq: double.
// Returns 0 on success, <0 on error; *big_endian set to 1 when the file
// needs byte-swapping (reference BIG_ENDIAN_CNFG flag, auto-detected here).
int dd_read_gauge_header(const char* path, int32_t* dims, double* plaq,
                         int32_t* big_endian) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  FileCloser fc{f};
  if (fread(dims, sizeof(int32_t), 4, f) != 4) return -2;
  *big_endian = 0;
  for (int i = 0; i < 4; ++i) {
    if (dims[i] <= 0 || dims[i] > 4096) { *big_endian = 1; break; }
  }
  if (*big_endian) {
    bswap32(dims, 4);
    for (int i = 0; i < 4; ++i)
      if (dims[i] <= 0 || dims[i] > 4096) return -3;
  }
  if (fread(plaq, sizeof(double), 1, f) != 1) return -4;
  if (*big_endian) bswap64(plaq, 1);
  return 0;
}

// Streams the gauge field into direction-major split planes.
//   re, im: double[4 * vol * 9]  (mu-major, then site, then row-major 3x3)
//   anti_periodic: negate U_T on the last T slice (src/io.c:538-544)
// Returns 0 on success.
int dd_read_gauge(const char* path, double* re, double* im,
                  int32_t anti_periodic) {
  int32_t dims[4], big;
  double plaq;
  int rc = dd_read_gauge_header(path, dims, &plaq, &big);
  if (rc) return rc;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  FileCloser fc{f};
  if (fseek(f, 24, SEEK_SET)) return -5;

  const int64_t lt = dims[0], lz = dims[1], ly = dims[2], lx = dims[3];
  const int64_t vol = lt * lz * ly * lx;
  const int64_t site_doubles = 4 * 9 * 2;           // 72 per site
  const int64_t bar_sites = lx;                      // one x-line per read
  std::vector<double> buf(bar_sites * site_doubles); // (reference bar_size)

  for (int64_t s0 = 0; s0 < vol; s0 += bar_sites) {
    if (fread(buf.data(), sizeof(double), buf.size(), f) != buf.size())
      return -6;
    if (big) bswap64(buf.data(), buf.size());
    const int64_t t = s0 / (lz * ly * lx);
    const bool flip_t = anti_periodic && (t == lt - 1);
    for (int64_t k = 0; k < bar_sites; ++k) {
      const int64_t site = s0 + k;
      const double* src = buf.data() + k * site_doubles;
      for (int mu = 0; mu < 4; ++mu) {
        const double sign = (flip_t && mu == 0) ? -1.0 : 1.0;
        double* dre = re + (static_cast<int64_t>(mu) * vol + site) * 9;
        double* dim = im + (static_cast<int64_t>(mu) * vol + site) * 9;
        const double* m = src + mu * 18;
        for (int e = 0; e < 9; ++e) {
          dre[e] = sign * m[2 * e];
          dim[e] = sign * m[2 * e + 1];
        }
      }
    }
  }
  return 0;
}

// Writes a gauge field from split planes (inverse of dd_read_gauge);
// little-endian output, header plaquette given by caller.
int dd_write_gauge(const char* path, const double* re, const double* im,
                   const int32_t* dims, double plaq, int32_t anti_periodic) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  FileCloser fc{f};
  if (fwrite(dims, sizeof(int32_t), 4, f) != 4) return -2;
  if (fwrite(&plaq, sizeof(double), 1, f) != 1) return -3;

  const int64_t lt = dims[0], lz = dims[1], ly = dims[2], lx = dims[3];
  const int64_t vol = lt * lz * ly * lx;
  const int64_t site_doubles = 4 * 9 * 2;
  std::vector<double> buf(lx * site_doubles);

  for (int64_t s0 = 0; s0 < vol; s0 += lx) {
    const int64_t t = s0 / (lz * ly * lx);
    const bool flip_t = anti_periodic && (t == lt - 1);
    for (int64_t k = 0; k < lx; ++k) {
      const int64_t site = s0 + k;
      double* dst = buf.data() + k * site_doubles;
      for (int mu = 0; mu < 4; ++mu) {
        const double sign = (flip_t && mu == 0) ? -1.0 : 1.0;
        const double* sre = re + (static_cast<int64_t>(mu) * vol + site) * 9;
        const double* sim = im + (static_cast<int64_t>(mu) * vol + site) * 9;
        double* m = dst + mu * 18;
        for (int e = 0; e < 9; ++e) {
          m[2 * e] = sign * sre[e];
          m[2 * e + 1] = sign * sim[e];
        }
      }
    }
    if (fwrite(buf.data(), sizeof(double), buf.size(), f) != buf.size())
      return -4;
  }
  return 0;
}

// Streams a vector file (optional text header skipped by caller-provided
// offset) into split planes re/im of length n.
int dd_read_vector(const char* path, int64_t offset, double* re, double* im,
                   int64_t n) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  FileCloser fc{f};
  if (fseek(f, static_cast<long>(offset), SEEK_SET)) return -2;
  const int64_t chunk = 1 << 16;
  std::vector<double> buf(2 * chunk);
  int64_t done = 0;
  while (done < n) {
    const int64_t want = (n - done) < chunk ? (n - done) : chunk;
    if (fread(buf.data(), sizeof(double), 2 * want, f) !=
        static_cast<size_t>(2 * want))
      return -3;
    for (int64_t i = 0; i < want; ++i) {
      re[done + i] = buf[2 * i];
      im[done + i] = buf[2 * i + 1];
    }
    done += want;
  }
  return 0;
}

}  // extern "C"
