// Flat C ABI — drop-in equivalent of the reference's SPERR_C_API
// (include/SPERR_C_API.h:53-156): sperr_comp_2d/3d, sperr_decomp_2d/3d,
// sperr_parse_header, sperr_trunc_3d.  Built on this framework's native
// per-chunk pipeline (flt.cpp) with a std::thread pool over chunks (the
// reference's OpenMP loop, SPERR3D_OMP_C.cpp:94).  Output buffers are
// malloc'd; callers free() them.
//
// Container format (normative, SPERR3D_OMP_C.cpp:163-234):
//   {version u8, flags u8(portion,is3D,isFloat,multichunk @ bits 7..4),
//    vol dims 3xu32, [chunk dims 3xu16 if multichunk], per-chunk len u32 x n}
//   ‖ chunk streams.   2D header = 10 bytes {version, flags, dims 2xu32}.

#include "flt.cpp"

#include <atomic>
#include <thread>

namespace {

constexpr uint8_t kVersionMajor = 0;
constexpr size_t kMagicN = 20, kMagic1 = 14, kMinChunkBytes = 64;

struct Chunk {
  size_t x0, lx, y0, ly, z0, lz;
};

// Domain decomposition (sperr_helper.cpp:542-592): a trailing remainder
// longer than half a chunk becomes its own segment, else it merges.
std::vector<Chunk> chunk_volume(const size_t v[3], const size_t c[3]) {
  size_t nseg[3];
  for (int i = 0; i < 3; i++) {
    nseg[i] = v[i] / c[i];
    if (v[i] % c[i] > c[i] / 2) nseg[i]++;
    if (nseg[i] == 0) nseg[i] = 1;
  }
  std::vector<std::vector<size_t>> tics(3);
  for (int i = 0; i < 3; i++) {
    for (size_t k = 0; k < nseg[i]; k++) tics[i].push_back(k * c[i]);
    tics[i].push_back(v[i]);
  }
  std::vector<Chunk> out;
  out.reserve(nseg[0] * nseg[1] * nseg[2]);
  for (size_t z = 0; z < nseg[2]; z++)
    for (size_t y = 0; y < nseg[1]; y++)
      for (size_t x = 0; x < nseg[0]; x++)
        out.push_back({tics[0][x], tics[0][x + 1] - tics[0][x],
                       tics[1][y], tics[1][y + 1] - tics[1][y],
                       tics[2][z], tics[2][z + 1] - tics[2][z]});
  return out;
}

void put_u32(std::vector<uint8_t>& v, uint32_t x) {
  v.insert(v.end(), {uint8_t(x), uint8_t(x >> 8), uint8_t(x >> 16), uint8_t(x >> 24)});
}
void put_u16(std::vector<uint8_t>& v, uint16_t x) {
  v.insert(v.end(), {uint8_t(x), uint8_t(x >> 8)});
}
uint32_t get_u32(const uint8_t* p) {
  return uint32_t(p[0]) | uint32_t(p[1]) << 8 | uint32_t(p[2]) << 16 |
         uint32_t(p[3]) << 24;
}
uint16_t get_u16(const uint8_t* p) { return uint16_t(p[0]) | uint16_t(p[1]) << 8; }

// flags byte: b[0] -> bit 7 (portion, is3D, isFloat, multichunk)
uint8_t make_flags(bool portion, bool is3d, bool isfloat, bool multi) {
  return uint8_t(portion) << 7 | uint8_t(is3d) << 6 | uint8_t(isfloat) << 5 |
         uint8_t(multi) << 4;
}

// Run fn(i) for i in [0, n) on up to `nthreads` workers (0 = hardware).
template <typename Fn>
void parallel_for(size_t n, size_t nthreads, Fn&& fn) {
  if (nthreads == 0) nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0) nthreads = 1;
  nthreads = std::min(nthreads, n);
  if (nthreads <= 1) {
    for (size_t i = 0; i < n; i++) fn(i);
    return;
  }
  std::vector<std::thread> ts;
  std::atomic<size_t> next{0};
  for (size_t t = 0; t < nthreads; t++)
    ts.emplace_back([&] {
      for (size_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  for (auto& t : ts) t.join();
}

int64_t header_len_from_magic(const uint8_t* p, size_t avail) {
  if (avail < kMagic1 + 4) return -1;
  bool multi = (p[1] >> 4) & 1;
  size_t v[3] = {get_u32(p + 2), get_u32(p + 6), get_u32(p + 10)};
  if (!v[0] || !v[1] || !v[2]) return -1;
  size_t c[3] = {v[0], v[1], v[2]};
  size_t base = kMagic1;
  if (multi) {
    if (avail < kMagicN) return -1;
    c[0] = get_u16(p + 14);
    c[1] = get_u16(p + 16);
    c[2] = get_u16(p + 18);
    base = kMagicN;
  }
  if (!c[0] || !c[1] || !c[2]) return -1;
  return int64_t(base + 4 * chunk_volume(v, c).size());
}

uint8_t* alloc_copy(const std::vector<uint8_t>& v) {
  uint8_t* p = static_cast<uint8_t*>(std::malloc(v.size()));
  if (p) std::memcpy(p, v.data(), v.size());
  return p;
}

}  // namespace

extern "C" {

int sperr_comp_2d(const void* src, int is_float, size_t dimx, size_t dimy,
                  int mode, double quality, int out_inc_header, void** dst,
                  size_t* dst_len) {
  if (*dst != nullptr) return 1;
  if (mode < 1 || mode > 3 || quality <= 0.0 || !dimx || !dimy) return 2;
  size_t n = dimx * dimy;
  rvec<double> vals(n);
  if (is_float) {
    const float* p = static_cast<const float*>(src);
    for (size_t i = 0; i < n; i++) vals[i] = p[i];
  } else {
    std::memcpy(vals.data(), src, n * sizeof(double));
  }
  auto body = compress_chunk<double>(2, vals, dimx, dimy, 1, mode, quality);
  std::vector<uint8_t> out;
  if (out_inc_header) {
    out.push_back(kVersionMajor);
    out.push_back(make_flags(false, false, is_float != 0, false));
    put_u32(out, uint32_t(dimx));
    put_u32(out, uint32_t(dimy));
  }
  out.insert(out.end(), body.begin(), body.end());
  *dst = alloc_copy(out);
  if (!*dst) return -1;
  *dst_len = out.size();
  return 0;
}

int sperr_decomp_2d(const void* src, size_t src_len, int output_float,
                    size_t dimx, size_t dimy, void** dst) {
  if (*dst != nullptr) return 1;
  size_t n = dimx * dimy;
  rvec<double> out(n);
  int rtn = decompress_chunk<double>(2, static_cast<const uint8_t*>(src),
                                     src_len, dimx, dimy, 1, out.data());
  if (rtn < 0) return -1;
  if (output_float) {
    float* p = static_cast<float*>(std::malloc(n * sizeof(float)));
    if (!p) return -1;
    for (size_t i = 0; i < n; i++) p[i] = float(out[i]);
    *dst = p;
  } else {
    double* p = static_cast<double*>(std::malloc(n * sizeof(double)));
    if (!p) return -1;
    std::memcpy(p, out.data(), n * sizeof(double));
    *dst = p;
  }
  return 0;
}

void sperr_parse_header(const void* src, size_t* dimx, size_t* dimy,
                        size_t* dimz, int* is_float) {
  const uint8_t* p = static_cast<const uint8_t*>(src);
  bool is3d = (p[1] >> 6) & 1;
  *is_float = (p[1] >> 5) & 1;
  *dimx = get_u32(p + 2);
  *dimy = get_u32(p + 6);
  *dimz = is3d ? get_u32(p + 10) : 1;
}

int sperr_comp_3d(const void* src, int is_float, size_t dimx, size_t dimy,
                  size_t dimz, size_t chunk_x, size_t chunk_y, size_t chunk_z,
                  int mode, double quality, size_t nthreads, void** dst,
                  size_t* dst_len) {
  if (*dst != nullptr) return 1;
  if (mode < 1 || mode > 3 || quality <= 0.0 || !dimx || !dimy || !dimz)
    return 2;
  size_t v[3] = {dimx, dimy, dimz};
  size_t c[3] = {std::min(chunk_x, dimx), std::min(chunk_y, dimy),
                 std::min(chunk_z, dimz)};
  if (!c[0] || !c[1] || !c[2]) return 2;
  auto chunks = chunk_volume(v, c);
  // multi-chunk headers store chunk dims as u16 (format-normative)
  if (chunks.size() > 1 && (c[0] > 0xFFFF || c[1] > 0xFFFF || c[2] > 0xFFFF))
    return 2;
  size_t nch = chunks.size();
  std::vector<std::vector<uint8_t>> streams(nch);
  std::atomic<int> err{0};

  parallel_for(nch, nthreads, [&](size_t i) {
    const Chunk& ck = chunks[i];
    size_t n = ck.lx * ck.ly * ck.lz;
    rvec<double> vals(n);
    // strided gather, f32 widened to f64 (SPERR3D_OMP_C.cpp:236-261)
    size_t idx = 0;
    for (size_t z = ck.z0; z < ck.z0 + ck.lz; z++)
      for (size_t y = ck.y0; y < ck.y0 + ck.ly; y++) {
        size_t base = (z * dimy + y) * dimx + ck.x0;
        if (is_float) {
          const float* p = static_cast<const float*>(src) + base;
          for (size_t x = 0; x < ck.lx; x++) vals[idx++] = p[x];
        } else {
          const double* p = static_cast<const double*>(src) + base;
          for (size_t x = 0; x < ck.lx; x++) vals[idx++] = p[x];
        }
      }
    streams[i] = compress_chunk<double>(3, vals, ck.lx, ck.ly, ck.lz, mode,
                                        quality);
    if (streams[i].empty()) err.store(-1);
  });
  if (err.load() != 0) return -1;

  bool multi = nch > 1;
  std::vector<uint8_t> out;
  out.push_back(kVersionMajor);
  out.push_back(make_flags(false, true, is_float != 0, multi));
  put_u32(out, uint32_t(dimx));
  put_u32(out, uint32_t(dimy));
  put_u32(out, uint32_t(dimz));
  if (multi) {
    put_u16(out, uint16_t(c[0]));
    put_u16(out, uint16_t(c[1]));
    put_u16(out, uint16_t(c[2]));
  }
  for (auto& s : streams) put_u32(out, uint32_t(s.size()));
  for (auto& s : streams) out.insert(out.end(), s.begin(), s.end());
  *dst = alloc_copy(out);
  if (!*dst) return -1;
  *dst_len = out.size();
  return 0;
}

int sperr_decomp_3d(const void* src, size_t src_len, int output_float,
                    size_t nthreads, size_t* dimx, size_t* dimy, size_t* dimz,
                    void** dst) {
  if (*dst != nullptr) return 1;
  const uint8_t* p = static_cast<const uint8_t*>(src);
  if (src_len < kMagic1 + 4 || p[0] != kVersionMajor) return -1;
  bool is3d = (p[1] >> 6) & 1;
  bool multi = (p[1] >> 4) & 1;
  if (!is3d) return -1;
  size_t v[3] = {get_u32(p + 2), get_u32(p + 6), get_u32(p + 10)};
  if (!v[0] || !v[1] || !v[2]) return -1;
  // hostile headers: bound the element-count product (also guards malloc)
  if (v[0] > SIZE_MAX / v[1] / v[2] || v[0] * v[1] * v[2] > (size_t(1) << 40))
    return -1;
  size_t c[3] = {v[0], v[1], v[2]};
  size_t pos = kMagic1;
  if (multi) {
    if (src_len < kMagicN + 4) return -1;
    c[0] = get_u16(p + 14);
    c[1] = get_u16(p + 16);
    c[2] = get_u16(p + 18);
    if (!c[0] || !c[1] || !c[2]) return -1;
    pos = kMagicN;
  }
  auto chunks = chunk_volume(v, c);
  size_t nch = chunks.size();
  if (src_len < pos + 4 * nch) return -1;
  std::vector<size_t> offs(nch), lens(nch);
  size_t off = pos + 4 * nch;
  for (size_t i = 0; i < nch; i++) {
    lens[i] = get_u32(p + pos + 4 * i);
    offs[i] = off;
    off += lens[i];
  }
  if (src_len < off) return -1;

  size_t total = v[0] * v[1] * v[2];
  float* outf = nullptr;
  double* outd = nullptr;
  if (output_float)
    outf = static_cast<float*>(std::malloc(total * sizeof(float)));
  else
    outd = static_cast<double*>(std::malloc(total * sizeof(double)));
  if (!outf && !outd) return -1;

  std::atomic<int> err{0};
  parallel_for(nch, nthreads, [&](size_t i) {
    const Chunk& ck = chunks[i];
    size_t n = ck.lx * ck.ly * ck.lz;
    rvec<double> buf(n);
    int rtn = decompress_chunk<double>(3, p + offs[i], lens[i], ck.lx, ck.ly,
                                       ck.lz, buf.data());
    if (rtn < 0) {
      err.store(-1);
      return;
    }
    size_t idx = 0;  // strided scatter (SPERR3D_OMP_D.cpp:167-184)
    for (size_t z = ck.z0; z < ck.z0 + ck.lz; z++)
      for (size_t y = ck.y0; y < ck.y0 + ck.ly; y++) {
        size_t base = (z * v[1] + y) * v[0] + ck.x0;
        if (outf)
          for (size_t x = 0; x < ck.lx; x++) outf[base + x] = float(buf[idx++]);
        else
          for (size_t x = 0; x < ck.lx; x++) outd[base + x] = buf[idx++];
      }
  });
  if (err.load() != 0) {
    std::free(outf);
    std::free(outd);
    return -1;
  }
  *dimx = v[0];
  *dimy = v[1];
  *dimz = v[2];
  *dst = output_float ? static_cast<void*>(outf) : static_cast<void*>(outd);
  return 0;
}

int sperr_trunc_3d(const void* src, size_t src_len, unsigned pct, void** dst,
                   size_t* dst_len) {
  if (*dst != nullptr) return 1;
  const uint8_t* p = static_cast<const uint8_t*>(src);
  int64_t hlen = header_len_from_magic(p, src_len);
  if (hlen < 0 || src_len < size_t(hlen)) return -1;
  bool multi = (p[1] >> 4) & 1;
  size_t v[3] = {get_u32(p + 2), get_u32(p + 6), get_u32(p + 10)};
  size_t c[3] = {v[0], v[1], v[2]};
  if (multi) {
    c[0] = get_u16(p + 14);
    c[1] = get_u16(p + 16);
    c[2] = get_u16(p + 18);
  }
  size_t nch = chunk_volume(v, c).size();
  size_t lenpos = size_t(hlen) - 4 * nch;
  bool truncating = pct >= 1 && pct < 100;

  std::vector<uint8_t> out(p, p + hlen);
  if (truncating) out[1] |= 0x80;  // portion flag (bit 7)
  std::vector<size_t> offs(nch), newlens(nch);
  size_t off = size_t(hlen);
  for (size_t i = 0; i < nch; i++) {
    size_t orig = get_u32(p + lenpos + 4 * i);
    offs[i] = off;
    off += orig;
    size_t nl = orig;
    if (truncating && orig > kMinChunkBytes)
      nl = std::max(kMinChunkBytes, size_t(pct / 100.0 * orig));
    newlens[i] = nl;
    out[lenpos + 4 * i + 0] = uint8_t(nl);
    out[lenpos + 4 * i + 1] = uint8_t(nl >> 8);
    out[lenpos + 4 * i + 2] = uint8_t(nl >> 16);
    out[lenpos + 4 * i + 3] = uint8_t(nl >> 24);
  }
  for (size_t i = 0; i < nch; i++) {
    if (offs[i] + newlens[i] > src_len) return -1;
    out.insert(out.end(), p + offs[i], p + offs[i] + newlens[i]);
  }
  *dst = alloc_copy(out);
  if (!*dst) return -1;
  *dst_len = out.size();
  return 0;
}

}  // extern "C"
