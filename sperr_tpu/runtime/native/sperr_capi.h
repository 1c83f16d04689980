/*
 * sperr_tpu flat C ABI — drop-in equivalent of the reference SPERR C API.
 * Link against libsperr_capi.so (built by sperr_tpu.runtime.native, or
 * directly: g++ -O3 -std=c++17 -ffp-contract=off -fno-math-errno -pthread
 *               -shared -fPIC capi.cpp -o libsperr_capi.so).
 *
 * Conventions (matching the reference include/SPERR_C_API.h):
 *  - output buffers are malloc'd by these functions; callers free() them;
 *  - `dst` must point at a NULL pointer on entry (returns 1 otherwise);
 *  - mode: 1 = fixed bit-per-pixel (quality = bpp),
 *          2 = fixed PSNR            (quality = dB),
 *          3 = fixed point-wise error (quality = tolerance);
 *  - return 0 on success, 1 bad dst, 2 bad parameters, -1 other error.
 */
#ifndef SPERR_TPU_CAPI_H
#define SPERR_TPU_CAPI_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Compress a 2D slice (dimx fastest-varying).  is_float: 1 = f32, 0 = f64.
 * out_inc_header: prepend the 10-byte {version, flags, dimx u32, dimy u32}
 * header. */
int sperr_comp_2d(const void* src, int is_float, size_t dimx, size_t dimy,
                  int mode, double quality, int out_inc_header, void** dst,
                  size_t* dst_len);

/* Decompress a HEADERLESS 2D stream (strip the 10-byte header first if it
 * was included).  output_float: 1 = f32 output, 0 = f64. */
int sperr_decomp_2d(const void* src, size_t src_len, int output_float,
                    size_t dimx, size_t dimy, void** dst);

/* Parse a 3D container header or a 2D file header. dimz == 1 for 2D. */
void sperr_parse_header(const void* src, size_t* dimx, size_t* dimy,
                        size_t* dimz, int* is_float);

/* Compress a 3D volume, chunked (preferred chunk dims, u16-bounded when
 * multi-chunk), nthreads workers (0 = all hardware threads). */
int sperr_comp_3d(const void* src, int is_float, size_t dimx, size_t dimy,
                  size_t dimz, size_t chunk_x, size_t chunk_y, size_t chunk_z,
                  int mode, double quality, size_t nthreads, void** dst,
                  size_t* dst_len);

/* Decompress a 3D container stream produced by sperr_comp_3d(). */
int sperr_decomp_3d(const void* src, size_t src_len, int output_float,
                    size_t nthreads, size_t* dimx, size_t* dimy, size_t* dimz,
                    void** dst);

/* Truncate a 3D container to ~pct% of each chunk (min 64 bytes per chunk);
 * sets the portion flag.  The result decodes progressively. */
int sperr_trunc_3d(const void* src, size_t src_len, unsigned pct, void** dst,
                   size_t* dst_len);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* SPERR_TPU_CAPI_H */
