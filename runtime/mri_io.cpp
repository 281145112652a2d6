// libmri_io — native IO runtime for mri_raytracer_tpu.
//
// The reference's host runtime is Python (SlangPy apps + nibabel loaders);
// its data-loading hot path (NIfTI decode + normalization over hundreds of
// cases, SURVEY §3.1 "disk->RAM; I/O hot") is reimplemented here as a small
// C++ library driven from Python via ctypes:
//
//   * gzip inflate (zlib)
//   * NIfTI-1 parse (LE, common dtypes) -> float32 volume
//   * z-score-over-nonzero normalization (the training-path contract)
//   * BC4 block decode
//   * a pthread pool that loads whole cases (4 modalities + seg) in
//     parallel, feeding the device-pool refresh without the GIL.
//
// Build: see runtime/Makefile (g++ -O3 -shared -fPIC, links zlib).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <thread>
#include <atomic>
#include <zlib.h>

extern "C" {

// ------------------------------------------------------------------ gzip
// Inflate a gzip/zlib stream. Returns bytes written, or -1 on failure.
long long mri_gunzip(const uint8_t* src, long long src_len,
                     uint8_t* dst, long long dst_cap) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return -1;  // auto gzip/zlib
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dst_cap);
  int rc = inflate(&zs, Z_FINISH);
  long long out = static_cast<long long>(zs.total_out);
  inflateEnd(&zs);
  if (rc != Z_STREAM_END) return -1;
  return out;
}

// ----------------------------------------------------------------- NIfTI
// Parse a little-endian NIfTI-1 byte buffer (already inflated) into a
// float32 volume in x-fastest (Fortran) order, applying scl_slope/inter.
// dims_out receives up to 3 dims. Returns voxel count, or -1.
long long mri_nifti_to_f32(const uint8_t* buf, long long len,
                           float* out, long long out_cap,
                           int32_t* dims_out) {
  if (len < 352) return -1;
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, buf, 4);
  if (sizeof_hdr != 348) return -1;  // big-endian unsupported in fast path
  int16_t dim[8];
  std::memcpy(dim, buf + 40, 16);
  int ndim = dim[0];
  if (ndim < 1 || ndim > 7) return -1;
  long long count = 1;
  for (int i = 0; i < 3; ++i) {
    int32_t d = (i < ndim) ? dim[1 + i] : 1;
    dims_out[i] = d;
    count *= d;
  }
  for (int i = 3; i < ndim; ++i) count *= dim[1 + i];
  if (count > out_cap) return -1;

  int16_t datatype;
  std::memcpy(&datatype, buf + 70, 2);
  float vox_offset, scl_slope, scl_inter;
  std::memcpy(&vox_offset, buf + 108, 4);
  std::memcpy(&scl_slope, buf + 112, 4);
  std::memcpy(&scl_inter, buf + 116, 4);
  long long off = vox_offset >= 348.f ? (long long)vox_offset : 352;
  const uint8_t* data = buf + off;
  float slope = (scl_slope == 0.f) ? 1.f : scl_slope;

  auto convert = [&](auto typed) -> bool {
    using T = decltype(typed);
    if (off + count * (long long)sizeof(T) > len) return false;
    const T* p = reinterpret_cast<const T*>(data);
    for (long long i = 0; i < count; ++i)
      out[i] = static_cast<float>(p[i]) * slope + scl_inter;
    return true;
  };
  bool ok = false;
  switch (datatype) {
    case 2: ok = convert(uint8_t{}); break;
    case 4: ok = convert(int16_t{}); break;
    case 8: ok = convert(int32_t{}); break;
    case 16: ok = convert(float{}); break;
    case 64: ok = convert(double{}); break;
    case 256: ok = convert(int8_t{}); break;
    case 512: ok = convert(uint16_t{}); break;
    case 768: ok = convert(uint32_t{}); break;
    default: return -1;
  }
  return ok ? count : -1;
}

// ------------------------------------------------------- normalization
// In-place z-score over the nonzero mask (training contract,
// reference inr/inr/dataloader.py:30-35).
void mri_zscore_nonzero(float* data, long long n) {
  double sum = 0.0, sum2 = 0.0;
  long long cnt = 0;
  for (long long i = 0; i < n; ++i) {
    if (data[i] != 0.f) {
      sum += data[i];
      sum2 += (double)data[i] * data[i];
      ++cnt;
    }
  }
  if (cnt == 0) return;
  double mu = sum / cnt;
  double var = sum2 / cnt - mu * mu;
  float sigma = (float)std::sqrt(var > 0 ? var : 0) + 1e-6f;
  float fmu = (float)mu;
  for (long long i = 0; i < n; ++i) data[i] = (data[i] - fmu) / sigma;
}

// -------------------------------------------------------------- BC4
// Unsigned BC4 decode: blocks of 8 bytes -> 4x4 texels, width/height in
// texels per slice, depth slices. Output row-major (depth, height, width).
int mri_bc4_decode(const uint8_t* src, long long src_len,
                   uint8_t* dst, int width, int height, int depth) {
  int bw = (width + 3) / 4, bh = (height + 3) / 4;
  long long n_blocks = (long long)bw * bh * depth;
  if (src_len < n_blocks * 8) return -1;
  for (long long b = 0; b < n_blocks; ++b) {
    const uint8_t* blk = src + b * 8;
    float r0 = blk[0], r1 = blk[1];
    float pal[8];
    pal[0] = r0;
    pal[1] = r1;
    if (r0 > r1)
      for (int k = 1; k < 7; ++k) pal[1 + k] = ((7 - k) * r0 + k * r1) / 7.f;
    else {
      for (int k = 1; k < 5; ++k) pal[1 + k] = ((5 - k) * r0 + k * r1) / 5.f;
      pal[6] = 0.f;
      pal[7] = 255.f;
    }
    uint64_t bits = 0;
    for (int i = 0; i < 6; ++i) bits |= (uint64_t)blk[2 + i] << (8 * i);
    int z = (int)(b / (bw * bh));
    int bidx = (int)(b % (bw * bh));
    int by = bidx / bw, bx = bidx % bw;
    for (int t = 0; t < 16; ++t) {
      int code = (bits >> (3 * t)) & 7;
      int ty = by * 4 + t / 4, tx = bx * 4 + t % 4;
      if (ty < height && tx < width) {
        float v = pal[code];
        v = v < 0 ? 0 : (v > 255 ? 255 : v);
        dst[((long long)z * height + ty) * width + tx] =
            (uint8_t)(v + 0.5f);
      }
    }
  }
  return 0;
}

// ------------------------------------------------------ threaded loader
// Load a batch of gzip'd NIfTI files in parallel: for each file, inflate,
// parse to f32, optionally z-score. Buffers and capacities supplied by the
// caller (numpy arrays). Returns number of successful loads.
struct LoadJob {
  const uint8_t* src;
  long long src_len;
  float* out;
  long long out_cap;
  int32_t* dims;
  int do_zscore;
  int status;  // 0 ok, 1 fail
};

int mri_load_batch(LoadJob* jobs, int n_jobs, int n_threads,
                   uint8_t* scratch, long long scratch_per_job) {
  std::atomic<int> next{0};
  std::atomic<int> ok{0};
  auto worker = [&](int tid) {
    for (;;) {
      int j = next.fetch_add(1);
      if (j >= n_jobs) break;
      LoadJob& job = jobs[j];
      uint8_t* buf = scratch + (long long)tid * scratch_per_job;
      long long len = mri_gunzip(job.src, job.src_len, buf, scratch_per_job);
      if (len < 0) {  // maybe not compressed
        if (job.src_len <= scratch_per_job) {
          std::memcpy(buf, job.src, job.src_len);
          len = job.src_len;
        } else {
          job.status = 1;
          continue;
        }
      }
      long long cnt = mri_nifti_to_f32(buf, len, job.out, job.out_cap,
                                       job.dims);
      if (cnt < 0) {
        job.status = 1;
        continue;
      }
      if (job.do_zscore) mri_zscore_nonzero(job.out, cnt);
      job.status = 0;
      ok.fetch_add(1);
    }
  };
  int nt = n_threads > 0 ? n_threads : 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
