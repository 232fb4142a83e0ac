// Native CT ingest: NIfTI-1 (.nii/.nii.gz) parsing + the u2 preprocessing
// pipeline in C++.
//
// The reference's ingest is Python (nibabel + MONAI on dataloader workers,
// src/utils/u2Transform.py); this library is the framework's native data
// path: zlib inflate, header parse, percentile windowing, foreground crop,
// anti-aliased trilinear resize, pad + chunk — producing the same
// (T, chunk_depth, size, size) float32 tensor as data/transforms.py's
// U2VolumeTransform (validation mode; training augmentations stay in
// Python where the RNG lives).
//
// Exposed C ABI (ctypes):
//   u2_load_nifti(path, out*, dims[8])        -> malloc'd float32 volume
//   u2_preprocess(vol, X, Y, Z, target, chunk_depth, num_chunks, out*)
//   u2_load_and_preprocess(path, ...)         -> fused load+preprocess
//   u2_free(ptr)
//
// Build: native/build.sh (g++ -O3 -shared -fPIC ... -lz)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

struct Volume {
  std::vector<float> data;  // fortran order from file, reindexed as [x + X*(y + Y*z)]
  int64_t X = 0, Y = 0, Z = 0;
};

// ---------------------------------------------------------------------------
// IO
// ---------------------------------------------------------------------------

bool read_file_raw(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(n);
  size_t got = std::fread(out.data(), 1, n, f);
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

bool gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;  // gzip or zlib
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  out.clear();
  out.reserve(in.size() * 4);
  uint8_t buf[1 << 16];
  int ret = Z_OK;
  do {
    zs.next_out = buf;
    zs.avail_out = sizeof(buf);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf, buf + (sizeof(buf) - zs.avail_out));
  } while (ret != Z_STREAM_END);
  inflateEnd(&zs);
  return true;
}

template <typename T>
T read_le(const uint8_t* p) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  return v;
}

template <typename T>
void convert_voxels(const uint8_t* src, int64_t n, bool swap, float slope,
                    float inter, std::vector<float>& dst) {
  dst.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    T v;
    std::memcpy(&v, src + i * sizeof(T), sizeof(T));
    if (swap) {
      uint8_t* b = reinterpret_cast<uint8_t*>(&v);
      std::reverse(b, b + sizeof(T));
    }
    dst[i] = static_cast<float>(v) * slope + inter;
  }
}

bool parse_nifti(const std::vector<uint8_t>& raw, Volume& vol) {
  if (raw.size() < 352) return false;
  const uint8_t* h = raw.data();
  int32_t sizeof_hdr = read_le<int32_t>(h);
  bool swap = false;
  if (sizeof_hdr != 348) {
    uint8_t b[4] = {h[3], h[2], h[1], h[0]};
    if (read_le<int32_t>(b) != 348) return false;  // (NIfTI-2 unsupported here)
    swap = true;
  }
  auto rd16 = [&](int off) {
    int16_t v = read_le<int16_t>(h + off);
    if (swap) {
      uint8_t* p = reinterpret_cast<uint8_t*>(&v);
      std::swap(p[0], p[1]);
    }
    return v;
  };
  auto rd32f = [&](int off) {
    float v = read_le<float>(h + off);
    if (swap) {
      uint8_t* p = reinterpret_cast<uint8_t*>(&v);
      std::reverse(p, p + 4);
    }
    return v;
  };
  int ndim = rd16(40);
  if (ndim < 3) return false;
  vol.X = rd16(42);
  vol.Y = rd16(44);
  vol.Z = rd16(46);
  int16_t datatype = rd16(70);
  float slope = rd32f(112);
  float inter = rd32f(116);
  float vox_offset = rd32f(108);
  if (slope == 0.0f) slope = 1.0f;

  int64_t n = vol.X * vol.Y * vol.Z;
  // higher dims (time/channel) beyond 3 are ignored: first volume only.
  int64_t offset = vox_offset > 0 ? static_cast<int64_t>(vox_offset) : 352;
  const uint8_t* vox = raw.data() + offset;
  int64_t avail = static_cast<int64_t>(raw.size()) - offset;

  switch (datatype) {
    case 2:  // uint8
      if (avail < n) return false;
      convert_voxels<uint8_t>(vox, n, false, slope, inter, vol.data);
      break;
    case 4:  // int16
      if (avail < n * 2) return false;
      convert_voxels<int16_t>(vox, n, swap, slope, inter, vol.data);
      break;
    case 8:  // int32
      if (avail < n * 4) return false;
      convert_voxels<int32_t>(vox, n, swap, slope, inter, vol.data);
      break;
    case 16:  // float32
      if (avail < n * 4) return false;
      convert_voxels<float>(vox, n, swap, slope, inter, vol.data);
      break;
    case 64:  // float64
      if (avail < n * 8) return false;
      convert_voxels<double>(vox, n, swap, slope, inter, vol.data);
      break;
    case 512:  // uint16
      if (avail < n * 2) return false;
      convert_voxels<uint16_t>(vox, n, swap, slope, inter, vol.data);
      break;
    default:
      return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// preprocessing (mirror of data/transforms.py U2VolumeTransform, validation)
// ---------------------------------------------------------------------------

// percentile via nth_element (O(n), numpy 'linear' interpolation semantics)
void percentiles(const std::vector<float>& v, double lo_q, double hi_q,
                 float& lo, float& hi) {
  std::vector<float> s(v);
  auto pick = [&](double q) {
    double idx = q / 100.0 * (s.size() - 1);
    int64_t i0 = static_cast<int64_t>(idx);
    int64_t i1 = std::min<int64_t>(i0 + 1, s.size() - 1);
    double frac = idx - i0;
    std::nth_element(s.begin(), s.begin() + i0, s.end());
    float v0 = s[i0];
    // element i1 is in the partition right of i0 (or equals it)
    float v1 = v0;
    if (i1 != i0) {
      v1 = *std::min_element(s.begin() + i0 + 1, s.end());
    }
    return static_cast<float>(v0 * (1.0 - frac) + v1 * frac);
  };
  lo = pick(lo_q);
  hi = pick(hi_q);
}

struct Box {
  int64_t lo[3], hi[3];
};

// separable gaussian blur along one axis (truncate=4, reflect-free "nearest"
// edge handling to match scipy mode used in transforms.py)
void gaussian_1d(std::vector<float>& data, int64_t n0, int64_t n1, int64_t n2,
                 int axis, double sigma) {
  if (sigma <= 0) return;
  int radius = static_cast<int>(sigma * 4.0 + 0.5);
  if (radius < 1) return;
  std::vector<float> kernel(2 * radius + 1);
  double s2 = sigma * sigma;
  double total = 0;
  for (int i = -radius; i <= radius; ++i) {
    kernel[i + radius] = std::exp(-0.5 * i * i / s2);
    total += kernel[i + radius];
  }
  for (auto& k : kernel) k = static_cast<float>(k / total);

  int64_t dims[3] = {n0, n1, n2};
  int64_t strides[3] = {n1 * n2, n2, 1};
  int64_t len = dims[axis];
  int64_t stride = strides[axis];
  std::vector<float> line(len);

  // iterate over all lines along `axis`
  int a1 = (axis + 1) % 3, a2 = (axis + 2) % 3;
  for (int64_t i = 0; i < dims[a1]; ++i) {
    for (int64_t j = 0; j < dims[a2]; ++j) {
      int64_t base = i * strides[a1] + j * strides[a2];
      for (int64_t t = 0; t < len; ++t) line[t] = data[base + t * stride];
      for (int64_t t = 0; t < len; ++t) {
        double acc = 0;
        for (int kk = -radius; kk <= radius; ++kk) {
          int64_t src = std::clamp<int64_t>(t + kk, 0, len - 1);
          acc += line[src] * kernel[kk + radius];
        }
        data[base + t * stride] = static_cast<float>(acc);
      }
    }
  }
}

inline float sample_at(const std::vector<float>& v, int64_t X, int64_t Y,
                       int64_t Z, int64_t x, int64_t y, int64_t z) {
  return v[x + X * (y + Y * z)];
}

}  // namespace

extern "C" {

void u2_free(float* p) { std::free(p); }

// Load a NIfTI volume. dims_out[0..2] = X, Y, Z. Returns 0 on success.
int u2_load_nifti(const char* path, float** out, int64_t* dims_out) {
  std::vector<uint8_t> raw;
  if (!read_file_raw(path, raw)) return 1;
  size_t n = std::strlen(path);
  if (n > 3 && std::strcmp(path + n - 3, ".gz") == 0) {
    std::vector<uint8_t> inflated;
    if (!gunzip(raw, inflated)) return 2;
    raw.swap(inflated);
  }
  Volume vol;
  if (!parse_nifti(raw, vol)) return 3;
  float* buf = static_cast<float*>(
      std::malloc(vol.data.size() * sizeof(float)));
  if (!buf) return 4;
  std::memcpy(buf, vol.data.data(), vol.data.size() * sizeof(float));
  *out = buf;
  dims_out[0] = vol.X;
  dims_out[1] = vol.Y;
  dims_out[2] = vol.Z;
  return 0;
}

// Full u2 validation preprocessing of an (X, Y, Z) fortran-order volume:
// percentile window -> crop foreground -> aspect-preserving AA trilinear
// resize -> zero pad to (target, target, depth) -> chunk to
// (num_chunks, chunk_depth, target, target). out is malloc'd.
int u2_preprocess(const float* vol_in, int64_t X, int64_t Y, int64_t Z,
                  int64_t target, int64_t chunk_depth, int64_t num_chunks,
                  float** out) {
  const int64_t depth = chunk_depth * num_chunks;
  std::vector<float> v(vol_in, vol_in + X * Y * Z);

  // 1. percentile windowing to [0, 1]
  float lo, hi;
  percentiles(v, 0.5, 99.5, lo, hi);
  float denom = (hi > lo) ? (hi - lo) : 1.0f;
  for (auto& x : v) x = std::clamp((x - lo) / denom, 0.0f, 1.0f);

  // 2. crop foreground (bbox of voxels > 0)
  Box box{{X, Y, Z}, {0, 0, 0}};
  for (int64_t z = 0; z < Z; ++z)
    for (int64_t y = 0; y < Y; ++y)
      for (int64_t x = 0; x < X; ++x)
        if (sample_at(v, X, Y, Z, x, y, z) > 0.0f) {
          box.lo[0] = std::min(box.lo[0], x);
          box.lo[1] = std::min(box.lo[1], y);
          box.lo[2] = std::min(box.lo[2], z);
          box.hi[0] = std::max(box.hi[0], x + 1);
          box.hi[1] = std::max(box.hi[1], y + 1);
          box.hi[2] = std::max(box.hi[2], z + 1);
        }
  if (box.lo[0] >= box.hi[0]) {  // empty: keep everything
    box = Box{{0, 0, 0}, {X, Y, Z}};
  }
  int64_t cx = box.hi[0] - box.lo[0];
  int64_t cy = box.hi[1] - box.lo[1];
  int64_t cz = box.hi[2] - box.lo[2];
  std::vector<float> crop(cx * cy * cz);
  for (int64_t z = 0; z < cz; ++z)
    for (int64_t y = 0; y < cy; ++y)
      for (int64_t x = 0; x < cx; ++x)
        crop[x + cx * (y + cy * z)] = sample_at(
            v, X, Y, Z, x + box.lo[0], y + box.lo[1], z + box.lo[2]);

  // 3. output spatial size: min(X, Y) ratio to target; Z only shrinks
  double ratio = std::min(static_cast<double>(target) / cx,
                          static_cast<double>(target) / cy);
  int64_t sx = static_cast<int64_t>(cx * ratio);
  int64_t sy = static_cast<int64_t>(cy * ratio);
  int64_t sz = (depth >= cz) ? cz : depth;
  sx = std::max<int64_t>(sx, 1);
  sy = std::max<int64_t>(sy, 1);

  // 4. gaussian anti-alias for downscaled axes (sigma = (factor-1)/2)
  double fx = static_cast<double>(cx) / sx;
  double fy = static_cast<double>(cy) / sy;
  double fz = static_cast<double>(cz) / sz;
  // crop is indexed [x + cx*(y + cy*z)] = axis0 stride 1 → reorder to use
  // gaussian_1d's (n0, n1, n2) row-major layout: treat as (z, y, x)
  gaussian_1d(crop, cz, cy, cx, 2, std::max(0.0, (fx - 1.0) / 2.0));  // x axis
  gaussian_1d(crop, cz, cy, cx, 1, std::max(0.0, (fy - 1.0) / 2.0));  // y axis
  gaussian_1d(crop, cz, cy, cx, 0, std::max(0.0, (fz - 1.0) / 2.0));  // z axis

  // 5. align_corners trilinear resample to (sx, sy, sz)
  auto grid = [](int64_t in, int64_t out, int64_t i) {
    if (out == 1) return (in - 1) / 2.0;
    return static_cast<double>(i) * (in - 1) / (out - 1);
  };
  std::vector<float> resized(sx * sy * sz);
  for (int64_t z = 0; z < sz; ++z) {
    double gz = grid(cz, sz, z);
    int64_t z0 = static_cast<int64_t>(gz), z1 = std::min(z0 + 1, cz - 1);
    double tz = gz - z0;
    for (int64_t y = 0; y < sy; ++y) {
      double gy = grid(cy, sy, y);
      int64_t y0 = static_cast<int64_t>(gy), y1 = std::min(y0 + 1, cy - 1);
      double ty = gy - y0;
      for (int64_t x = 0; x < sx; ++x) {
        double gx = grid(cx, sx, x);
        int64_t x0 = static_cast<int64_t>(gx), x1 = std::min(x0 + 1, cx - 1);
        double tx = gx - x0;
        auto at = [&](int64_t xx, int64_t yy, int64_t zz) {
          return static_cast<double>(crop[xx + cx * (yy + cy * zz)]);
        };
        double c00 = at(x0, y0, z0) * (1 - tx) + at(x1, y0, z0) * tx;
        double c01 = at(x0, y0, z1) * (1 - tx) + at(x1, y0, z1) * tx;
        double c10 = at(x0, y1, z0) * (1 - tx) + at(x1, y1, z0) * tx;
        double c11 = at(x0, y1, z1) * (1 - tx) + at(x1, y1, z1) * tx;
        double c0 = c00 * (1 - ty) + c10 * ty;
        double c1 = c01 * (1 - ty) + c11 * ty;
        resized[x + sx * (y + sy * z)] =
            static_cast<float>(c0 * (1 - tz) + c1 * tz);
      }
    }
  }

  // 6. pad into (num_chunks, chunk_depth, target, target): out[c][d][x][y]
  //    with global z = c * chunk_depth + d (transforms.py layout (Z, X, Y)).
  int64_t out_n = num_chunks * chunk_depth * target * target;
  float* buf = static_cast<float*>(std::calloc(out_n, sizeof(float)));
  if (!buf) return 4;
  for (int64_t z = 0; z < sz; ++z)
    for (int64_t x = 0; x < sx; ++x)
      for (int64_t y = 0; y < sy; ++y)
        buf[((z * target) + x) * target + y] =
            resized[x + sx * (y + sy * z)];
  *out = buf;
  return 0;
}

int u2_load_and_preprocess(const char* path, int64_t target,
                           int64_t chunk_depth, int64_t num_chunks,
                           float** out) {
  float* vol = nullptr;
  int64_t dims[8] = {0};
  int rc = u2_load_nifti(path, &vol, dims);
  if (rc != 0) return rc;
  rc = u2_preprocess(vol, dims[0], dims[1], dims[2], target, chunk_depth,
                     num_chunks, out);
  std::free(vol);
  return rc;
}

}  // extern "C"
