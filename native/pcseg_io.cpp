// pcseg_io: native host-side IO + preprocessing for openpcseg_tpu.
//
// Counterpart of the reference's native runtime layer: where the reference
// relies on torch's C++ DataLoader machinery plus numpy hot loops
// (np.vectorize label remap, argsort-based range projection — measured host
// bottlenecks, SURVEY.md §3.6), this library does scan loading, label
// remapping, global augmentation and the spherical range projection in C++.
// Exposed through ctypes (no pybind11 in this environment); the Python side
// falls back to numpy when the shared object is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC pcseg_io.cpp -o libpcseg_io.so
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Load a SemanticKITTI .bin scan (x, y, z, intensity float32 rows).
// Writes at most cap rows into out; returns the number of rows in the file
// (may exceed cap) or -1 on IO error.
int load_kitti_scan(const char* path, float* out, int cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  long n = bytes / (4 * sizeof(float));
  long take = std::min<long>(n, cap);
  size_t got = fread(out, sizeof(float) * 4, take, f);
  fclose(f);
  if ((long)got != take) return -1;
  return (int)n;
}

// Load a .label file, mask to the lower 16 bits and remap through lut
// (reference semantickitti.py:114-115). Returns row count or -1.
int load_kitti_labels(const char* path, const int32_t* lut, int lut_n,
                      int32_t* out, int cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  long n = bytes / sizeof(uint32_t);
  long take = std::min<long>(n, cap);
  std::vector<uint32_t> raw(take);
  size_t got = fread(raw.data(), sizeof(uint32_t), take, f);
  fclose(f);
  if ((long)got != take) return -1;
  for (long i = 0; i < take; ++i) {
    int sem = (int)(raw[i] & 0xFFFFu);
    out[i] = (sem >= 0 && sem < lut_n) ? lut[sem] : 0;
  }
  return (int)n;
}

// In-place global augmentation: rotate by theta around z, uniform scale,
// flip (0 none, 1 x, 2 y, 3 xy), additive jitter
// (reference tools/utils/common/seg_utils.py:43-100; same op order).
void aug_points_xyz(float* xyz, int n, int stride, double theta,
                    double scale, int flip_type, double jx, double jy,
                    double jz) {
  const float c = (float)std::cos(theta), s = (float)std::sin(theta);
  for (int i = 0; i < n; ++i) {
    float* p = xyz + (long)i * stride;
    float x = p[0], y = p[1], z = p[2];
    // rotation convention matches aug_points: [x y z] @ [[c,s],[-s,c]]
    float rx = x * c - y * s;
    float ry = x * s + y * c;
    rx *= (float)scale;
    ry *= (float)scale;
    z *= (float)scale;
    if (flip_type == 1) rx = -rx;
    else if (flip_type == 2) ry = -ry;
    else if (flip_type == 3) { rx = -rx; ry = -ry; }
    p[0] = rx + (float)jx;
    p[1] = ry + (float)jy;
    p[2] = z + (float)jz;
  }
}

// Spherical range projection with closest-point z-buffer
// (reference laserscan.py:174-238) writing the packed 6-channel input
// tensor [x/50, y/50, z/3, intensity, depth/80, mask] directly
// (reference semantickitti_rv.py:284-301).
void range_project(const float* pts, int n, int h, int w, float fov_up_deg,
                   float fov_down_deg, const int32_t* labels,
                   float* scan_out, int32_t* label_out, float* mask_out,
                   int32_t* px_out, int32_t* py_out) {
  const float pi = 3.14159265358979323846f;
  const float fov_up = fov_up_deg / 180.0f * pi;
  const float fov_down = fov_down_deg / 180.0f * pi;
  const float fov = std::fabs(fov_down) + std::fabs(fov_up);

  std::vector<float> best(h * (long)w, -1.0f);  // depth of current winner
  std::memset(scan_out, 0, sizeof(float) * 6 * h * (long)w);
  std::memset(mask_out, 0, sizeof(float) * h * (long)w);
  if (label_out) std::memset(label_out, 0, sizeof(int32_t) * h * (long)w);

  for (int i = 0; i < n; ++i) {
    const float x = pts[i * 4 + 0], y = pts[i * 4 + 1], z = pts[i * 4 + 2];
    const float inten = pts[i * 4 + 3];
    float depth = std::sqrt(x * x + y * y + z * z);
    if (depth < 1e-8f) depth = 1e-8f;
    const float yaw = -std::atan2(y, x);
    float pitch = std::asin(std::max(-1.0f, std::min(1.0f, z / depth)));

    float fx = 0.5f * (yaw / pi + 1.0f) * w;
    float fy = (1.0f - (pitch + std::fabs(fov_down)) / fov) * h;
    int ix = (int)std::floor(fx);
    int iy = (int)std::floor(fy);
    ix = std::max(0, std::min(w - 1, ix));
    iy = std::max(0, std::min(h - 1, iy));
    px_out[i] = ix;
    py_out[i] = iy;

    const long pix = (long)iy * w + ix;
    if (best[pix] >= 0.0f && depth >= best[pix]) continue;  // farther: lose
    best[pix] = depth;
    float* sp = scan_out + pix * 6;
    sp[0] = x / 50.0f;
    sp[1] = y / 50.0f;
    sp[2] = z / 3.0f;
    sp[3] = inten;
    sp[4] = depth / 80.0f;
    sp[5] = 1.0f;
    mask_out[pix] = 1.0f;
    if (label_out && labels) label_out[pix] = labels[i];
  }
}

// Load a generic .npy-free binary of float32 rows (Waymo .npy payloads are
// loaded in Python; this is here for symmetry / future formats).
int load_float_rows(const char* path, int row_width, float* out, int cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  long n = bytes / (row_width * sizeof(float));
  long take = std::min<long>(n, cap);
  size_t got = fread(out, sizeof(float) * row_width, take, f);
  fclose(f);
  if ((long)got != take) return -1;
  return (int)n;
}

}  // extern "C"
