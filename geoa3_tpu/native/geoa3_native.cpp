// geoa3_native — host-side native runtime for the TPU GeoA3 framework.
//
// The reference keeps its native layer on the GPU (pointnet2_ops CUDA); on
// TPU those kernels live in Pallas, and the native layer moves to where the
// host actually burns time: the data pipeline. This library provides
//   * a fast comma/space-separated point-file parser (the reference loads
//     ModelNet40_normal_resampled via np.loadtxt — Provider/
//     modelnet_trn_test.py:79 — which is ~30x slower than this parser),
//   * greedy farthest-point sampling on the CPU (the attack-set distillation
//     loops numpy FPS over every instance — Provider/gen_data_mat.py:121-159),
//   * area-weighted triangle-mesh sampling (Provider/gen_data_mat.py:88-119).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Build: python -m geoa3_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <random>
#include <vector>

extern "C" {

// Parse up to max_rows lines of `cols` numbers (comma or whitespace
// separated) from `path` into out[max_rows * cols]. Returns rows parsed,
// or -1 on open failure.
int geoa3_parse_points(const char* path, float* out, int max_rows, int cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  // slurp the file
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf[got] = '\0';

  const char* p = buf.data();
  const char* end = p + got;
  int row = 0;
  while (row < max_rows && p < end) {
    int col = 0;
    while (col < cols && p < end) {
      char* next = nullptr;
      float v = std::strtof(p, &next);
      if (next == p) {  // separator / junk: advance one char
        ++p;
        continue;
      }
      out[row * cols + col] = v;
      ++col;
      p = next;
    }
    if (col == cols) ++row;
    // skip to end of line
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  return row;
}

// Greedy farthest-point sampling over pts[n*3] -> out_idx[m].
// start < 0 selects CUDA semantics: start at 0 and skip points with squared
// magnitude <= 1e-3 (reference sampling_gpu.cu:86,100-101); start >= 0 is the
// torch random-start variant without the skip (Lib/utility.py:175-187).
void geoa3_fps(const float* pts, int n, int m, int start, int* out_idx) {
  const bool skip_near_origin = start < 0;
  int first = start < 0 ? 0 : start;
  std::vector<float> mindist(static_cast<size_t>(n),
                             std::numeric_limits<float>::max());
  std::vector<uint8_t> ok(static_cast<size_t>(n), 1);
  if (skip_near_origin) {
    for (int i = 0; i < n; ++i) {
      const float* q = pts + 3 * i;
      float mag = q[0] * q[0] + q[1] * q[1] + q[2] * q[2];
      ok[i] = mag > 1e-3f ? 1 : 0;
    }
  }
  int last = first;
  out_idx[0] = first;
  for (int j = 1; j < m; ++j) {
    const float* lp = pts + 3 * last;
    float best = -1.f;
    int besti = 0;
    for (int i = 0; i < n; ++i) {
      const float* q = pts + 3 * i;
      float dx = q[0] - lp[0], dy = q[1] - lp[1], dz = q[2] - lp[2];
      float d = dx * dx + dy * dy + dz * dz;
      if (d < mindist[i]) mindist[i] = d;
      float score = ok[i] ? mindist[i] : -1.f;
      if (score > best) {
        best = score;
        besti = i;
      }
    }
    last = besti;
    out_idx[j] = besti;
  }
}

// Area-weighted uniform sampling on a triangle mesh
// (verts[nv*3], faces[nf*3] 0-based) -> out_pts/out_nrm [num_points*3].
// Deterministic given `seed`. Matches reference `sample_points`
// (Provider/gen_data_mat.py:88-119) semantics: triangles picked by area,
// uniform barycentric coords, per-sample unit face normal.
void geoa3_sample_mesh(const float* verts, int nv, const int* faces, int nf,
                       int num_points, uint64_t seed, float* out_pts,
                       float* out_nrm) {
  (void)nv;
  std::vector<double> cum(static_cast<size_t>(nf));
  std::vector<float> nrm(static_cast<size_t>(nf) * 3);
  double total = 0.0;
  for (int t = 0; t < nf; ++t) {
    const float* a = verts + 3 * faces[3 * t + 0];
    const float* b = verts + 3 * faces[3 * t + 1];
    const float* c = verts + 3 * faces[3 * t + 2];
    float ux = b[0] - a[0], uy = b[1] - a[1], uz = b[2] - a[2];
    float vx = c[0] - a[0], vy = c[1] - a[1], vz = c[2] - a[2];
    float cx = uy * vz - uz * vy;
    float cy = uz * vx - ux * vz;
    float cz = ux * vy - uy * vx;
    double area = 0.5 * std::sqrt(double(cx) * cx + double(cy) * cy +
                                  double(cz) * cz);
    total += area;
    cum[t] = total;
    float len = std::sqrt(cx * cx + cy * cy + cz * cz);
    if (len < 1e-20f) len = 1.f;
    nrm[3 * t + 0] = cx / len;
    nrm[3 * t + 1] = cy / len;
    nrm[3 * t + 2] = cz / len;
  }
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int s = 0; s < num_points; ++s) {
    double r = uni(rng) * total;
    // binary search the cumulative areas
    int lo = 0, hi = nf - 1;
    while (lo < hi) {
      int mid = (lo + hi) / 2;
      if (cum[mid] < r)
        lo = mid + 1;
      else
        hi = mid;
    }
    int t = lo;
    const float* a = verts + 3 * faces[3 * t + 0];
    const float* b = verts + 3 * faces[3 * t + 1];
    const float* c = verts + 3 * faces[3 * t + 2];
    float u = static_cast<float>(uni(rng));
    float v = static_cast<float>(uni(rng));
    if (u + v > 1.f) {
      u = 1.f - u;
      v = 1.f - v;
    }
    for (int d = 0; d < 3; ++d) {
      out_pts[3 * s + d] = a[d] + u * (b[d] - a[d]) + v * (c[d] - a[d]);
      out_nrm[3 * s + d] = nrm[3 * t + d];
    }
  }
}

// Centre + unit-sphere normalise pts[n*3] in place
// (reference Lib/utility.py:454-464 / gen_data_mat.py:151-158).
void geoa3_normalize(float* pts, int n) {
  double cx = 0, cy = 0, cz = 0;
  for (int i = 0; i < n; ++i) {
    cx += pts[3 * i];
    cy += pts[3 * i + 1];
    cz += pts[3 * i + 2];
  }
  cx /= n;
  cy /= n;
  cz /= n;
  float maxn = 0.f;
  for (int i = 0; i < n; ++i) {
    pts[3 * i] -= static_cast<float>(cx);
    pts[3 * i + 1] -= static_cast<float>(cy);
    pts[3 * i + 2] -= static_cast<float>(cz);
    float d = std::sqrt(pts[3 * i] * pts[3 * i] +
                        pts[3 * i + 1] * pts[3 * i + 1] +
                        pts[3 * i + 2] * pts[3 * i + 2]);
    if (d > maxn) maxn = d;
  }
  if (maxn <= 0.f) maxn = 1.f;
  for (int i = 0; i < 3 * n; ++i) pts[i] /= maxn;
}

}  // extern "C"
