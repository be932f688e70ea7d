// Native ray-pool builder + batch sampler for the data layer.
//
// The reference's data layer spends its startup in a Python loop computing
// per-pixel ray directions, world transforms, normalization and unit-sphere
// intersections for every frame (reference: dataset/base.py:131-223,
// util/ray.py:25-99). This is the host-side hot loop of the framework — on a
// 100-frame 512x512 scene it is ~26M ray constructions — so it lives in C++
// with OpenMP, exposed to Python via ctypes (see
// contrastive_lift_tpu/data/native.py).
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared -fPIC)
#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Rays for one pinhole frame: out is [height*width, 8] row-major
// (ox oy oz dx dy dz near far). intrinsics: 3x3 row-major (already scaled to
// the target resolution); cam2world: 4x4 row-major in the normalized scene.
// far = forward intersection with the unit sphere (callers guarantee the
// camera is inside it, like the reference's assert).
void build_rays(int height, int width, const float* intrinsics,
                const float* cam2world, float near_plane, float* out) {
  const float fx = intrinsics[0], cx = intrinsics[2];
  const float fy = intrinsics[4], cy = intrinsics[5];
  const float r00 = cam2world[0], r01 = cam2world[1], r02 = cam2world[2];
  const float r10 = cam2world[4], r11 = cam2world[5], r12 = cam2world[6];
  const float r20 = cam2world[8], r21 = cam2world[9], r22 = cam2world[10];
  const float ox = cam2world[3], oy = cam2world[7], oz = cam2world[11];
  const float o_norm_sq = ox * ox + oy * oy + oz * oz;

#pragma omp parallel for schedule(static)
  for (int j = 0; j < height; ++j) {
    for (int i = 0; i < width; ++i) {
      // camera-space direction (+z forward), reference util/ray.py:25-31
      const float dx_c = (static_cast<float>(i) - cx) / fx;
      const float dy_c = (static_cast<float>(j) - cy) / fy;
      // world direction = R * d (note: directions @ R^T in row-vector form)
      float dx = dx_c * r00 + dy_c * r01 + r02;
      float dy = dx_c * r10 + dy_c * r11 + r12;
      float dz = dx_c * r20 + dy_c * r21 + r22;
      const float inv_norm = 1.0f / std::sqrt(dx * dx + dy * dy + dz * dz);
      dx *= inv_norm; dy *= inv_norm; dz *= inv_norm;
      // forward unit-sphere intersection (reference util/ray.py:81-99);
      // d is unit so ||d||^2 = 1
      const float odotd = ox * dx + oy * dy + oz * dz;
      const float det = odotd * odotd + (1.0f - o_norm_sq);
      const float far = std::sqrt(det > 0.0f ? det : 0.0f) - odotd;

      float* row = out + (static_cast<int64_t>(j) * width + i) * 8;
      row[0] = ox; row[1] = oy; row[2] = oz;
      row[3] = dx; row[4] = dy; row[5] = dz;
      row[6] = near_plane; row[7] = far;
    }
  }
}

// Gather rows: out[k] = src[idx[k]] for [n] indices into [*, dim] f32 rows.
// The batch-assembly inner loop of the flat ray-pool sampler.
void gather_rows_f32(const float* src, const int64_t* idx, int64_t n, int dim,
                     float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; ++k) {
    std::memcpy(out + k * dim, src + idx[k] * dim,
                sizeof(float) * static_cast<size_t>(dim));
  }
}

void gather_rows_i32(const int32_t* src, const int64_t* idx, int64_t n,
                     int dim, int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; ++k) {
    std::memcpy(out + k * dim, src + idx[k] * dim,
                sizeof(int32_t) * static_cast<size_t>(dim));
  }
}

void gather_rows_u8(const uint8_t* src, const int64_t* idx, int64_t n,
                    int dim, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; ++k) {
    std::memcpy(out + k * dim, src + idx[k] * dim,
                sizeof(uint8_t) * static_cast<size_t>(dim));
  }
}

// Host worker-thread cap — the TPU-native analog of the reference's
// DataLoader num_workers knob (reference: train_panopli_tensorf.py:434).
void set_num_threads(int n) {
#ifdef _OPENMP
  if (n > 0) omp_set_num_threads(n);
#else
  (void)n;
#endif
}

// splitmix64 uniform indices in [0, n_pool) — deterministic batch sampling.
void sample_indices(int64_t n_pool, int64_t batch, uint64_t seed,
                    int64_t* out) {
  uint64_t x = seed ? seed : 0x9e3779b97f4a7c15ULL;
  for (int64_t k = 0; k < batch; ++k) {
    x += 0x9e3779b97f4a7c15ULL;
    uint64_t z = x;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    z = z ^ (z >> 31);
    out[k] = static_cast<int64_t>(z % static_cast<uint64_t>(n_pool));
  }
}

}  // extern "C"
