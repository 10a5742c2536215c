// Software z-buffer triangle rasterizer for mesh-overlay visualization.
//
// Reference parity: the reference renders the recovered SMPL mesh over the
// input frame through a native renderer (opendr / neural_renderer —
// SURVEY.md section 2 "Renderer", the reference's only native component).
// This is the TPU-framework equivalent: a dependency-free C++ rasterizer
// (no GL, no CUDA) driven from Python via ctypes; deterministic and
// testable against the numpy fallback.
//
// Conventions:
//  - verts: (n_verts, 3) float32, x/y in PIXEL coordinates of the target
//    image, z = depth (smaller = closer to camera).
//  - faces: (n_faces, 3) int32 vertex indices.
//  - image: (H, W, 3) float32 in [0, 255], modified in place (alpha blend).
//  - Flat Lambertian shading from the per-face normal against a fixed
//    headlight; back faces are shaded the same (meshes may be inside-out).

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <limits>
#include <vector>

extern "C" {

// Rasterize and alpha-blend a shaded mesh into `image`.
// `base_color` is RGB in [0,255]; `alpha` in [0,1].
// Returns the number of pixels touched.
long rasterize_mesh(
    const float* verts, long n_verts,
    const int32_t* faces, long n_faces,
    float* image, long H, long W,
    const float* base_color, float alpha) {
  std::vector<float> zbuf(static_cast<size_t>(H) * W,
                          std::numeric_limits<float>::infinity());
  std::vector<float> shade(static_cast<size_t>(H) * W, 0.0f);
  std::vector<uint8_t> hit(static_cast<size_t>(H) * W, 0);

  for (long f = 0; f < n_faces; ++f) {
    const int32_t i0 = faces[3 * f + 0];
    const int32_t i1 = faces[3 * f + 1];
    const int32_t i2 = faces[3 * f + 2];
    if (i0 < 0 || i1 < 0 || i2 < 0 || i0 >= n_verts || i1 >= n_verts || i2 >= n_verts)
      continue;
    const float* v0 = verts + 3 * i0;
    const float* v1 = verts + 3 * i1;
    const float* v2 = verts + 3 * i2;

    // Per-face normal for shading (screen-space tangents + depth).
    const float e1x = v1[0] - v0[0], e1y = v1[1] - v0[1], e1z = v1[2] - v0[2];
    const float e2x = v2[0] - v0[0], e2y = v2[1] - v0[1], e2z = v2[2] - v0[2];
    float nx = e1y * e2z - e1z * e2y;
    float ny = e1z * e2x - e1x * e2z;
    float nz = e1x * e2y - e1y * e2x;
    const float nlen = std::sqrt(nx * nx + ny * ny + nz * nz) + 1e-12f;
    // Headlight along -z: |cos| so winding doesn't matter.
    const float lambert = 0.35f + 0.65f * std::fabs(nz / nlen);

    // Bounding box, clipped to the image.
    const float minxf = std::min({v0[0], v1[0], v2[0]});
    const float maxxf = std::max({v0[0], v1[0], v2[0]});
    const float minyf = std::min({v0[1], v1[1], v2[1]});
    const float maxyf = std::max({v0[1], v1[1], v2[1]});
    long x0 = std::max(0L, static_cast<long>(std::floor(minxf)));
    long x1 = std::min(W - 1, static_cast<long>(std::ceil(maxxf)));
    long y0 = std::max(0L, static_cast<long>(std::floor(minyf)));
    long y1 = std::min(H - 1, static_cast<long>(std::ceil(maxyf)));
    if (x0 > x1 || y0 > y1) continue;

    // Edge functions (barycentric).
    const float denom = (v1[1] - v2[1]) * (v0[0] - v2[0]) +
                        (v2[0] - v1[0]) * (v0[1] - v2[1]);
    if (std::fabs(denom) < 1e-12f) continue;  // degenerate
    const float inv_denom = 1.0f / denom;

    for (long y = y0; y <= y1; ++y) {
      const float py = static_cast<float>(y) + 0.5f;
      for (long x = x0; x <= x1; ++x) {
        const float px = static_cast<float>(x) + 0.5f;
        const float w0 =
            ((v1[1] - v2[1]) * (px - v2[0]) + (v2[0] - v1[0]) * (py - v2[1])) *
            inv_denom;
        const float w1 =
            ((v2[1] - v0[1]) * (px - v2[0]) + (v0[0] - v2[0]) * (py - v2[1])) *
            inv_denom;
        const float w2 = 1.0f - w0 - w1;
        if (w0 < 0.0f || w1 < 0.0f || w2 < 0.0f) continue;
        const float z = w0 * v0[2] + w1 * v1[2] + w2 * v2[2];
        const size_t idx = static_cast<size_t>(y) * W + x;
        if (z < zbuf[idx]) {
          zbuf[idx] = z;
          shade[idx] = lambert;
          hit[idx] = 1;
        }
      }
    }
  }

  long touched = 0;
  for (long y = 0; y < H; ++y) {
    for (long x = 0; x < W; ++x) {
      const size_t idx = static_cast<size_t>(y) * W + x;
      if (!hit[idx]) continue;
      ++touched;
      float* px = image + 3 * idx;
      for (int c = 0; c < 3; ++c) {
        const float mesh_c = base_color[c] * shade[idx];
        px[c] = (1.0f - alpha) * px[c] + alpha * mesh_c;
      }
    }
  }
  return touched;
}

// Depth-only rasterization into a caller-provided (H, W) buffer
// (initialized by the caller, +inf convention). Returns pixels touched.
long rasterize_depth(
    const float* verts, long n_verts,
    const int32_t* faces, long n_faces,
    float* zbuf, long H, long W) {
  long touched = 0;
  for (long f = 0; f < n_faces; ++f) {
    const int32_t i0 = faces[3 * f + 0];
    const int32_t i1 = faces[3 * f + 1];
    const int32_t i2 = faces[3 * f + 2];
    if (i0 < 0 || i1 < 0 || i2 < 0 || i0 >= n_verts || i1 >= n_verts || i2 >= n_verts)
      continue;
    const float* v0 = verts + 3 * i0;
    const float* v1 = verts + 3 * i1;
    const float* v2 = verts + 3 * i2;
    const float denom = (v1[1] - v2[1]) * (v0[0] - v2[0]) +
                        (v2[0] - v1[0]) * (v0[1] - v2[1]);
    if (std::fabs(denom) < 1e-12f) continue;
    const float inv_denom = 1.0f / denom;
    long x0 = std::max(0L, static_cast<long>(std::floor(std::min({v0[0], v1[0], v2[0]}))));
    long x1 = std::min(W - 1, static_cast<long>(std::ceil(std::max({v0[0], v1[0], v2[0]}))));
    long y0 = std::max(0L, static_cast<long>(std::floor(std::min({v0[1], v1[1], v2[1]}))));
    long y1 = std::min(H - 1, static_cast<long>(std::ceil(std::max({v0[1], v1[1], v2[1]}))));
    for (long y = y0; y <= y1; ++y) {
      const float py = static_cast<float>(y) + 0.5f;
      for (long x = x0; x <= x1; ++x) {
        const float px = static_cast<float>(x) + 0.5f;
        const float w0 =
            ((v1[1] - v2[1]) * (px - v2[0]) + (v2[0] - v1[0]) * (py - v2[1])) * inv_denom;
        const float w1 =
            ((v2[1] - v0[1]) * (px - v2[0]) + (v0[0] - v2[0]) * (py - v2[1])) * inv_denom;
        const float w2 = 1.0f - w0 - w1;
        if (w0 < 0.0f || w1 < 0.0f || w2 < 0.0f) continue;
        const float z = w0 * v0[2] + w1 * v1[2] + w2 * v2[2];
        const size_t idx = static_cast<size_t>(y) * W + x;
        if (z < zbuf[idx]) {
          zbuf[idx] = z;
          ++touched;
        }
      }
    }
  }
  return touched;
}

}  // extern "C"
