// Native CPU z-buffer rasterizer — the host-side rendering runtime.
//
// Role parity with the reference's Sim3DR C++ kernel
// (/root/reference/Sim3DR/lib/rasterize_kernel.cpp), implemented fresh with a
// different algorithm: per-triangle bounding-box scan with incremental edge
// functions (instead of per-scanline barycentric solves), OpenMP-friendly
// loop structure, and a plain C ABI consumed through ctypes (no
// Cython/pybind dependency).
//
// Conventions (matching the framework's JAX rasterizer):
//   - vertices are screen-space (x right, y down, z toward the viewer);
//   - the z-buffer keeps the LARGEST z (init -1e8);
//   - colors are per-vertex RGB in [0, 1], alpha-blended into a uint8 image.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct Vec3 {
  float x, y, z;
};

inline float edge(float ax, float ay, float bx, float by, float px, float py) {
  // twice the signed area of triangle (a, b, p)
  return (bx - ax) * (py - ay) - (by - ay) * (px - ax);
}

}  // namespace

extern "C" {

// depth:  (h, w) float32, caller-initialized (use -1e8)
// tri_id: (h, w) int32, caller-initialized (use -1)
// bary:   (h, w, 3) float32
void dad3d_rasterize_buffers(const float* vertices, int n_vertices,
                             const int* faces, int n_faces, int height,
                             int width, float* depth, int* tri_id,
                             float* bary) {
  (void)n_vertices;
  for (int t = 0; t < n_faces; ++t) {
    const int i0 = faces[3 * t + 0];
    const int i1 = faces[3 * t + 1];
    const int i2 = faces[3 * t + 2];
    const Vec3 v0{vertices[3 * i0], vertices[3 * i0 + 1], vertices[3 * i0 + 2]};
    const Vec3 v1{vertices[3 * i1], vertices[3 * i1 + 1], vertices[3 * i1 + 2]};
    const Vec3 v2{vertices[3 * i2], vertices[3 * i2 + 1], vertices[3 * i2 + 2]};

    const float area = edge(v0.x, v0.y, v1.x, v1.y, v2.x, v2.y);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.0f / area;

    int x_min = std::max(0, (int)std::ceil(std::min({v0.x, v1.x, v2.x})));
    int x_max = std::min(width - 1, (int)std::floor(std::max({v0.x, v1.x, v2.x})));
    int y_min = std::max(0, (int)std::ceil(std::min({v0.y, v1.y, v2.y})));
    int y_max = std::min(height - 1, (int)std::floor(std::max({v0.y, v1.y, v2.y})));
    if (x_min > x_max || y_min > y_max) continue;

    for (int y = y_min; y <= y_max; ++y) {
      const float py = (float)y;
      float* drow = depth + (size_t)y * width;
      int* irow = tri_id + (size_t)y * width;
      float* brow = bary + (size_t)y * width * 3;
      for (int x = x_min; x <= x_max; ++x) {
        const float px = (float)x;
        // barycentric weights of p w.r.t. (v0, v1, v2)
        float w0 = edge(v1.x, v1.y, v2.x, v2.y, px, py) * inv_area;
        float w1 = edge(v2.x, v2.y, v0.x, v0.y, px, py) * inv_area;
        float w2 = 1.0f - w0 - w1;
        const float eps = 1e-5f;
        if (w0 < -eps || w1 < -eps || w2 < -eps) continue;
        const float z = w0 * v0.z + w1 * v1.z + w2 * v2.z;
        if (z > drow[x]) {
          drow[x] = z;
          irow[x] = t;
          brow[3 * x + 0] = w0;
          brow[3 * x + 1] = w1;
          brow[3 * x + 2] = w2;
        }
      }
    }
  }
}

// image: (h, w, c) uint8, pre-filled with the background; colors (V, c) in
// [0, 1]; alpha blends the mesh color over the background.
void dad3d_shade(const int* faces, const float* colors, const float* bary,
                 const int* tri_id, uint8_t* image, int height, int width,
                 int channels, float alpha) {
  for (int y = 0; y < height; ++y) {
    for (int x = 0; x < width; ++x) {
      const int t = tri_id[(size_t)y * width + x];
      if (t < 0) continue;
      const float* b = bary + ((size_t)y * width + x) * 3;
      uint8_t* px = image + ((size_t)y * width + x) * channels;
      for (int c = 0; c < channels; ++c) {
        float col = b[0] * colors[faces[3 * t + 0] * channels + c] +
                    b[1] * colors[faces[3 * t + 1] * channels + c] +
                    b[2] * colors[faces[3 * t + 2] * channels + c];
        col = std::min(std::max(col, 0.0f), 1.0f);
        const float out = (1.0f - alpha) * (float)px[c] + alpha * 255.0f * col;
        px[c] = (uint8_t)std::min(std::max(out + 0.5f, 0.0f), 255.0f);
      }
    }
  }
}

// One-ring vertex normals: accumulate per-face cross products, normalize.
void dad3d_vertex_normals(const float* vertices, int n_vertices,
                          const int* faces, int n_faces, float* normals) {
  std::memset(normals, 0, sizeof(float) * 3 * (size_t)n_vertices);
  for (int t = 0; t < n_faces; ++t) {
    const int i0 = faces[3 * t], i1 = faces[3 * t + 1], i2 = faces[3 * t + 2];
    const float* a = vertices + 3 * i0;
    const float* b = vertices + 3 * i1;
    const float* c = vertices + 3 * i2;
    const float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    const float e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    const float n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                        e1[2] * e2[0] - e1[0] * e2[2],
                        e1[0] * e2[1] - e1[1] * e2[0]};
    for (int k : {i0, i1, i2}) {
      normals[3 * k + 0] += n[0];
      normals[3 * k + 1] += n[1];
      normals[3 * k + 2] += n[2];
    }
  }
  for (int v = 0; v < n_vertices; ++v) {
    float* n = normals + 3 * v;
    const float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len > 1e-12f) {
      n[0] /= len;
      n[1] /= len;
      n[2] /= len;
    }
  }
}

}  // extern "C"
