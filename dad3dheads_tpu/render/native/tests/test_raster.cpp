// Self-checking native rasterizer tests (the reference's C++ test harness
// printed values without asserting — Sim3DR/tests/test.cpp; these assert).
//
// Build & run:  make test   (in dad3dheads_tpu/render/native)

#include <cassert>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

extern "C" {
void dad3d_rasterize_buffers(const float*, int, const int*, int, int, int,
                             float*, int*, float*);
void dad3d_shade(const int*, const float*, const float*, const int*, uint8_t*,
                 int, int, int, float);
void dad3d_vertex_normals(const float*, int, const int*, int, float*);
}

static int failures = 0;
#define CHECK(cond)                                                    \
  do {                                                                 \
    if (!(cond)) {                                                     \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);      \
      ++failures;                                                      \
    }                                                                  \
  } while (0)

int main() {
  const int H = 32, W = 32;

  // one triangle covering the upper-left half, constant depth 1
  std::vector<float> verts = {0, 0, 1, 31, 0, 1, 0, 31, 1};
  std::vector<int> faces = {0, 1, 2};
  std::vector<float> depth(H * W, -1e8f);
  std::vector<int> tri(H * W, -1);
  std::vector<float> bary(H * W * 3, 0.f);
  dad3d_rasterize_buffers(verts.data(), 3, faces.data(), 1, H, W,
                          depth.data(), tri.data(), bary.data());
  CHECK(tri[1 * W + 1] == 0);
  CHECK(std::fabs(depth[1 * W + 1] - 1.0f) < 1e-5f);
  CHECK(tri[30 * W + 30] == -1);
  // barycentric sums to ~1 where covered
  for (int i = 0; i < H * W; ++i)
    if (tri[i] >= 0)
      CHECK(std::fabs(bary[3 * i] + bary[3 * i + 1] + bary[3 * i + 2] - 1.f) < 1e-4f);

  // z-buffer: nearer triangle (larger z) wins
  std::vector<float> verts2 = {0, 0, 1, 31, 0, 1, 0, 31, 1,
                               0, 0, 5, 31, 0, 5, 0, 31, 5};
  std::vector<int> faces2 = {0, 1, 2, 3, 4, 5};
  std::fill(depth.begin(), depth.end(), -1e8f);
  std::fill(tri.begin(), tri.end(), -1);
  dad3d_rasterize_buffers(verts2.data(), 6, faces2.data(), 2, H, W,
                          depth.data(), tri.data(), bary.data());
  for (int i = 0; i < H * W; ++i)
    if (tri[i] >= 0) CHECK(tri[i] == 1);

  // shading: red triangle over zero background
  std::vector<uint8_t> img(H * W * 3, 0);
  std::vector<float> colors = {1, 0, 0, 1, 0, 0, 1, 0, 0};
  std::fill(depth.begin(), depth.end(), -1e8f);
  std::fill(tri.begin(), tri.end(), -1);
  dad3d_rasterize_buffers(verts.data(), 3, faces.data(), 1, H, W,
                          depth.data(), tri.data(), bary.data());
  dad3d_shade(faces.data(), colors.data(), bary.data(), tri.data(), img.data(),
              H, W, 3, 1.0f);
  CHECK(img[(1 * W + 1) * 3 + 0] == 255);
  CHECK(img[(1 * W + 1) * 3 + 1] == 0);

  // normals of a flat square point along +-z
  std::vector<float> sq = {0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0};
  std::vector<int> sqf = {0, 1, 2, 0, 2, 3};
  std::vector<float> normals(12, 0.f);
  dad3d_vertex_normals(sq.data(), 4, sqf.data(), 2, normals.data());
  for (int v = 0; v < 4; ++v) {
    CHECK(std::fabs(std::fabs(normals[3 * v + 2]) - 1.f) < 1e-5f);
  }

  // timing smoke: 10k triangles at 512^2
  {
    const int N = 10000, S = 512;
    std::vector<float> rv(N * 9);
    std::vector<int> rf(N * 3);
    unsigned seed = 1234;
    auto rnd = [&]() { seed = seed * 1664525u + 1013904223u; return (seed >> 8) % S; };
    for (int i = 0; i < N * 3; ++i) {
      rf[i] = i;
      rv[3 * i] = (float)rnd();
      rv[3 * i + 1] = (float)rnd();
      rv[3 * i + 2] = (float)(rnd() % 100);
    }
    std::vector<float> d(S * S, -1e8f);
    std::vector<int> ti(S * S, -1);
    std::vector<float> b(S * S * 3, 0.f);
    auto t0 = std::chrono::steady_clock::now();
    dad3d_rasterize_buffers(rv.data(), N * 3, rf.data(), N, S, S, d.data(),
                            ti.data(), b.data());
    auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    std::printf("10k tris @ 512^2: %.2f ms/frame\n", dt * 1e3);
  }

  if (failures == 0) std::printf("ALL NATIVE RASTER TESTS PASSED\n");
  return failures == 0 ? 0 : 1;
}
