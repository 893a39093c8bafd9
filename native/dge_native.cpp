// dge_native — native runtime components for the dge_tpu framework.
//
// Reference analogs: the reference's non-CUDA native pieces — simple-knn
// (submodules/simple-knn/simple_knn.cu: Morton-ordered 3-NN mean distance
// used for Gaussian scale init) and the binary COLMAP/PLY loaders whose
// Python equivalents (scene/colmap_loader.py, plyfile) dominate scene load
// time on multi-million-point captures.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdge_native.so dge_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// KNN: mean squared distance to the K nearest neighbors per point.
// Grid-hash accelerated (the reference uses Morton boxes,
// simple_knn.cu:63-218; a uniform grid gives the same O(N) behavior).
// ---------------------------------------------------------------------------
int dge_knn_mean_sq_dist(const float* pts, int64_t n, int k, float* out) {
  if (n <= 0 || k <= 0) return -1;
  if (n <= k) {  // degenerate: all pairs
    for (int64_t i = 0; i < n; i++) {
      std::vector<float> d2;
      for (int64_t j = 0; j < n; j++) {
        if (i == j) continue;
        float dx = pts[3 * i] - pts[3 * j];
        float dy = pts[3 * i + 1] - pts[3 * j + 1];
        float dz = pts[3 * i + 2] - pts[3 * j + 2];
        d2.push_back(dx * dx + dy * dy + dz * dz);
      }
      std::sort(d2.begin(), d2.end());
      float s = 0;
      int m = std::min<int>(k, (int)d2.size());
      for (int j = 0; j < m; j++) s += d2[j];
      out[i] = s / k;  // missing neighbors count as 0, same as grid path
    }
    return 0;
  }

  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; i++)
    for (int c = 0; c < 3; c++) {
      lo[c] = std::min(lo[c], pts[3 * i + c]);
      hi[c] = std::max(hi[c], pts[3 * i + c]);
    }
  // grid with ~1 point per cell on average
  double target_cells = (double)n;
  int dim = std::max(1, (int)std::cbrt(target_cells));
  dim = std::min(dim, 512);
  float ext[3], cell[3];
  for (int c = 0; c < 3; c++) {
    ext[c] = std::max(hi[c] - lo[c], 1e-9f);
    cell[c] = ext[c] / dim;
  }
  auto cell_of = [&](const float* p, int* g) {
    for (int c = 0; c < 3; c++) {
      int v = (int)((p[c] - lo[c]) / cell[c]);
      g[c] = std::min(std::max(v, 0), dim - 1);
    }
  };
  // counting sort into cells
  std::vector<int64_t> cell_id(n);
  std::vector<int64_t> counts((int64_t)dim * dim * dim + 1, 0);
  for (int64_t i = 0; i < n; i++) {
    int g[3];
    cell_of(pts + 3 * i, g);
    cell_id[i] = ((int64_t)g[2] * dim + g[1]) * dim + g[0];
    counts[cell_id[i] + 1]++;
  }
  for (size_t i = 1; i < counts.size(); i++) counts[i] += counts[i - 1];
  std::vector<int64_t> order(n);
  {
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    for (int64_t i = 0; i < n; i++) order[cursor[cell_id[i]]++] = i;
  }

  for (int64_t qi = 0; qi < n; qi++) {
    const float* q = pts + 3 * qi;
    int g[3];
    cell_of(q, g);
    std::vector<float> best(k, 1e30f);
    float worst = 1e30f;
    // expanding ring search
    for (int ring = 0; ring < dim; ring++) {
      // prune: if the closest possible point in this ring is farther than
      // our current k-th best, stop
      if (ring > 0) {
        float min_ring = 1e30f;
        for (int c = 0; c < 3; c++)
          min_ring = std::min(min_ring, cell[c]);
        float ring_dist = (ring - 1) * min_ring;
        if (worst < ring_dist * ring_dist) break;
      }
      for (int z = g[2] - ring; z <= g[2] + ring; z++)
        for (int y = g[1] - ring; y <= g[1] + ring; y++)
          for (int x = g[0] - ring; x <= g[0] + ring; x++) {
            // true (unclamped) shell only — clamping would re-visit border
            // cells across rings and duplicate neighbors
            if (ring > 0 && std::abs(x - g[0]) != ring &&
                std::abs(y - g[1]) != ring && std::abs(z - g[2]) != ring)
              continue;
            if (x < 0 || y < 0 || z < 0 || x >= dim || y >= dim || z >= dim)
              continue;
            int64_t cid = ((int64_t)z * dim + y) * dim + x;
            for (int64_t s = counts[cid]; s < counts[cid + 1]; s++) {
              int64_t j = order[s];
              if (j == qi) continue;
              float dx = q[0] - pts[3 * j], dy = q[1] - pts[3 * j + 1],
                    dz = q[2] - pts[3 * j + 2];
              float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < worst) {
                // insert into best-k (small k: linear insertion)
                int pos = k - 1;
                while (pos > 0 && best[pos - 1] > d2) {
                  best[pos] = best[pos - 1];
                  pos--;
                }
                best[pos] = d2;
                worst = best[k - 1];
              }
            }
          }
      if (worst < 1e29f && ring >= 2) {
        // conservative extra ring, then stop if nothing can beat worst
        float min_cell = std::min(cell[0], std::min(cell[1], cell[2]));
        if (worst < (ring * min_cell) * (ring * min_cell)) break;
      }
    }
    float s = 0;
    for (int j = 0; j < k; j++) s += (best[j] < 1e29f ? best[j] : 0.f);
    out[qi] = s / k;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP points3D.bin parsing: returns xyz (double) and rgb (uint8).
// Two-pass C parse of the variable-length record stream — the Python loop
// in scene/colmap_loader.py is O(N) interpreter overhead.
// ---------------------------------------------------------------------------
int64_t dge_colmap_points3d_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) {
    fclose(f);
    return -1;
  }
  fclose(f);
  return (int64_t)n;
}

int dge_colmap_points3d_read(const char* path, int64_t n, double* xyz,
                             uint8_t* rgb) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n_hdr = 0;
  if (fread(&n_hdr, 8, 1, f) != 1 || (int64_t)n_hdr != n) {
    fclose(f);
    return -2;
  }
  for (int64_t i = 0; i < n; i++) {
    uint64_t id;
    double p[3];
    uint8_t c[3];
    double err;
    uint64_t track_len;
    if (fread(&id, 8, 1, f) != 1 || fread(p, 8, 3, f) != 3 ||
        fread(c, 1, 3, f) != 3 || fread(&err, 8, 1, f) != 1 ||
        fread(&track_len, 8, 1, f) != 1) {
      fclose(f);
      return -3;
    }
    if (fseek(f, (long)(8 * track_len), SEEK_CUR) != 0) {
      fclose(f);
      return -4;
    }
    memcpy(xyz + 3 * i, p, 24);
    memcpy(rgb + 3 * i, c, 3);
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Binary PLY vertex block copy: given the byte offset of the data section
// and per-vertex stride, bulk-read the float32 attribute matrix.
// (Header parsing stays in Python; the bulk copy is the hot part.)
// ---------------------------------------------------------------------------
int dge_ply_read_block(const char* path, int64_t offset, int64_t n,
                       int64_t stride_bytes, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, (long)offset, SEEK_SET) != 0) {
    fclose(f);
    return -2;
  }
  size_t total = (size_t)n * (size_t)stride_bytes;
  size_t got = fread(out, 1, total, f);
  fclose(f);
  return got == total ? 0 : -3;
}
}
