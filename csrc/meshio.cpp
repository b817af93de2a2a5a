// Native host-side mesh preprocessing for dmesh2_renderer_tpu.
//
// The CUDA reference keeps its host glue in C++ (render.cu shape plumbing,
// buffer management); the TPU build's device path is Pallas/XLA, and this
// file is the native host runtime around it: tetrahedral-grid generation and
// face/tet adjacency construction (the inputs of LayeredRenderer.generate,
// reference dmesh2_renderer/__init__.py:404-416). The adjacency dedup is a
// hash map over sorted face keys -- quadratic-free and ~100x the Python
// dict loop it replaces for large grids.
//
// Exposed via a C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct FaceKey {
  int32_t a, b, c;
  bool operator==(const FaceKey& o) const {
    return a == o.a && b == o.b && c == o.c;
  }
};

struct FaceKeyHash {
  size_t operator()(const FaceKey& k) const {
    uint64_t h = 1469598103934665603ull;
    auto mix = [&h](int32_t v) {
      h ^= static_cast<uint64_t>(static_cast<uint32_t>(v));
      h *= 1099511628211ull;
    };
    mix(k.a);
    mix(k.b);
    mix(k.c);
    return static_cast<size_t>(h);
  }
};

inline FaceKey sorted_key(int32_t x, int32_t y, int32_t z) {
  if (x > y) std::swap(x, y);
  if (y > z) std::swap(y, z);
  if (x > y) std::swap(x, y);
  return FaceKey{x, y, z};
}

// Face f of tet (v0 v1 v2 v3) = the tet minus vertex f, matching the
// reference's tet_faces convention (tri_of_tet in utils/meshes.py).
constexpr int kTriOfTet[4][3] = {{1, 2, 3}, {0, 2, 3}, {0, 1, 3}, {0, 1, 2}};

}  // namespace

extern "C" {

// Pass 1: count unique faces of a tet mesh. Returns n_faces.
int32_t tet_count_faces(const int32_t* tets, int32_t n_tets) {
  std::unordered_map<FaceKey, int32_t, FaceKeyHash> map;
  map.reserve(static_cast<size_t>(n_tets) * 4);
  for (int32_t t = 0; t < n_tets; ++t) {
    const int32_t* tet = tets + 4 * t;
    for (int f = 0; f < 4; ++f) {
      map.emplace(sorted_key(tet[kTriOfTet[f][0]], tet[kTriOfTet[f][1]],
                             tet[kTriOfTet[f][2]]),
                  0);
    }
  }
  return static_cast<int32_t>(map.size());
}

// Pass 2: fill faces (n_faces, 3) with sorted vertex ids, face_tets
// (n_faces, 2) with the <= 2 incident tets (-1 padded, first-seen first),
// and tet_faces (n_tets, 4) with each tet's face ids. Face ids are assigned
// in first-encounter order (deterministic). Returns n_faces written, or -1
// if it exceeds the caller's capacity.
int32_t tet_build_adjacency(const int32_t* tets, int32_t n_tets,
                            int32_t faces_capacity, int32_t* faces,
                            int32_t* face_tets, int32_t* tet_faces) {
  std::unordered_map<FaceKey, int32_t, FaceKeyHash> map;
  map.reserve(static_cast<size_t>(n_tets) * 4);
  int32_t n_faces = 0;
  for (int32_t t = 0; t < n_tets; ++t) {
    const int32_t* tet = tets + 4 * t;
    for (int f = 0; f < 4; ++f) {
      FaceKey key = sorted_key(tet[kTriOfTet[f][0]], tet[kTriOfTet[f][1]],
                               tet[kTriOfTet[f][2]]);
      auto it = map.find(key);
      int32_t fid;
      if (it == map.end()) {
        if (n_faces >= faces_capacity) return -1;
        fid = n_faces++;
        map.emplace(key, fid);
        faces[3 * fid + 0] = key.a;
        faces[3 * fid + 1] = key.b;
        faces[3 * fid + 2] = key.c;
        face_tets[2 * fid + 0] = t;
        face_tets[2 * fid + 1] = -1;
      } else {
        fid = it->second;
        face_tets[2 * fid + 1] = t;
      }
      tet_faces[4 * t + f] = fid;
    }
  }
  return n_faces;
}

// Regular tetrahedral grid filling [-extent, extent]^3 at resolution res:
// (res+1)^3 vertices, 6 tets per cell. verts must hold (res+1)^3 * 3 floats,
// tets res^3 * 6 * 4 int32.
void tet_grid_generate(int32_t res, float extent, float* verts,
                       int32_t* tets) {
  const int32_t n1 = res + 1;
  for (int32_t i = 0; i < n1; ++i) {
    for (int32_t j = 0; j < n1; ++j) {
      for (int32_t k = 0; k < n1; ++k) {
        float* v = verts + 3 * ((i * n1 + j) * n1 + k);
        v[0] = -extent + 2.0f * extent * static_cast<float>(i) / res;
        v[1] = -extent + 2.0f * extent * static_cast<float>(j) / res;
        v[2] = -extent + 2.0f * extent * static_cast<float>(k) / res;
      }
    }
  }
  constexpr int kCubeTets[6][4] = {{0, 1, 3, 7}, {0, 1, 7, 5}, {0, 5, 7, 4},
                                   {0, 3, 2, 7}, {0, 2, 6, 7}, {0, 6, 4, 7}};
  int32_t* out = tets;
  for (int32_t i = 0; i < res; ++i) {
    for (int32_t j = 0; j < res; ++j) {
      for (int32_t k = 0; k < res; ++k) {
        int32_t c[8];
        int idx = 0;
        for (int32_t di = 0; di < 2; ++di)
          for (int32_t dj = 0; dj < 2; ++dj)
            for (int32_t dk = 0; dk < 2; ++dk)
              c[idx++] = ((i + di) * n1 + (j + dj)) * n1 + (k + dk);
        for (int tt = 0; tt < 6; ++tt) {
          for (int vv = 0; vv < 4; ++vv) *out++ = c[kCubeTets[tt][vv]];
        }
      }
    }
  }
}

}  // extern "C"
