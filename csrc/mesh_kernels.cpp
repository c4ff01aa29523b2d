// Native mesh kernels for the TPU-native NICE-SLAM framework.
//
// Replaces the reference's host-side third-party mesh dependencies
// (skimage.measure.marching_cubes at src/utils/Mesher.py:441-458, trimesh
// connected-component filtering at :484-510) with in-repo C++:
//
//   * iso-surface extraction via marching tetrahedra (table-free: each cell
//     splits into 6 tets; per-tet triangulation has 3 generic cases), with
//     global vertex dedup on grid-edge keys so the surface is watertight;
//   * triangle-mesh connected components (union-find) with per-component
//     triangle area sums, for largest-component / small-geometry filtering.
//
// Exposed with a plain C ABI for ctypes.  Buffers are malloc'd here and
// released by free_buffer().
//
// Build: see csrc/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <functional>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

// The 6-tetrahedra decomposition of a unit cell.  Cube corner numbering:
// bit 0 -> +x, bit 1 -> +y, bit 2 -> +z  (corner i = (i&1, (i>>1)&1, (i>>2)&1)).
// All six tets share the main diagonal 0-7, guaranteeing face compatibility
// between neighboring cells.
static const int kTets[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

struct MeshBuilder {
  std::vector<float> verts;
  std::vector<int64_t> tris;
  // edge key (packed global corner ids) -> vertex index
  std::unordered_map<uint64_t, int64_t> edge_cache;

  int64_t edge_vertex(uint64_t ga, uint64_t gb, V3 pa, V3 pb, float va,
                      float vb, float level) {
    if (ga > gb) {
      std::swap(ga, gb);
      std::swap(va, vb);
      std::swap(pa, pb);
    }
    const uint64_t key = (ga << 32) | gb;
    auto it = edge_cache.find(key);
    if (it != edge_cache.end()) return it->second;
    float denom = vb - va;
    float t = (std::fabs(denom) > 1e-12f) ? (level - va) / denom : 0.5f;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    const int64_t idx = static_cast<int64_t>(verts.size() / 3);
    verts.push_back(pa.x + t * (pb.x - pa.x));
    verts.push_back(pa.y + t * (pb.y - pa.y));
    verts.push_back(pa.z + t * (pb.z - pa.z));
    edge_cache.emplace(key, idx);
    return idx;
  }

  void tri(int64_t a, int64_t b, int64_t c) {
    if (a == b || b == c || a == c) return;  // degenerate
    tris.push_back(a);
    tris.push_back(b);
    tris.push_back(c);
  }
};

}  // namespace

extern "C" {

// Extract the iso-surface of a scalar field at `level`.
// field: (nx, ny, nz) row-major (x-major: index = (ix*ny + iy)*nz + iz).
// origin/spacing: world placement of grid node (0,0,0) and per-axis step.
// Outputs malloc'd arrays: *out_verts (3*n_verts floats, xyz),
// *out_tris (3*n_tris int64).  Returns 0 on success.
int marching_tetrahedra(const float* field, int64_t nx, int64_t ny, int64_t nz,
                        float level, const float* origin, const float* spacing,
                        float** out_verts, int64_t* n_verts,
                        int64_t** out_tris, int64_t* n_tris) {
  if (nx < 2 || ny < 2 || nz < 2) {
    *out_verts = nullptr;
    *out_tris = nullptr;
    *n_verts = 0;
    *n_tris = 0;
    return 0;
  }
  MeshBuilder mb;
  mb.verts.reserve(1 << 16);
  mb.tris.reserve(1 << 16);

  const float ox = origin[0], oy = origin[1], oz = origin[2];
  const float sx = spacing[0], sy = spacing[1], sz = spacing[2];

  auto gid = [ny, nz](int64_t ix, int64_t iy, int64_t iz) -> uint64_t {
    return static_cast<uint64_t>((ix * (ny) + iy) * (nz) + iz);
  };

  float cv[8];
  V3 cp[8];
  uint64_t cg[8];

  for (int64_t ix = 0; ix + 1 < nx; ++ix) {
    for (int64_t iy = 0; iy + 1 < ny; ++iy) {
      const float* col0 = field + (ix * ny + iy) * nz;
      const float* col1 = field + (ix * ny + iy + 1) * nz;
      const float* col2 = field + ((ix + 1) * ny + iy) * nz;
      const float* col3 = field + ((ix + 1) * ny + iy + 1) * nz;
      for (int64_t iz = 0; iz + 1 < nz; ++iz) {
        // corner order: bit0->+x, bit1->+y, bit2->+z
        cv[0] = col0[iz];
        cv[1] = col2[iz];
        cv[2] = col1[iz];
        cv[3] = col3[iz];
        cv[4] = col0[iz + 1];
        cv[5] = col2[iz + 1];
        cv[6] = col1[iz + 1];
        cv[7] = col3[iz + 1];

        // quick reject: all above or all below
        bool any_lo = false, any_hi = false;
        for (int c = 0; c < 8; ++c) {
          if (cv[c] < level) any_lo = true; else any_hi = true;
        }
        if (!any_lo || !any_hi) continue;

        for (int c = 0; c < 8; ++c) {
          const int64_t dx = c & 1, dy = (c >> 1) & 1, dz = (c >> 2) & 1;
          cp[c].x = ox + sx * static_cast<float>(ix + dx);
          cp[c].y = oy + sy * static_cast<float>(iy + dy);
          cp[c].z = oz + sz * static_cast<float>(iz + dz);
          cg[c] = gid(ix + dx, iy + dy, iz + dz);
        }

        for (int t = 0; t < 6; ++t) {
          const int* tet = kTets[t];
          int code = 0;
          for (int c = 0; c < 4; ++c) {
            if (cv[tet[c]] < level) code |= (1 << c);
          }
          if (code == 0 || code == 15) continue;

          // orient so the "inside" (< level) set is {cases}
          auto ev = [&](int a, int b) {
            return mb.edge_vertex(cg[tet[a]], cg[tet[b]], cp[tet[a]],
                                  cp[tet[b]], cv[tet[a]], cv[tet[b]], level);
          };
          switch (code) {
            // one corner inside
            case 1: mb.tri(ev(0, 1), ev(0, 2), ev(0, 3)); break;
            case 2: mb.tri(ev(1, 0), ev(1, 3), ev(1, 2)); break;
            case 4: mb.tri(ev(2, 0), ev(2, 1), ev(2, 3)); break;
            case 8: mb.tri(ev(3, 0), ev(3, 2), ev(3, 1)); break;
            // one corner outside (complement, opposite winding)
            case 14: mb.tri(ev(0, 1), ev(0, 3), ev(0, 2)); break;
            case 13: mb.tri(ev(1, 0), ev(1, 2), ev(1, 3)); break;
            case 11: mb.tri(ev(2, 0), ev(2, 3), ev(2, 1)); break;
            case 7:  mb.tri(ev(3, 0), ev(3, 1), ev(3, 2)); break;
            // two corners inside: quad = two triangles
            case 3:  // 0,1 inside
              mb.tri(ev(0, 2), ev(0, 3), ev(1, 3));
              mb.tri(ev(0, 2), ev(1, 3), ev(1, 2));
              break;
            case 12:
              mb.tri(ev(0, 2), ev(1, 3), ev(0, 3));
              mb.tri(ev(0, 2), ev(1, 2), ev(1, 3));
              break;
            case 5:  // 0,2 inside
              mb.tri(ev(0, 1), ev(2, 3), ev(0, 3));
              mb.tri(ev(0, 1), ev(2, 1), ev(2, 3));
              break;
            case 10:
              mb.tri(ev(0, 1), ev(0, 3), ev(2, 3));
              mb.tri(ev(0, 1), ev(2, 3), ev(2, 1));
              break;
            case 6:  // 1,2 inside
              mb.tri(ev(1, 0), ev(2, 3), ev(1, 3));
              mb.tri(ev(1, 0), ev(2, 0), ev(2, 3));
              break;
            case 9:
              mb.tri(ev(1, 0), ev(1, 3), ev(2, 3));
              mb.tri(ev(1, 0), ev(2, 3), ev(2, 0));
              break;
            default:
              break;
          }
        }
      }
    }
  }

  *n_verts = static_cast<int64_t>(mb.verts.size() / 3);
  *n_tris = static_cast<int64_t>(mb.tris.size() / 3);
  *out_verts = static_cast<float*>(std::malloc(mb.verts.size() * sizeof(float)));
  *out_tris =
      static_cast<int64_t*>(std::malloc(mb.tris.size() * sizeof(int64_t)));
  if ((*out_verts == nullptr && !mb.verts.empty()) ||
      (*out_tris == nullptr && !mb.tris.empty()))
    return 1;
  std::memcpy(*out_verts, mb.verts.data(), mb.verts.size() * sizeof(float));
  std::memcpy(*out_tris, mb.tris.data(), mb.tris.size() * sizeof(int64_t));
  return 0;
}

// Label connected components of a triangle mesh (vertex-connectivity).
// Writes a component id per triangle into comp_out (n_tris) and the triangle
// area sum per component into area_out (n_tris capacity; entry c valid for
// c < n_components).  Returns the number of components.
int64_t mesh_components(const float* verts, int64_t n_verts,
                        const int64_t* tris, int64_t n_tris,
                        int32_t* comp_out, float* area_out) {
  std::vector<int64_t> parent(static_cast<size_t>(n_verts));
  for (int64_t i = 0; i < n_verts; ++i) parent[static_cast<size_t>(i)] = i;

  std::function<int64_t(int64_t)> find = [&](int64_t x) {
    while (parent[static_cast<size_t>(x)] != x) {
      parent[static_cast<size_t>(x)] =
          parent[static_cast<size_t>(parent[static_cast<size_t>(x)])];
      x = parent[static_cast<size_t>(x)];
    }
    return x;
  };
  auto unite = [&](int64_t a, int64_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[static_cast<size_t>(a)] = b;
  };

  for (int64_t t = 0; t < n_tris; ++t) {
    unite(tris[3 * t], tris[3 * t + 1]);
    unite(tris[3 * t], tris[3 * t + 2]);
  }

  std::unordered_map<int64_t, int32_t> root2comp;
  int32_t n_comp = 0;
  for (int64_t t = 0; t < n_tris; ++t) {
    const int64_t r = find(tris[3 * t]);
    auto it = root2comp.find(r);
    int32_t c;
    if (it == root2comp.end()) {
      c = n_comp++;
      root2comp.emplace(r, c);
      area_out[c] = 0.f;
    } else {
      c = it->second;
    }
    comp_out[t] = c;
    // triangle area
    const float* a = verts + 3 * tris[3 * t];
    const float* b = verts + 3 * tris[3 * t + 1];
    const float* cvtx = verts + 3 * tris[3 * t + 2];
    const float ux = b[0] - a[0], uy = b[1] - a[1], uz = b[2] - a[2];
    const float vx = cvtx[0] - a[0], vy = cvtx[1] - a[1], vz = cvtx[2] - a[2];
    const float cxx = uy * vz - uz * vy;
    const float cyy = uz * vx - ux * vz;
    const float czz = ux * vy - uy * vx;
    area_out[c] += 0.5f * std::sqrt(cxx * cxx + cyy * cyy + czz * czz);
  }
  return n_comp;
}

void free_buffer(void* ptr) { std::free(ptr); }

}  // extern "C"
