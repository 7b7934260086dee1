// Native marching-tetrahedra iso-surface extractor.
//
// The runtime companion to arcnerf_tpu/geometry/mesh.py: same algorithm
// (6 tets per cube around the 0-6 diagonal, per-tet case triangulation),
// but a tight C++ loop for host-side extraction of large grids (512^3),
// where the vectorized-numpy path pays large transient allocations. The
// reference runs mesh extraction through compiled skimage
// (arcnerf/eval/infer_func.py:532 -> geometry/mesh.py:30); this replaces it.
//
// Exposed via a C ABI for ctypes:
//   mt_extract(field, nx, ny, nz, level, out_tris, max_tris) -> n_tris
// writing packed triangles (9 floats each, grid-index coordinates; python
// applies spacing/origin, welds vertices and orients faces).

#include <cstdint>
#include <cstddef>

namespace {

// cube corner k offset: (k&1, (k>>1)&1, (k>>2)&1)
const int CORNER[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

// six tets sharing the 0-6 diagonal (corner ids in the binary order above;
// note python's EIGHT-order differs — these ids are local to this file)
const int TETS[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

struct Tri {
    int e[3][2];  // three edges, each (inside_vertex, outside_vertex) local tet ids
};

struct Case {
    int n;
    Tri tris[2];
};

// build the 16-case table at startup (mirrors _tet_case_table in mesh.py)
struct CaseTable {
    Case cases[16];
    CaseTable() {
        for (int mask = 0; mask < 16; ++mask) {
            int in[4], out[4], ni = 0, no = 0;
            for (int v = 0; v < 4; ++v) {
                if (mask & (1 << v)) in[ni++] = v; else out[no++] = v;
            }
            Case& c = cases[mask];
            c.n = 0;
            if (ni == 1) {
                c.n = 1;
                for (int j = 0; j < 3; ++j) { c.tris[0].e[j][0] = in[0]; c.tris[0].e[j][1] = out[j]; }
            } else if (ni == 3) {
                c.n = 1;
                for (int j = 0; j < 3; ++j) { c.tris[0].e[j][0] = in[j]; c.tris[0].e[j][1] = out[0]; }
            } else if (ni == 2) {
                c.n = 2;
                // quad edges: (i0,o0) (i0,o1) (i1,o1) (i1,o0)
                int q[4][2] = {{in[0], out[0]}, {in[0], out[1]}, {in[1], out[1]}, {in[1], out[0]}};
                int t0[3] = {0, 1, 2}, t1[3] = {0, 2, 3};
                for (int j = 0; j < 3; ++j) {
                    c.tris[0].e[j][0] = q[t0[j]][0]; c.tris[0].e[j][1] = q[t0[j]][1];
                    c.tris[1].e[j][0] = q[t1[j]][0]; c.tris[1].e[j][1] = q[t1[j]][1];
                }
            }
        }
    }
};

const CaseTable TABLE;

}  // namespace

extern "C" {

// Returns the number of triangles written (capped at max_tris). field is
// x-major (x, y, z) -> field[(x * ny + y) * nz + z]. Triangles are written
// as 9 floats in GRID coordinates.
int64_t mt_extract(const float* field, int64_t nx, int64_t ny, int64_t nz,
                   float level, float* out_tris, int64_t max_tris) {
    int64_t n_out = 0;
    float vals[8];
    float pos[8][3];

    for (int64_t x = 0; x + 1 < nx; ++x) {
        for (int64_t y = 0; y + 1 < ny; ++y) {
            const float* base = field + (x * ny + y) * nz;
            const float* base_x = field + ((x + 1) * ny + y) * nz;
            for (int64_t z = 0; z + 1 < nz; ++z) {
                // corner values
                vals[0] = base[z];            // (x, y, z)
                vals[1] = base_x[z];          // (x+1, y, z)
                vals[2] = base[nz + z];       // (x, y+1, z)
                vals[3] = base_x[nz + z];     // (x+1, y+1, z)
                vals[4] = base[z + 1];
                vals[5] = base_x[z + 1];
                vals[6] = base[nz + z + 1];
                vals[7] = base_x[nz + z + 1];

                float vmin = vals[0], vmax = vals[0];
                for (int k = 1; k < 8; ++k) {
                    if (vals[k] < vmin) vmin = vals[k];
                    if (vals[k] > vmax) vmax = vals[k];
                }
                if (!(vmin < level && vmax >= level)) continue;

                for (int k = 0; k < 8; ++k) {
                    pos[k][0] = float(x + CORNER[k][0]);
                    pos[k][1] = float(y + CORNER[k][1]);
                    pos[k][2] = float(z + CORNER[k][2]);
                }

                for (int t = 0; t < 6; ++t) {
                    const int* tet = TETS[t];
                    int mask = 0;
                    for (int v = 0; v < 4; ++v) {
                        if (vals[tet[v]] < level) mask |= (1 << v);
                    }
                    const Case& c = TABLE.cases[mask];
                    for (int ti = 0; ti < c.n; ++ti) {
                        if (n_out >= max_tris) return n_out;
                        float* dst = out_tris + n_out * 9;
                        for (int j = 0; j < 3; ++j) {
                            int a = tet[c.tris[ti].e[j][0]];
                            int b = tet[c.tris[ti].e[j][1]];
                            float va = vals[a], vb = vals[b];
                            float denom = vb - va;
                            if (denom > -1e-12f && denom < 1e-12f) denom = 1e-12f;
                            float s = (level - va) / denom;
                            if (s < 0.f) s = 0.f;
                            if (s > 1.f) s = 1.f;
                            for (int d = 0; d < 3; ++d) {
                                dst[j * 3 + d] = pos[a][d] * (1.f - s) + pos[b][d] * s;
                            }
                        }
                        ++n_out;
                    }
                }
            }
        }
    }
    return n_out;
}

// count pass so python can allocate exactly
int64_t mt_count(const float* field, int64_t nx, int64_t ny, int64_t nz, float level) {
    int64_t n = 0;
    float vals[8];
    for (int64_t x = 0; x + 1 < nx; ++x) {
        for (int64_t y = 0; y + 1 < ny; ++y) {
            const float* base = field + (x * ny + y) * nz;
            const float* base_x = field + ((x + 1) * ny + y) * nz;
            for (int64_t z = 0; z + 1 < nz; ++z) {
                vals[0] = base[z];
                vals[1] = base_x[z];
                vals[2] = base[nz + z];
                vals[3] = base_x[nz + z];
                vals[4] = base[z + 1];
                vals[5] = base_x[z + 1];
                vals[6] = base[nz + z + 1];
                vals[7] = base_x[nz + z + 1];
                float vmin = vals[0], vmax = vals[0];
                for (int k = 1; k < 8; ++k) {
                    if (vals[k] < vmin) vmin = vals[k];
                    if (vals[k] > vmax) vmax = vals[k];
                }
                if (!(vmin < level && vmax >= level)) continue;
                for (int t = 0; t < 6; ++t) {
                    const int* tet = TETS[t];
                    int mask = 0;
                    for (int v = 0; v < 4; ++v) {
                        if (vals[tet[v]] < level) mask |= (1 << v);
                    }
                    n += TABLE.cases[mask].n;
                }
            }
        }
    }
    return n;
}

}  // extern "C"
