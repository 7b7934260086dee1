// Native marching-cubes iso-surface extractor.
//
// The case table is NOT embedded here: python generates it programmatically
// (arcnerf_tpu/geometry/mc_table.py, contour cycle tracing) and passes it
// in, keeping one source of truth between the numpy fallback and this fast
// path. Replaces the reference's skimage.measure.marching_cubes host call
// (/root/reference/arcnerf/geometry/mesh.py:30).
//
// C ABI (ctypes):
//   mc_count  (field, nx, ny, nz, level, tri_counts) -> n_tris
//   mc_extract(field, nx, ny, nz, level, tri_counts, tri_table, max_t,
//              edge_corners, out_tris, max_tris) -> n_tris
// field is x-major: field[(x * ny + y) * nz + z]. Corner k of a cube sits
// at (k & 1, (k >> 1) & 1, (k >> 2) & 1). Triangles are 9 packed floats in
// grid coordinates; python applies spacing/origin and welds vertices.

#include <cstdint>

namespace {

const int CORNER[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

inline void gather_corners(const float* field, int64_t ny, int64_t nz,
                           int64_t x, int64_t y, int64_t z, float* vals) {
    const float* base = field + (x * ny + y) * nz;
    const float* base_x = field + ((x + 1) * ny + y) * nz;
    vals[0] = base[z];
    vals[1] = base_x[z];
    vals[2] = base[nz + z];
    vals[3] = base_x[nz + z];
    vals[4] = base[z + 1];
    vals[5] = base_x[z + 1];
    vals[6] = base[nz + z + 1];
    vals[7] = base_x[nz + z + 1];
}

inline int corner_mask(const float* vals, float level) {
    int mask = 0;
    for (int k = 0; k < 8; ++k) {
        if (vals[k] < level) mask |= (1 << k);
    }
    return mask;
}

}  // namespace

extern "C" {

int64_t mc_count(const float* field, int64_t nx, int64_t ny, int64_t nz,
                 float level, const int32_t* tri_counts) {
    int64_t n = 0;
    float vals[8];
    for (int64_t x = 0; x + 1 < nx; ++x) {
        for (int64_t y = 0; y + 1 < ny; ++y) {
            for (int64_t z = 0; z + 1 < nz; ++z) {
                gather_corners(field, ny, nz, x, y, z, vals);
                int mask = corner_mask(vals, level);
                n += tri_counts[mask];
            }
        }
    }
    return n;
}

int64_t mc_extract(const float* field, int64_t nx, int64_t ny, int64_t nz,
                   float level, const int32_t* tri_counts,
                   const int32_t* tri_table, int64_t max_t,
                   const int32_t* edge_corners,
                   float* out_tris, int64_t max_tris) {
    int64_t n_out = 0;
    float vals[8];
    float edge_pt[12][3];

    for (int64_t x = 0; x + 1 < nx; ++x) {
        for (int64_t y = 0; y + 1 < ny; ++y) {
            for (int64_t z = 0; z + 1 < nz; ++z) {
                gather_corners(field, ny, nz, x, y, z, vals);
                int mask = corner_mask(vals, level);
                int nt = tri_counts[mask];
                if (nt == 0) continue;

                const int32_t* tris = tri_table + (int64_t)mask * max_t * 3;
                // interpolate only the edges this case uses
                int used = 0;
                for (int t = 0; t < nt * 3; ++t) used |= (1 << tris[t]);
                for (int e = 0; e < 12; ++e) {
                    if (!(used & (1 << e))) continue;
                    int a = edge_corners[e * 2], b = edge_corners[e * 2 + 1];
                    float va = vals[a], vb = vals[b];
                    float denom = vb - va;
                    if (denom > -1e-12f && denom < 1e-12f) denom = 1e-12f;
                    float s = (level - va) / denom;
                    if (s < 0.f) s = 0.f;
                    if (s > 1.f) s = 1.f;
                    edge_pt[e][0] = float(x + CORNER[a][0]) * (1.f - s) + float(x + CORNER[b][0]) * s;
                    edge_pt[e][1] = float(y + CORNER[a][1]) * (1.f - s) + float(y + CORNER[b][1]) * s;
                    edge_pt[e][2] = float(z + CORNER[a][2]) * (1.f - s) + float(z + CORNER[b][2]) * s;
                }
                for (int t = 0; t < nt; ++t) {
                    if (n_out >= max_tris) return n_out;
                    float* dst = out_tris + n_out * 9;
                    for (int j = 0; j < 3; ++j) {
                        const float* p = edge_pt[tris[t * 3 + j]];
                        dst[j * 3 + 0] = p[0];
                        dst[j * 3 + 1] = p[1];
                        dst[j * 3 + 2] = p[2];
                    }
                    ++n_out;
                }
            }
        }
    }
    return n_out;
}

}  // extern "C"
