// Quadric-error-metric mesh simplification (Garland & Heckbert '97 style).
//
// Replaces the reference's pyfqmr simplify_mesh dependency
// (/root/reference/arcnerf/geometry/mesh.py:149) with a native
// implementation: per-vertex plane quadrics (area weighted), greedy
// edge contraction by minimum quadric error with optimal-point solve,
// lazy-deletion binary heap, and a normal-flip guard.
//
// C ABI (ctypes):
//   qem_simplify(verts, nv, faces, nf, target_faces,
//                out_verts, out_faces, out_counts[2]) -> 0 ok / <0 error
// out_verts must hold nv*3 floats, out_faces nf*3 int64; the used counts
// are written to out_counts = {n_verts, n_faces}.

#include <cstdint>
#include <cmath>
#include <queue>
#include <vector>
#include <unordered_set>

namespace {

struct Quadric {
    // symmetric 4x4: A (3x3 sym), b (3), c
    double a00 = 0, a01 = 0, a02 = 0, a11 = 0, a12 = 0, a22 = 0;
    double b0 = 0, b1 = 0, b2 = 0, c = 0;

    void add_plane(double nx, double ny, double nz, double d, double w) {
        a00 += w * nx * nx; a01 += w * nx * ny; a02 += w * nx * nz;
        a11 += w * ny * ny; a12 += w * ny * nz; a22 += w * nz * nz;
        b0 += w * nx * d; b1 += w * ny * d; b2 += w * nz * d;
        c += w * d * d;
    }
    void add(const Quadric& o) {
        a00 += o.a00; a01 += o.a01; a02 += o.a02; a11 += o.a11; a12 += o.a12; a22 += o.a22;
        b0 += o.b0; b1 += o.b1; b2 += o.b2; c += o.c;
    }
    double eval(double x, double y, double z) const {
        return x * (a00 * x + 2 * a01 * y + 2 * a02 * z + 2 * b0)
             + y * (a11 * y + 2 * a12 * z + 2 * b1)
             + z * (a22 * z + 2 * b2) + c;
    }
    // solve A p = -b; false if near-singular
    bool optimal(double* p) const {
        double det = a00 * (a11 * a22 - a12 * a12)
                   - a01 * (a01 * a22 - a12 * a02)
                   + a02 * (a01 * a12 - a11 * a02);
        double scale = a00 + a11 + a22;
        if (std::fabs(det) < 1e-12 * scale * scale * scale + 1e-30) return false;
        double i00 = (a11 * a22 - a12 * a12) / det;
        double i01 = (a02 * a12 - a01 * a22) / det;
        double i02 = (a01 * a12 - a02 * a11) / det;
        double i11 = (a00 * a22 - a02 * a02) / det;
        double i12 = (a01 * a02 - a00 * a12) / det;
        double i22 = (a00 * a11 - a01 * a01) / det;
        p[0] = -(i00 * b0 + i01 * b1 + i02 * b2);
        p[1] = -(i01 * b0 + i11 * b1 + i12 * b2);
        p[2] = -(i02 * b0 + i12 * b1 + i22 * b2);
        return true;
    }
};

struct HeapEntry {
    double cost;
    int64_t u, v;       // u < v
    uint32_t ver_u, ver_v;
    double px, py, pz;  // contraction target
    bool operator<(const HeapEntry& o) const { return cost > o.cost; }  // min-heap
};

struct PairHash {
    size_t operator()(uint64_t k) const { return std::hash<uint64_t>()(k); }
};

}  // namespace

extern "C" {

int64_t qem_simplify(const float* verts_in, int64_t nv,
                     const int64_t* faces_in, int64_t nf,
                     int64_t target_faces,
                     float* out_verts, int64_t* out_faces, int64_t* out_counts) {
    if (nv <= 0 || nf <= 0) return -1;

    std::vector<double> vx(nv), vy(nv), vz(nv);
    for (int64_t i = 0; i < nv; ++i) {
        vx[i] = verts_in[i * 3];
        vy[i] = verts_in[i * 3 + 1];
        vz[i] = verts_in[i * 3 + 2];
    }
    std::vector<int64_t> f(faces_in, faces_in + nf * 3);
    std::vector<bool> face_alive(nf, true);
    std::vector<bool> vert_alive(nv, true);
    std::vector<uint32_t> version(nv, 0);
    std::vector<Quadric> q(nv);

    // per-vertex incident-face lists
    std::vector<std::vector<int64_t>> vfaces(nv);
    int64_t alive_faces = 0;
    for (int64_t t = 0; t < nf; ++t) {
        int64_t a = f[t * 3], b = f[t * 3 + 1], c3 = f[t * 3 + 2];
        if (a == b || b == c3 || a == c3 || a >= nv || b >= nv || c3 >= nv) {
            face_alive[t] = false;
            continue;
        }
        ++alive_faces;
        vfaces[a].push_back(t);
        vfaces[b].push_back(t);
        vfaces[c3].push_back(t);
        // area-weighted plane quadric
        double e1x = vx[b] - vx[a], e1y = vy[b] - vy[a], e1z = vz[b] - vz[a];
        double e2x = vx[c3] - vx[a], e2y = vy[c3] - vy[a], e2z = vz[c3] - vz[a];
        double nx = e1y * e2z - e1z * e2y;
        double ny = e1z * e2x - e1x * e2z;
        double nz = e1x * e2y - e1y * e2x;
        double len = std::sqrt(nx * nx + ny * ny + nz * nz);
        if (len < 1e-30) continue;
        double area = 0.5 * len;
        nx /= len; ny /= len; nz /= len;
        double d = -(nx * vx[a] + ny * vy[a] + nz * vz[a]);
        Quadric pq;
        pq.add_plane(nx, ny, nz, d, area);
        q[a].add(pq); q[b].add(pq); q[c3].add(pq);
    }

    auto pack = [](int64_t u, int64_t v) -> uint64_t {
        if (u > v) { int64_t t = u; u = v; v = t; }
        return (uint64_t(u) << 32) | uint64_t(v);
    };

    std::priority_queue<HeapEntry> heap;
    std::unordered_set<uint64_t, PairHash> edge_set;

    auto push_edge = [&](int64_t u, int64_t v) {
        if (u == v || !vert_alive[u] || !vert_alive[v]) return;
        if (u > v) { int64_t t = u; u = v; v = t; }
        Quadric sum = q[u];
        sum.add(q[v]);
        double p[3];
        double cost;
        if (sum.optimal(p)) {
            cost = sum.eval(p[0], p[1], p[2]);
        } else {
            // try endpoints + midpoint
            double mx = 0.5 * (vx[u] + vx[v]), my = 0.5 * (vy[u] + vy[v]), mz = 0.5 * (vz[u] + vz[v]);
            double cu = sum.eval(vx[u], vy[u], vz[u]);
            double cv = sum.eval(vx[v], vy[v], vz[v]);
            double cm = sum.eval(mx, my, mz);
            if (cu <= cv && cu <= cm) { p[0] = vx[u]; p[1] = vy[u]; p[2] = vz[u]; cost = cu; }
            else if (cv <= cm) { p[0] = vx[v]; p[1] = vy[v]; p[2] = vz[v]; cost = cv; }
            else { p[0] = mx; p[1] = my; p[2] = mz; cost = cm; }
        }
        heap.push({cost, u, v, version[u], version[v], p[0], p[1], p[2]});
    };

    for (int64_t t = 0; t < nf; ++t) {
        if (!face_alive[t]) continue;
        for (int j = 0; j < 3; ++j) {
            int64_t u = f[t * 3 + j], v = f[t * 3 + (j + 1) % 3];
            uint64_t key = pack(u, v);
            if (edge_set.insert(key).second) push_edge(u, v);
        }
    }

    // would contracting (u, v) -> p flip any surviving face around u/v?
    auto flips = [&](int64_t u, int64_t v, double px, double py, double pz) {
        for (int side = 0; side < 2; ++side) {
            int64_t w = side ? v : u;
            for (int64_t t : vfaces[w]) {
                if (!face_alive[t]) continue;
                int64_t a = f[t * 3], b = f[t * 3 + 1], c3 = f[t * 3 + 2];
                // faces containing both u and v die — skip
                bool has_u = (a == u || b == u || c3 == u);
                bool has_v = (a == v || b == v || c3 == v);
                if (has_u && has_v) continue;
                double ox[3] = {vx[a], vx[b], vx[c3]};
                double oy[3] = {vy[a], vy[b], vy[c3]};
                double oz[3] = {vz[a], vz[b], vz[c3]};
                double e1x = ox[1] - ox[0], e1y = oy[1] - oy[0], e1z = oz[1] - oz[0];
                double e2x = ox[2] - ox[0], e2y = oy[2] - oy[0], e2z = oz[2] - oz[0];
                double n0x = e1y * e2z - e1z * e2y, n0y = e1z * e2x - e1x * e2z, n0z = e1x * e2y - e1y * e2x;
                // replace w by p
                int64_t ids[3] = {a, b, c3};
                for (int k = 0; k < 3; ++k) {
                    if (ids[k] == w) { ox[k] = px; oy[k] = py; oz[k] = pz; }
                }
                e1x = ox[1] - ox[0]; e1y = oy[1] - oy[0]; e1z = oz[1] - oz[0];
                e2x = ox[2] - ox[0]; e2y = oy[2] - oy[0]; e2z = oz[2] - oz[0];
                double n1x = e1y * e2z - e1z * e2y, n1y = e1z * e2x - e1x * e2z, n1z = e1x * e2y - e1y * e2x;
                if (n0x * n1x + n0y * n1y + n0z * n1z < 0) return true;
            }
        }
        return false;
    };

    while (alive_faces > target_faces && !heap.empty()) {
        HeapEntry e = heap.top();
        heap.pop();
        int64_t u = e.u, v = e.v;
        if (!vert_alive[u] || !vert_alive[v]) continue;
        if (version[u] != e.ver_u || version[v] != e.ver_v) continue;  // stale
        if (flips(u, v, e.px, e.py, e.pz)) continue;

        // contract v into u at p
        vx[u] = e.px; vy[u] = e.py; vz[u] = e.pz;
        q[u].add(q[v]);
        vert_alive[v] = false;
        ++version[u];

        // rewire v's faces
        for (int64_t t : vfaces[v]) {
            if (!face_alive[t]) continue;
            int64_t* tv = &f[t * 3];
            bool has_u = (tv[0] == u || tv[1] == u || tv[2] == u);
            for (int j = 0; j < 3; ++j) {
                if (tv[j] == v) tv[j] = u;
            }
            if (has_u) {  // face contained the edge -> degenerate
                face_alive[t] = false;
                --alive_faces;
            } else {
                vfaces[u].push_back(t);
            }
        }
        vfaces[v].clear();
        vfaces[v].shrink_to_fit();

        // refresh candidate edges around u
        std::unordered_set<int64_t> nbrs;
        for (int64_t t : vfaces[u]) {
            if (!face_alive[t]) continue;
            for (int j = 0; j < 3; ++j) {
                int64_t w = f[t * 3 + j];
                if (w != u && vert_alive[w]) nbrs.insert(w);
            }
        }
        for (int64_t w : nbrs) push_edge(u, w);
    }

    // compact output
    std::vector<int64_t> remap(nv, -1);
    int64_t n_out_v = 0;
    for (int64_t t = 0; t < nf; ++t) {
        if (!face_alive[t]) continue;
        for (int j = 0; j < 3; ++j) {
            int64_t a = f[t * 3 + j];
            if (remap[a] < 0) {
                remap[a] = n_out_v;
                out_verts[n_out_v * 3] = float(vx[a]);
                out_verts[n_out_v * 3 + 1] = float(vy[a]);
                out_verts[n_out_v * 3 + 2] = float(vz[a]);
                ++n_out_v;
            }
        }
    }
    int64_t n_out_f = 0;
    for (int64_t t = 0; t < nf; ++t) {
        if (!face_alive[t]) continue;
        out_faces[n_out_f * 3] = remap[f[t * 3]];
        out_faces[n_out_f * 3 + 1] = remap[f[t * 3 + 1]];
        out_faces[n_out_f * 3 + 2] = remap[f[t * 3 + 2]];
        ++n_out_f;
    }
    out_counts[0] = n_out_v;
    out_counts[1] = n_out_f;
    return 0;
}

}  // extern "C"
