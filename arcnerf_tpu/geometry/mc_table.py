"""Marching-cubes case table, generated programmatically.

Instead of embedding the classic hand-made 256-entry triangle table, the
table is derived at import time by contour cycle tracing: for each of the
256 inside/outside corner configurations, crossed edges are paired on each
cube face with a rule that is a pure function of the face's inside pattern
(ambiguous 4-crossing faces separate the inside corners), so neighbouring
cubes make identical pairing choices and the global surface is watertight.
The pairings link every crossed edge to exactly two others (one per
adjacent face); tracing the links yields closed polygons which are fan
triangulated and oriented so normals point from inside (value < level)
toward outside.

Produces marching-cubes-class triangle counts (~half of marching tets),
matching the reference's skimage.measure.marching_cubes usage
(/root/reference/arcnerf/geometry/mesh.py:30) without the skimage
dependency.

Corner k sits at (k & 1, (k >> 1) & 1, (k >> 2) & 1) — same convention as
mesh.py's marching tets.
"""

import numpy as np

# 12 cube edges as (corner_a, corner_b) pairs, ordered lexicographically
EDGES = []
for a in range(8):
    for axis_bit in (1, 2, 4):
        b = a | axis_bit
        if b != a:
            e = (a, b)
            if e not in EDGES:
                EDGES.append(e)
EDGES = sorted(set(EDGES))
assert len(EDGES) == 12
_EDGE_ID = {e: i for i, e in enumerate(EDGES)}

# 6 faces as cyclically-ordered corner quads
_FACES = []
for axis_bit, (u_bit, v_bit) in ((1, (2, 4)), (2, (1, 4)), (4, (1, 2))):
    for val in (0, axis_bit):
        quad = [val, val | u_bit, val | u_bit | v_bit, val | v_bit]
        _FACES.append(quad)


def _face_pairings(quad, inside):
    """Pair the crossed boundary edges of one face.

    quad: 4 corner ids in cyclic order; inside: per-corner bool (8,).
    Returns list of (edge_id, edge_id) pairs. Rule for the ambiguous
    4-crossing face (diagonal inside corners): each contour segment cuts
    off ONE inside corner (the 'separated' resolution) — a function of the
    face pattern only, hence consistent across the two cubes sharing it."""
    crossings = []  # (position_in_cycle, edge_id)
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        if inside[a] != inside[b]:
            e = (min(a, b), max(a, b))
            crossings.append((i, _EDGE_ID[e]))
    if not crossings:
        return []
    if len(crossings) == 2:
        return [(crossings[0][1], crossings[1][1])]
    assert len(crossings) == 4
    # separated rule: pair each crossing with the neighbour around an
    # inside corner: boundary edge i crosses between corner i and i+1;
    # crossings at cycle positions p0<p1<p2<p3 alternate entering/leaving
    # inside runs. Pair crossings that straddle a single inside corner.
    pairs = []
    used = set()
    for (i, e) in crossings:
        if e in used:
            continue
        # the corner after this boundary edge (i+1) — if it's inside, the
        # next crossing (around that corner) closes a segment cutting it off
        nxt_corner = quad[(i + 1) % 4]
        if inside[nxt_corner]:
            for (j, e2) in crossings:
                if j == (i + 1) % 4:
                    pairs.append((e, e2))
                    used.add(e)
                    used.add(e2)
    assert len(pairs) == 2, pairs
    return pairs


def _trace_cycles(pairs_per_edge):
    """pairs_per_edge: edge_id -> set of linked edge_ids (exactly 2 when
    crossed). Returns list of closed cycles (lists of edge ids)."""
    cycles = []
    visited = set()
    for start in pairs_per_edge:
        if start in visited:
            continue
        cycle = [start]
        visited.add(start)
        prev, cur = None, start
        while True:
            nxt = [e for e in pairs_per_edge[cur] if e != prev]
            # both links may equal prev only in degenerate 2-cycles (impossible
            # on a cube); take the other link
            nxt = nxt[0] if nxt else prev
            if nxt == start:
                break
            cycle.append(nxt)
            visited.add(nxt)
            prev, cur = cur, nxt
        cycles.append(cycle)
    return cycles


def _edge_midpoint(edge_id):
    a, b = EDGES[edge_id]
    ca = np.array([a & 1, (a >> 1) & 1, (a >> 2) & 1], dtype=np.float64)
    cb = np.array([b & 1, (b >> 1) & 1, (b >> 2) & 1], dtype=np.float64)
    return 0.5 * (ca + cb)


def build_table():
    """Returns (tri_counts (256,) int32, tri_edges (256, MAX_T, 3) int32)
    where tri_edges[case, t] are edge ids of triangle t (padded with -1).
    Triangles are oriented so the right-hand normal points toward the
    OUTSIDE corners (value >= level)."""
    all_tris = []
    max_t = 0
    for mask in range(256):
        inside = [(mask >> k) & 1 == 1 for k in range(8)]
        links = {}
        for quad in _FACES:
            for e0, e1 in _face_pairings(quad, inside):
                links.setdefault(e0, set()).add(e1)
                links.setdefault(e1, set()).add(e0)
        tris = []
        if links:
            for e in links:
                assert len(links[e]) == 2, (mask, e, links)
            for cycle in _trace_cycles(links):
                pts = np.stack([_edge_midpoint(e) for e in cycle])
                # orientation: polygon normal should point from inside
                # corners toward outside corners
                n = np.zeros(3)
                for i in range(1, len(cycle) - 1):
                    n += np.cross(pts[i] - pts[0], pts[i + 1] - pts[0])
                ins = [k for k in range(8) if inside[k]]
                outs = [k for k in range(8) if not inside[k]]
                c_in = np.mean([[k & 1, (k >> 1) & 1, (k >> 2) & 1] for k in ins], axis=0)
                c_out = np.mean([[k & 1, (k >> 1) & 1, (k >> 2) & 1] for k in outs], axis=0)
                if np.dot(n, c_out - c_in) < 0:
                    cycle = cycle[::-1]
                for i in range(1, len(cycle) - 1):
                    tris.append((cycle[0], cycle[i], cycle[i + 1]))
        all_tris.append(tris)
        max_t = max(max_t, len(tris))

    counts = np.array([len(t) for t in all_tris], dtype=np.int32)
    table = np.full((256, max_t, 3), -1, dtype=np.int32)
    for m, tris in enumerate(all_tris):
        for t, tri in enumerate(tris):
            table[m, t] = tri
    return counts, table


TRI_COUNTS, TRI_TABLE = build_table()
# (E, 2) corner ids per edge, for interpolation
EDGE_CORNERS = np.array(EDGES, dtype=np.int32)
