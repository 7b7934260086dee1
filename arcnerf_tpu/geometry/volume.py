"""Dense voxel volume: geometry bookkeeping + functional occupancy state.

Capability parity with /root/reference/arcnerf/geometry/volume.py (Volume
class, 1158 LoC): corner/grid-point bookkeeping, xyz<->flatten index
conversion (:573/:588), trilinear interpolation (:454/:533), ray-volume
intersection incl. occupied-subvolume (:624/:653), voxel bitfield
(:741-:957) and opacity field (:959-:1018) maintenance, bound/dense/occupied
visualization lines and faces (:1020-1158).

TPU-native design: ``Volume`` holds only *static* geometry (python floats /
small numpy arrays that become jit constants). Occupancy state — the bool
``bitfield`` (n_grid^3) and float ``opafield`` — is NOT stored on the
object; every method that needs it takes/returns it explicitly so it can
live inside the jitted train-state pytree and be updated functionally.
Anything data-dependent (occupied-voxel queries) comes back as masks, never
dynamic-length index lists.
"""

import numpy as np

import jax.numpy as jnp

from .ray import aabb_ray_intersection, get_ray_points_by_zvals

# corner-permutation order shared with the reference (volume.py:157-183):
# z is the outer bit, then x, then y.
EIGHT_PERMUTATION = np.array(
    [
        [0, 0, 0],
        [0, 1, 0],
        [1, 0, 0],
        [1, 1, 0],
        [0, 0, 1],
        [0, 1, 1],
        [1, 0, 1],
        [1, 1, 1],
    ],
    dtype=np.int32,
)


def convert_xyz_index_to_flatten_index(xyz, n):
    """(B, 3) int -> (B,) flatten = x*n^2 + y*n + z."""
    return xyz[..., 0] * (n**2) + xyz[..., 1] * n + xyz[..., 2]


def convert_flatten_index_to_xyz_index(flat, n):
    """(B,) -> (B, 3)."""
    z = flat % n
    y = (flat // n) % n
    x = flat // (n * n)
    return jnp.stack([x, y, z], axis=-1)


class Volume:
    """Axis-aligned voxel volume centered at ``origin`` with ``n_grid``
    voxels per side. All geometry is static python/numpy -> jit constants."""

    def __init__(self, n_grid=None, origin=(0, 0, 0), side=None, xyz_len=None, dtype=jnp.float32, **kwargs):
        self.n_grid = n_grid
        self.dtype = dtype
        self.origin = np.zeros(3, dtype=np.float32)
        self.xyz_len = np.zeros(3, dtype=np.float32)
        if origin is not None and (side is not None or xyz_len is not None):
            self.set_params(origin, side, xyz_len)

    # ------------------------------------------------------------------ setup
    def set_params(self, origin, side, xyz_len):
        assert side is not None or xyz_len is not None, "specify side or xyz_len"
        self.origin = np.asarray(origin, dtype=np.float32)
        if side is not None:
            self.xyz_len = np.array([side, side, side], dtype=np.float32)
        else:
            self.xyz_len = np.asarray(xyz_len, dtype=np.float32)

    def set_n_grid(self, n_grid):
        self.n_grid = n_grid

    def expand_len(self, factor):
        self.xyz_len = self.xyz_len * factor

    # --------------------------------------------------------------- geometry
    def get_n_grid(self):
        return self.n_grid

    def get_n_voxel(self):
        return self.n_grid**3

    def get_n_grid_pts(self):
        return (self.n_grid + 1) ** 3

    def get_origin(self):
        return jnp.asarray(self.origin, dtype=self.dtype)

    def get_len(self):
        return tuple(float(v) for v in self.xyz_len)

    def get_range(self):
        """(3, 2) min/max per axis."""
        half = self.xyz_len / 2.0
        return jnp.asarray(np.stack([self.origin - half, self.origin + half], axis=-1), dtype=self.dtype)

    def get_range_np(self):
        half = self.xyz_len / 2.0
        return np.stack([self.origin - half, self.origin + half], axis=-1)

    def get_diag_len(self):
        return float(np.linalg.norm(self.xyz_len))

    def get_voxel_size(self, to_list=True):
        xyz_s = self.xyz_len / self.n_grid
        if to_list:
            return float(xyz_s[0]), float(xyz_s[1]), float(xyz_s[2])
        return jnp.asarray(xyz_s, dtype=self.dtype)

    def get_corner(self, in_grid=False):
        """(8, 3) corner points (reference order)."""
        rng = self.get_range_np()
        corners = rng[np.arange(3)[None, :], EIGHT_PERMUTATION]  # (8, 3)
        corners = jnp.asarray(corners, dtype=self.dtype)
        return corners.reshape(2, 2, 2, 3) if in_grid else corners

    def get_grid_pts(self, in_grid=False):
        """((n_grid+1)^3, 3) voxel-corner lattice."""
        rng = self.get_range_np()
        axes = [np.linspace(rng[i, 0], rng[i, 1], self.n_grid + 1) for i in range(3)]
        pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).astype(np.float32)
        pts = jnp.asarray(pts, dtype=self.dtype)
        return pts if in_grid else pts.reshape(-1, 3)

    def get_volume_pts(self, in_grid=False):
        """(n_grid^3, 3) voxel-center lattice."""
        rng = self.get_range_np()
        vs = self.xyz_len / self.n_grid
        axes = [np.linspace(rng[i, 0] + 0.5 * vs[i], rng[i, 1] - 0.5 * vs[i], self.n_grid) for i in range(3)]
        pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).astype(np.float32)
        pts = jnp.asarray(pts, dtype=self.dtype)
        return pts if in_grid else pts.reshape(-1, 3)

    def get_full_voxel_idx(self, flatten=False):
        idx = np.stack(np.meshgrid(*([np.arange(self.n_grid)] * 3), indexing="ij"), axis=-1)
        idx = jnp.asarray(idx, dtype=jnp.int32)
        return idx.reshape(-1, 3) if flatten else idx

    def get_eight_permutation_index(self):
        return jnp.asarray(EIGHT_PERMUTATION)

    # -------------------------------------------------------------- indexing
    def get_voxel_idx_from_xyz(self, pts):
        """pts (B, 3) -> voxel_idx (B, 3) int32 (-1 outside), valid (B,)."""
        vs = self.get_voxel_size(to_list=False)
        start = self.get_range()[:, 0]
        fidx = (pts - start) / vs
        valid = jnp.all(fidx >= 0, axis=-1) & jnp.all(fidx < float(self.n_grid), axis=-1)
        idx = jnp.floor(fidx).astype(jnp.int32)
        idx = jnp.where(valid[:, None], idx, -1)
        return idx, valid

    def get_grid_pts_idx_by_voxel_idx(self, voxel_idx, flatten=True):
        """(B, 3) -> (B, 8) flattened corner indices (or (B, 8, 3))."""
        perm = self.get_eight_permutation_index()
        idx = voxel_idx[:, None, :] + perm[None, :, :]  # (B, 8, 3)
        if flatten:
            return convert_xyz_index_to_flatten_index(idx, self.n_grid + 1)
        return idx

    def get_grid_pts_by_voxel_idx(self, voxel_idx):
        """(B, 3) -> (B, 8, 3) corner xyz computed directly."""
        idx = self.get_grid_pts_idx_by_voxel_idx(voxel_idx, flatten=False)
        vs = self.get_voxel_size(to_list=False)
        start = self.get_range()[:, 0]
        return idx.astype(self.dtype) * vs + start

    def get_voxel_pts_by_voxel_idx(self, voxel_idx):
        """(B, 3) -> (B, 3) voxel center xyz."""
        vs = self.get_voxel_size(to_list=False)
        start = self.get_range()[:, 0]
        return voxel_idx.astype(self.dtype) * vs + 0.5 * vs + start

    @staticmethod
    def check_pts_in_grid_boundary(pts, grid_pts):
        """pts (B, 3), grid_pts (B, 8, 3) or (8, 3) -> (B,) bool."""
        if grid_pts.ndim == 2:
            grid_pts = jnp.broadcast_to(grid_pts[None], (pts.shape[0],) + grid_pts.shape)
        lo = jnp.min(grid_pts, axis=1)
        hi = jnp.max(grid_pts, axis=1)
        return jnp.all((pts >= lo) & (pts < hi), axis=-1)

    # ----------------------------------------------------------- interpolation
    def cal_weights_to_grid_pts(self, pts, grid_pts):
        """Trilinear weights of pts vs their 8 corners. (B, 3), (B, 8, 3) -> (B, 8)."""
        w = (pts - grid_pts[:, 0, :]) / (grid_pts[:, -1, :] - grid_pts[:, 0, :])
        w = jnp.clip(w, 0.0, 1.0)
        perm = self.get_eight_permutation_index().astype(w.dtype)  # (8, 3)
        weights = (
            (perm[:, 0] * w[:, 0:1] + (1 - perm[:, 0]) * (1 - w[:, 0:1]))
            * (perm[:, 1] * w[:, 1:2] + (1 - perm[:, 1]) * (1 - w[:, 1:2]))
            * (perm[:, 2] * w[:, 2:3] + (1 - perm[:, 2]) * (1 - w[:, 2:3]))
        )
        return weights

    def get_voxel_grid_info_from_xyz(self, pts):
        """pts (B, 3) -> voxel_idx (B, 3), valid (B,), grid_pts_idx (B, 8),
        grid_pts (B, 8, 3), weights (B, 8). Invalid rows hold clamped
        (safe-to-gather) values — mask with ``valid``."""
        voxel_idx, valid = self.get_voxel_idx_from_xyz(pts)
        safe_idx = jnp.clip(voxel_idx, 0, self.n_grid - 1)
        grid_pts_idx = self.get_grid_pts_idx_by_voxel_idx(safe_idx)
        grid_pts = self.get_grid_pts_by_voxel_idx(safe_idx)
        weights = self.cal_weights_to_grid_pts(pts, grid_pts)
        return voxel_idx, valid, grid_pts_idx, grid_pts, weights

    @staticmethod
    def interpolate_values_by_weights(values, weights):
        """values (B, 8, ...) * weights (B, 8) -> (B, ...)."""
        w = weights.reshape(weights.shape + (1,) * (values.ndim - 2))
        return jnp.sum(values * w, axis=1)

    def interpolate(self, values, weights, voxel_idx):
        """Gather corner values ((n+1)^3, ...) and blend. -> (B, ...)."""
        grid_pts_idx = self.get_grid_pts_idx_by_voxel_idx(jnp.clip(voxel_idx, 0, self.n_grid - 1))
        gathered = values[grid_pts_idx]  # (B, 8, ...)
        return self.interpolate_values_by_weights(gathered, weights)

    @staticmethod
    def collect_grid_pts_values(values, grid_pts_idx):
        """values (N, ...), grid_pts_idx (B, 8) -> (B, 8, ...)."""
        return values[grid_pts_idx]

    # --------------------------------------------------------------- bitfield
    def create_bitfield(self, init_occ=True):
        """-> (n_grid, n_grid, n_grid) bool array (caller owns the state)."""
        fn = jnp.ones if init_occ else jnp.zeros
        return fn((self.n_grid,) * 3, dtype=bool)

    @staticmethod
    def update_bitfield(bitfield, occupancy, ops="and"):
        """Combine new occupancy into bitfield; returns the new bitfield."""
        occupancy = occupancy.reshape(bitfield.shape)
        if ops == "and":
            return bitfield & occupancy
        if ops == "or":
            return bitfield | occupancy
        if ops == "overwrite":
            return occupancy
        raise NotImplementedError("ops {} not supported".format(ops))

    def update_bitfield_by_voxel_idx(self, bitfield, voxel_idx, occ=True, valid=None):
        """Scatter ``occ`` at voxel_idx (B, 3). ``valid`` masks rows."""
        flat = bitfield.reshape(-1)
        fidx = convert_xyz_index_to_flatten_index(jnp.clip(voxel_idx, 0, self.n_grid - 1), self.n_grid)
        updates = jnp.full(fidx.shape, occ, dtype=bool)
        if valid is not None:
            updates = jnp.where(valid, updates, flat[fidx])
        return flat.at[fidx].set(updates).reshape(bitfield.shape)

    @staticmethod
    def get_n_occupied_voxel(bitfield):
        return jnp.sum(bitfield)

    def get_occupied_bounding_range(self, bitfield):
        """(3, 2) tight AABB around occupied voxels (full range if empty).
        Branch-free: min/max over masked voxel-center coordinates."""
        vs = self.get_voxel_size(to_list=False)
        start = self.get_range()[:, 0]
        any_occ = jnp.any(bitfield)
        ranges = []
        for axis in range(3):
            occ_on_axis = jnp.any(bitfield, axis=tuple(d for d in range(3) if d != axis))  # (n_grid,)
            coords = jnp.arange(self.n_grid, dtype=self.dtype) * vs[axis] + 0.5 * vs[axis] + start[axis]
            lo = jnp.min(jnp.where(occ_on_axis, coords, jnp.inf)) - 0.5 * vs[axis]
            hi = jnp.max(jnp.where(occ_on_axis, coords, -jnp.inf)) + 0.5 * vs[axis]
            full = self.get_range()[axis]
            lo = jnp.where(any_occ, lo, full[0])
            hi = jnp.where(any_occ, hi, full[1])
            ranges.append(jnp.stack([lo, hi]))
        return jnp.stack(ranges, axis=0)

    def check_pts_in_occ_voxel(self, pts, bitfield):
        """pts (B, 3) -> (B,) bool: in-volume AND in an occupied voxel.
        O(B) gather — replaces the reference's CUDA kernel and its
        O(B * N_occ) torch fallback (volume.py:929)."""
        voxel_idx, valid = self.get_voxel_idx_from_xyz(pts)
        safe = jnp.clip(voxel_idx, 0, self.n_grid - 1)
        occ = bitfield[safe[:, 0], safe[:, 1], safe[:, 2]]
        return valid & occ

    def get_flat_voxel_idx_from_coords(self, x, y, z):
        """Per-axis coords (any same shape) -> (flat voxel idx, valid).

        SoA form of get_voxel_idx_from_xyz: three clean-layout planes
        instead of a (..., 3) tensor whose minor dim tile-pads 3->128 on
        TPU (a 42x HBM blowup at (B, N, 3) sample grids — measured 191 ms
        for the materialized pts at the 32k-ray bucket)."""
        vs = self.get_voxel_size()
        start = self.get_range_np()[:, 0]
        n = self.n_grid
        fx = (x - float(start[0])) / vs[0]
        fy = (y - float(start[1])) / vs[1]
        fz = (z - float(start[2])) / vs[2]
        valid = (fx >= 0) & (fx < n) & (fy >= 0) & (fy < n) & (fz >= 0) & (fz < n)
        ix = jnp.clip(fx.astype(jnp.int32), 0, n - 1)
        iy = jnp.clip(fy.astype(jnp.int32), 0, n - 1)
        iz = jnp.clip(fz.astype(jnp.int32), 0, n - 1)
        return (ix * n + iy) * n + iz, valid

    def check_flat_in_occ_voxel(self, flat_idx, valid, bitfield):
        """Occupancy lookup by flat voxel index; returns valid & occupied.

        On TPU uses a ROW-FORM gather — full 128-lane uint8 rows + fused
        one-hot lane extract (33.5 ms vs 68.2 ms for the element-granular
        3d-index gather at 4.2M points, scripts/probe_hotpath.py). On CPU
        (and for grids not divisible by 128) a flat take is faster."""
        import jax

        n_voxel = self.get_n_voxel()
        if jax.default_backend() == "tpu" and n_voxel % 128 == 0:
            rows = bitfield.reshape(n_voxel // 128, 128).astype(jnp.uint8)
            fr = flat_idx.reshape(-1)
            r = jnp.take(rows, fr >> 7, axis=0)  # (P, 128)
            lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            hit = jnp.sum(jnp.where(lanes == (fr & 127)[:, None], r, 0), axis=1) > 0
            return valid & hit.reshape(flat_idx.shape)
        occ = jnp.take(bitfield.reshape(-1), flat_idx.reshape(-1)).reshape(flat_idx.shape)
        return valid & occ

    # --------------------------------------------------------------- opafield
    def create_opafield(self, init=0.0):
        """-> (n_grid, n_grid, n_grid) float opacity field."""
        return jnp.full((self.n_grid,) * 3, init, dtype=self.dtype)

    def update_opafield_by_voxel_idx(self, opafield, voxel_idx, opacity, ema=None, valid=None):
        """Scatter new opacity (optionally EMA-max vs old); only cells with
        old value >= 0 update. Returns the new opafield."""
        safe = jnp.clip(voxel_idx, 0, self.n_grid - 1)
        old = opafield[safe[:, 0], safe[:, 1], safe[:, 2]]
        new = opacity if ema is None else jnp.maximum(old * ema, opacity)
        new = jnp.where(old >= 0, new, old)
        if valid is not None:
            new = jnp.where(valid, new, old)
        return opafield.at[safe[:, 0], safe[:, 1], safe[:, 2]].set(new)

    @staticmethod
    def get_mean_voxel_opacity(opafield):
        return jnp.mean(jnp.clip(opafield, 0.0, None))

    @staticmethod
    def get_mean_occ_voxel_opacity(opafield, bitfield):
        clipped = jnp.clip(opafield, 0.0, None)
        n = jnp.maximum(jnp.sum(bitfield), 1)
        return jnp.sum(jnp.where(bitfield, clipped, 0.0)) / n

    def update_bitfield_by_opafield(self, bitfield, opafield, threshold=0.01, ops="and"):
        """Occupancy = opacity >= min(mean, threshold). Returns new bitfield."""
        thres = jnp.minimum(self.get_mean_voxel_opacity(opafield), threshold)
        return self.update_bitfield(bitfield, opafield >= thres, ops)

    # ------------------------------------------------------------ intersection
    def ray_volume_intersection(self, rays_o, rays_d, bitfield=None, in_occ_voxel=False):
        """Ray/volume near-far.

        Returns near (N, 1), far (N, 1), pts (N, 2, 3), mask (N, 1).
        With ``in_occ_voxel`` the AABB is the tight bound of occupied voxels
        (always the "force" strategy of the reference — static shapes).
        """
        if in_occ_voxel:
            assert bitfield is not None, "need bitfield for occupied intersection"
            aabb = self.get_occupied_bounding_range(bitfield)[None]
        else:
            aabb = self.get_range()[None]
        near, far, pts, mask = aabb_ray_intersection(rays_o, rays_d, aabb)
        return near, far, pts[:, 0], mask

    def get_ray_pass_through(self, rays_o, rays_d):
        """(n_grid, n_grid, n_grid) bool: voxels hit by any ray. Computed by
        sampling along each ray (dense per-voxel aabb tests are O(N * n^3))."""
        near, far, _, mask = self.ray_volume_intersection(rays_o, rays_d)
        n_steps = self.n_grid * 4
        t = jnp.linspace(0.0, 1.0, n_steps)[None, :]
        zvals = near + (far - near) * t  # (N_rays, n_steps)
        pts = get_ray_points_by_zvals(rays_o, rays_d, zvals).reshape(-1, 3)
        voxel_idx, valid = self.get_voxel_idx_from_xyz(pts)
        valid = valid & jnp.repeat(mask[:, 0], n_steps)
        field = jnp.zeros((self.n_grid,) * 3, dtype=bool)
        return self.update_bitfield_by_voxel_idx(field, voxel_idx, occ=True, valid=valid)

    # ---------------------------------------------------------- visualization
    @staticmethod
    def _lines_from_corners(corners):
        """corners (8, 3) in EIGHT_PERMUTATION order -> 12 edge segments."""
        edges = [
            (0, 1), (0, 2), (1, 3), (2, 3),  # bottom z face
            (4, 5), (4, 6), (5, 7), (6, 7),  # top z face
            (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
        ]
        return [np.stack([corners[a], corners[b]]) for a, b in edges]

    def get_bound_lines(self):
        """List of 12 np(2, 3) outer-boundary segments."""
        return self._lines_from_corners(np.asarray(self.get_corner()))

    def get_dense_lines(self):
        """All voxel edges (list of np(2, 3))."""
        lines = []
        idx = np.asarray(self.get_full_voxel_idx(flatten=True))
        corners = np.asarray(self.get_grid_pts_by_voxel_idx(jnp.asarray(idx)))
        for c in corners:
            lines.extend(self._lines_from_corners(c))
        return lines

    def get_occupied_lines(self, bitfield):
        """Edges of occupied voxels only (host-side; dynamic length OK)."""
        occ = np.argwhere(np.asarray(bitfield))
        corners = np.asarray(self.get_grid_pts_by_voxel_idx(jnp.asarray(occ, dtype=jnp.int32)))
        lines = []
        for c in corners:
            lines.extend(self._lines_from_corners(c))
        return lines

    @staticmethod
    def _faces_from_corners(corners):
        """corners (8, 3) -> (6, 4, 3) quad faces."""
        quads = [
            (0, 1, 3, 2), (4, 5, 7, 6),  # z faces
            (0, 1, 5, 4), (2, 3, 7, 6),  # x faces
            (0, 2, 6, 4), (1, 3, 7, 5),  # y faces
        ]
        return np.stack([np.stack([corners[i] for i in q]) for q in quads])

    def get_bound_faces(self):
        return self._faces_from_corners(np.asarray(self.get_corner()))

    def get_occupied_faces(self, bitfield):
        occ = np.argwhere(np.asarray(bitfield))
        corners = np.asarray(self.get_grid_pts_by_voxel_idx(jnp.asarray(occ, dtype=jnp.int32)))
        return np.concatenate([self._faces_from_corners(c) for c in corners], axis=0) if len(occ) else None
