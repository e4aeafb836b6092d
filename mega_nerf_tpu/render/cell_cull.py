"""Exact per-chunk submodule culling for merged MegaNeRF rendering.

The dense mixture blend (`models/mega.mega_apply`) evaluates every submodule
on every sample point — K x MLP FLOPs per chunk regardless of where the
chunk's rays actually travel (PERF.md round 4: the K=8 merged render runs at
13.5k rays/s vs 55.3k for a single NeRF; the reference pays the same K-fold
cost through its per-submodule boolean indexing,
`/root/reference/mega_nerf/models/mega_nerf.py:34-49`). But `cluster_weights`
has COMPACT SUPPORT: a submodule's weight is exactly zero wherever its
centroid distance exceeds boundary_margin x the nearest centroid's distance
(`models/mega.py:59`; reference `mega_nerf.py:21-27`). Every foreground
sample position of a chunk of camera rays lies inside the axis-aligned
bounding box of the rays' [near, far] segment endpoints (segments are convex
combinations of their endpoints; an AABB is convex), so a submodule whose
weight is provably zero everywhere in that box can be dropped from the
chunk's stacked parameters without changing a single output value.

The per-cell proof over a box B (interval arithmetic):

    lb_j = min_{p in B} d_j(p)     -- point-to-box distance to centroid j
    ub_k = max_{p in B} d_k(p)     -- distance to the farthest corner of B
    min_k d_k(p) <= min_k ub_k     -- for every p in B

so ``lb_j > margin * min_k ub_k`` implies ``d_j(p) > margin * min_d(p)``
for all p in B, which is exactly the condition under which
`cluster_weights` zeroes cell j (strict ``>`` in `mega.py:59`); for
margin == 1 (hard assignment) the same bound proves j can never win the
argmin. The weights of the SURVIVING cells are unchanged by the drop: the
per-point min distance is attained by a surviving cell, and the
inverse-distance normalizer only sums within-margin (surviving) entries.

Culling is host-side and cheap (O(rays + K) numpy per chunk); the renderer
(`runtime.runner.Runner.render_image`) gathers the active rows of the
stacked params once per distinct active set and traces one render per
active COUNT — the culled centroids enter the jitted render as a traced
argument, so two chunks with different active sets of the same size share a
compilation. TPU-honest: static shapes per compile, dense math on device,
the dynamic-shape routing decision on the host where it is free.

Background submodules are never culled: NeRF++ background samples route by
their real-world coordinates out to unbounded radii (reference
`mega_nerf.py:36`, `rendering.py:52-56`), where all centroid distances
converge to each other and every cell falls within any margin > 1.
"""

from __future__ import annotations

import numpy as np

# Relative slack on the cull threshold. The bound itself is proved in real
# arithmetic; the device evaluates `cluster_weights` in float32, so a cell
# sitting within float32 rounding of the threshold could get a ~1e-7-mass
# weight on device while host float64 math culls it. The slack keeps such
# razor-edge cells active — culling stays EXACT, never approximate.
_EDGE_SLACK = 1e-5


def clamp_rays_to_fg(
    rays: np.ndarray,
    sphere_center=None,
    sphere_radius=None,
) -> np.ndarray:
    """Copy of `rays` with far clamped to the foreground ellipsoid exit.

    Scenes with a NeRF++ background carry far ~ 1e5 (the bg model owns
    everything past the ellipsoid, `render/rendering.py:660-667`), so a
    cull box built from raw [near, far] endpoints spans the whole scene
    and culls NOTHING — measured on-chip: the 4x2 drone flythrough showed
    zero steady-state cull win before this clamp. Foreground samples stop
    at min(far, ellipsoid exit), so the box may too.

    Host replica of `ops/geometry.intersect_sphere` (reference
    `rendering.py:396-417`) in float64, inflated by 1e-5 relative so f32
    device rounding can never place a sample past the host's box.
    Always returns a fresh float64 array (callers mutate it in place)."""
    if sphere_radius is None:
        return np.array(rays, np.float64)
    rays = np.asarray(rays, np.float64)
    c = np.asarray(sphere_center, np.float64)
    r = np.asarray(sphere_radius, np.float64)
    o = (rays[:, :3] - c) / r
    d = rays[:, 3:6] / r
    d1 = -(d * o).sum(-1) / (d * d).sum(-1)
    p = o + d1[:, None] * d
    d2 = np.sqrt(np.maximum(1.0 - (p * p).sum(-1), 0.0)) / np.sqrt(
        (d * d).sum(-1)
    )
    exit_t = np.maximum(d1 + d2, rays[:, 6]) * (1.0 + 1e-5)
    out = rays.copy()
    out[:, 7] = np.minimum(rays[:, 7], exit_t)
    return out


def chunk_point_box(rays: np.ndarray, cluster_dim_start: int = 0):
    """AABB containing every fg sample position of a chunk of rays.

    rays: (N, 8) float [origin(3) | direction(3) | near | far] — the 8-float
    record of `ops/rays.py`. Foreground samples lie at o + t*d with
    t in [near, t_max], t_max <= far (sphere/altitude truncation only ever
    SHRINKS the interval, `render/rendering.py`), so the box over the
    {t=near, t=far} endpoints contains them all. Returns (lo, hi) over the
    routing dims [cluster_dim_start:3] (cluster_2d drops altitude, matching
    `models/mega.cluster_weights`).
    """
    rays = np.asarray(rays, np.float64)
    o, d = rays[:, :3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    pts = np.concatenate([o + near * d, o + far * d], axis=0)
    pts = pts[:, cluster_dim_start:3]
    return pts.min(axis=0), pts.max(axis=0)


def active_cells(
    rays: np.ndarray,
    centroids: np.ndarray,
    boundary_margin: float,
    cluster_dim_start: int = 0,
) -> np.ndarray:
    """(K,) bool mask of submodules that can have nonzero routing weight for
    ANY foreground sample of these rays. Conservative (never culls a
    contributing cell) and typically tight for localized camera frusta.

    Rays with a zero-width interval (far <= near) are excluded from the
    box: they arise only from occupancy-collapsed bounds
    (render/ray_bounds.py), where render_rays zeroes the trailing
    last_delta so the ray's fg contribution — hence its routing — is
    exactly zero. Without the exclusion one sky pixel per tile drags the
    box out to the ellipsoid exit and no horizon tile ever culls.
    """
    rays = np.asarray(rays)
    live = rays[:, 7] > rays[:, 6]
    if not live.all() and live.any():
        rays = rays[live]
    # All-collapsed chunk: every fg weight is zero — any non-empty mask is
    # exact; fall through with the original rays for determinism.
    lo, hi = chunk_point_box(rays, cluster_dim_start)
    return _active_cells_box(lo, hi, centroids, boundary_margin,
                             cluster_dim_start)


def active_cells_for_points(
    points: np.ndarray,
    centroids: np.ndarray,
    boundary_margin: float,
    cluster_dim_start: int = 0,
) -> np.ndarray:
    """Same mask for a batch of QUERY POINTS (no rays): used by the octree
    bake (`scripts/create_octree.py`), whose sigma/RGBA probes walk the
    grid/leaf list in spatial order — each chunk's AABB touches 1-2 cells
    of the grid, so the dense blend's K x FLOPs collapse to the local
    cells'."""
    pts = np.asarray(points, np.float64)[:, cluster_dim_start:3]
    return _active_cells_box(pts.min(axis=0), pts.max(axis=0), centroids,
                             boundary_margin, cluster_dim_start)


def bucket_mask(mask: np.ndarray) -> np.ndarray:
    """Pad an active-cell mask with lowest-index inactive cells up to the
    next power-of-two size (capped at K). Exact: a padded-in cell was
    proved zero-weight everywhere in the chunk's box, and the surviving
    cells' weights don't depend on which zero cells ride along (the
    per-point min distance is attained by an active cell)."""
    k = mask.size
    n_active = int(mask.sum())
    target = 1
    while target < n_active:
        target *= 2
    target = min(target, k)
    if target == n_active:
        return mask
    mask = mask.copy()
    mask[np.flatnonzero(~mask)[: target - n_active]] = True
    return mask


class ParamSubsetCache:
    """Mask-keyed cache of (stacked-params subset, centroids subset).

    One device gather per distinct active set — not one per chunk (each
    eager dispatch costs ~0.4 s of relay round-trip, PERF.md). Shared by
    `Runner._culled_fg_inputs` and the octree bake probes so the caching /
    full-mask fast-path logic cannot drift between them.

    Active counts are BUCKETED up to the next power of two by padding the
    set with (provably-zero) inactive cells: the downstream render jit
    compiles once per subset SIZE, and an unbucketed cull can see nearly K
    distinct counts across an image/bake — measured on-chip, those extra
    full-renderer XLA compiles (~40 s each over the relay) cost far more
    than the <2x FLOP overshoot of the bucket (a 4x2 bake went 249.6 s
    unbucketed vs 109.4 s cull-off; padding with zero-weight cells keeps
    outputs exact, see module docstring). At most log2(K)+1 sizes compile.

    `gather(params, idx)` and `put(array)` are injected: the Runner's eval
    mesh needs sharding-aware versions, plain `jnp.asarray` works
    elsewhere."""

    def __init__(self, params, centroids: np.ndarray, gather, put):
        self._params = params
        self._centroids = np.asarray(centroids, np.float32)
        self._gather = gather
        self._put = put
        self._cache = {}

    def __len__(self) -> int:
        return len(self._cache)

    def masks(self):
        return [np.frombuffer(k, bool) for k in self._cache]

    def get(self, mask: np.ndarray):
        mask = bucket_mask(mask)
        key = mask.tobytes()
        hit = self._cache.get(key)
        if hit is None:
            if mask.all():
                hit = (self._params, self._put(self._centroids))
            else:
                idx = np.flatnonzero(mask).astype(np.int32)
                hit = (
                    self._gather(self._params, self._put(idx)),
                    self._put(self._centroids[mask]),
                )
            self._cache[key] = hit
        return hit


def ray_support_masks(
    rays: np.ndarray,
    centroids: np.ndarray,
    boundary_margin: float,
    cluster_dim_start: int = 0,
    probes: int = 16,
    chunk: int = 65536,
) -> np.ndarray:
    """(N, K) bool: cells that can have nonzero routing weight anywhere on
    each ray's OWN [near, far] segment — a per-RAY support set, far tighter
    than the per-chunk AABB bound on oblique views (measured on the 4x2
    drone flythrough: AABB chunks stayed at 8/8 active while per-point
    support averages 2.5).

    Conservative between probe points: for p within h of probe p1
    (h = segment/(2*(probes-1))), d_j(p) >= d_j(p1) - h and
    min_d(p) <= min_d(p1) + h, so "j active somewhere in the
    h-neighborhood" implies d_j(p1) <= margin*min_d(p1) + (margin+1)*h —
    the slackened test below. Intended for occupancy-TIGHTENED rays
    (render/ray_bounds.py), whose short segments make the slack negligible
    (width/30 vs cell pitches); it is valid (just looser) for raw rays.
    Zero-width (collapsed) rays get an all-False row: their fg
    contribution is exactly zero (render_rays zeroes their last_delta).

    Distances run in the routing subspace [cluster_dim_start:3], matching
    `models/mega.cluster_weights`. Vectorized f32 numpy in the
    |p|^2 + |c|^2 - 2 p.c sgemm form; ~0.5 s for a 262k-ray frame.
    """
    rays = np.asarray(rays, np.float32)
    c = np.asarray(centroids, np.float32)[:, cluster_dim_start:]
    n, k = rays.shape[0], c.shape[0]
    margin = max(float(boundary_margin), 1.0)
    out = np.zeros((n, k), bool)
    s = np.linspace(0.0, 1.0, probes, dtype=np.float32)
    c_sq = (c**2).sum(-1)
    for start in range(0, n, chunk):
        seg = rays[start : start + chunk]
        live = seg[:, 7] > seg[:, 6]
        if not live.any():
            continue
        seg = seg[live]
        t = seg[:, 6:7] * (1.0 - s) + seg[:, 7:8] * s  # (m, Q)
        pts = (
            seg[:, None, :3] + seg[:, None, 3:6] * t[..., None]
        )[..., cluster_dim_start:]  # (m, Q, dims)
        p_sq = (pts**2).sum(-1)
        d_sq = p_sq[..., None] + c_sq - 2.0 * (pts @ c.T)  # (m, Q, K)
        dist = np.sqrt(np.maximum(d_sq, 0.0))
        h = (seg[:, 7] - seg[:, 6])[:, None, None] / (2.0 * (probes - 1))
        act = dist <= margin * dist.min(-1, keepdims=True) + (
            (margin + 1.0) * h + _EDGE_SLACK
        )
        dst = out[start : start + chunk]
        dst[live] = act.any(1)
        out[start : start + chunk] = dst
    return out


def support_order(masks: np.ndarray) -> np.ndarray:
    """Permutation grouping rays by their support SET (ray_support_masks),
    so consecutive chunks share one small active union instead of the
    per-chunk unions degrading to the image-level set. Collapsed rays
    (all-False rows) sort first — they join any chunk for free. Stable, so
    ties keep scanline locality. Rays are independent rows of every render
    pass; `Runner.render_image` un-permutes the outputs."""
    masks = np.asarray(masks, bool)
    k = masks.shape[1]
    if k <= 62:
        key = masks @ (np.int64(1) << np.arange(k, dtype=np.int64))
        return np.argsort(key, kind="stable")
    return np.lexsort(tuple(masks[:, i] for i in range(k - 1, -1, -1)))


def tile_order(w: int, h: int, chunk_rays: int) -> np.ndarray:
    """Permutation putting a row-major (h*w,) ray grid into square-tile
    order, tile area <= chunk_rays.

    Scanline chunks span the full image width, so their sample boxes stay
    wide in one scene dimension no matter how many rays fit a chunk; at a
    1920-wide production frame a 16k-ray chunk is 8.5 full-width rows,
    where a 128x128 tile covers 1/15 of the width — per-chunk active-cell
    sets shrink accordingly. Rays are independent rows of every render
    pass, so reordering is exact; `Runner.render_image` un-permutes the
    outputs."""
    t = 1
    while (t * 2) ** 2 <= chunk_rays and t * 2 <= max(w, h):
        t *= 2
    ys, xs = np.mgrid[0:h, 0:w]
    tiles_x = (w + t - 1) // t
    tile_id = (ys // t) * tiles_x + (xs // t)
    # Sort by (tile, y, x): stable row-major order within each tile.
    return np.lexsort((xs.ravel(), ys.ravel(), tile_id.ravel()))


def _active_cells_box(
    lo: np.ndarray,
    hi: np.ndarray,
    centroids: np.ndarray,
    boundary_margin: float,
    cluster_dim_start: int,
) -> np.ndarray:
    c = np.asarray(centroids, np.float64)[:, cluster_dim_start:]

    # Per-dim distance from the box to each centroid (0 inside the slab).
    gap = np.maximum(np.maximum(lo[None] - c, c - hi[None]), 0.0)
    lb = np.sqrt((gap**2).sum(axis=-1))  # min_{p in B} d_j(p)
    corner = np.maximum(np.abs(c - lo[None]), np.abs(hi[None] - c))
    ub = np.sqrt((corner**2).sum(axis=-1))  # max_{p in B} d_j(p)

    margin = max(float(boundary_margin), 1.0)
    threshold = margin * ub.min()
    mask = lb <= threshold * (1.0 + _EDGE_SLACK) + 1e-12
    # The nearest-ub cell always survives (lb <= ub.min() by definition),
    # so the mask is never empty; assert the invariant anyway.
    assert mask.any()
    return mask
