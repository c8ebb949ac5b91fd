"""Voxel-grid point-cloud kernels (device sort/segment ops).

Replaces the PlyOptimizer's numpy ``unique``/scatter voxel math
(``/root/reference/cli_tools/gs360_PlyOptimizer.py:723-843``) with
shape-static JAX: voxel keys → sort → boundary flags → segment reductions.
Outputs are padded to N with a validity mask (XLA needs static shapes);
hosts trim with the mask. The same segment machinery serves the fixed-size,
binary-search-to-target, and spatial-hash modes; the adaptive octree stays
host-side (a sequential heap algorithm over ≤N nodes — selection logic, not
pixel math).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

def grid_keys(xyz: jnp.ndarray, voxel: float,
              xyz_min: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int32 voxel indices per point (no 64-bit packing: device
    int64 is unavailable without x64 mode; lexicographic sorts over the
    three columns replace a packed-key sort)."""
    ijk = jnp.floor((xyz - xyz_min) / voxel)
    return jnp.clip(ijk, 0.0, 2.0 ** 30).astype(jnp.int32)


def _lexsort_order(keys3: jnp.ndarray) -> jnp.ndarray:
    return jnp.lexsort((keys3[:, 2], keys3[:, 1], keys3[:, 0]))


def _heads(k_sorted: jnp.ndarray) -> jnp.ndarray:
    diff = jnp.any(k_sorted[1:] != k_sorted[:-1], axis=1)
    return jnp.concatenate([jnp.array([True]), diff])


@jax.jit
def _unique_count_from_keys(keys3: jnp.ndarray) -> jnp.ndarray:
    order = _lexsort_order(keys3)
    return jnp.sum(_heads(keys3[order]))


def unique_voxel_count(xyz, voxel: float, xyz_min=None) -> int:
    """Number of occupied voxels at the given edge length."""
    xyz = jnp.asarray(xyz)
    if xyz.shape[0] == 0:
        return 0
    if xyz_min is None:
        xyz_min = jnp.min(xyz, axis=0)
    return int(_unique_count_from_keys(grid_keys(xyz, voxel,
                                                 jnp.asarray(xyz_min))))


@functools.partial(jax.jit, static_argnames=("representative",))
def _voxel_reduce_impl(xyz, keys, rand_bits, *, representative):
    """Per-voxel representative pick via sort + segment reductions.

    Returns (pick_idx (N,), valid (N,)): pick_idx[s] is the chosen original
    index of segment s; valid marks real segments (count > 0)."""
    n = xyz.shape[0]
    order = _lexsort_order(keys)
    k_sorted = keys[order]
    xyz_sorted = xyz[order]

    seg = jnp.cumsum(_heads(k_sorted).astype(jnp.int32)) - 1   # (N,)
    counts = jax.ops.segment_sum(jnp.ones(n, jnp.float32), seg, n)

    if representative == "first":
        score = order.astype(jnp.float32)  # lowest original index wins
    elif representative == "random":
        score = rand_bits[order].astype(jnp.float32)
    else:  # centroid: closest point to the voxel centroid
        sums = jax.ops.segment_sum(xyz_sorted, seg, n)
        target = sums / jnp.maximum(counts, 1.0)[:, None]
        diff = xyz_sorted - target[seg]
        score = jnp.sum(diff * diff, axis=1)

    idx_in_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    seg_min = jax.ops.segment_min(score, seg, n)
    cand_pos = jnp.where(score <= seg_min[seg], idx_in_n, n + 1)
    pick_sorted_pos = jnp.clip(jax.ops.segment_min(cand_pos, seg, n), 0, n - 1)
    return order[pick_sorted_pos], counts > 0


def voxel_downsample_by_size(xyz: np.ndarray, rgb: np.ndarray, voxel: float,
                             *, representative: str = "centroid",
                             seed: int = 0
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fixed-voxel downsample. Returns (xyz_out, rgb_out, pick_indices).

    Representative strategies match the reference: 'centroid' (closest to
    the voxel centroid), 'center' (closest to the voxel cube center),
    'first' (lowest original index), 'random'.
    """
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.uint8)
    n = xyz.shape[0]
    if n == 0:
        return xyz, rgb, np.zeros((0,), np.int64)
    xyz_min = xyz.min(axis=0)
    keys = grid_keys(jnp.asarray(xyz), float(voxel), jnp.asarray(xyz_min))

    if representative == "center":
        # closest to the cube center: the target is derivable per point, so
        # a host group-argmin over the voxel ids is simplest
        ijk = np.floor((xyz - xyz_min) / voxel)
        centers = xyz_min + (ijk + 0.5) * voxel
        d2 = ((xyz - centers) ** 2).sum(axis=1)
        _, inv = np.unique(np.asarray(keys), axis=0, return_inverse=True)
        pick = _host_group_argmin(inv, d2)
        return xyz[pick], rgb[pick], pick

    rand = np.random.default_rng(seed).random(n).astype(np.float32)
    pick_idx, valid = _voxel_reduce_impl(
        jnp.asarray(xyz), keys, jnp.asarray(rand),
        representative=representative)
    pick = np.sort(np.asarray(pick_idx)[np.asarray(valid)])
    return xyz[pick], rgb[pick], pick.astype(np.int64)


def _host_group_argmin(keys: np.ndarray, score: np.ndarray) -> np.ndarray:
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    ends = np.r_[starts[1:], ks.size]
    picks = np.empty(len(starts), np.int64)
    ss = score[order]
    for gi, (a, b) in enumerate(zip(starts, ends)):
        picks[gi] = order[a + int(np.argmin(ss[a:b]))]
    return np.sort(picks)


def voxel_downsample_to_target(xyz, rgb, target_points: int, *,
                               tol_ratio: float = 0.02, max_iter: int = 32,
                               representative: str = "centroid",
                               log=print):
    """Binary-search the voxel size whose occupied-voxel count hits the
    target (reference algorithm, counts evaluated on device)."""
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.uint8)
    n = xyz.shape[0]
    if n == 0 or target_points <= 0 or target_points >= n:
        return xyz, rgb, np.arange(n, dtype=np.int64)

    xyz_min = xyz.min(axis=0)
    extent = xyz.max(axis=0) - xyz_min
    vol = float(np.prod(np.maximum(extent, 1e-12)))
    v0 = (vol / float(target_points)) ** (1.0 / 3.0) if vol > 0 else 1e-3

    cache = {}

    def count(v):
        key = round(float(v), 12)
        if key not in cache:
            cache[key] = unique_voxel_count(xyz, float(v), xyz_min)
        return cache[key]

    lo = max(v0 / 64.0, 1e-9)
    hi = max(v0 * 64.0, lo * 2.0)
    shrink = 0
    while count(lo) < target_points and lo > 1e-9 and shrink < 32:
        lo = max(lo * 0.5, 1e-9)
        shrink += 1
    for _ in range(10):
        if count(hi) <= target_points:
            break
        hi *= 2.0

    best_v, best_diff = v0, float("inf")
    for it in range(1, max_iter + 1):
        mid = 0.5 * (lo + hi)
        c = count(mid)
        diff = abs(c - target_points)
        if diff < best_diff:
            best_diff, best_v = diff, mid
        log(f"[iter {it:02d}] voxel={mid:.6g}  unique={c:,}")
        if diff / float(target_points) <= tol_ratio:
            best_v = mid
            break
        if c > target_points:
            lo = mid
        else:
            hi = mid
    return voxel_downsample_by_size(xyz, rgb, best_v,
                                    representative=representative)


def spatial_hash_downsample(xyz, rgb, *, target_points: Optional[int] = None,
                            voxel_size: Optional[float] = None,
                            representative: str = "centroid", log=print):
    """One-pass approximate downsample: ≤3 probes refine the voxel size via
    an effective-dimension estimate (reference heuristic,
    ``gs360_PlyOptimizer.py:1033-1171``)."""
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.uint8)
    n = xyz.shape[0]
    if n == 0:
        return xyz, rgb, np.zeros((0,), np.int64)
    if voxel_size and voxel_size > 0:
        voxel = float(voxel_size)
    elif target_points and target_points > 0:
        target = int(max(1, min(n, target_points)))
        if target >= n:
            return xyz, rgb, np.arange(n, dtype=np.int64)
        xyz_min = xyz.min(axis=0)
        extent = xyz.max(axis=0) - xyz_min
        vol = float(np.prod(np.maximum(extent, 1e-12)))
        voxel = max((vol / target) ** (1.0 / 3.0) if vol > 0 else 1e-3, 1e-9)
        prev_v = prev_c = None
        for probe in range(1, 4):
            c = unique_voxel_count(xyz, voxel, xyz_min)
            log(f"[spatial-hash probe {probe}] voxel={voxel:.6g} "
                f"unique={c:,}")
            if c <= 0:
                break
            ratio = c / float(target)
            if abs(ratio - 1.0) <= 0.06 or probe >= 3:
                break
            if prev_v is not None and prev_c and c != prev_c \
                    and abs(voxel - prev_v) > 1e-12:
                try:
                    dim = math.log(c / prev_c) / math.log(prev_v / voxel)
                except (ValueError, ZeroDivisionError):
                    dim = 2.0
                dim = max(1.2, min(3.0, abs(dim))) if math.isfinite(dim) else 2.0
            else:
                dim = 1.45 if ratio < 0.2 else (1.7 if ratio < 0.5 else (
                    2.6 if ratio > 2.0 else 2.1))
            scale = min(2.8, max(0.12, ratio ** (1.0 / dim)))
            new_v = max(voxel * scale, 1e-9)
            prev_v, prev_c = voxel, c
            if abs(new_v - voxel) <= max(1e-9, voxel * 1e-4):
                break
            voxel = new_v
    else:
        return xyz, rgb, np.arange(n, dtype=np.int64)
    return voxel_downsample_by_size(xyz, rgb, voxel,
                                    representative=representative)


def adaptive_voxel_downsample(xyz, rgb, target_points: Optional[int], *,
                              weight_power: float = 1.0,
                              min_voxel_size: Optional[float] = None,
                              representative: str = "centroid",
                              max_depth: int = 12, seed: int = 0):
    """Octree splitting that prefers dense regions (host heap algorithm,
    reference ``gs360_PlyOptimizer.py:1174-1407``): repeatedly split the
    heaviest node until ~target leaves, then pick one representative per
    leaf."""
    import heapq
    from itertools import count as _count

    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.uint8)
    n = xyz.shape[0]
    if n == 0:
        return xyz, rgb, np.zeros((0,), np.int64)
    target = n if not target_points or target_points <= 0 \
        else int(max(1, min(n, target_points)))
    if target >= n:
        return xyz, rgb, np.arange(n, dtype=np.int64)

    weight_power = max(0.0, float(weight_power))

    def weight(c):
        return 1.0 if weight_power == 0.0 else float(c) ** weight_power

    xyz_min = xyz.min(axis=0)
    extent = xyz.max(axis=0) - xyz_min
    cube = float(extent.max())
    if cube <= 0:
        keep = np.arange(target, dtype=np.int64)
        return xyz[keep], rgb[keep], keep
    cube_min = xyz_min - np.maximum((cube - extent) * 0.5, 0.0)

    seq = _count()
    heap = [(-weight(n), next(seq),
             (np.arange(n, dtype=np.int64), cube_min, cube, 0))]
    leaves = []
    eps = 1e-9

    def can_split(idx, size, depth):
        if len(idx) <= 1 or depth >= max_depth:
            return False
        if min_voxel_size and size <= min_voxel_size + eps:
            return False
        return size * 0.5 > eps

    while heap and len(heap) + len(leaves) < target:
        _, _, (idx, mn, size, depth) = heapq.heappop(heap)
        if not can_split(idx, size, depth):
            leaves.append((idx, mn, size))
            continue
        half = size * 0.5
        rel = xyz[idx] - mn
        octant = ((rel[:, 0] >= half).astype(np.int8) * 4
                  + (rel[:, 1] >= half).astype(np.int8) * 2
                  + (rel[:, 2] >= half).astype(np.int8))
        for o in range(8):
            sub = idx[octant == o]
            if len(sub) == 0:
                continue
            off = np.array([(o >> 2) & 1, (o >> 1) & 1, o & 1],
                           np.float32) * half
            heapq.heappush(heap, (-weight(len(sub)), next(seq),
                                  (sub, mn + off, half, depth + 1)))
    for _w, _s, (idx, mn, size, _depth) in heap:
        leaves.append((idx, mn, size))

    rng = np.random.default_rng(seed)
    picks = []
    for idx, mn, size in leaves:
        pts = xyz[idx]
        if representative == "first":
            picks.append(idx[0])
        elif representative == "random":
            picks.append(idx[rng.integers(len(idx))])
        elif representative == "center":
            center = mn + size * 0.5
            picks.append(idx[np.argmin(((pts - center) ** 2).sum(axis=1))])
        else:
            centroid = pts.mean(axis=0)
            picks.append(idx[np.argmin(((pts - centroid) ** 2).sum(axis=1))])
    pick = np.sort(np.asarray(picks, np.int64))[:target]
    return xyz[pick], rgb[pick], pick


# --------------------------------------------------------------------------
# sky dome synthesis (gs360_PlyOptimizer.py:244-302)
# --------------------------------------------------------------------------


def fibonacci_hemisphere(count: int, sky_percent: float = 50.0) -> np.ndarray:
    idx = np.arange(count, dtype=np.float32)
    phi = math.pi * (3.0 - math.sqrt(5.0))
    coverage = float(np.clip(sky_percent, 0.0, 100.0)) / 100.0
    z_min = 1.0 - 2.0 * coverage
    z = 1.0 - (idx / count) * (1.0 - z_min)
    radius = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack([np.cos(phi * idx) * radius,
                     np.sin(phi * idx) * radius, z], axis=1)


def rotation_from_z_to(axis_vec: np.ndarray) -> np.ndarray:
    a = np.array([0.0, 0.0, 1.0])
    b = np.asarray(axis_vec, np.float64)
    b = b / max(np.linalg.norm(b), 1e-12)
    v = np.cross(a, b)
    c = float(a @ b)
    if np.linalg.norm(v) < 1e-12:
        return np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx * (1.0 / (1.0 + c))


def generate_sky_points(center, axis_vec, scale: float, count: int,
                        color, sky_percent: float = 50.0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    samples = fibonacci_hemisphere(count, sky_percent) * float(scale)
    rot = rotation_from_z_to(axis_vec)
    world = samples @ rot.T + np.asarray(center, np.float64)
    colors = np.tile(np.asarray(color, np.uint8), (count, 1))
    return world.astype(np.float32), colors


SKY_AXES = {
    "+X": (1, 0, 0), "-X": (-1, 0, 0),
    "+Y": (0, 1, 0), "-Y": (0, -1, 0),
    "+Z": (0, 0, 1), "-Z": (0, 0, -1),
}
