"""Pallas TPU map-remap kernel — the fast path for ``cv2.remap`` workloads.

Where :mod:`gs360x.kernels.warp_pallas` computes (u, v) coordinates from
view geometry in-kernel, the dual-fisheye pipeline's undistortion and
fisheye→perspective maps (reference
``gs360_DualFisheyeDistortionCalibration.py:1120-1217``) are *precomputed
static arrays* per sensor calibration. That makes the window planning
trivial: the per-tile source-window origin table is computed once on the
host (and cached per map), shipped to SMEM, and the kernel just DMAs each
tile's window and runs the same planar-window
resample core as the warp kernels
(:func:`gs360x.kernels.warp_pallas._resample_tile_planar`); the source is
de-interleaved once per frame by ``_planar_source``.

Budget: same static window as the warp kernel — horizontal span ≤
``WIN_COLS − margins`` per tile, vertical span per row class. Maps that
exceed it (none of the Osmo-style fisheye maps do at practical zooms)
raise :class:`~gs360x.kernels.warp_pallas.PallasFallback`; callers fall
back to the XLA gather remap.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs360x.kernels.warp_pallas import (
    H_MARGIN, ROW_CLASSES, TILE_COLS, TILE_ROWS, V_MARGIN,
    WIN_COLS, PallasFallback, _planar_source, _resample_tile_planar)

__all__ = ["PreparedRemap", "remap_pallas", "plan_remap_tiles"]


# --------------------------------------------------------------------------
# Host planner: per-tile window origins from the static maps
# --------------------------------------------------------------------------


def plan_remap_tiles(map_x: np.ndarray, map_y: np.ndarray,
                     valid: Optional[np.ndarray], src_w: int, src_h: int):
    """Per-tile window-origin table [rm, cm] (int32, (n_tiles, 2)) or None
    when any tile's span exceeds the static window budget.

    Spans are measured over *valid* pixels only — invalid pixels clamp
    into the window in-kernel and are overwritten by the fill value.
    Returns (table, win_rows).
    """
    h, w = map_x.shape
    assert h % TILE_ROWS == 0 and w % TILE_COLS == 0
    n_ty, n_tx = h // TILE_ROWS, w // TILE_COLS
    mx = map_x.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    my = map_y.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    if valid is not None:
        v = valid.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS).astype(bool)
        big = np.float64(1e12)
        mx_min = np.where(v, mx, big).min(axis=(1, 3))
        mx_max = np.where(v, mx, -big).max(axis=(1, 3))
        my_min = np.where(v, my, big).min(axis=(1, 3))
        my_max = np.where(v, my, -big).max(axis=(1, 3))
        empty = ~v.any(axis=(1, 3))
        mx_min = np.where(empty, 0.0, mx_min)
        mx_max = np.where(empty, 0.0, mx_max)
        my_min = np.where(empty, 0.0, my_min)
        my_max = np.where(empty, 0.0, my_max)
    else:
        mx_min = mx.min(axis=(1, 3))
        mx_max = mx.max(axis=(1, 3))
        my_min = my.min(axis=(1, 3))
        my_max = my.max(axis=(1, 3))

    cm = np.clip((np.floor(mx_min).astype(np.int64) - H_MARGIN), 0, None)
    cm = (cm // TILE_COLS) * TILE_COLS
    rm = np.clip(np.floor(my_min).astype(np.int64) - V_MARGIN, 0, None)
    rm = (rm // 8) * 8

    h_need = np.floor(mx_max) + 2 + H_MARGIN - cm
    if (h_need >= WIN_COLS).any():
        return None, 0
    v_need = np.floor(my_max) + 2 + V_MARGIN - rm
    win_rows = 0
    for r in ROW_CLASSES:
        if (v_need < r).all() and r <= src_h:
            win_rows = r
            break
    if not win_rows:
        return None, 0
    rm = np.minimum(rm, max(0, src_h - win_rows))
    # store pre-divided offsets so Mosaic can prove DMA alignment
    # (rm = tab*8 rows, cm = tab*128 lanes)
    table = np.stack([rm // 8, cm // TILE_COLS],
                     axis=-1).reshape(-1, 2).astype(np.int32)
    return table, win_rows


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _remap_kernel(tab_ref,     # (n_tiles, 2) i32 SMEM: [rm/8, cm/128]
                  mapx_ref,    # (TILE_ROWS, TILE_COLS) VMEM block
                  mapy_ref,
                  valid_ref,   # (TILE_ROWS, TILE_COLS) f32 block
                  src_hbm,     # (3, H8, W'') planar f32 in ANY/HBM
                  out_ref,     # (3, TILE_ROWS, TILE_COLS) VMEM block
                  win_raw,     # scratch (2, 3, R, WIN_COLS) f32
                  acc,         # scratch (3, TILE_ROWS, TILE_COLS)
                  sems,        # DMA semaphores (2,)
                  *, interp: str, win_rows: int, fill: float):
    R = win_rows
    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def dma(slot, t):
        rm = pl.multiple_of(tab_ref[t, 0] * 8, 8)
        cm = pl.multiple_of(tab_ref[t, 1] * TILE_COLS, TILE_COLS)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), pl.ds(cm, WIN_COLS)],
            win_raw.at[slot], sems.at[slot])

    @pl.when(tile == 0)
    def _():
        dma(0, tile).start()

    @pl.when(tile + 1 < n_tiles)
    def _():
        dma((tile + 1) % 2, tile + 1).start()

    slot = tile % 2
    dma(slot, tile).wait()

    cm = (tab_ref[tile, 1] * TILE_COLS).astype(jnp.float32)
    rm = (tab_ref[tile, 0] * 8).astype(jnp.float32)
    urel = jnp.clip(mapx_ref[:, :] - cm, 0.0, WIN_COLS - 1.001)
    vrel = jnp.clip(mapy_ref[:, :] - rm, 0.0, R - 1.001)
    _resample_tile_planar(win_raw, slot, urel, vrel, acc, R=R,
                          interp=interp)

    v = valid_ref[:, :]
    for c in range(3):
        out_ref[c, :, :] = acc[c] * v + fill * (1.0 - v)


@functools.partial(
    jax.jit,
    static_argnames=("interp", "win_rows", "fill", "interpret"))
def _remap_call(src_rows, map_x, map_y, valid, table, *, interp, win_rows,
                fill, interpret=False):
    h, w = map_x.shape
    n_tiles_x = w // TILE_COLS
    n_tiles = (h // TILE_ROWS) * n_tiles_x

    kernel = functools.partial(_remap_kernel, interp=interp,
                               win_rows=win_rows, fill=fill)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # table
            pl.BlockSpec((TILE_ROWS, TILE_COLS),
                         lambda t: (t // n_tiles_x, t % n_tiles_x)),
            pl.BlockSpec((TILE_ROWS, TILE_COLS),
                         lambda t: (t // n_tiles_x, t % n_tiles_x)),
            pl.BlockSpec((TILE_ROWS, TILE_COLS),
                         lambda t: (t // n_tiles_x, t % n_tiles_x)),
            pl.BlockSpec(memory_space=pl.ANY),       # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (3, TILE_ROWS, TILE_COLS),
            lambda t: (0, t // n_tiles_x, t % n_tiles_x)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, win_rows, WIN_COLS), jnp.float32),
            pltpu.VMEM((3, TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(table, map_x, map_y, valid, src_rows)


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


def _pad_to_tiles(arr: np.ndarray, mode: str = "edge") -> np.ndarray:
    h, w = arr.shape
    ph = (-h) % TILE_ROWS
    pw = (-w) % TILE_COLS
    if not ph and not pw:
        return arr
    return np.pad(arr, ((0, ph), (0, pw)), mode=mode)


class PreparedRemap:
    """A remap with its maps planned and resident on device.

    Undistortion / fisheye→perspective maps are static per sensor
    calibration, so the per-tile window table, the padded maps, and the
    validity mask transfer to the device ONCE; each ``apply`` only ships
    the source frame. Raises :class:`PallasFallback` at construction when
    the maps exceed the static window budget.
    """

    def __init__(self, map_x, map_y, valid=None, *, src_w: int,
                 src_h: int):
        map_x = np.asarray(map_x, np.float32)
        map_y = np.asarray(map_y, np.float32)
        self.out_h, self.out_w = map_x.shape
        valid_f = (np.ones(map_x.shape, np.float32) if valid is None
                   else np.asarray(valid, np.float32))
        mx = _pad_to_tiles(map_x)
        my = _pad_to_tiles(map_y)
        vf = _pad_to_tiles(valid_f, mode="constant")
        table, win_rows = plan_remap_tiles(mx, my, vf, src_w, src_h)
        if table is None:
            raise PallasFallback(
                "remap maps exceed the static window budget")
        self.win_rows = win_rows
        self.map_x = jnp.asarray(mx)
        self.map_y = jnp.asarray(my)
        self.valid = jnp.asarray(vf)
        self.table = jnp.asarray(table)

    def __call__(self, src, *, interp: str = "bilinear",
                 fill: float = 0.0, planar: bool = True,
                 interpret: bool = False):
        rows = src.reshape(src.shape[0], src.shape[1] * 3) \
            if src.ndim == 3 else src
        padded = _planar_source(jnp.asarray(rows), interpret=interpret)
        out = _remap_call(padded, self.map_x, self.map_y, self.valid,
                          self.table, interp=interp,
                          win_rows=self.win_rows, fill=float(fill),
                          interpret=interpret)
        out = out[:, :self.out_h, :self.out_w]
        if planar:
            return out
        return jnp.moveaxis(out, 0, -1)


def remap_pallas(src, map_x, map_y, valid=None, *,
                 interp: str = "bilinear", fill: float = 0.0,
                 planar: bool = True, interpret: bool = False):
    """One-shot remap (convenience over :class:`PreparedRemap`).

    Same sampling semantics as :func:`gs360x.kernels.warp.remap`
    (cv2.remap twin): ``out[y, x] = src[map_y[y, x], map_x[y, x]]``
    interpolated, with invalid pixels set to ``fill``. Returns planar
    (3, H, W) float32 (or HWC when ``planar=False``). Raises
    :class:`PallasFallback` when the maps exceed the window budget.
    For repeated frames through the same maps, build a
    :class:`PreparedRemap` once — it keeps the maps on device.
    """
    if src.ndim == 3:
        src_h, src_w = src.shape[0], src.shape[1]
    else:
        src_h, src_w = src.shape[0], src.shape[1] // 3
    prepared = PreparedRemap(map_x, map_y, valid, src_w=src_w, src_h=src_h)
    return prepared(src, interp=interp, fill=fill, planar=planar,
                    interpret=interpret)
