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
    WIN_COLS, WIDE2_BPR, WIDE3_FLAG_CHUNK, PallasFallback,
    _catmull_rom_weights, _lagrange_weights, _linear_weights,
    _n_planes, _planar_source, _resample_group_wide3,
    _resample_tile_planar, _wide3_plan_from_uv)

__all__ = ["PreparedRemap", "PreparedRemapBatch", "remap_pallas",
           "plan_remap_tiles"]


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


# --------------------------------------------------------------------------
# Wide-v3 batched remap: de-sheared residual windows over static maps
# --------------------------------------------------------------------------
#
# The v1 remap core above pays the full chunk-sweep per (group, chunk)
# like the original wide kernel; the SFM10 dual-fisheye chain
# (``gs360_DualFisheyeDistortionCalibration.py:1996-2055``) is exactly
# the geometry the wide-v3 machinery was built for — smooth maps, known
# on host — so this path reuses the v3 planner on the static maps
# (``_wide3_plan_from_uv`` with ``wrap=False``) and the v3 SIMD
# resample, and BATCHES all views of a rig into one kernel launch over
# one shared planarized (and packed) source.


def plan_remap_wide3(map_x: np.ndarray, map_y: np.ndarray,
                     valid: Optional[np.ndarray], src_w: int, src_h: int,
                     interp: str, force=None):
    """Wide-v3 plan tuple for one static map (or None when out of
    budget / taps leave the image)."""
    n_taps = 4 if interp in ("bicubic", "catmull-rom") else 2
    koff = -1 if n_taps == 4 else 0
    u = np.clip(np.asarray(map_x, np.float64), 0.0, src_w - 1.001)
    v = np.asarray(map_y, np.float64)
    vb = (np.ones(u.shape, bool) if valid is None
          else np.asarray(valid) > 0.5)
    return _wide3_plan_from_uv(u, v, vb, src_w, src_h, is_fish=False,
                               wrap=False, n_taps=n_taps, koff=koff,
                               force=force)


def _remap_kernel_wide3(tab_ref,         # scalar-prefetch (3+NG+MB, n_t)
                        mapx_ref,        # (1, TILE_ROWS, TILE_COLS)
                        mapy_ref,
                        validf_ref,
                        src_hbm,         # (3|planes, H8, W'') planar HBM
                        cs_hbm,          # (1, CSB, NG, 128) i32 block
                        out_ref,         # (1, 3, TILE_ROWS, TILE_COLS)
                        win_raw, acc, sems,
                        *, interp: str, win_rows: int, resid_lo: int,
                        resid_hi: int, spread_lo: int, src_w: int,
                        src_h: int, mb: int, cs_blocks: int,
                        has_chunk: bool, packed: int, fill: float):
    """Wide-v3 resample over static maps: the warp kernel's DMA plan and
    group dispatch (:func:`warp_pallas._warp_kernel_wide3`) with the ray
    math replaced by map-block reads."""
    R = win_rows
    NG = TILE_ROWS // 8
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def tile_tab(tt):
        return tab_ref[0, tt], tab_ref[1, tt]     # b0, nblk

    b0_t, nblk_t = tile_tab(t)
    rounds_t = (nblk_t + WIDE2_BPR - 1) // WIDE2_BPR

    def dma_blk(slot, tt, bi, b):
        b0n, _ = tile_tab(tt)
        rm = pl.multiple_of((tab_ref[3 + NG + b, tt] // 8) * 8, 8)
        bcol = pl.multiple_of((b0n + b) * 128, 128)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), pl.ds(bcol, 128)],
            win_raw.at[slot, :, :, pl.ds(bi * 128, 128)],
            sems.at[slot, bi])

    def start_r0(slot, tt):
        _, nblk_n = tile_tab(tt)
        for bi in range(WIDE2_BPR):
            @pl.when(bi < nblk_n)
            def _(bi=bi):
                dma_blk(slot, tt, bi, bi).start()

    slot0 = t % 2

    @pl.when(t == 0)
    def _():
        start_r0(0, 0)

    # ---- geometry: straight from the map blocks ----
    u = jnp.clip(mapx_ref[0], 0.0, src_w - 1.001)
    vcl = jnp.clip(mapy_ref[0], 0.0, src_h - 1.001)
    valid = validf_ref[0] > 0.5

    x0 = jnp.floor(u).astype(jnp.int32)
    fx = u - jnp.floor(u)
    y0 = jnp.floor(vcl).astype(jnp.int32)
    fy = vcl - jnp.floor(vcl)
    if interp in ("bicubic", "catmull-rom"):
        hw = (_lagrange_weights(fx) if interp == "bicubic"
              else _catmull_rom_weights(fx))
        vw = (_lagrange_weights(fy) if interp == "bicubic"
              else _catmull_rom_weights(fy))
        koff = -1
    else:
        hw = _linear_weights(fx)
        vw = _linear_weights(fy)
        koff = 0
    n_taps = len(hw)

    for c in range(3):
        acc[c] = jnp.zeros((TILE_ROWS, TILE_COLS), jnp.float32)

    def block_cs(b, g):
        row = cs_hbm[0, pl.ds(jnp.minimum(b, cs_blocks - 1), 1), g, :]
        return jnp.broadcast_to(row.reshape(1, TILE_COLS),
                                (8, TILE_COLS))

    for bi in range(WIDE2_BPR):
        @pl.when(bi < nblk_t)
        def _(bi=bi):
            dma_blk(slot0, t, bi, bi).wait()
            rm_b = tab_ref[3 + NG + bi, t]
            for g in range(NG):
                _resample_group_wide3(
                    g, win_raw, slot0, bi * 128, block_cs(bi, g),
                    (b0_t + bi) * 128, tab_ref[3 + g, t], x0, hw, y0,
                    vw, rm_b, acc, valid, vcl, win_rows=R,
                    resid_lo=resid_lo, resid_hi=resid_hi,
                    spread_lo=spread_lo, n_taps=n_taps, koff=koff,
                    src_h=src_h, has_chunk=has_chunk, packed=packed)

    @pl.when((rounds_t <= 1) & (t + 1 < n_t))
    def _():
        start_r0((t + 1) % 2, t + 1)

    if mb > WIDE2_BPR:
        def round_body(rr, _):
            for bi in range(WIDE2_BPR):
                b = rr * WIDE2_BPR + bi

                @pl.when(b < nblk_t)
                def _(bi=bi, b=b):
                    cp = dma_blk(2, t, bi, b)
                    cp.start()
                    cp.wait()
            for bi in range(WIDE2_BPR):
                b = rr * WIDE2_BPR + bi

                @pl.when(b < nblk_t)
                def _(bi=bi, b=b):
                    rm_b = tab_ref[3 + NG + b, t]
                    for g in range(NG):
                        _resample_group_wide3(
                            g, win_raw, 2, bi * 128, block_cs(b, g),
                            (b0_t + b) * 128, tab_ref[3 + g, t], x0,
                            hw, y0, vw, rm_b, acc, valid, vcl,
                            win_rows=R, resid_lo=resid_lo,
                            resid_hi=resid_hi, spread_lo=spread_lo,
                            n_taps=n_taps, koff=koff, src_h=src_h,
                            has_chunk=has_chunk, packed=packed)
            return 0

        jax.lax.fori_loop(1, rounds_t, round_body, 0)

        @pl.when((rounds_t > 1) & (t + 1 < n_t))
        def _():
            start_r0((t + 1) % 2, t + 1)

    vf = valid.astype(jnp.float32)
    scale = (1.0 / 255.0) if packed else 1.0
    for c in range(3):
        out_ref[0, c, :, :] = (acc[c] * (vf * scale)
                               + fill * (1.0 - vf))


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "src_w", "src_h", "interp",
                     "win_rows", "resid_lo", "resid_hi", "spread_lo",
                     "n_views", "mb", "cs_blocks", "has_chunk", "packed",
                     "fill", "interpret"))
def _remap_call_wide3(src_rows, mapx, mapy, validf, tab, cs, *, out_h,
                      out_w, src_w, src_h, interp, win_rows, resid_lo,
                      resid_hi, spread_lo, n_views, mb, cs_blocks,
                      has_chunk, packed, fill, interpret=False):
    n_tiles_x = out_w // TILE_COLS
    tiles_per_view = (out_h // TILE_ROWS) * n_tiles_x
    n_tiles = tiles_per_view * n_views

    kernel = functools.partial(
        _remap_kernel_wide3, interp=interp, win_rows=win_rows,
        resid_lo=resid_lo, resid_hi=resid_hi, spread_lo=spread_lo,
        src_w=src_w, src_h=src_h, mb=mb, cs_blocks=cs_blocks,
        has_chunk=has_chunk, packed=packed, fill=fill)

    def blk(t, tab):
        return (t // tiles_per_view,
                (t % tiles_per_view) // n_tiles_x,
                (t % tiles_per_view) % n_tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE_ROWS, TILE_COLS), blk),   # mapx
            pl.BlockSpec((1, TILE_ROWS, TILE_COLS), blk),   # mapy
            pl.BlockSpec((1, TILE_ROWS, TILE_COLS), blk),   # valid
            pl.BlockSpec(memory_space=pl.ANY),              # src in HBM
            pl.BlockSpec((1, cs_blocks, TILE_ROWS // 8, TILE_COLS),
                         lambda t, tab: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TILE_ROWS, TILE_COLS),
            lambda t, tab: (t // tiles_per_view,
                            0,
                            (t % tiles_per_view) // n_tiles_x,
                            (t % tiles_per_view) % n_tiles_x)),
        scratch_shapes=[
            pltpu.VMEM((3, _n_planes(packed), win_rows,
                        WIDE2_BPR * TILE_COLS), src_rows.dtype),
            pltpu.VMEM((3, TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((3, WIDE2_BPR)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_views, 3, out_h, out_w),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab, mapx, mapy, validf, src_rows, cs)


class PreparedRemapBatch:
    """A whole rig's static maps planned once and run as ONE device
    program per frame over one shared (packed) planarized source.

    The SFM10 chain cuts 10 perspective views from each fisheye frame;
    per-view :class:`PreparedRemap` calls pay the v1 chunk-sweep core
    and re-planarize the source per view.  This path plans every map
    through the wide-v3 machinery (de-sheared residual windows, SIMD
    sweep), harmonizes the per-map classes like the mixed-view warp
    dispatch does, and batches all views into a single grid.

    Raises :class:`PallasFallback` when any map exceeds the v3 budgets
    (callers keep the per-view path as fallback).
    """

    def __init__(self, maps, *, src_w: int, src_h: int,
                 interp: str = "bicubic"):
        if not maps:
            raise ValueError("PreparedRemapBatch: no maps")
        self.interp = interp
        self.out_h, self.out_w = np.asarray(maps[0][0]).shape
        mxs, mys, vfs, plans = [], [], [], []
        for (mx, my, valid) in maps:
            mx_raw = np.asarray(mx, np.float32)
            mx = _pad_to_tiles(mx_raw)
            my = _pad_to_tiles(np.asarray(my, np.float32))
            vf = _pad_to_tiles(
                np.ones(mx_raw.shape, np.float32)
                if valid is None else np.asarray(valid, np.float32),
                mode="constant")
            if mx.shape != (self.out_h + (-self.out_h) % TILE_ROWS,
                            self.out_w + (-self.out_w) % TILE_COLS):
                raise ValueError("PreparedRemapBatch: maps must share "
                                 "one output size")
            plan = plan_remap_wide3(mx, my, vf, src_w, src_h, interp)
            if plan is None:
                raise PallasFallback(
                    "remap map exceeds the wide-v3 budgets")
            mxs.append(mx)
            mys.append(my)
            vfs.append(vf)
            plans.append(plan)

        # harmonize per-map classes with pinned re-plans (the mixed-view
        # warp dispatch's exact protocol)
        win = max(p[0] for p in plans)
        rlo = max(p[1] for p in plans)
        rhi = max(p[2] for p in plans)
        slo = max(p[3] for p in plans)
        mb = max(p[4] for p in plans) * WIDE2_BPR
        if slo == 0:
            rlo = rhi
        fkey = (win, rlo, rhi, slo)
        for i, p in enumerate(plans):
            if (p[0], p[1], p[2], p[3]) != fkey:
                plans[i] = plan_remap_wide3(mxs[i], mys[i], vfs[i],
                                            src_w, src_h, interp,
                                            force=fkey)
                if plans[i] is None:
                    raise PallasFallback(
                        "remap map re-plan failed at batch classes")
        ng = TILE_ROWS // 8
        cs_blocks = min(mb, max(p[7].shape[1] for p in plans))
        self.has_chunk = any(
            (p[6][:, 3:3 + ng] == WIDE3_FLAG_CHUNK).any() for p in plans)
        tab_rows, cs_rows = [], []
        for p in plans:
            tab, cs = p[6], p[7]
            n_t, w_t = tab.shape
            if w_t - 3 - ng < mb:
                tab = np.concatenate(
                    [tab, np.zeros((n_t, mb - (w_t - 3 - ng)),
                                   np.int32)], axis=1)
            if cs.shape[1] < cs_blocks:
                cs = np.concatenate(
                    [cs, np.zeros((n_t, cs_blocks - cs.shape[1])
                                  + cs.shape[2:], np.int32)], axis=1)
            tab_rows.append(tab)
            cs_rows.append(cs)
        self.tab = jnp.asarray(np.concatenate(tab_rows, axis=0).T.copy())
        self.cs = jnp.asarray(np.concatenate(cs_rows, axis=0))
        self.win_rows, self.resid_lo, self.resid_hi, self.spread_lo = fkey
        self.mb = mb
        self.cs_blocks = cs_blocks
        self.n_views = len(maps)
        self.src_w, self.src_h = src_w, src_h
        self.mapx = jnp.asarray(np.stack(mxs))
        self.mapy = jnp.asarray(np.stack(mys))
        self.validf = jnp.asarray(np.stack(vfs))

    def __call__(self, src, *, fill: float = 0.0, planar: bool = True,
                 interpret: bool = False):
        """Warp one frame through every map: (V, 3, H, W) float32."""
        rows = src.reshape(src.shape[0], src.shape[1] * 3) \
            if src.ndim == 3 else src
        rows = jnp.asarray(rows)
        packed = 3 if rows.dtype == jnp.uint8 else 0
        padded = _planar_source(rows, interpret=interpret,
                                pack_rg=packed)
        out = _remap_call_wide3(
            padded, self.mapx, self.mapy, self.validf, self.tab,
            self.cs, out_h=int(self.mapx.shape[1]),
            out_w=int(self.mapx.shape[2]), src_w=self.src_w,
            src_h=self.src_h, interp=self.interp,
            win_rows=self.win_rows, resid_lo=self.resid_lo,
            resid_hi=self.resid_hi, spread_lo=self.spread_lo,
            n_views=self.n_views, mb=self.mb, cs_blocks=self.cs_blocks,
            has_chunk=self.has_chunk, packed=packed, fill=float(fill),
            interpret=interpret)
        out = out[:, :, :self.out_h, :self.out_w]
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
