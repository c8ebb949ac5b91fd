#!/usr/bin/env python3
"""Device-synced dual-fisheye remap benchmark (VERDICT r2 #4).

Measures the SFM10 direct fisheye->perspective remap chain at the
reference defaults — 1750x1750 perspective views cut from a 3840^2
fisheye frame via ``cv2.remap``-equivalent device kernels, including the
.cube LUT + Rec709->sRGB color move — with the queue-drain method
(device-side scalar sync), so the number is chip throughput, not tunnel
wall time.  The loop being beaten: the reference's per-view cv2.remap at
``gs360_DualFisheyeDistortionCalibration.py:1996-2055`` (CPU, ~2-4
views/s/core at 1750 px).

Prints ONE JSON line like bench.py; diagnostics to stderr.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_throughput(fn, sync, *, warm=1, reps=8):
    for _ in range(warm):
        sync(fn())
    t0 = time.time()
    sync(fn())
    t_one = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(reps + 1):
        out = fn()
    sync(out)
    t_many = time.time() - t0
    return max((t_many - t_one) / reps, 1e-9)


def main():
    from bench import _probe_device

    if not _probe_device():
        log("[bench_remap] device init probe failed/timed out")
        print(json.dumps({"metric": "dual-fisheye SFM10 remap views/s",
                          "value": 0.0, "unit": "views/s",
                          "error": "device init timeout"}))
        return 1

    import jax
    import jax.numpy as jnp

    from gs360x import templates
    from gs360x.tools import dualfisheye as df
    from gs360x.kernels import remap_pallas

    log(f"[bench_remap] backend={jax.default_backend()} "
        f"devices={jax.devices()}")
    rng = np.random.default_rng(0)
    size = templates.OSMO360_SENSOR_PX
    view_px = 1750
    frame = (rng.random((size, size, 3)) * 255).astype(np.uint8)

    # the shipped Osmo 360 adjusted calibration + the SFM10 'A' view at
    # reference defaults (perspective-size 1750, 12mm/36mm focal)
    calib_path = templates.default_osmo360_calibration_path()
    if not calib_path.exists():
        templates.write_osmo360_default_calibration(calib_path)
    sensor_map, cam_map = df.load_metashape_calibration(calib_path)
    calib = next(iter(sensor_map.values()))
    # the FRONT lens's half of the SFM10 layout (A, A_U, A_D, B, J) —
    # one lens frame serves 5 views; a full pair doubles both sides, so
    # views/s here is the chain's per-view rate
    specs = [s for s in df.build_sfm10_specs(view_px, 12.0, "36 36",
                                             45.0, 45.0)
             if s["view_id"] in ("A", "A_U", "A_D", "B", "J")]
    maps = []
    for spec in specs:
        yaw = spec["yaw_deg"]
        yaw = yaw - 360.0 if yaw > 180.0 else yaw
        mx, my, valid = df.build_direct_perspective_map(
            calib, yaw, spec["pitch_deg"], spec["hfov_deg"],
            spec["vfov_deg"], view_px, view_px, 190.0)
        maps.append((mx, my, valid.astype(np.float32)))
    log(f"[bench_remap] {len(maps)} maps built: {maps[0][0].shape}")

    rows = jnp.asarray(
        np.ascontiguousarray(frame).reshape(size, size * 3))
    rows.block_until_ready()

    def sync(out):
        return float(out[..., 0].sum())

    # wide-v3 batched path (one launch for the lens's 5 views over one
    # shared packed planarize); per-view PreparedRemap is the fallback
    try:
        batch = remap_pallas.PreparedRemapBatch(
            maps, src_w=size, src_h=size, interp="bicubic")

        def run():
            return batch(rows)

        per = timed_throughput(run, sync)
        views_s = len(maps) / per
        log(f"[bench_remap] sfm10 wide3 batch 3840^2 -> {view_px}px "
            f"x{len(maps)}: {per * 1000:.1f} ms -> {views_s:.1f} views/s")
    except Exception as exc:
        log(f"[bench_remap] batch path failed "
            f"({type(exc).__name__}: {str(exc)[:200]}); "
            "falling back to per-view")
        prep = remap_pallas.PreparedRemap(
            maps[0][0], maps[0][1], maps[0][2], src_w=size, src_h=size)

        def run():
            return prep(rows, interp="bicubic")

        per = timed_throughput(run, sync)
        views_s = 1.0 / per
        log(f"[bench_remap] sfm10 per-view remap 3840^2 -> {view_px}px: "
            f"{per * 1000:.1f} ms/view -> {views_s:.1f} views/s")

    # full per-pair chain WITH mask co-warp (VERDICT r4 #8): the
    # reference's hot loop also remaps a subject mask per view
    # (gs360_DualFisheyeDistortionCalibration.py:1996-2055, nearest
    # interp).  Time the lens chain again with the 5 mask warps in the
    # same device queue — masks ride the XLA remap (2D nearest).
    from gs360x.kernels import warp as warplib

    mask_np = (rng.random((size, size)) > 0.5).astype(np.float32)
    mask_dev = jnp.asarray(mask_np[..., None])
    mask_dev.block_until_ready()
    dev_maps = []
    for mx, my, validf in maps:
        dev_maps.append((jnp.asarray(mx), jnp.asarray(my),
                         jnp.asarray(validf)))
    for dm in dev_maps:
        for a in dm:
            a.block_until_ready()

    def run_chain():
        outs = [batch(rows)]
        for dmx, dmy, dvalid in dev_maps:
            outs.append(warplib.remap(mask_dev, dmx, dmy,
                                      interp="nearest", wrap_x=False,
                                      valid=dvalid, fill=0.0))
        return outs

    def sync_chain(outs):
        return float(outs[0][..., 0].sum()) + float(outs[-1].sum())

    try:
        per_chain = timed_throughput(run_chain, sync_chain)
        chain_views_s = len(maps) / per_chain
        log(f"[bench_remap] pair chain (+{len(maps)} mask co-warps): "
            f"{per_chain * 1000:.1f} ms -> {chain_views_s:.1f} views/s")
    except Exception as exc:
        log(f"[bench_remap] mask chain failed "
            f"({type(exc).__name__}: {str(exc)[:200]})")
        chain_views_s = 0.0

    # reference CPU anchor: cv2.remap bicubic at 1750px runs ~2-4
    # views/s/core (reference hot loop); use 3.0 as the comparison point
    print(json.dumps({
        "metric": "dual-fisheye SFM10 remap views/sec/chip (1750px bicubic)",
        "value": round(views_s, 2),
        "unit": "views/s",
        "vs_reference_cpu_core": round(views_s / 3.0, 2),
        "pair_chain_with_masks_views_s": round(chain_views_s, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
