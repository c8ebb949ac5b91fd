#!/usr/bin/env python3
"""A/B ablation for the wide-class kernels on the production geometries.

Measures, device-synced (queue-drain), each kernel generation on:
  - tilt: the full360coverage pitched +-30 views (8x 1600^2, 104 deg)
  - full360: the full 12-view mixed set (4 yaw + 8 pitched)
  - fisheye: the 8K -> 1792^2 d_fov-190 front/back pair

Usage::

    python tilt_ab.py                  # all scenarios, wide2 vs wide3
    python tilt_ab.py tilt             # one scenario
    python tilt_ab.py tilt --interp bilinear

``GS360X_WIDE3=0`` routes wide-class views to wide2; default is wide3.
``GS360X_WIDE3_PACK`` selects the u8 window packing: ``3``/``rgb``
(one-plane 65536R+256G+B, the default), ``2``/``rg`` (two-plane
256R+G / B), ``0`` (off). Packing cuts window DMA + gather work by
the plane ratio. The script flips the env vars itself between passes:
wide3p3 (1-plane pack), wide3p2 (2-plane pack), wide3 (unpacked),
wide2.

LO-class tuning: run one process per setting (plans are lru_cached), e.g.
``GS360X_WIDE3_LO=24,4 python tilt_ab.py tilt`` or ``...LO=off`` for the
single-branch ablation.
"""
import argparse
import os
import sys
import time

import numpy as np

FOV = 104.2500326978036


def timed(fn, sync, reps=12):
    for _ in range(2):
        sync(fn())
    t0 = time.time(); sync(fn()); t1 = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(reps + 1):
        out = fn()
    sync(out)
    tm = time.time() - t0
    return max((tm - t1) / reps, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenarios", nargs="*",
                    default=["tilt", "full360", "fisheye"])
    ap.add_argument("--interp", default="bicubic",
                    choices=["bicubic", "bilinear"])
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args()

    import jax.numpy as jnp
    from gs360x.kernels import warp_pallas as wp

    rng = np.random.default_rng(0)
    frame8 = (rng.random((3840, 7680, 3)) * 255).astype(np.uint8)
    rows = jnp.asarray(frame8.reshape(3840, 7680 * 3))
    rows.block_until_ready()

    def sync(out):
        return float(out.sum())

    f360_yaws = np.array([0., 90., 180., -90.,
                          45., 135., -135., -45.,
                          45., 135., -135., -45.])
    f360_pitch = np.array([0.] * 4 + [30.] * 4 + [-30.] * 4)
    cfgs = {
        "tilt": (f360_yaws[4:], f360_pitch[4:], 1600, 1600, FOV, FOV,
                 "perspective"),
        "full360": (f360_yaws, f360_pitch, 1600, 1600, FOV, FOV,
                    "perspective"),
        "fisheye": (np.array([0., 180.]), np.zeros(2), 1792, 1792,
                    190.0, 190.0, "fisheye_v360"),
    }
    for name in args.scenarios:
        yaws, pitches, w, h, hf, vf, proj = cfgs[name]
        gens = (("wide3p3", "1", "3"), ("wide3p2", "1", "2"),
                ("wide3", "1", "0"), ("wide2", "0", "0"))
        only = os.environ.get("GS360X_AB_GENS", "")
        if only:
            gens = tuple(g for g in gens if g[0] in only.split(","))
        for gen, flag, pack in gens:
            os.environ["GS360X_WIDE3"] = flag
            os.environ["GS360X_WIDE3_PACK"] = pack

            def fn():
                return wp.warp_equirect_to_views_pallas(
                    rows, yaws, pitches, np.zeros_like(yaws),
                    width=w, height=h, hfov_deg=hf, vfov_deg=vf,
                    projection=proj, interp=args.interp, planar=True)

            try:
                per = timed(fn, sync, reps=args.reps)
                print(f"{name:8s} {gen}: {per*1000:7.1f} ms/batch -> "
                      f"{len(yaws)/per:7.1f} views/s", flush=True)
            except Exception as exc:
                print(f"{name:8s} {gen}: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:200]}",
                      flush=True)
    os.environ["GS360X_WIDE3"] = "1"
    os.environ["GS360X_WIDE3_PACK"] = "3"


if __name__ == "__main__":
    sys.exit(main())
