#!/usr/bin/env python3
"""Ablation timings for the wide2 (tilt) kernel on the bench geometry."""
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from gs360x.kernels import warp_pallas as wp

    rng = np.random.default_rng(0)
    frame8 = (rng.random((3840, 7680, 3)) * 255).astype(np.uint8)
    rows = jnp.asarray(frame8.reshape(3840, 7680 * 3))
    rows.block_until_ready()
    yaws = np.array([45., 135., -135., -45.] * 2)
    pitches = np.array([30.] * 4 + [-30.] * 4)
    zeros = np.zeros(8)
    fov = 104.2500326978036

    def sync(out):
        return float(out.sum())

    def timed(fn, reps=12):
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

    for interp in (sys.argv[1:] or ["bicubic", "bilinear"]):
        def fn(interp=interp):
            return wp.warp_equirect_to_views_pallas(
                rows, yaws, pitches, zeros, width=1600, height=1600,
                hfov_deg=fov, vfov_deg=fov, interp=interp, planar=True)
        per = timed(fn)
        print(f"{interp}: {per*1000:.1f} ms/8 views -> "
              f"{8/per:.1f} views/s")


if __name__ == "__main__":
    main()
