"""Phase breakdown of the warp kernels on the real chip.

Measures the yaw kernel (and the planarize pass) at STOP_AFTER stages to
see where the 1.32 ms/view goes, plus wide-kernel timing on a
full360coverage tilted view.
"""
import sys
import time

import numpy as np


def timed_throughput(fn, sync, warm=1, reps=8):
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
    which = sys.argv[1] if len(sys.argv) > 1 else "yaw"
    stop_after = sys.argv[2] if len(sys.argv) > 2 else "full"

    import gs360x.kernels.warp_pallas as wp
    wp.STOP_AFTER = stop_after
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frame8 = (rng.random((3840, 7680, 3)) * 255).astype(np.uint8)
    rows = jnp.asarray(frame8.reshape(3840, 7680 * 3))
    rows.block_until_ready()

    def sync(out):
        return float(out.sum())

    if which == "planarize":
        def run():
            return wp._planar_source(rows)
        per = timed_throughput(run, sync)
        print(f"planarize: {per*1000:.2f} ms/frame", flush=True)
        return

    if which == "yaw":
        n = 8
        yaws = np.arange(n) * (360.0 / n)
        zeros = np.zeros(n)
        W, H, HF, VF = 1920, 1080, 112.6, 73.7
    elif which == "tilt1600":
        # full360coverage pitched views (these go to the wide kernel)
        n = 8
        yaws = np.array([45., 135., -135., -45.] * 2)
        zeros = np.array([30.] * 4 + [-30.] * 4)
        W = H = 1600
        HF = VF = 104.2500326978036
        yaws, pitches = yaws, zeros
    elif which == "tilt1080":
        # default-preset geometry pitched +-30 (narrow/tilt class)
        n = 8
        yaws = np.arange(n) * 45.0
        zeros = np.array([30., -30.] * 4)
        W, H, HF, VF = 1920, 1080, 112.6, 73.7

    pitches = zeros if which != "yaw" else np.zeros(n)
    rolls = np.zeros(n)

    def run():
        return wp.warp_equirect_to_views_pallas(
            rows, yaws, pitches, rolls, width=W, height=H,
            hfov_deg=HF, vfov_deg=VF, interp="bicubic", planar=True)

    per = timed_throughput(run, sync)
    print(f"{which} STOP_AFTER={stop_after}: {per*1000:.2f} ms/frame "
          f"-> {n/per:.1f} views/s", flush=True)


if __name__ == "__main__":
    main()
