#!/usr/bin/env python3
"""Per-phase roofline probe for the wide3 warp classes (VERDICT r4 #1).

Runs each production wide-class geometry (tilt / full360 / fisheye)
at every ``GS360X_WIDE3_STOP`` stage — each stage in its OWN
subprocess (the knob is read at trace time) — and prints a phase
breakdown table: DMA+geometry, window reads, vsel select chains,
one-sweep-trip, full sweep.  The deltas between stages attribute the
batch time to kernel phases; together with ``micro_ops.py``'s measured
primitive costs this is the evidence base for ``docs/WIDE_ROOFLINE.md``.

Usage::

    python tools/wide_roofline.py                # all classes, all stages
    python tools/wide_roofline.py tilt fisheye   # subset
    python tools/wide_roofline.py --json out.json
"""
import argparse
import json
import os
import subprocess
import sys

STAGES = ["dma", "read", "vsel", "trip1", "full"]

CHILD = r"""
import os, sys, time
import numpy as np
import jax.numpy as jnp
from gs360x.kernels import warp_pallas as wp

name = sys.argv[1]
rng = np.random.default_rng(0)
frame8 = (rng.random((3840, 7680, 3)) * 255).astype(np.uint8)
rows = jnp.asarray(frame8.reshape(3840, 7680 * 3))
rows.block_until_ready()

FOV = 104.2500326978036
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
yaws, pitches, w, h, hf, vf, proj = cfgs[name]

def fn():
    return wp.warp_equirect_to_views_pallas(
        rows, yaws, pitches, np.zeros_like(yaws),
        width=w, height=h, hfov_deg=hf, vfov_deg=vf,
        projection=proj, interp="bicubic", planar=True)

def sync(out):
    return float(out.sum())

for _ in range(2):
    sync(fn())
t0 = time.time(); sync(fn()); t1 = time.time() - t0
reps = 12
t0 = time.time()
out = None
for _ in range(reps + 1):
    out = fn()
sync(out)
tm = time.time() - t0
per = max((tm - t1) / reps, 1e-9)
print(f"RESULT {per * 1000:.3f}")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenarios", nargs="*",
                    default=["tilt", "full360", "fisheye"])
    ap.add_argument("--json", default=None)
    ap.add_argument("--stages", default=",".join(STAGES))
    args = ap.parse_args()
    stages = args.stages.split(",")

    results = {}
    for name in args.scenarios:
        results[name] = {}
        for stage in stages:
            env = dict(os.environ)
            env["GS360X_WIDE3_STOP"] = stage
            p = subprocess.run(
                [sys.executable, "-c", CHILD, name], env=env,
                capture_output=True, text=True, timeout=1800)
            ms = None
            for line in p.stdout.splitlines():
                if line.startswith("RESULT "):
                    ms = float(line.split()[1])
            if ms is None:
                print(f"{name:8s} {stage:6s}: FAILED rc={p.returncode}\n"
                      f"{p.stderr[-2000:]}", flush=True)
                continue
            results[name][stage] = ms
            print(f"{name:8s} {stage:6s}: {ms:8.1f} ms/batch", flush=True)
        # phase attribution via stage deltas
        r = results[name]
        if all(s in r for s in ("dma", "read", "vsel", "full")):
            print(f"{name:8s} phases: dma+geom {r['dma']:.1f} | "
                  f"win-reads +{r['read'] - r['dma']:.1f} | "
                  f"vsel-chains +{r['vsel'] - r['read']:.1f} | "
                  f"sweep +{r['full'] - r['vsel']:.1f}"
                  + (f" (1 trip: +{r['trip1'] - r['vsel']:.1f})"
                     if 'trip1' in r else ""), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
