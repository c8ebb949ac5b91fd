"""gs360x-warmup — prime the persistent kernel-compile cache.

First contact with a new (source size × view size × preset) combination
pays the Mosaic compile for its warp kernels — minutes through a remote
compile service. The compiled binaries land in the persistent JAX cache
(``~/.cache/gs360x/jax_cache``), so paying it once per machine, ahead of
time, makes every later run start hot. This tool runs one dummy frame
through the exact kernel classes a production run would use.

Examples::

    gs360x-warmup --src 7680x3840 --size 1600 --preset default
    gs360x-warmup --src 5760x2880 --size 1600 --preset fisheyelike \\
                  --interp bicubic bilinear
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def parse_wh(text: str):
    for sep in ("x", "X", ","):
        if sep in text:
            w, h = text.split(sep, 1)
            return int(w), int(h)
    raise argparse.ArgumentTypeError(f"expected WxH, got {text!r}")


def build_arg_parser() -> argparse.ArgumentParser:
    from gs360x.rig.presets import PRESET_CHOICES

    ap = argparse.ArgumentParser(
        description="Pre-compile the warp kernels for given shapes so "
                    "production runs start hot.")
    ap.add_argument("--src", type=parse_wh, default=(7680, 3840),
                    help="Equirect source size WxH (default 7680x3840)")
    ap.add_argument("--size", type=int, nargs="+", default=[1600],
                    help="View sizes to warm (square px)")
    ap.add_argument("--preset", choices=PRESET_CHOICES, nargs="+",
                    default=["default"],
                    help="Presets whose view sets to warm")
    ap.add_argument("--interp", choices=["bicubic", "bilinear"], nargs="+",
                    default=["bicubic"])
    return ap


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    import pathlib

    import jax

    from gs360x.rig.presets import PerspCutConfig, build_view_plan
    from gs360x.runtime.executor import _warp_frame_views

    src_w, src_h = args.src
    rng = np.random.default_rng(0)
    frame = (rng.random((src_h, src_w, 3)) * 255).astype(np.uint8)
    print(f"[INFO] device: {jax.devices()[0]}  source {src_w}x{src_h}")

    n = 0
    for preset in args.preset:
        for size in args.size:
            cfg = PerspCutConfig(preset=preset, size=size,
                                 size_explicit=True)
            plan = build_view_plan(cfg, [pathlib.Path("warmup.jpg")],
                                   pathlib.Path("."))
            views = plan.unique_views()
            for interp in args.interp:
                t0 = time.time()
                outs = _warp_frame_views(frame, views, interp=interp,
                                         backend="auto", quantize_bits=8)
                for out, _planar in outs:
                    np.asarray(out)
                n += 1
                print(f"[OK] {preset} size={size} {interp}: "
                      f"{len(views)} views in {time.time() - t0:.1f}s "
                      "(compiles now cached)")
    print(f"[OK] warmed {n} configuration(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
