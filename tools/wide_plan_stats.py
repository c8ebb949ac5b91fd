#!/usr/bin/env python3
"""Host-side work model for the wide3 kernel — the analytic half of
``docs/WIDE_ROOFLINE.md`` (VERDICT r4 #1).

For each production wide-class geometry this prints, from the actual
planner tables (no chip needed):

- per-view classes: win_rows / resid_lo / resid_hi / spread_lo,
  LO/HI/chunk flag distribution;
- touched (tile, block, group) work items per branch (the kernel's
  touch gate);
- executed sweep trips (group shear span + taps, rounded up to the
  unroll), vs the USEFUL-tap minimum (n_taps trips per pixel column);
- vsel select-chain totals.

Combine with ``tools/wide_roofline.py`` (measured per-phase ms) to get
ns/trip and compare against ``micro_ops.py``'s primitive floors.
"""
import json
import math
import sys

import numpy as np

FOV = 104.2500326978036


def analyze(name, yaws, pitches, w, h, hf, vf, proj):
    from gs360x.kernels import warp_pallas as wp

    src_w, src_h = 7680, 3840
    out_w = w + (-w) % wp.TILE_COLS
    out_h = h + (-h) % wp.TILE_ROWS
    fisheye_out = proj in ("fisheye_v360", "equisolid")
    v_pad = 0
    if any(wp._view_needs_pole_pad(out_w, out_h, hf, vf, float(yv),
                                   float(pv), 0.0, src_w, src_h, w, h,
                                   proj)
           for yv, pv in zip(yaws, pitches)):
        v_pad = wp.POLE_PAD

    n_taps = 4
    plans = []
    wide_views = 0
    for yv, pv in zip(yaws, pitches):
        if not fisheye_out and float(pv) % 360.0 == 0.0:
            continue            # yaw-ring class, not wide
        p = wp._wide3_plan_view(out_w, out_h, hf, vf, float(yv),
                                float(pv), 0.0, src_w, src_h, w, h,
                                proj, "bicubic", v_pad=v_pad)
        if p is None:
            print(f"  view yaw={yv} pitch={pv}: wide3 plan FAILED")
            continue
        wide_views += 1
        plans.append((yv, pv, p))

    if not plans:
        print(f"{name}: no wide views")
        return None

    # call-level class maxima (mixed dispatch pins these)
    win_w3 = max(p[0] for _, _, p in plans)
    rlo = max(p[1] for _, _, p in plans)
    rhi = max(p[2] for _, _, p in plans)
    slo = max(p[3] for _, _, p in plans)
    if slo == 0:
        rlo = rhi
    agg = {"views": wide_views, "win_rows": win_w3, "resid_lo": rlo,
           "resid_hi": rhi, "spread_lo": slo,
           "flags": {"LO": 0, "HI": 0, "CHUNK": 0, "untouched": 0},
           "work_items": {"LO": 0, "HI": 0, "CHUNK": 0},
           "exec_trips": {"LO": 0, "HI": 0},
           "useful_trips": 0, "vsel_selects": 0, "vsel_reads": 0,
           "out_px": wide_views * w * h}
    unroll = 8
    NG = wp.TILE_ROWS // 8
    nvv_lo, nvv_hi = rlo // 8, rhi // 8
    ncs_hi = (win_w3 - rhi) // 8
    for yv, pv, p in plans:
        # re-plan pinned like the dispatcher
        p = wp._wide3_plan_view(out_w, out_h, hf, vf, float(yv),
                                float(pv), 0.0, src_w, src_h, w, h,
                                proj, "bicubic",
                                force=(win_w3, rlo, rhi, slo),
                                v_pad=v_pad)
        assert p is not None
        tab, cs = p[6], p[7]
        n_tiles = tab.shape[0]
        # recompute per-(tile, group) shear spans + touch from geometry
        rot = wp._rot_matrix(float(yv), float(pv), 0.0)
        u, v = wp._np_view_coords_strided(
            out_w, out_h, hf, vf, rot, src_w, src_h, stride=1,
            true_w=w, true_h=h, projection=proj)
        u = np.mod(u, float(src_w))
        if proj == "perspective":
            valid = np.ones_like(u, dtype=bool)
        else:
            xs = (2.0 * np.arange(out_w) + 1.0) / w - 1.0
            ys = (2.0 * np.arange(out_h) + 1.0) / h - 1.0
            nxg, nyg = np.meshgrid(xs, ys)
            valid = np.hypot(nxg, nyg) <= 1.0
        n_ty, n_tx = out_h // wp.TILE_ROWS, out_w // wp.TILE_COLS
        koff = -1
        for ty in range(n_ty):
            for tx in range(n_tx):
                t = ty * n_tx + tx
                b0, nblk = int(tab[t, 0]), int(tab[t, 1])
                anchor = int(tab[t, 2])
                ut = u[ty * wp.TILE_ROWS:(ty + 1) * wp.TILE_ROWS,
                       tx * wp.TILE_COLS:(tx + 1) * wp.TILE_COLS]
                mt = valid[ty * wp.TILE_ROWS:(ty + 1) * wp.TILE_ROWS,
                           tx * wp.TILE_COLS:(tx + 1) * wp.TILE_COLS]
                wsrc = float(src_w)
                ua = anchor + np.mod(ut - anchor + wsrc / 2.0, wsrc) \
                    - wsrc / 2.0
                x0 = np.floor(ua).astype(np.int64)
                for g in range(NG):
                    flag = int(tab[t, 3 + g])
                    xg = x0[g * 8:(g + 1) * 8]
                    mg = mt[g * 8:(g + 1) * 8]
                    if not mg.any():
                        agg["flags"]["untouched"] += 1
                        continue
                    key = ("LO", "HI", "CHUNK")[flag]
                    agg["flags"][key] += 1
                    # kernel x0 sanitization for invalid lanes
                    if not mg.all():
                        lane_max = np.where(mg, xg, -1 << 28).max(0)
                        glob_min = np.where(mg, xg, 1 << 28).min()
                        fill = np.where(lane_max > -(1 << 28), lane_max,
                                        glob_min)
                        xg = np.where(mg, xg, fill[None, :])
                    # the kernel's sweep bounds: per-lane deviation from
                    # the lane's row-3 anchor (jb = x0g[3:4, :])
                    dx = xg - xg[3:4, :]
                    span = int(dx.max() - dx.min())
                    trips = span + n_taps
                    exec_trips = math.ceil(trips / unroll) * unroll
                    for b in range(nblk):
                        bcol = (b0 + b) * 128 - anchor  # local? touch uses bcol_local
                        bcol_local = (b0 + b) * 128
                        touch = (xg.max() + koff + n_taps - 1
                                 >= bcol_local) \
                            and (xg.min() + koff < bcol_local + 128)
                        if not touch and flag != 2:
                            continue
                        agg["work_items"][key] += 1
                        if flag == 0:
                            agg["exec_trips"]["LO"] += exec_trips
                            agg["vsel_selects"] += nvv_lo * slo
                            agg["vsel_reads"] += slo + nvv_lo
                        elif flag == 1:
                            agg["exec_trips"]["HI"] += exec_trips
                            agg["vsel_selects"] += nvv_hi * ncs_hi
                            agg["vsel_reads"] += ncs_hi + nvv_hi
                    # useful trips: each valid pixel column needs n_taps
                    # tap positions; a zero-shear group would need
                    # exactly n_taps trips per touched block
                    agg["useful_trips"] += n_taps

    et = agg["exec_trips"]
    wi = agg["work_items"]
    tot_trips = et["LO"] + et["HI"]
    tot_items = wi["LO"] + wi["HI"]
    print(f"{name}: {wide_views} wide views  classes: win {win_w3} "
          f"lo {rlo}/spread {slo} hi {rhi}")
    print(f"  flags: {agg['flags']}")
    print(f"  touched work items: {wi}  (LO nvv={nvv_lo}, HI nvv={nvv_hi},"
          f" ncs_hi={ncs_hi})")
    print(f"  executed sweep trips: LO {et['LO']:,} HI {et['HI']:,} "
          f"(mean {tot_trips / max(tot_items, 1):.1f}/item; useful floor "
          f"{agg['useful_trips']:,} = n_taps/group)")
    print(f"  vsel: {agg['vsel_reads']:,} window reads, "
          f"{agg['vsel_selects']:,} selects")
    return agg


def main():
    cfgs = {
        "tilt": ([45., 135., -135., -45.] * 2,
                 [30.] * 4 + [-30.] * 4, 1600, 1600, FOV, FOV,
                 "perspective"),
        "full360": ([0., 90., 180., -90., 45., 135., -135., -45.,
                     45., 135., -135., -45.],
                    [0.] * 4 + [30.] * 4 + [-30.] * 4, 1600, 1600,
                    FOV, FOV, "perspective"),
        "fisheye": ([0., 180.], [0., 0.], 1792, 1792, 190.0, 190.0,
                    "fisheye_v360"),
    }
    names = sys.argv[1:] or list(cfgs)
    out = {}
    for name in names:
        yaws, pitches, w, h, hf, vf, proj = cfgs[name]
        out[name] = analyze(name, yaws, pitches, w, h, hf, vf, proj)
    with open("/tmp/wide_plan_stats.json", "w") as f:
        json.dump(out, f, indent=1, default=int)
    return 0


if __name__ == "__main__":
    sys.exit(main())
