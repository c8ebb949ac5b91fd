#!/usr/bin/env python3
"""Multi-seed segmentation capability evaluation (VERDICT r4 #6).

Trains the test-fixture-sized U-Net (features (16, 32, 64), 64 px) from
N independent seeds on the synthetic corpus and reports, per seed and
aggregated:

* held-out IoU          — same generator family, unseen seed
* photo-style IoU       — photographic-statistics held-out fixtures
* transfer IoU          — HELD-OUT generator config (stripe/Voronoi
                          textures, shifted scales, forced occlusion,
                          gradient light) — the anti-memorization gate
* instance AP@0.5       — watershed instances vs per-instance GT
* adversarial IoU       — transfer config pushed harder (0.3-0.6x
                          subjects, every pair occluding, harsh light);
                          reported UNTHRESHOLDED so the trend is visible
                          across rounds (no gate)

The per-seed table goes into STATUS.md; tests/test_synthseg.py gates
the SHIPPED weights (gs360x/models/weights/, written by
``--save-weights`` from this tool's seed 0 — corpus 448 scenes /
photo_frac 0.7 / batch 16 / lr 3e-3 + warmup-cosine / fg_weight 4 /
flip + augment_batch; the r5 shipped artifact is the 6000-step run),
so the table IS the shipped config's distribution over seeds.
Reference capability being approximated: COCO Mask R-CNN
(/root/reference/cli_tools/gs360_SegmentationMaskTool.py:262-288);
this corpus-bound eval is the offline stand-in (SURVEY §2.1).

Usage::

    python tools/seg_eval.py [--seeds 3] [--steps 6000] [--json-out F]
    python tools/seg_eval.py --seeds 1 --steps 6000 \
        --save-weights gs360x/models/weights/seg_unet_64_v10.msgpack
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FEATS = (16, 32, 64)
SIZE = 64


def train_seed(seed: int, steps: int):
    import jax
    import jax.numpy as jnp

    from gs360x.models import segmentation as seg
    from gs360x.models import synthseg

    cache = (pathlib.Path.home() / ".cache" / "gs360x"
             / f"seg_eval_v10_s{seed}_{steps}")
    state = seg.create_train_state(jax.random.key(seed), 3e-3,
                                   input_size=SIZE, features=FEATS,
                                   decay_steps=steps)
    if cache.exists():
        try:
            params = seg.load_checkpoint(cache, state.params)
            return state.replace(params=params)
        except Exception:
            pass
    images, labels = synthseg.generate_corpus(448, size=SIZE, seed=seed,
                                              photo_frac=0.7)
    rng = np.random.default_rng(seed + 1)
    for step in range(steps):
        idx = rng.integers(0, len(images), 16)
        im, lb = images[idx].copy(), labels[idx]
        if rng.random() < 0.5:
            im = im[:, :, ::-1].copy()
            lb = lb[:, :, ::-1].copy()
        im = synthseg.augment_batch(rng, im)
        state, loss = seg.train_step(state, jnp.asarray(im),
                                     jnp.asarray(lb), fg_weight=4.0)
        if (step + 1) % 500 == 0:
            print(f"[seg_eval] seed {seed} step {step + 1}/{steps} "
                  f"loss {float(loss):.3f}", file=sys.stderr, flush=True)
    try:
        cache.parent.mkdir(parents=True, exist_ok=True)
        seg.save_checkpoint(cache, state.params)
    except Exception:
        pass
    return state


def subject_iou(state, images, labels):
    import jax.numpy as jnp
    logits = state.apply_fn({"params": state.params}, jnp.asarray(images))
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    inter = float(((pred > 0) & (labels > 0)).sum())
    union = float(((pred > 0) | (labels > 0)).sum())
    return inter / max(union, 1.0)


def eval_seed(state, seed: int):
    import jax
    import jax.numpy as jnp

    from gs360x.models import instances
    from gs360x.models import segmentation as seg
    from gs360x.models import synthseg

    out = {}
    # held-out corpus scenes (eval seeds disjoint from training seeds)
    images, labels = synthseg.generate_corpus(16, size=SIZE,
                                              seed=9900 + seed)
    out["heldout_iou"] = subject_iou(state, images, labels)

    rng = np.random.default_rng(4242)
    imgs, labs = zip(*[synthseg.generate_scene(rng, size=SIZE,
                                               photo_style=True)
                       for _ in range(16)])
    out["photo_iou"] = subject_iou(state, np.stack(imgs), np.stack(labs))

    rng = np.random.default_rng(777)
    imgs, labs = zip(*[synthseg.generate_transfer_scene(rng, size=SIZE)
                       for _ in range(16)])
    out["transfer_iou"] = subject_iou(state, np.stack(imgs),
                                      np.stack(labs))

    rng = np.random.default_rng(31337)
    imgs, labs = zip(*[synthseg.generate_transfer_scene(
        rng, size=SIZE, max_subjects=4, zoom=(0.3, 0.6),
        occlude_prob=1.0, grad=(0.25, 0.45)) for _ in range(16)])
    out["adversarial_iou"] = subject_iou(state, np.stack(imgs),
                                         np.stack(labs))

    person = seg.CLASS_TO_INDEX["person"]
    rng = np.random.default_rng(888)
    dets_all, n_gt = [], 0
    for _ in range(12):
        im, _, inst = synthseg.generate_instance_scene(
            rng, size=SIZE, n_people=(2, 3))
        lg = state.apply_fn({"params": state.params},
                            jnp.asarray(im[None]))
        prob = np.asarray(jax.nn.softmax(lg, axis=-1))[0, ..., person]
        pred = np.asarray(jnp.argmax(lg, axis=-1))[0]
        dets = instances.instance_masks(pred == person, prob,
                                        score_thresh=0.3, max_count=10)
        gts = [inst == k for k in range(1, inst.max() + 1)
               if (inst == k).sum() >= 16]
        for d in dets:
            d["gts"] = gts
        dets_all.extend(dets)
        n_gt += len(gts)
    out["instance_ap50"] = instances.average_precision(dets_all, n_gt,
                                                       iou_thresh=0.5)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--save-weights", default=None,
                    help="write seed-0 params to this path as single-file"
                         " msgpack — the shipped-checkpoint format "
                         "(gs360x/models/weights/)")
    args = ap.parse_args()

    rows = []
    for seed in range(args.seeds):
        state = train_seed(seed, args.steps)
        if seed == 0 and args.save_weights:
            from gs360x.models import segmentation as seg
            seg.save_weights(args.save_weights, state.params)
            print(f"[seg_eval] seed-0 weights -> {args.save_weights}",
                  file=sys.stderr, flush=True)
        r = eval_seed(state, seed)
        r["seed"] = seed
        rows.append(r)
        print(f"[seg_eval] seed {seed}: " + ", ".join(
            f"{k}={v:.3f}" for k, v in r.items() if k != "seed"),
            file=sys.stderr, flush=True)

    keys = ["heldout_iou", "photo_iou", "transfer_iou",
            "adversarial_iou", "instance_ap50"]
    print("| seed | " + " | ".join(keys) + " |")
    print("|---" * (len(keys) + 1) + "|")
    for r in rows:
        print(f"| {r['seed']} | " + " | ".join(
            f"{r[k]:.3f}" for k in keys) + " |")
    mins = {k: min(r[k] for r in rows) for k in keys}
    print("| min | " + " | ".join(f"{mins[k]:.3f}" for k in keys) + " |")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"rows": rows, "min": mins}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
