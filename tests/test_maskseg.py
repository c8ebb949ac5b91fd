"""Segmentation model + mask tool tests."""

import numpy as np
import pytest

from gs360x.kernels import morphology as morph
from gs360x.models import segmentation as seg
from gs360x.tools import maskseg


class TestMorphology:
    def test_dilate_erode_inverse_on_blob(self):
        import jax.numpy as jnp
        m = np.zeros((32, 32), np.float32)
        m[10:20, 10:20] = 1.0
        d = np.asarray(morph.dilate(jnp.asarray(m), 3))
        assert d.sum() > m.sum()
        e = np.asarray(morph.erode(jnp.asarray(d), 3))
        np.testing.assert_array_equal(e > 0, m > 0)

    def test_close_fills_small_holes(self):
        import jax.numpy as jnp
        m = np.ones((20, 20), np.float32)
        m[10, 10] = 0.0
        out = np.asarray(morph.close_mask(jnp.asarray(m), 5))
        assert out[10, 10] == 1.0

    def test_connected_components(self):
        m = np.zeros((20, 20), bool)
        m[2:5, 2:5] = True
        m[10:15, 10:15] = True
        labels, count = morph.connected_components(m)
        assert count == 2
        assert labels[3, 3] != labels[12, 12]
        assert labels[0, 0] == 0

    def test_diffusion_inpaint_fills_hole(self):
        import jax.numpy as jnp
        img = np.full((24, 24, 3), 0.8, np.float32)
        img[8:16, 8:16] = 0.0
        mask = np.zeros((24, 24), bool)
        mask[8:16, 8:16] = True
        out = np.asarray(morph.diffusion_inpaint(jnp.asarray(img),
                                                 jnp.asarray(mask), 128))
        assert abs(out[12, 12, 0] - 0.8) < 0.05
        assert out[0, 0, 0] == pytest.approx(0.8)

    def test_gaussian_blur_preserves_mean(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        img = rng.random((32, 32)).astype(np.float32)
        out = np.asarray(morph.gaussian_blur(jnp.asarray(img), 2.0, 5))
        assert abs(out.mean() - img.mean()) < 0.01
        assert out.std() < img.std()


class TestModel:
    def test_forward_shapes(self):
        import jax
        params = seg.init_params(jax.random.key(0), 64)
        pred = seg.SegmentationPredictor(params)
        rgb = np.random.default_rng(0).random((80, 120, 3)).astype(np.float32)
        probs = pred.class_probabilities(rgb)
        assert probs.shape == (80, 120, seg.NUM_CLASSES)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)

    def test_train_step_reduces_loss(self):
        import jax
        state = seg.create_train_state(jax.random.key(0), 3e-3, 32)
        rng = np.random.default_rng(0)
        images = rng.random((2, 32, 32, 3)).astype(np.float32)
        labels = np.zeros((2, 32, 32), np.int32)
        labels[:, 8:24, 8:24] = seg.CLASS_TO_INDEX["person"]
        losses = []
        for _ in range(8):
            state, loss = seg.train_step(state, images, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_checkpoint_round_trip(self, tmp_path):
        import jax
        params = seg.init_params(jax.random.key(1), 32)
        seg.save_checkpoint(tmp_path / "ckpt", params)
        back = seg.load_checkpoint(tmp_path / "ckpt", params)
        leaves_a = jax.tree.leaves(params)
        leaves_b = jax.tree.leaves(back)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_trained_model_detects_region(self, tmp_path):
        """Overfit a tiny model on one synthetic image; predictor must find
        the subject region through the full detect() contract."""
        import jax
        state = seg.create_train_state(jax.random.key(0), 3e-3, 64)
        rng = np.random.default_rng(1)
        img = rng.random((64, 64, 3)).astype(np.float32) * 0.2
        img[16:48, 16:48] = [0.9, 0.1, 0.1]  # red square "person"
        labels = np.zeros((64, 64), np.int32)
        labels[16:48, 16:48] = seg.CLASS_TO_INDEX["person"]
        for _ in range(60):
            state, loss = seg.train_step(state, img[None], labels[None])
        pred = seg.SegmentationPredictor(state.params)
        dets = pred.detect(img, ["person"], score_thresh=0.5)
        assert dets, "no detections after overfitting"
        mask = dets[0]["mask"]
        inside = mask[20:44, 20:44].mean()
        outside = mask[:10, :10].mean()
        assert inside > 0.8 and outside < 0.2

    def test_inference_size_rule(self):
        nh, nw = seg.inference_size(1080, 1920)
        assert max(nh, nw) <= seg.MAX_SIZE
        assert nh % 16 == 0 and nw % 16 == 0


class TestMaskRefinement:
    def test_fuse_mask_to_edges(self):
        m = np.zeros((50, 50), np.uint8)
        m[40:45, 20:30] = 255  # blob near the bottom, within 25 px
        out = maskseg.fuse_mask_to_edges(m, 25)
        assert out[49, 25] == 255      # extended to border
        assert out[0, 25] == 0         # top untouched

    def test_expand_mask_pixels_and_percent(self):
        m = np.zeros((100, 100), np.uint8)
        m[50, 50] = 255
        outp = maskseg.expand_mask(m, "pixels", 5, 0)
        assert outp[45, 50] == 255 and outp[40, 50] == 0
        outpc = maskseg.expand_mask(m, "percent", 0, 3.0)
        assert outpc[47, 50] == 255

    def test_manual_mask_key(self):
        import pathlib
        assert maskseg.manual_mask_key_for_path(
            pathlib.Path("video_0000012_A_U.jpg")) == "view__A_U"
        assert maskseg.manual_mask_key_for_path(
            pathlib.Path("plain.jpg")) == "file__plain"

    def test_target_resolution(self):
        class A:
            target = "animal"
            target_name = None
        assert maskseg.resolve_targets(A) == ["bird", "cat", "dog"]

        class B:
            target = None
            target_name = "motorbike"
        assert maskseg.resolve_targets(B) == ["motorcycle"]

        class C:
            target = None
            target_name = "spaceship"
        with pytest.raises(ValueError):
            maskseg.resolve_targets(C)


class TestCli:
    def test_end_to_end_with_manual_layer(self, tmp_path, capsys):
        from PIL import Image

        in_dir = tmp_path / "imgs"
        in_dir.mkdir()
        rng = np.random.default_rng(0)
        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(in_dir / "frame_0001_A.png")
        manual = tmp_path / "manual"
        manual.mkdir()
        layer = np.zeros((64, 96), np.uint8)
        layer[10:20, 10:20] = 255
        Image.fromarray(layer).save(manual / "view__A__add.png")

        out = tmp_path / "masks"
        rc = maskseg.main(["-i", str(in_dir), "-o", str(out),
                           "--manual-mask-dir", str(manual),
                           "--mask-expand-pixels", "0",
                           "--edge-fuse-pixels", "0", "--allow-random",
                           "--score-thresh", "1.1"])  # suppress random dets
        assert rc == 0
        mask = np.asarray(Image.open(out / "frame_0001_A.png"))
        # mode=mask inverts: manual region black, background white
        assert mask[15, 15] == 0
        assert mask[40, 60] == 255

    def test_modes_produce_files(self, tmp_path):
        from PIL import Image

        in_dir = tmp_path / "i"
        in_dir.mkdir()
        img = np.full((32, 32, 3), 128, np.uint8)
        Image.fromarray(img).save(in_dir / "x.png")
        for mode, name in [("alpha", "x.png"), ("cutout", "x_cutout.png"),
                           ("keep_person", "x_keep_person.png"),
                           ("inpaint", "x_inpaint.png")]:
            out = tmp_path / f"o_{mode}"
            rc = maskseg.main(["-i", str(in_dir), "-o", str(out),
                               "--mode", mode, "--allow-random",
                               "--score-thresh", "1.1"])
            assert rc == 0
            assert (out / name).exists(), mode

    def test_missing_dir(self, tmp_path, capsys):
        assert maskseg.main(["-i", str(tmp_path / "none")]) == 1
