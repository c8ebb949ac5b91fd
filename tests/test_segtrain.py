"""Segmentation training CLI: pair matching, resize, end-to-end smoke."""

import numpy as np
import pytest

from gs360x.io.image import write_image
from gs360x.tools import segtrain


def make_dataset(root, n=6, size=64):
    (root / "img").mkdir(parents=True)
    (root / "mask").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 60, (size, size, 3)).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        c = int(rng.integers(20, size - 20))
        img[c - 8:c + 8, c - 8:c + 8] = 220
        mask[c - 8:c + 8, c - 8:c + 8] = 255
        write_image(root / "img" / f"f{i:02d}.png", img)
        write_image(root / "mask" / f"f{i:02d}.png",
                    np.stack([mask] * 3, -1))


class TestHelpers:
    def test_find_pairs_matches_stems(self, tmp_path):
        make_dataset(tmp_path, n=3)
        (tmp_path / "img" / "orphan.png").write_bytes(
            (tmp_path / "img" / "f00.png").read_bytes())
        pairs = segtrain.find_pairs(tmp_path / "img", tmp_path / "mask")
        assert len(pairs) == 3
        assert all(i.stem == m.stem for i, m in pairs)

    def test_resize_bilinear_identity(self):
        img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
        out = segtrain.resize_bilinear_np(img, 16, 16)
        np.testing.assert_array_equal(out, img)

    def test_resize_bilinear_constant(self):
        img = np.full((10, 20, 3), 0.5, np.float32)
        out = segtrain.resize_bilinear_np(img, 32, 32)
        assert out.shape == (32, 32, 3)
        np.testing.assert_allclose(out, 0.5, atol=1e-6)

    def test_load_pair_target_mapping(self, tmp_path):
        make_dataset(tmp_path, n=1)
        img, mask = segtrain.load_pair(tmp_path / "img" / "f00.png",
                                       tmp_path / "mask" / "f00.png",
                                       32, target_class=3)
        assert img.shape == (32, 32, 3) and mask.shape == (32, 32)
        assert set(np.unique(mask)) <= {0, 3}
        assert (mask == 3).any()


class TestEndToEnd:
    def test_train_writes_loadable_checkpoint(self, tmp_path):
        from gs360x.models import segmentation as seg

        make_dataset(tmp_path, n=4)
        ckpt = tmp_path / "ckpt"
        rc = segtrain.main([
            "-i", str(tmp_path / "img"), "-m", str(tmp_path / "mask"),
            "-o", str(ckpt), "--target", "person",
            "--epochs", "1", "--batch-size", "8", "--size", "32"])
        assert rc == 0
        params = seg.load_checkpoint(
            ckpt, template_params=seg.init_params(
                __import__("jax").random.key(0), input_size=32))
        assert params is not None

    def test_too_few_pairs_errors(self, tmp_path):
        (tmp_path / "img").mkdir()
        (tmp_path / "mask").mkdir()
        rc = segtrain.main(["-i", str(tmp_path / "img"),
                            "-m", str(tmp_path / "mask"),
                            "-o", str(tmp_path / "c")])
        assert rc == 1
