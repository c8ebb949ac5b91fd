"""Map-remap Pallas kernel vs the XLA remap (interpret mode on CPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gs360x.kernels import remap_pallas as rp  # noqa: E402
from gs360x.kernels import warp as w  # noqa: E402
from gs360x.kernels.warp_pallas import PallasFallback  # noqa: E402


def barrel_maps(H, W, src_h, src_w, shift=(30.0, 20.0)):
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    nx = (xx - W / 2) / W
    ny = (yy - H / 2) / H
    r2 = nx * nx + ny * ny
    map_x = np.clip(xx * (1 + 0.08 * r2) + shift[0], 0, src_w - 1)
    map_y = np.clip(yy * (1 + 0.08 * r2) + shift[1], 0, src_h - 1)
    return map_x.astype(np.float32), map_y.astype(np.float32)


@pytest.fixture(scope="module")
def src():
    return np.random.default_rng(0).random((256, 384, 3)).astype(np.float32)


class TestRemapPallas:
    @pytest.mark.parametrize("interp", [
        "bilinear",
        pytest.param("bicubic", marks=pytest.mark.slow),
        pytest.param("catmull-rom", marks=pytest.mark.slow)])
    def test_matches_xla_remap(self, src, interp):
        map_x, map_y = barrel_maps(64, 128, 256, 384)
        out = rp.remap_pallas(src, map_x, map_y, None, interp=interp,
                              planar=False, interpret=True)
        ref = w.remap(jnp.asarray(src), jnp.asarray(map_x),
                      jnp.asarray(map_y), interp=interp)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    def test_valid_fill(self, src):
        map_x, map_y = barrel_maps(64, 128, 256, 384)
        valid = np.zeros((64, 128), bool)
        valid[16:48, 32:96] = True
        out = rp.remap_pallas(src, map_x, map_y, valid, interp="bilinear",
                              fill=0.25, planar=False, interpret=True)
        out = np.asarray(out)
        np.testing.assert_allclose(out[0, 0], 0.25, atol=1e-6)
        assert (np.abs(out[32, 64] - 0.25) > 1e-3).any()

    def test_non_tile_aligned_output(self, src):
        map_x, map_y = barrel_maps(50, 200, 256, 384)
        out = rp.remap_pallas(src, map_x, map_y, None, interp="bilinear",
                              planar=False, interpret=True)
        assert out.shape == (50, 200, 3)

    def test_prepared_reuse(self, src):
        map_x, map_y = barrel_maps(32, 128, 256, 384)
        prep = rp.PreparedRemap(map_x, map_y, None, src_w=384, src_h=256)
        a = prep(src, interp="bilinear", interpret=True)
        b = prep(src * 0.5, interp="bilinear", interpret=True)
        np.testing.assert_allclose(np.asarray(a) * 0.5, np.asarray(b),
                                   atol=1e-6)

    def test_budget_exceeded_raises(self, src):
        # map jumping across the whole source inside one tile
        map_x = np.zeros((16, 128), np.float32)
        map_x[:, 64:] = 380.0
        map_y = np.full((16, 128), 10.0, np.float32)
        with pytest.raises(PallasFallback):
            rp.remap_pallas(src, map_x, map_y, None, interpret=True)

    def test_rows_input(self, src):
        map_x, map_y = barrel_maps(32, 128, 256, 384)
        rows = src.reshape(256, 384 * 3)
        a = rp.remap_pallas(src, map_x, map_y, None, interpret=True)
        b = rp.remap_pallas(rows, map_x, map_y, None, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
