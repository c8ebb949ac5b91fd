"""Native C++ library tests: build, bindings, numpy parity."""

import numpy as np
import pytest

from gs360x import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.HAS_NATIVE:
        pytest.skip("native library not built (no toolchain)")


class TestLayout:
    def test_interleave_round_trip(self):
        rng = np.random.default_rng(0)
        hwc = rng.integers(0, 256, (33, 47, 3), np.uint8)
        chw = native.deinterleave_u8(hwc)
        np.testing.assert_array_equal(chw, np.moveaxis(hwc, -1, 0))
        back = native.interleave_u8(chw)
        np.testing.assert_array_equal(back, hwc)

    def test_planar_f32_to_u8(self):
        rng = np.random.default_rng(1)
        chw = rng.random((3, 64, 80)).astype(np.float32)
        out = native.planar_f32_to_u8_hwc(chw)
        ref = np.clip(np.moveaxis(chw, 0, -1) * 255.0 + 0.5,
                      0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out, ref)

    def test_planar_f32_clamps(self):
        chw = np.array([[[-0.5, 2.0]], [[0.0, 1.0]], [[0.5, 0.25]]],
                       np.float32)
        out = native.planar_f32_to_u8_hwc(chw)
        assert out[0, 0, 0] == 0 and out[0, 1, 0] == 255

    def test_multithreaded_matches(self):
        rng = np.random.default_rng(2)
        chw = rng.random((3, 256, 320)).astype(np.float32)
        np.testing.assert_array_equal(
            native.planar_f32_to_u8_hwc(chw, threads=1),
            native.planar_f32_to_u8_hwc(chw, threads=4))


class TestYuv:
    def test_yuv444_matches_numpy(self):
        from gs360x.io.video import rgb_to_yuv601, yuv601_to_rgb

        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, (48, 64, 3), np.uint8)
        yuv = rgb_to_yuv601(rgb)
        planes = np.ascontiguousarray(np.moveaxis(yuv, -1, 0))
        nat = native.yuv444_to_rgb(planes)
        ref = yuv601_to_rgb(yuv)
        assert np.abs(nat.astype(int) - ref.astype(int)).max() <= 1

    def test_y4m_reader_uses_native(self, tmp_path):
        from gs360x.io import video as vio

        rng = np.random.default_rng(4)
        frames = [rng.integers(0, 256, (32, 64, 3), np.uint8)
                  for _ in range(3)]
        p = tmp_path / "v.y4m"
        vio.write_y4m(p, frames, fps=3.0)
        out = list(vio.Y4MReader(p).frames())
        assert len(out) == 3
        assert np.abs(out[0].astype(int) - frames[0].astype(int)).max() <= 3


class TestAviScan:
    def test_scan_matches_python(self, tmp_path):
        from gs360x.io import video as vio

        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (32, 48, 3), np.uint8)
                  for _ in range(5)]
        p = tmp_path / "v.avi"
        vio.write_mjpeg_avi(p, frames, fps=12.5)
        offs, sizes, info = native.avi_scan(p.read_bytes())
        assert len(offs) == 5
        assert info["width"] == 48 and info["height"] == 32
        assert info["fps"] == pytest.approx(12.5)
        # reader (which prefers native scan) decodes identical frames
        out = list(vio.MJPEGAVIReader(p).frames())
        assert len(out) == 5

    def test_rejects_non_avi(self):
        with pytest.raises(ValueError):
            native.avi_scan(b"RIFFxxxxWAVE" + b"\x00" * 100)
