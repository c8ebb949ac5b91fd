"""Sharpness metric + optical flow kernel tests."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gs360x.kernels import flow as flowk
from gs360x.kernels import sharpness as sharp


def blur_np(a, k=5, n=1):
    for _ in range(n):
        p = np.pad(a, k // 2, mode="edge")
        a = sum(p[i:i + a.shape[0], j:j + a.shape[1]]
                for i in range(k) for j in range(k)) / (k * k)
    return a


@pytest.fixture(scope="module")
def sharp_and_blurry():
    rng = np.random.default_rng(0)
    sharp_img = (rng.random((96, 128)) * 255).astype(np.float32)
    blurry_img = blur_np(sharp_img, 5, 2).astype(np.float32)
    return jnp.asarray(sharp_img), jnp.asarray(blurry_img)


class TestSharpnessMetrics:
    def test_lapvar_orders_sharpness(self, sharp_and_blurry):
        s, b = sharp_and_blurry
        assert float(sharp.laplacian_variance(s)) > 5 * float(
            sharp.laplacian_variance(b))

    def test_tenengrad_orders_sharpness(self, sharp_and_blurry):
        s, b = sharp_and_blurry
        assert float(sharp.tenengrad(s)) > 3 * float(sharp.tenengrad(b))

    def test_fft_orders_sharpness(self, sharp_and_blurry):
        s, b = sharp_and_blurry
        assert float(sharp.fft_energy(s)) > 2 * float(sharp.fft_energy(b))

    def test_sobel_yavg_orders_sharpness(self, sharp_and_blurry):
        s, b = sharp_and_blurry
        assert float(sharp.sobel_yavg(s)) > float(sharp.sobel_yavg(b))

    def test_constant_image_scores_zero(self):
        c = jnp.full((64, 64), 100.0)
        assert float(sharp.laplacian_variance(c)) == pytest.approx(0.0, abs=1e-3)
        assert float(sharp.tenengrad(c)) == pytest.approx(0.0, abs=1e-3)

    def test_laplacian_matches_cv2_kernel_semantics(self):
        # impulse response of the ksize=3 Laplacian: [[2,0,2],[0,-8,0],[2,0,2]]
        img = np.zeros((7, 7), np.float32)
        img[3, 3] = 1.0
        lap = np.asarray(sharp._conv3x3(jnp.asarray(img), sharp._LAPLACIAN_K3))
        assert lap[3, 3] == -8.0
        assert lap[2, 2] == 2.0 and lap[2, 4] == 2.0
        assert lap[2, 3] == 0.0

    def test_mask_excludes_region(self):
        rng = np.random.default_rng(1)
        img = np.zeros((64, 64), np.float32)
        img[:, 32:] = (rng.random((64, 32)) * 255)  # right half noisy
        mask_left = np.zeros((64, 64), bool)
        mask_left[:, :32] = True
        full = float(sharp.tenengrad(jnp.asarray(img)))
        left = float(sharp.tenengrad(jnp.asarray(img), jnp.asarray(mask_left)))
        assert left < full * 0.3

    def test_brightness_and_highlights(self):
        img = jnp.full((32, 32), 255.0)
        assert float(sharp.brightness_mean(img)) == pytest.approx(1.0)
        assert float(sharp.highlight_ratio(img)) == pytest.approx(1.0)
        assert float(sharp.highlight_ratio(jnp.zeros((32, 32)))) == 0.0

    def test_circle_mask(self):
        m = np.asarray(sharp.circle_mask(64, 64))
        assert m[32, 32] and not m[0, 0]
        assert abs(m.mean() - math.pi / 4) < 0.03

    def test_crop_by_ratio(self):
        ys, xs = sharp.crop_by_ratio((100, 200), 0.8)
        assert ys == slice(10, 90) and xs == slice(20, 180)

    def test_downscale_max_long(self):
        img = np.arange(100 * 200, dtype=np.float32).reshape(100, 200)
        out = sharp.downscale_max_long(img, 50)
        assert max(out.shape) == 50
        assert abs(out.mean() - img.mean()) < 1.0

    def test_motion_and_brightness_weights(self):
        assert sharp.motion_factor_from_tenengrad(1e9) == pytest.approx(1.0, abs=1e-3)
        assert sharp.motion_factor_from_tenengrad(0.0) == pytest.approx(0.6)
        assert sharp.brightness_weight(0.5) == 1.0
        assert sharp.brightness_weight(0.0) == pytest.approx(0.5)


class TestFlow:
    def test_known_shift(self):
        rng = np.random.default_rng(0)
        base = blur_np((rng.random((128, 168)) * 255), 5, 2).astype(np.float32)
        curr = np.roll(base, (3, 5), (0, 1))
        mag = flowk.mean_flow_magnitude(jnp.asarray(base), jnp.asarray(curr))
        assert abs(mag - math.hypot(3, 5)) < 0.8

    def test_zero_motion(self):
        rng = np.random.default_rng(1)
        base = blur_np((rng.random((96, 128)) * 255), 5, 1).astype(np.float32)
        mag = flowk.mean_flow_magnitude(jnp.asarray(base), jnp.asarray(base))
        assert mag == pytest.approx(0.0, abs=0.05)

    def test_corners_on_checkerboard(self):
        img = np.zeros((64, 64), np.float32)
        img[::16, :] = 255
        img[:, ::16] = 255
        pts, valid = flowk.shi_tomasi_corners(jnp.asarray(blur_np(img, 3)))
        assert int(valid.sum()) > 4


class TestThrottle:
    def test_limiter_gates_concurrency(self):
        import threading
        import time

        from gs360x.runtime.throttle import AdaptiveLimiter

        lim = AdaptiveLimiter(2)
        peak = [0]
        cur = [0]
        lock = threading.Lock()

        def work():
            with lim:
                with lock:
                    cur[0] += 1
                    peak[0] = max(peak[0], cur[0])
                time.sleep(0.02)
                with lock:
                    cur[0] -= 1

        threads = [threading.Thread(target=work) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert peak[0] <= 2

    def test_set_target_clamps(self):
        from gs360x.runtime.throttle import AdaptiveLimiter

        lim = AdaptiveLimiter(4)
        lim.set_target(100)
        assert lim.target == 4   # never above base
        lim.set_target(0)
        assert lim.target == 1   # never below 1

    def test_memory_ratio_readable_or_none(self):
        from gs360x.runtime.throttle import memory_usage_ratio

        r = memory_usage_ratio()
        assert r is None or 0.0 <= r <= 1.0

    def test_monitor_nudges_down_on_pressure(self, monkeypatch):
        import time

        from gs360x.runtime import throttle

        lim = throttle.AdaptiveLimiter(4)
        monkeypatch.setattr(throttle, "memory_usage_ratio", lambda: 0.95)
        mon = throttle.MemoryMonitor(lim, interval=0.01)
        with mon:
            time.sleep(0.1)
        assert lim.target < 4

class TestFarneback:
    def test_recovers_known_translation(self):
        import math

        from gs360x.kernels import flow as flowk

        h, w = 96, 128
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")

        def pat(ox, oy):
            return (0.5 + 0.3 * np.sin(2 * np.pi * (xx + ox) / 24)
                    * np.cos(2 * np.pi * (yy + oy) / 20)).astype(np.float32)

        prev, curr = pat(0, 0), pat(-2, -1)   # content moved +2x, +1y
        flow = np.asarray(flowk.farneback_flow(prev, curr))
        inner = flow[20:-20, 20:-20]
        assert abs(inner[..., 0].mean() - 2.0) < 0.1
        assert abs(inner[..., 1].mean() - 1.0) < 0.1
        mag = flowk.mean_flow_magnitude_farneback(prev, curr)
        assert abs(mag - math.hypot(2, 1)) < 0.15

    def test_static_scene_is_near_zero(self):
        from gs360x.kernels import flow as flowk

        rng = np.random.default_rng(0)
        img = rng.random((64, 96)).astype(np.float32)
        mag = flowk.mean_flow_magnitude_farneback(img, img)
        assert mag < 1e-3
