"""Unit tests for core camera math: closed-form FOV algebra and ray-model
round trips."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gs360x.core import camera as cam


class TestFovAlgebra:
    def test_hfov_from_focal_12mm_36mm(self):
        # the reference's default preset: 12mm on a 36mm sensor
        assert cam.hfov_from_focal_mm(12.0, 36.0) == pytest.approx(
            math.degrees(2 * math.atan(1.5)))

    def test_focal_round_trip(self):
        for f in (6.0, 12.0, 14.0, 17.0):
            hfov = cam.hfov_from_focal_mm(f, 36.0)
            assert cam.focal_mm_from_hfov(hfov, 36.0) == pytest.approx(f)

    def test_vfov_square_equals_hfov(self):
        assert cam.vfov_from_hfov(90.0, 1600, 1600) == pytest.approx(90.0)

    def test_metashape_focal_px_constants(self):
        # README-published precalibrated f values at 1600px / 36mm sensor
        assert cam.focal_px(12.0, 36.0, 1600) == pytest.approx(533.33333, abs=1e-5)
        assert cam.focal_px(17.0, 36.0, 1600) == pytest.approx(755.55556, abs=1e-5)
        assert cam.focal_px(14.0, 36.0, 1600) == pytest.approx(622.22222, abs=1e-5)


class TestPerspectiveRays:
    def test_center_ray_is_forward(self):
        rays = cam.perspective_rays(64, 64, 90.0, 90.0)
        # average of the four center pixels is the optical axis
        center = np.asarray(rays[31:33, 31:33]).mean(axis=(0, 1))
        center /= np.linalg.norm(center)
        np.testing.assert_allclose(center, [0, 0, 1], atol=1e-6)

    def test_rays_are_unit(self):
        rays = cam.perspective_rays(32, 16, 100.0, 60.0)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays), axis=-1), 1.0, atol=1e-6)

    def test_fov_edges(self):
        # outermost pixel center sits half a pixel inside the FOV edge
        w = 512
        hfov = 90.0
        rays = cam.perspective_rays(w, w, hfov, hfov)
        x_over_z = rays[..., 0] / rays[..., 2]
        half_w = math.tan(math.radians(hfov) / 2)
        expected_max = half_w * (w - 1) / w  # NDC of last pixel center
        assert float(jnp.max(x_over_z)) == pytest.approx(expected_max, rel=1e-5)

    def test_uv_round_trip(self):
        rays = cam.perspective_rays(64, 48, 80.0, 60.0)
        u, v, valid = cam.perspective_uv(rays, 64, 48, 80.0, 60.0)
        uu, vv = np.meshgrid(np.arange(64), np.arange(48))
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(u), uu, atol=1e-3)
        np.testing.assert_allclose(np.asarray(v), vv, atol=1e-3)


class TestEquirect:
    def test_ray_uv_round_trip(self):
        rays = cam.equirect_rays(128, 64)
        u, v = cam.equirect_uv(rays, 128, 64)
        uu, vv = np.meshgrid(np.arange(128), np.arange(64))
        np.testing.assert_allclose(np.asarray(u), uu, atol=1e-2)
        np.testing.assert_allclose(np.asarray(v), vv, atol=1e-2)

    def test_forward_ray_maps_to_center(self):
        ray = jnp.array([[[0.0, 0.0, 1.0]]])
        u, v = cam.equirect_uv(ray, 1000, 500)
        assert float(u[0, 0]) == pytest.approx(499.5)
        assert float(v[0, 0]) == pytest.approx(249.5)

    def test_up_ray_maps_to_top(self):
        ray = jnp.array([[[0.0, -1.0, 0.0]]])  # y down => -y is up
        _, v = cam.equirect_uv(ray, 1000, 500)
        assert float(v[0, 0]) == pytest.approx(-0.5)


class TestFisheye:
    @pytest.mark.parametrize("model", ["equidistant", "equisolid"])
    def test_uv_round_trip_within_circle(self, model):
        rays, valid = cam.fisheye_rays(96, 96, 180.0, model=model)
        u, v, valid2 = cam.fisheye_uv(rays, 96, 96, 180.0, model=model)
        uu, vv = np.meshgrid(np.arange(96), np.arange(96))
        mask = np.asarray(valid & valid2)
        assert mask.sum() > 96 * 96 * 0.5
        np.testing.assert_allclose(np.asarray(u)[mask], uu[mask], atol=1e-2)
        np.testing.assert_allclose(np.asarray(v)[mask], vv[mask], atol=1e-2)

    def test_center_is_forward(self):
        rays, _ = cam.fisheye_rays(64, 64, 180.0)
        c = np.asarray(rays[31:33, 31:33]).mean(axis=(0, 1))
        c /= np.linalg.norm(c)
        np.testing.assert_allclose(c, [0, 0, 1], atol=1e-6)


class TestBrownDistortion:
    def test_zero_coefficients_identity(self):
        x = jnp.linspace(-0.5, 0.5, 11)
        y = jnp.linspace(-0.5, 0.5, 11)
        xd, yd = cam.brown_distort(x, y, 0, 0, 0, 0, 0, 0)
        np.testing.assert_allclose(np.asarray(xd), np.asarray(x), atol=1e-7)
        np.testing.assert_allclose(np.asarray(yd), np.asarray(y), atol=1e-7)

    def test_radial_only_matches_closed_form(self):
        x, y = jnp.array([0.3]), jnp.array([0.4])
        k1 = -0.1
        xd, yd = cam.brown_distort(x, y, k1, 0, 0, 0, 0, 0)
        r2 = 0.25
        assert float(xd[0]) == pytest.approx(0.3 * (1 + k1 * r2))
        assert float(yd[0]) == pytest.approx(0.4 * (1 + k1 * r2))
