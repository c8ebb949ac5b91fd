"""Software rasterizer + point-edit operation tests (headless)."""

import numpy as np
import pytest

from gs360x.gui import plyview, pointedit
from gs360x.gui.plyview import OrbitCamera


class TestOrbitCamera:
    def test_eye_behind_target(self):
        cam = OrbitCamera(distance=5.0)
        np.testing.assert_allclose(cam.eye(), [0, 0, 5], atol=1e-9)

    def test_orbit_changes_eye_keeps_distance(self):
        cam = OrbitCamera(distance=5.0)
        cam.orbit(30.0, 10.0)
        assert np.linalg.norm(cam.eye() - cam.target) == pytest.approx(5.0)
        assert abs(cam.eye()[0]) > 0.1

    def test_zoom_clamped(self):
        cam = OrbitCamera(distance=1.0)
        cam.zoom(1e-9)
        assert cam.distance >= 1e-3

    def test_fit(self):
        cam = OrbitCamera()
        xyz = np.array([[0, 0, 0], [10, 2, 4]], float)
        cam.fit(xyz)
        np.testing.assert_allclose(cam.target, [5, 1, 2])
        assert cam.distance > 10


class TestRenderer:
    def test_center_point_lands_center(self):
        cam = OrbitCamera(distance=4.0)
        img = plyview.render_points(
            np.array([[0.0, 0.0, 0.0]]), np.array([[255, 0, 0]], np.uint8),
            cam, 100, 100, splat=3, grid=False, axes=False)
        region = img[48:53, 48:53]
        assert (region[..., 0] == 255).any()

    def test_z_buffer_near_wins(self):
        cam = OrbitCamera(distance=4.0)
        xyz = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])  # near, far
        rgb = np.array([[0, 255, 0], [255, 0, 0]], np.uint8)
        img = plyview.render_points(xyz, rgb, cam, 64, 64, splat=3,
                                    grid=False, axes=False)
        center = img[30:34, 30:34].reshape(-1, 3)
        assert (center[:, 1] == 255).any()
        assert not (center[:, 0] == 255).any()  # far point occluded

    def test_point_budget_subsamples(self):
        cam = OrbitCamera(distance=10.0)
        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(5000, 3))
        rgb = np.full((5000, 3), 200, np.uint8)
        img = plyview.render_points(xyz, rgb, cam, 64, 64,
                                    point_budget=100, grid=False, axes=False)
        assert img.shape == (64, 64, 3)

    def test_ortho_mode(self):
        cam = OrbitCamera(distance=4.0, ortho=True)
        img = plyview.render_points(
            np.array([[0.0, 0.0, 0.0]]), np.array([[0, 0, 255]], np.uint8),
            cam, 64, 64, splat=3, grid=False, axes=False)
        assert (img[..., 2] == 255).any()

    def test_segments_drawn(self):
        cam = OrbitCamera(distance=4.0)
        segs = np.array([[[-1, 0, 0], [1, 0, 0]]], float)
        img = plyview.render_points(
            np.zeros((0, 3)), np.zeros((0, 3), np.uint8), cam, 64, 64,
            grid=False, axes=False, segments=segs)
        assert (img[:, :, 0] == 255).any()


class TestPointEdit:
    def test_remove_by_color(self):
        xyz = np.zeros((4, 3), np.float32)
        rgb = np.array([[135, 206, 250], [134, 205, 249], [10, 10, 10],
                        [135, 100, 250]], np.uint8)
        out_xyz, out_rgb, removed = pointedit.remove_points_by_color(
            xyz, rgb, (135, 206, 250), tolerance=5.0)
        assert removed == 2
        assert len(out_xyz) == 2

    def test_bbox_fill_palette_from_cloud(self):
        xyz = np.zeros((10, 3), np.float32)
        rgb = np.full((10, 3), 42, np.uint8)
        out_xyz, out_rgb = pointedit.add_bbox_fill_points(
            xyz, rgb, (0, 0, 0), (1, 2, 3), 50)
        assert len(out_xyz) == 60
        new = out_xyz[10:]
        assert (new >= 0).all() and (new[:, 1] <= 2).all() \
            and (new[:, 2] <= 3).all()
        assert (out_rgb[10:] == 42).all()  # palette sampled from the cloud

    def test_bbox_fill_flat_color(self):
        out_xyz, out_rgb = pointedit.add_bbox_fill_points(
            np.zeros((0, 3)), np.zeros((0, 3), np.uint8),
            (0, 0, 0), (1, 1, 1), 10, color=(1, 2, 3))
        assert (out_rgb == [1, 2, 3]).all()

    def test_add_sky_dome(self):
        xyz = np.zeros((5, 3), np.float32)
        rgb = np.zeros((5, 3), np.uint8)
        out_xyz, out_rgb = pointedit.add_sky_dome(xyz, rgb, count=100,
                                                  scale=10.0)
        assert len(out_xyz) == 105
        assert (out_rgb[5:] == [135, 206, 250]).all()
