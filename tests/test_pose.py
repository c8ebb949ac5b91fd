"""Unit tests for pose algebra: rotations, quaternions, COLMAP conversions."""

import math

import numpy as np
import pytest

from gs360x.core import pose


class TestElementaryRotations:
    def test_rot_x_90_maps_z_to_y(self):
        np.testing.assert_allclose(pose.rot_x_deg(90) @ [0, 0, 1], [0, -1, 0], atol=1e-12)

    def test_rot_y_90_maps_z_to_x(self):
        np.testing.assert_allclose(pose.rot_y_deg(90) @ [0, 0, 1], [1, 0, 0], atol=1e-12)

    def test_axis_angle_matches_elementary(self):
        for deg in (0.0, 33.0, -120.0, 270.0):
            np.testing.assert_allclose(
                pose.axis_angle_mat3([1, 0, 0], deg), pose.rot_x_deg(deg), atol=1e-12)
            np.testing.assert_allclose(
                pose.axis_angle_mat3([0, 1, 0], deg), pose.rot_y_deg(deg), atol=1e-12)

    def test_orthonormal(self):
        r = pose.axis_angle_mat3([1, 2, 3], 77.0)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(r) == pytest.approx(1.0)


class TestViewRotations:
    def test_gl_yaw_right(self):
        # GL camera looks down -z with +x right; panning right (positive
        # yaw, reference convention R_y(-yaw)) turns forward toward +x.
        r = pose.yaw_pitch_to_rot_gl(90.0, 0.0)
        fwd = r @ [0, 0, -1]
        np.testing.assert_allclose(fwd, [1, 0, 0], atol=1e-12)

    def test_cv_yaw_right_increases_longitude(self):
        r = pose.view_rotation_cv(90.0, 0.0)
        fwd = r @ [0, 0, 1]
        np.testing.assert_allclose(fwd, [1, 0, 0], atol=1e-12)

    def test_cv_pitch_up_decreases_y(self):
        # warp frame is y-down: looking up means forward acquires negative y
        r = pose.view_rotation_cv(0.0, 45.0)
        fwd = r @ [0, 0, 1]
        assert fwd[1] == pytest.approx(-math.sin(math.radians(45)))
        assert fwd[2] == pytest.approx(math.cos(math.radians(45)))

    def test_gl_and_cv_elevation_agrees(self):
        # the GL world is y-up and the warp world is y-down: the same pitch
        # must produce opposite-signed y components of the forward ray.
        yaw, p = 37.0, -21.0
        fwd_gl = pose.yaw_pitch_to_rot_gl(yaw, p) @ [0, 0, -1]
        fwd_cv = pose.view_rotation_cv(yaw, p) @ [0, 0, 1]
        assert fwd_gl[1] == pytest.approx(-fwd_cv[1])


class TestQuaternions:
    @pytest.mark.parametrize("axis,deg", [
        ([1, 0, 0], 90), ([0, 1, 0], -45), ([1, 1, 1], 120),
        ([3, -2, 1], 179), ([0, 0, 1], 0.001),
    ])
    def test_round_trip(self, axis, deg):
        r = pose.axis_angle_mat3(axis, deg)
        q = pose.quat_wxyz_from_mat3(r)
        r2 = pose.mat3_from_quat_wxyz(*q)
        np.testing.assert_allclose(r2, r, atol=1e-10)

    def test_identity(self):
        assert pose.quat_wxyz_from_mat3(np.eye(3)) == pytest.approx((1, 0, 0, 0))


class TestColmapPose:
    def test_round_trip(self):
        c2w = pose.mat4_from_rt(pose.axis_angle_mat3([1, 2, -1], 63.0), [4.0, -2.0, 7.5])
        r_wc, t = pose.colmap_pose_from_c2w_gl(c2w, 0.0)
        back = pose.c2w_gl_from_colmap_pose(r_wc, t)
        np.testing.assert_allclose(back, c2w, atol=1e-10)

    def test_camera_center_preserved(self):
        center = np.array([1.0, 2.0, 3.0])
        c2w = pose.mat4_from_rt(pose.rot_y_deg(30), center)
        r_wc, t = pose.colmap_pose_from_c2w_gl(c2w, 0.0)
        np.testing.assert_allclose(-(r_wc.T @ t), center, atol=1e-12)

    def test_x_fix_rotates_center(self):
        center = np.array([0.0, 0.0, 1.0])
        c2w = pose.mat4_from_rt(np.eye(3), center)
        r_wc, t = pose.colmap_pose_from_c2w_gl(c2w, 90.0)
        c = -(r_wc.T @ t)
        np.testing.assert_allclose(c, [0, -1, 0], atol=1e-12)

    def test_normalize_angle(self):
        assert pose.normalize_angle_deg(190.0) == pytest.approx(-170.0)
        assert pose.normalize_angle_deg(-180.0) == 180.0
        assert pose.normalize_angle_deg(45.0) == 45.0
