"""Voxel kernel + plyopt CLI tests."""

import numpy as np
import pytest

from gs360x.io import ply as plyio
from gs360x.kernels import voxel as vox
from gs360x.tools import plyopt


def cloud(n=2000, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    xyz = (rng.random((n, 3)) * spread).astype(np.float32)
    rgb = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    return xyz, rgb


class TestVoxelKernels:
    def test_unique_count_matches_numpy(self):
        xyz, _ = cloud()
        for v in (0.5, 1.0, 3.0):
            keys = np.floor((xyz - xyz.min(0)) / v).astype(np.int64)
            expected = len(np.unique(keys, axis=0))
            assert vox.unique_voxel_count(xyz, v) == expected

    def test_fixed_size_one_point_per_voxel(self):
        xyz, rgb = cloud()
        out_xyz, out_rgb, pick = vox.voxel_downsample_by_size(xyz, rgb, 1.0)
        keys = np.floor((out_xyz - xyz.min(0)) / 1.0).astype(np.int64)
        assert len(np.unique(keys, axis=0)) == len(out_xyz)
        assert len(out_xyz) == vox.unique_voxel_count(xyz, 1.0)
        np.testing.assert_array_equal(out_xyz, xyz[pick])
        np.testing.assert_array_equal(out_rgb, rgb[pick])

    def test_centroid_representative_is_closest(self):
        xyz = np.array([[0.1, 0, 0], [0.4, 0, 0], [0.45, 0, 0]], np.float32)
        rgb = np.zeros((3, 3), np.uint8)
        out_xyz, _, pick = vox.voxel_downsample_by_size(xyz, rgb, 1.0)
        # centroid ~0.3167 -> closest is 0.4
        assert pick.tolist() == [1]

    def test_first_representative(self):
        xyz = np.array([[0.9, 0, 0], [0.1, 0, 0], [0.5, 0, 0]], np.float32)
        rgb = np.zeros((3, 3), np.uint8)
        _, _, pick = vox.voxel_downsample_by_size(xyz, rgb, 1.0,
                                                  representative="first")
        assert pick.tolist() == [0]

    def test_center_representative(self):
        xyz = np.array([[0.05, 0.05, 0.05], [0.5, 0.5, 0.5]], np.float32)
        rgb = np.zeros((2, 3), np.uint8)
        _, _, pick = vox.voxel_downsample_by_size(xyz, rgb, 1.0,
                                                  representative="center")
        # cube center is at min+0.5 per axis => (0.55,...) closest is idx 1
        assert pick.tolist() == [1]

    def test_target_search_converges(self, capsys):
        xyz, rgb = cloud(5000)
        out_xyz, _, _ = vox.voxel_downsample_to_target(
            xyz, rgb, 500, log=lambda *a: None)
        assert abs(len(out_xyz) - 500) / 500 < 0.25

    def test_spatial_hash_approximate(self):
        xyz, rgb = cloud(5000)
        out_xyz, _, _ = vox.spatial_hash_downsample(
            xyz, rgb, target_points=800, log=lambda *a: None)
        assert 200 < len(out_xyz) < 3000

    def test_adaptive_prefers_dense_regions(self):
        rng = np.random.default_rng(3)
        dense = rng.normal(0, 0.5, (4000, 3)).astype(np.float32)
        sparse = (rng.random((400, 3)) * 40 + 10).astype(np.float32)
        xyz = np.concatenate([dense, sparse])
        rgb = np.zeros((len(xyz), 3), np.uint8)
        out_xyz, _, _ = vox.adaptive_voxel_downsample(xyz, rgb, 500)
        assert len(out_xyz) <= 500
        from_dense = (np.linalg.norm(out_xyz, axis=1) < 5).sum()
        assert from_dense > len(out_xyz) * 0.5

    def test_sky_dome_geometry(self):
        pts, cols = vox.generate_sky_points(
            center=[1, 2, 3], axis_vec=[0, 0, 1], scale=10.0, count=500,
            color=[10, 20, 30])
        r = np.linalg.norm(pts - np.array([1, 2, 3]), axis=1)
        np.testing.assert_allclose(r, 10.0, atol=1e-3)
        assert (pts[:, 2] >= 3.0 - 1e-3).all()  # hemisphere above center
        assert (cols == [10, 20, 30]).all()

    def test_sky_dome_axis_rotation(self):
        pts, _ = vox.generate_sky_points([0, 0, 0], [1, 0, 0], 5.0, 200,
                                         [0, 0, 0])
        assert (pts[:, 0] >= -1e-3).all()  # dome points toward +X

    def test_sky_full_sphere(self):
        pts, _ = vox.generate_sky_points([0, 0, 0], [0, 0, 1], 1.0, 1000,
                                         [0, 0, 0], sky_percent=100.0)
        assert pts[:, 2].min() < -0.9  # covers the lower hemisphere too


class TestPlyoptCli:
    def test_stats_only(self, tmp_path, capsys):
        xyz, rgb = cloud(100)
        p = tmp_path / "c.ply"
        plyio.save_ply_xyz_rgb(p, xyz, rgb)
        assert plyopt.main(["-i", str(p)]) == 0
        out = capsys.readouterr().out
        assert "points=100" in out and "[aabb]" in out

    def test_voxel_size_downsample(self, tmp_path, capsys):
        xyz, rgb = cloud(3000)
        src = tmp_path / "in.ply"
        dst = tmp_path / "out.ply"
        plyio.save_ply_xyz_rgb(src, xyz, rgb)
        rc = plyopt.main(["-i", str(src), "-o", str(dst), "-v", "2.0"])
        assert rc == 0
        out_xyz, _ = plyio.load_ply_xyz_rgb(dst)
        assert len(out_xyz) == vox.unique_voxel_count(xyz, 2.0)

    def test_target_percent(self, tmp_path, capsys):
        xyz, rgb = cloud(4000)
        src, dst = tmp_path / "i.ply", tmp_path / "o.ply"
        plyio.save_ply_xyz_rgb(src, xyz, rgb)
        rc = plyopt.main(["-i", str(src), "-o", str(dst), "-r", "10"])
        assert rc == 0
        out_xyz, _ = plyio.load_ply_xyz_rgb(dst)
        assert abs(len(out_xyz) - 400) / 400 < 0.3

    def test_sky_dome_and_append(self, tmp_path, capsys):
        xyz, rgb = cloud(500)
        src, dst = tmp_path / "i.ply", tmp_path / "o.ply"
        extra = tmp_path / "extra.ply"
        plyio.save_ply_xyz_rgb(src, xyz, rgb)
        plyio.save_ply_xyz_rgb(extra, *cloud(50, seed=9))
        rc = plyopt.main(["-i", str(src), "-o", str(dst),
                          "--append-ply", str(extra),
                          "--sky-axis", "+Z", "--sky-count", "100",
                          "--sky-color", "255,0,0"])
        assert rc == 0
        out_xyz, out_rgb = plyio.load_ply_xyz_rgb(dst)
        assert len(out_xyz) == 500 + 50 + 100
        assert (out_rgb[-100:] == [255, 0, 0]).all()

    def test_colmap_model_round_trip_with_filtering(self, tmp_path, capsys):
        from gs360x.io.formats import colmap_text
        from gs360x.io.formats.model import ColmapModel, Image, Point3

        model = ColmapModel()
        cid = model.add_camera("PINHOLE", 100, 100, [50, 50, 50, 50])
        img = Image(1, 1, 0, 0, 0, 0, 0, 0, cid, "a.jpg",
                    points2d_line="1.0 2.0 1 3.0 4.0 2 5.0 6.0 -1")
        model.images.append(img)
        rng = np.random.default_rng(0)
        for j in range(1, 41):
            x, y, z = rng.random(3) * 10
            model.points.append(Point3(j, x, y, z, 10, 20, 30))
        src = tmp_path / "cm"
        colmap_text.write_model(src, model)
        dst = tmp_path / "cm_out"
        rc = plyopt.main(["-i", str(src), "-o", str(dst), "-v", "5.0"])
        assert rc == 0
        back = colmap_text.read_model(dst)
        assert len(back.points) < 40
        kept_ids = {p.id for p in back.points}
        # observations referencing dropped points are filtered
        tokens = back.images[0].points2d_line.split()
        for i in range(2, len(tokens), 3):
            pid = int(tokens[i])
            assert pid < 0 or pid in kept_ids

    def test_invalid_sky_color(self, tmp_path, capsys):
        xyz, rgb = cloud(10)
        p = tmp_path / "c.ply"
        plyio.save_ply_xyz_rgb(p, xyz, rgb)
        rc = plyopt.main(["-i", str(p), "-o", str(tmp_path / "o.ply"),
                          "--sky-axis", "+Z", "--sky-color", "banana"])
        assert rc == 1

    def test_missing_input(self, tmp_path, capsys):
        assert plyopt.main(["-i", str(tmp_path / "none.ply")]) == 1
