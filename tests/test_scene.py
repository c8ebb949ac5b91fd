"""Scene-loader tests: all five formats normalize to the same display space."""

import numpy as np
import pytest

from gs360x.core import pose as posemath
from gs360x.io import ply as plyio
from gs360x.io import scene as scenelib
from gs360x.io.formats import colmap_text
from gs360x.io.formats.hub import ExportOptions, export_model
from gs360x.io.formats.model import ColmapModel, Image, Point3


@pytest.fixture(scope="module")
def reference_model():
    rng = np.random.default_rng(0)
    model = ColmapModel()
    cid = model.add_camera("PINHOLE", 1600, 1600, [533.333, 533.333, 800, 800])
    for i in range(1, 5):
        r = posemath.axis_angle_mat3(rng.normal(size=3), rng.uniform(-80, 80))
        c = rng.normal(size=3) * 2
        model.images.append(Image.from_pose(i, r, r @ (-c), cid,
                                            f"img_{i:03d}_A.jpg"))
    for j in range(30):
        model.points.append(Point3(j + 1, *rng.normal(size=3), 100, 150, 200))
    return model


@pytest.fixture(scope="module")
def exported(reference_model, tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_exports")
    colmap_text.write_model(d / "colmap", reference_model)
    export_model(reference_model, ExportOptions(
        out_dir=d, export_csv=True, export_transforms=True,
        export_transforms_ply=True, export_xmp=True,
        export_metashape_xml=True, export_ply=True))
    return d


def assert_scene_matches(scene, model, atol=1e-4):
    assert len(scene.cameras) == len(model.images)
    for pose, img in zip(scene.cameras, model.images):
        np.testing.assert_allclose(pose.center, img.center, atol=atol)
        np.testing.assert_allclose(pose.rotation_cw, img.r_wc.T, atol=atol)


class TestLoaders:
    def test_colmap(self, exported, reference_model):
        scene = scenelib.load_scene(exported / "colmap")
        assert scene.source_kind == "colmap"
        assert_scene_matches(scene, reference_model)
        assert len(scene.points_xyz) == 30

    def test_transforms_with_ply(self, exported, reference_model):
        scene = scenelib.load_scene(
            exported / "transforms.json",
            ply_path=exported / "pointcloud_for_transforms.ply")
        assert_scene_matches(scene, reference_model)
        # points normalized back into COLMAP display space
        ref = np.array([[p.x, p.y, p.z] for p in reference_model.points])
        np.testing.assert_allclose(scene.points_xyz, ref, atol=1e-4)

    def test_realityscan_csv(self, exported, reference_model):
        scene = scenelib.load_scene(
            exported / "Align_RS_PerspCams.csv",
            ply_path=exported / "Align_RS_PerspCams.ply")
        assert_scene_matches(scene, reference_model, atol=1e-3)
        ref = np.array([[p.x, p.y, p.z] for p in reference_model.points])
        np.testing.assert_allclose(scene.points_xyz, ref, atol=1e-4)

    def test_realityscan_xmp(self, exported, reference_model):
        scene = scenelib.load_scene(exported / "cameras_RealityScan")
        assert_scene_matches(scene, reference_model, atol=1e-3)

    def test_metashape_xml(self, exported, reference_model):
        scene = scenelib.load_scene(exported / "perspective_cams.xml")
        assert_scene_matches(scene, reference_model, atol=1e-4)

    def test_frustum_half_extents(self, exported):
        scene = scenelib.load_scene(exported / "colmap")
        # 1600px at f=533.333 -> half extent = 800/533.333 = 1.5 (112.6°)
        assert scene.cameras[0].frustum_half_w == pytest.approx(1.5, abs=1e-3)

    def test_frustum_segments(self, exported):
        scene = scenelib.load_scene(exported / "colmap")
        segs = scenelib.frustum_segments(scene.cameras[0], scale=0.5)
        assert segs.shape == (8, 2, 3)
        np.testing.assert_allclose(segs[0][0], scene.cameras[0].center,
                                   atol=1e-6)

    def test_unknown_format(self, tmp_path):
        with pytest.raises(ValueError):
            scenelib.load_scene(tmp_path / "nope.xyz")


class TestSceneCli:
    def test_summary_and_export(self, exported, tmp_path, capsys):
        from gs360x.tools import scene as scene_cli

        out_ply = tmp_path / "norm.ply"
        rc = scene_cli.main([str(exported / "colmap"),
                             "--export-ply", str(out_ply)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "4 camera(s)" in out and "[aabb]" in out
        xyz, rgb = plyio.load_ply_xyz_rgb(out_ply)
        assert len(xyz) == 30 + 4  # points + camera markers
        assert (rgb[-1] == [255, 64, 64]).all()

    def test_missing_source(self, tmp_path, capsys):
        from gs360x.tools import scene as scene_cli

        assert scene_cli.main([str(tmp_path / "none")]) == 1
