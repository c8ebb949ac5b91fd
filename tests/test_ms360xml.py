"""ms360xml tool tests: view building, rig expansion, exports."""

import json
import math
import pathlib

import numpy as np
import pytest

from gs360x.core import pose as posemath
from gs360x.io import ply as plyio
from gs360x.io.formats import colmap_text
from gs360x.tools import ms360xml


SPHERICAL_XML = """<?xml version='1.0'?>
<document version="1.2.0">
 <chunk label="c" enabled="true">
  <sensors next_id="1"><sensor id="0" type="spherical"/></sensors>
  <cameras next_id="2">
   <camera id="0" label="pano_0001">
    <transform>1 0 0 1 0 1 0 2 0 0 1 3 0 0 0 1</transform>
   </camera>
   <camera id="1" label="pano_0002">
    <transform>0 0 1 4 0 1 0 2 -1 0 0 3 0 0 0 1</transform>
   </camera>
  </cameras>
 </chunk>
</document>"""


@pytest.fixture
def xml_file(tmp_path):
    p = tmp_path / "spherical.xml"
    p.write_text(SPHERICAL_XML)
    return p


class TestViews:
    def test_default_preset(self):
        views = ms360xml.build_views("default")
        assert [v[0] for v in views] == list("ABCDEFGH")

    def test_fisheyelike(self):
        views = ms360xml.build_views("fisheyelike")
        assert [v[0] for v in views] == [
            "A", "A_U", "A_D", "B", "E", "F", "F_U", "F_D", "G", "J"]

    def test_full360(self):
        views = ms360xml.build_views("full360coverage")
        ids = [v[0] for v in views]
        assert "B" not in ids and "B_U" in ids and "B_D" in ids
        assert len(ids) == 12

    def test_cube105(self):
        views = ms360xml.build_views("cube105")
        assert len(views) == 6
        assert views[4] == ("E", 0.0, 90.0)

    def test_matches_perspcut_rig(self):
        # preset view sets must agree with the 360PerspCut plan builder
        from gs360x.rig.presets import PerspCutConfig, build_view_plan

        for preset in ("default", "fisheyelike", "full360coverage"):
            plan = build_view_plan(PerspCutConfig(preset=preset),
                                   [pathlib.Path("/x/a.jpg")],
                                   pathlib.Path("/o"))
            assert [v[0] for v in ms360xml.build_views(preset)] == \
                [j.view.view_id for j in plan.jobs]


class TestHelpers:
    def test_strip_view_suffix(self):
        ids = ["A", "A_U", "B"]
        assert ms360xml.strip_view_suffix("pano_A_U", ids) == "pano"
        assert ms360xml.strip_view_suffix("pano_A", ids) == "pano"
        assert ms360xml.strip_view_suffix("pano", ids) == "pano"

    def test_intrinsics_constants(self):
        fl_x, fl_y, cx, cy = ms360xml.compute_intrinsics(12.0, 1600, 1600)
        assert fl_x == pytest.approx(533.33333, abs=1e-4)
        assert cx == 800.0


class TestCli:
    def test_transforms_export(self, xml_file, tmp_path):
        out = tmp_path / "out"
        rc = ms360xml.main([str(xml_file), "--preset", "default",
                            "--format", "transforms", "-o", str(out)])
        assert rc == 0
        data = json.loads((out / "transforms.json").read_text())
        assert len(data["frames"]) == 2 * 8
        assert data["frames"][0]["file_path"] == "pano_0001_A.jpg"
        assert data["fl_x"] == pytest.approx(533.33333, abs=1e-4)

    def test_colmap_requires_points(self, xml_file, tmp_path, capsys):
        rc = ms360xml.main([str(xml_file), "--format", "colmap",
                            "-o", str(tmp_path / "o")])
        assert rc == 1
        assert "--points-ply is required" in capsys.readouterr().err

    def test_colmap_with_points(self, xml_file, tmp_path):
        rng = np.random.default_rng(0)
        ply = tmp_path / "pts.ply"
        plyio.save_ply_xyz_rgb(ply, rng.random((50, 3)).astype(np.float32),
                               rng.integers(0, 255, (50, 3), dtype=np.uint8))
        out = tmp_path / "o"
        rc = ms360xml.main([str(xml_file), "--preset", "default",
                            "--format", "colmap",
                            "--points-ply", str(ply), "-o", str(out)])
        assert rc == 0
        model = colmap_text.read_model(out / "sparse" / "0")
        assert len(model.images) == 16
        assert len(model.points) == 50

    def test_camera_centers_scaled_and_views_share_center(self, xml_file,
                                                          tmp_path):
        out = tmp_path / "o"
        rc = ms360xml.main([str(xml_file), "--preset", "2views",
                            "--format", "metashape", "-o", str(out),
                            "--scale", "2.0"])
        assert rc == 0
        from gs360x.io.formats import metashape
        records, w, h = metashape.read_perspective_xml(
            out / "perspective_cams.xml")
        assert w == 3600
        # both views of pano_0001 share its (scaled) center
        centers = [r["c2w_cv"][:3, 3] for r in records
                   if r["name"].startswith("pano_0001")]
        assert len(centers) == 2
        np.testing.assert_allclose(centers[0], centers[1], atol=1e-9)
        np.testing.assert_allclose(centers[0], [2.0, 4.0, 6.0], atol=1e-9)

    def test_view_yaw_rotates_camera(self, xml_file, tmp_path):
        out = tmp_path / "o"
        ms360xml.main([str(xml_file), "--preset", "default",
                       "--format", "transforms", "-o", str(out)])
        data = json.loads((out / "transforms.json").read_text())
        by_name = {f["file_path"]: np.asarray(f["transform_matrix"])
                   for f in data["frames"]}
        a = by_name["pano_0001_A.jpg"]
        c = by_name["pano_0001_C.jpg"]  # yaw 90
        # relative rotation between A and C must be 90 deg about camera up
        rel = a[:3, :3].T @ c[:3, :3]
        angle = math.degrees(math.acos(min(1.0, (np.trace(rel) - 1) / 2)))
        assert angle == pytest.approx(90.0, abs=1e-6)

    def test_pointcloud_rotation_flag(self, xml_file, tmp_path):
        rng = np.random.default_rng(1)
        xyz = rng.random((20, 3)).astype(np.float32)
        ply = tmp_path / "p.ply"
        plyio.save_ply_xyz_rgb(ply, xyz,
                               np.zeros((20, 3), np.uint8))
        out = tmp_path / "o"
        rc = ms360xml.main([str(xml_file), "--format", "transforms",
                            "--points-ply", str(ply),
                            "--pc-rotate-x-plus180", "-o", str(out)])
        assert rc == 0
        out_xyz, _ = plyio.load_ply_xyz_rgb(
            out / "pointcloud_for_transforms.ply")
        expected = (posemath.rot_x_deg(180) @ xyz.T).T
        np.testing.assert_allclose(out_xyz, expected, atol=1e-5)

    def test_mcs_requires_fisheyelike(self, xml_file, tmp_path, capsys):
        rc = ms360xml.main([str(xml_file), "--format",
                            ms360xml.FORMAT_METASHAPE_MULTI,
                            "-o", str(tmp_path / "o")])
        assert rc == 1

    def test_mcs_export_structure(self, xml_file, tmp_path):
        import xml.etree.ElementTree as ET
        out = tmp_path / "o"
        rc = ms360xml.main([str(xml_file), "--preset", "fisheyelike",
                            "--format", ms360xml.FORMAT_METASHAPE_MULTI,
                            "-o", str(out)])
        assert rc == 0
        root = ET.parse(str(
            out / "perspective_cams_Multi-Camera-System.xml")).getroot()
        sensors = root.findall("chunk/sensors/sensor")
        assert len(sensors) == 10
        masters = [s for s in sensors if s.get("master_id") is None]
        assert len(masters) == 1 and masters[0].get("id") == "0"
        slaves = [s for s in sensors if s.get("master_id") == "0"]
        assert len(slaves) == 9
        for s in slaves:
            rot = s.find("rotation")
            assert rot is not None and len(rot.text.split()) == 9
        # flat camera list, Metashape-style: masters carry transforms,
        # slaves link via master_id (template parity: test_mcs_golden)
        cams = root.findall("chunk/cameras/camera")
        assert len(cams) == 20  # 2 source panos x 10 views
        masters_c = [c for c in cams if c.get("master_id") is None]
        assert len(masters_c) == 2
        for m in masters_c:
            assert m.find("transform") is not None

    def test_realityscan_export(self, xml_file, tmp_path):
        out = tmp_path / "o"
        rc = ms360xml.main([str(xml_file), "--preset", "default",
                            "--format", "realityscan", "-o", str(out)])
        assert rc == 0
        xmps = list((out / "cameras_RealityScan").glob("*.xmp"))
        assert len(xmps) == 16

    def test_missing_xml(self, tmp_path, capsys):
        rc = ms360xml.main([str(tmp_path / "no.xml")])
        assert rc == 1
