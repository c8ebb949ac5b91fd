"""Format-hub round-trip tests: every serialization through the canonical
COLMAP model and back, plus axis-convention invariants."""

import math
import pathlib

import numpy as np
import pytest

from gs360x.core import pose as posemath
from gs360x.io.formats import (
    colmap_text, metashape, realityscan, transforms_json,
)
from gs360x.io.formats.model import Camera, ColmapModel, Image, Point3


def sample_model(n_images=5, n_points=20) -> ColmapModel:
    rng = np.random.default_rng(0)
    model = ColmapModel()
    cam_id = model.add_camera("PINHOLE", 1600, 1600,
                              [533.333, 533.333, 800.0, 800.0])
    for i in range(1, n_images + 1):
        r = posemath.axis_angle_mat3(rng.normal(size=3), rng.uniform(-90, 90))
        center = rng.normal(size=3) * 3
        t = r @ (-center)
        img = Image.from_pose(i, r, t, cam_id, f"frame_{i:04d}_A.jpg")
        model.images.append(img)
    for j in range(n_points):
        model.points.append(Point3(
            id=j + 1, x=float(rng.normal()), y=float(rng.normal()),
            z=float(rng.normal()), r=int(rng.integers(0, 256)),
            g=int(rng.integers(0, 256)), b=int(rng.integers(0, 256)),
            err=0.5))
    return model


def assert_models_close(a: ColmapModel, b: ColmapModel, atol=1e-6):
    assert len(a.images) == len(b.images)
    for ia, ib in zip(a.images, b.images):
        np.testing.assert_allclose(ia.center, ib.center, atol=atol)
        np.testing.assert_allclose(ia.r_wc, ib.r_wc, atol=atol)
        assert ia.name == ib.name


class TestColmapText:
    def test_round_trip(self, tmp_path):
        model = sample_model()
        colmap_text.write_model(tmp_path, model)
        back = colmap_text.read_model(tmp_path)
        assert_models_close(model, back)
        assert len(back.points) == 20
        assert back.cameras[1].params[0] == pytest.approx(533.333)

    def test_header_format(self, tmp_path):
        colmap_text.write_model(tmp_path, sample_model())
        text = (tmp_path / "cameras.txt").read_text()
        assert text.startswith("# Camera list")
        assert "# Number of cameras: 1" in text


class TestTransformsJson:
    def test_round_trip_with_x_fix(self, tmp_path):
        model = sample_model()
        frames, intr = transforms_json.frames_from_model(
            model, x_fix_deg=270.0)
        path = tmp_path / "transforms.json"
        transforms_json.write_transforms(path, frames, intr)
        back = transforms_json.model_from_transforms(path, x_fix_deg=270.0)
        assert_models_close(model, back)

    def test_schema_fields(self, tmp_path):
        import json
        model = sample_model(2)
        frames, intr = transforms_json.frames_from_model(model, x_fix_deg=0.0)
        path = tmp_path / "t.json"
        transforms_json.write_transforms(path, frames, intr)
        data = json.loads(path.read_text())
        assert data["camera_model"] == "OPENCV"
        assert data["fl_x"] == pytest.approx(533.333)
        assert len(data["frames"]) == 2
        assert len(data["frames"][0]["transform_matrix"]) == 4

    def test_nonuniform_intrinsics_rejected(self):
        model = sample_model(2)
        cam2 = model.add_camera("PINHOLE", 800, 800, [400.0, 400.0, 400.0,
                                                      400.0])
        model.images[1].camera_id = cam2
        with pytest.raises(ValueError):
            transforms_json.frames_from_model(model, x_fix_deg=0.0)


class TestRealityScan:
    def test_hpr_rotation_round_trip(self):
        rng = np.random.default_rng(1)
        for _ in range(25):
            r = posemath.axis_angle_mat3(rng.normal(size=3),
                                         rng.uniform(-170, 170))
            r_xmp = realityscan.colmap_rot_to_rs_rot(r)
            h, p, roll = realityscan.rs_rotation_to_hpr(r_xmp)
            back = realityscan.hpr_to_rs_rotation(h, p, roll)
            np.testing.assert_allclose(back, r_xmp, atol=1e-9)

    def test_csv_round_trip(self, tmp_path):
        model = sample_model()
        from gs360x.io.formats.hub import ExportOptions, export_model
        opts = ExportOptions(out_dir=tmp_path, export_csv=True)
        export_model(model, opts)
        rows = realityscan.read_csv_rows(tmp_path / "Align_RS_PerspCams.csv")
        back = realityscan.model_from_csv_rows(
            rows, 1600, 1600, sensor_w_mm=36.0, sensor_h_mm=36.0)
        assert_models_close(model, back, atol=1e-8)

    def test_xmp_round_trip(self, tmp_path):
        model = sample_model(3)
        from gs360x.io.formats.hub import ExportOptions, export_model
        opts = ExportOptions(out_dir=tmp_path, export_xmp=True)
        export_model(model, opts)
        rows = realityscan.read_xmp_dir(tmp_path / "cameras_RealityScan")
        assert len(rows) == 3
        back = realityscan.model_from_xmp_rows(
            rows, 1600, 1600, sensor_w_mm=36.0, sensor_h_mm=36.0)
        assert_models_close(model, back, atol=1e-8)

    def test_point_axis_round_trips(self):
        model = sample_model()
        xyz, rgb = realityscan.points_to_rs_vertices(model.points)
        back = realityscan.rs_vertices_to_points(xyz, rgb)
        for a, b in zip(model.points, back):
            np.testing.assert_allclose([a.x, a.y, a.z], [b.x, b.y, b.z],
                                       atol=1e-5)
            assert (a.r, a.g, a.b) == (b.r, b.g, b.b)
        xyz2, rgb2 = realityscan.points_to_transforms_ply_vertices(model.points)
        back2 = realityscan.transforms_ply_vertices_to_points(xyz2, rgb2)
        for a, b in zip(model.points, back2):
            np.testing.assert_allclose([a.x, a.y, a.z], [b.x, b.y, b.z],
                                       atol=1e-5)

    def test_rs_world_axis(self):
        v = realityscan.colmap_world_to_rs_world([1.0, 2.0, 3.0])
        np.testing.assert_allclose(v, [1.0, 3.0, -2.0])
        np.testing.assert_allclose(
            realityscan.rs_world_to_colmap_world(v), [1.0, 2.0, 3.0])


class TestMetashape:
    def test_perspective_round_trip(self, tmp_path):
        model = sample_model()
        path = tmp_path / "cams.xml"
        metashape.write_perspective_xml(path, model)
        records, w, h = metashape.read_perspective_xml(path)
        back = metashape.model_from_perspective_records(records, w, h)
        # labels lose their extension; compare stems
        for ia, ib in zip(model.images, back.images):
            np.testing.assert_allclose(ia.center, ib.center, atol=1e-8)
            np.testing.assert_allclose(ia.r_wc, ib.r_wc, atol=1e-8)
            assert pathlib.Path(ia.name).stem == pathlib.Path(ib.name).stem

    def test_spherical_with_chunk_similarity(self, tmp_path):
        xml = """<?xml version='1.0'?>
<document version="1.2.0">
 <chunk label="c" enabled="true">
  <sensors next_id="1"><sensor id="0" type="spherical"/></sensors>
  <cameras next_id="2">
   <camera id="0" label="pano_0001">
    <transform>1 0 0 0 0 1 0 0 0 0 1 2 0 0 0 1</transform>
   </camera>
   <camera id="1" label="pano_0002" enabled="false">
    <transform>1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1</transform>
   </camera>
  </cameras>
  <transform>
   <rotation>0 -1 0 1 0 0 0 0 1</rotation>
   <translation>10 0 0</translation>
   <scale>2</scale>
  </transform>
 </chunk>
</document>"""
        p = tmp_path / "sph.xml"
        p.write_text(xml)
        cams = metashape.read_spherical_cameras(p)
        assert len(cams) == 1  # disabled camera skipped
        cam_id, label, c2w = cams[0]
        assert label == "pano_0001"
        # center (0,0,2) -> rot(z=... ) -> scaled by 2 -> +translation
        np.testing.assert_allclose(c2w[:3, 3], [10.0, 0.0, 4.0], atol=1e-12)
        # rotation must NOT be scaled
        np.testing.assert_allclose(np.linalg.det(c2w[:3, :3]), 1.0,
                                   atol=1e-12)


class TestWorldTransforms:
    def test_rotate_cameras_moves_centers(self):
        model = sample_model(2)
        centers = [img.center.copy() for img in model.images]
        rot = posemath.rot_z_deg(90)
        model.rotate_cameras(rot)
        for c0, img in zip(centers, model.images):
            np.testing.assert_allclose(img.center, rot @ c0, atol=1e-9)

    def test_scale_cameras(self):
        model = sample_model(2)
        c0 = model.images[0].center.copy()
        model.scale_cameras(2.5)
        np.testing.assert_allclose(model.images[0].center, c0 * 2.5,
                                   atol=1e-9)

    def test_rotation_preserves_relative_pose(self):
        model = sample_model(2)
        rel0 = model.images[0].r_wc @ model.images[1].r_wc.T
        model.rotate_cameras(posemath.rot_y_deg(33))
        rel1 = model.images[0].r_wc @ model.images[1].r_wc.T
        np.testing.assert_allclose(rel0, rel1, atol=1e-9)


class TestCamconvertCli:
    def test_colmap_to_all_and_back(self, tmp_path):
        from gs360x.tools import camconvert

        model = sample_model()
        src = tmp_path / "colmap_in"
        colmap_text.write_model(src, model)
        out = tmp_path / "out"
        rc = camconvert.main([
            "colmap", str(src), "-o", str(out),
            "--export-csv", "--export-transforms", "--export-xmp",
            "--export-metashape-xml", "--export-ply",
            "--export-transforms-ply"])
        assert rc == 0
        assert (out / "Align_RS_PerspCams.csv").exists()
        assert (out / "transforms.json").exists()
        assert (out / "cameras_RealityScan").is_dir()
        assert (out / "perspective_cams.xml").exists()
        assert (out / "Align_RS_PerspCams.ply").exists()
        assert (out / "pointcloud_for_transforms.ply").exists()

        # round trip through the transforms.json export
        rc = camconvert.main([
            "transforms-json", "--transforms-json",
            str(out / "transforms.json"),
            "--transforms-ply", str(out / "pointcloud_for_transforms.ply"),
            "-o", str(tmp_path / "back"), "--export-colmap"])
        assert rc == 0
        back = colmap_text.read_model(tmp_path / "back" / "colmap")
        assert_models_close(model, back, atol=1e-5)

    def test_default_export_policy_colmap(self, tmp_path, capsys):
        from gs360x.tools import camconvert

        src = tmp_path / "cm"
        colmap_text.write_model(src, sample_model())
        out = tmp_path / "o"
        rc = camconvert.main(["colmap", str(src), "-o", str(out)])
        assert rc == 0
        assert (out / "Align_RS_PerspCams.csv").exists()
        assert not (out / "transforms.json").exists()

    def test_csv_input_default_exports_all(self, tmp_path):
        from gs360x.tools import camconvert

        model = sample_model(3)
        src = tmp_path / "cm"
        colmap_text.write_model(src, model)
        out1 = tmp_path / "o1"
        camconvert.main(["colmap", str(src), "-o", str(out1), "--export-csv"])
        out2 = tmp_path / "o2"
        rc = camconvert.main([
            "realityscan-csv", "--csv",
            str(out1 / "Align_RS_PerspCams.csv"),
            "--width", "1600", "--height", "1600", "-o", str(out2)])
        assert rc == 0
        assert (out2 / "colmap" / "images.txt").exists()
        assert (out2 / "transforms.json").exists()
        assert (out2 / "perspective_cams.xml").exists()

    def test_world_rotation_flag(self, tmp_path):
        from gs360x.tools import camconvert

        model = sample_model(2)
        src = tmp_path / "cm"
        colmap_text.write_model(src, model)
        out = tmp_path / "rot"
        rc = camconvert.main(["colmap", str(src), "-o", str(out),
                              "--export-colmap",
                              "--camera-rot-z-deg", "90"])
        assert rc == 0
        back = colmap_text.read_model(out / "colmap")
        rot = posemath.rot_z_deg(90)
        for a, b in zip(model.images, back.images):
            np.testing.assert_allclose(b.center, rot @ a.center, atol=1e-6)

    def test_reference_flag_spellings(self, tmp_path):
        """The reference's long flag names are accepted as aliases
        (gs360_CameraFormatConverter.py:1883-1996)."""
        from gs360x.io import ply as plyio
        from gs360x.tools import camconvert

        src = tmp_path / "cm"
        colmap_text.write_model(src, sample_model())
        out = tmp_path / "o"
        rc = camconvert.main([
            "colmap", str(src), "-o", str(out),
            "--export-realityscan-csv", "--export-transforms-json",
            "--export-realityscan-xmp",
            "--realityscan-csv-file", "MyCams.csv",
            "--transforms-json-file", "tf.json",
            "--realityscan-xmp-output-dir", "xmps"])
        assert rc == 0
        assert (out / "MyCams.csv").exists()
        assert (out / "tf.json").exists()
        assert (out / "xmps").is_dir()
        assert not (out / "Align_RS_PerspCams.ply").exists()

    def test_point_id_start(self, tmp_path):
        from gs360x.io import ply as plyio
        from gs360x.tools import camconvert

        src = tmp_path / "cm"
        colmap_text.write_model(src, sample_model())
        out1 = tmp_path / "o1"
        camconvert.main(["colmap", str(src), "-o", str(out1),
                         "--export-csv"])
        cloud = tmp_path / "cloud.ply"
        plyio.save_ply_xyz_rgb(cloud, np.zeros((3, 3), np.float32),
                               np.full((3, 3), 7, np.uint8))
        out2 = tmp_path / "o2"
        rc = camconvert.main([
            "realityscan-csv", "--csv",
            str(out1 / "Align_RS_PerspCams.csv"),
            "--width", "1600", "--height", "1600", "-o", str(out2),
            "--realityscan-ply", str(cloud), "--export-colmap",
            "--point-id-start", "500"])
        assert rc == 0
        back = colmap_text.read_model(out2 / "colmap")
        assert [pt.id for pt in back.points] == [500, 501, 502]

    def test_missing_input_errors(self, tmp_path, capsys):
        from gs360x.tools import camconvert

        rc = camconvert.main(["colmap", str(tmp_path / "nope"),
                              "-o", str(tmp_path / "o")])
        assert rc == 1
