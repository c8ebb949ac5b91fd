"""Dual-fisheye pipeline tests: calibration math, auto-zoom, SFM10 layout,
lens selection, and the end-to-end CLI on a synthetic rig."""

import math
import pathlib

import numpy as np
import pytest

from gs360x.io import image as im
from gs360x.tools import dualfisheye as df


def make_calib(sid="0", size=512, f=None, **kw):
    f = f if f is not None else size * 0.28  # ~190deg equisolid fill
    return df.SensorCalibration(sensor_id=sid, model_type="fisheye",
                                width=size, height=size, f=f,
                                cx=kw.pop("cx", 0.0), cy=kw.pop("cy", 0.0),
                                **kw)


CALIB_XML = """<?xml version='1.0'?>
<document version="1.2.0">
 <chunk>
  <sensors next_id="2">
   <sensor id="0" label="lensX" type="fisheye">
    <resolution width="512" height="512"/>
    <calibration type="fisheye" class="adjusted">
     <resolution width="512" height="512"/>
     <f>143.0</f><cx>1.5</cx><cy>-0.8</cy><k1>0.01</k1>
    </calibration>
   </sensor>
   <sensor id="1" label="lensY" type="fisheye">
    <resolution width="512" height="512"/>
    <calibration type="fisheye" class="initial">
     <resolution width="512" height="512"/>
     <f>144.0</f>
    </calibration>
   </sensor>
  </sensors>
  <cameras next_id="2">
   <camera id="0" label="frame_0001_X" sensor_id="0"/>
   <camera id="1" label="frame_0001_Y" sensor_id="1"/>
  </cameras>
 </chunk>
</document>"""


@pytest.fixture
def calib_xml(tmp_path):
    p = tmp_path / "calib.xml"
    p.write_text(CALIB_XML)
    return p


class TestCalibration:
    def test_load_prefers_adjusted(self, calib_xml):
        sensors, cam_map = df.load_metashape_calibration(calib_xml)
        assert sorted(sensors) == ["0", "1"]
        assert sensors["0"].f == 143.0 and sensors["0"].k1 == 0.01
        assert cam_map["frame_0001_X"] == "0"

    def test_remap_identity_at_center(self):
        c = make_calib()
        cx0, cy0 = c.center
        sx, sy, valid, _ = df.remap_for_zoom(
            c, np.array([[cx0]]), np.array([[cy0]]), 1.0, 190.0)
        assert sx[0, 0] == pytest.approx(cx0, abs=1e-6)
        assert sy[0, 0] == pytest.approx(cy0, abs=1e-6)
        assert valid[0, 0]

    def test_auto_zoom_no_distortion_is_one(self):
        c = make_calib(f=100.0)
        assert df.estimate_auto_undistort_zoom(c) == 1.0

    def test_auto_zoom_positive_distortion(self):
        c = make_calib(f=140.0, k1=0.15)
        z = df.estimate_auto_undistort_zoom(c)
        assert z > 1.0
        # at the found zoom, all valid samples are in bounds
        gx = np.linspace(0, c.width - 1, 64)
        sx, sy, _v, vm = df.remap_for_zoom(
            c, *np.meshgrid(gx, gx), z, 190.0)
        assert sx[vm].min() >= -0.51 and sx[vm].max() <= c.width - 0.49


class TestSfm10:
    def test_layout_ids(self):
        specs = df.build_sfm10_specs(256, 14.0, "36 36", 40.0, 40.0)
        assert [s["view_id"] for s in specs] == [
            "A", "A_U", "A_D", "B", "E", "F", "F_U", "F_D", "G", "J"]

    def test_bad_deltas_rejected(self):
        with pytest.raises(ValueError):
            df.build_sfm10_specs(256, 14.0, "36 36", 190.0, 40.0)
        with pytest.raises(ValueError):
            df.build_sfm10_specs(256, 14.0, "36 36", 40.0, 95.0)

    def test_lens_selection_front_back(self):
        sensors = {"0": make_calib("0"), "1": make_calib("1")}
        specs = df.build_sfm10_specs(64, 14.0, "36 36", 40.0, 40.0)
        maps = df.build_perspective_spec_maps(sensors, "0", "1", specs,
                                              0.0, 180.0, 190.0)
        assert maps["A"]["lens_key"] == "X"   # front view -> front lens
        assert maps["F"]["lens_key"] == "Y"   # back view -> back lens

    def test_direct_map_center_view_hits_lens_center(self):
        c = make_calib()
        mx, my, valid = df.build_direct_perspective_map(
            c, 0.0, 0.0, 90.0, 90.0, 65, 65, 190.0)
        cx0, cy0 = c.center
        assert mx[32, 32] == pytest.approx(cx0, abs=1.0)
        assert my[32, 32] == pytest.approx(cy0, abs=1.0)
        assert valid.mean() > 0.9


class TestPairing:
    def test_build_pairs(self, tmp_path):
        for name in ("a_X.jpg", "a_Y.jpg", "b_X.jpg", "c_Y.jpg", "d.jpg"):
            (tmp_path / name).touch()
        files = sorted(tmp_path.iterdir())
        pairs = df.build_pair_records(files, "_X", "_Y")
        assert [p[0] for p in pairs] == ["a"]


def synth_fisheye(calib, seed=0):
    """Synthetic fisheye capture: horizontal gradient in the valid circle."""
    h, w = calib.height, calib.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx0, cy0 = calib.center
    r = np.sqrt((xx - cx0) ** 2 + (yy - cy0) ** 2) / (2.0 * calib.f)
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.clip(xx / w, 0, 1)
    img[..., 1] = np.clip(yy / h, 0, 1)
    img[..., 2] = 0.5
    img[r > 1.0] = 0.0
    return (img * 255).astype(np.uint8)


class TestCli:
    def test_end_to_end(self, calib_xml, tmp_path, capsys):
        sensors, _ = df.load_metashape_calibration(calib_xml)
        in_dir = tmp_path / "pairs"
        in_dir.mkdir()
        im.write_image(in_dir / "frame_0001_X.png", synth_fisheye(sensors["0"]))
        im.write_image(in_dir / "frame_0001_Y.png", synth_fisheye(sensors["1"]))
        out = tmp_path / "out"
        rc = df.main(["--input-dir", str(in_dir), "--camera-xml",
                      str(calib_xml), "--output-dir", str(out),
                      "--perspective-size", "128",
                      "--save-fisheye-output",
                      "--report-json", str(tmp_path / "r.json")])
        assert rc == 0
        persp = sorted((out / "perspective" / "images").glob("*.jpg"))
        assert len(persp) == 10
        assert (out / "frame_0001_X.png").exists()  # undistorted fisheye
        img = im.read_image(persp[0])
        assert img.shape == (128, 128, 3)
        assert img.mean() > 5  # not all fill

    def test_dry_run(self, calib_xml, tmp_path, capsys):
        in_dir = tmp_path / "pairs"
        in_dir.mkdir()
        (in_dir / "p_X.jpg").write_bytes(b"")
        (in_dir / "p_Y.jpg").write_bytes(b"")
        rc = df.main(["--input-dir", str(in_dir), "--camera-xml",
                      str(calib_xml), "--dry-run",
                      "--perspective-size", "64"])
        assert rc == 0
        assert "[DRY]" in capsys.readouterr().out

    def test_metadata_only(self, calib_xml, tmp_path):
        ext_xml = tmp_path / "align.xml"
        ext_xml.write_text("""<?xml version='1.0'?>
<document><chunk>
 <sensors next_id="1"><sensor id="0" type="fisheye"/></sensors>
 <cameras next_id="2">
  <camera id="0" label="frame_0001_X">
   <transform>1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1</transform>
  </camera>
  <camera id="1" label="frame_0001_Y">
   <transform>-1 0 0 0 0 1 0 0 0 0 -1 0 0 0 0 1</transform>
  </camera>
 </cameras>
</chunk></document>""")
        out = tmp_path / "meta"
        rc = df.main(["--camera-xml", str(calib_xml), "--metadata-only",
                      "--camera-extrinsics-xml", str(ext_xml),
                      "--output-dir", str(out),
                      "--perspective-size", "64"])
        assert rc == 0
        from gs360x.io.formats import colmap_text
        model = colmap_text.read_model(out / "sparse" / "0")
        assert len(model.images) == 10  # one rig pose x 10 views

    def test_missing_xml(self, tmp_path, capsys):
        rc = df.main(["--camera-xml", str(tmp_path / "no.xml")])
        assert rc == 1
