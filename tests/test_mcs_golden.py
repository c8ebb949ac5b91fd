"""Golden structural comparison of the Multi-Camera-System rig export
against the reference's Metashape-accepted template
(`templates/perspective_cams_Multi-Camera-System.xml`, written by
Metashape 2.3 itself). Skipped when the reference checkout is absent."""

import pathlib
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from gs360x.tools.ms360xml import (
    MCS_FISHEYELIKE_SLAVE_OFFSETS,
    build_views,
    export_metashape_multi_camera_xml,
)

GOLDEN = pathlib.Path(
    "/root/reference/cli_tools/templates/"
    "perspective_cams_Multi-Camera-System.xml")

needs_golden = pytest.mark.skipif(not GOLDEN.exists(),
                                  reason="reference template not present")


def _generate(tmp_path, n_frames=2):
    views = build_views("fisheyelike")
    frames = []
    for i in range(n_frames):
        for vid, yaw, pitch in views:
            c2w = np.eye(4)
            c2w[0, 3] = i * 0.5
            frames.append({"source_name": f"pano_{i:04d}",
                           "view_id": vid,
                           "file_path": f"pano_{i:04d}_{vid}.jpg",
                           "c2w_gl": c2w})
    out = tmp_path / "mcs.xml"
    export_metashape_multi_camera_xml(
        out, frames, (755.55556, 755.55556, 800, 800, 1600, 1600), views,
        preset="fisheyelike")
    return ET.parse(out).getroot()


def _sensor_children(sensor):
    return [c.tag for c in sensor]


@needs_golden
class TestAgainstGoldenTemplate:
    @pytest.fixture(scope="class")
    def ours(self, tmp_path_factory):
        return _generate(tmp_path_factory.mktemp("mcs"))

    @pytest.fixture(scope="class")
    def golden(self):
        return ET.parse(GOLDEN).getroot()

    def test_document_and_chunk_shape(self, ours, golden):
        assert ours.get("version") == golden.get("version") == "2.3.0"
        for root in (ours, golden):
            chunk = root.find("chunk")
            assert chunk is not None
            for tag in ("sensors", "components", "cameras", "settings"):
                assert chunk.find(tag) is not None, tag

    def test_sensor_node_sets_match(self, ours, golden):
        g_sensors = golden.find("chunk/sensors").findall("sensor")
        o_sensors = ours.find("chunk/sensors").findall("sensor")
        assert len(o_sensors) == len(g_sensors) == 10
        for o, g in zip(o_sensors, g_sensors):
            assert o.get("master_id") == g.get("master_id")
            # every child node class Metashape wrote must be present
            assert set(_sensor_children(g)) <= set(_sensor_children(o)) | {
                "rotation_covariance", "location_covariance", "location"}
            # calibration focal + resolution carried identically
            assert o.find("calibration/f") is not None
            assert (o.find("resolution").get("width")
                    == g.find("resolution").get("width"))

    def test_slave_reference_attributes_match_reference_constants(
            self, ours, golden):
        g_by_ref = {s.find("reference").get("rotation"): s
                    for s in golden.find("chunk/sensors").findall("sensor")
                    if s.find("reference") is not None}
        o_slaves = [s for s in ours.find("chunk/sensors").findall("sensor")
                    if s.get("master_id") is not None]
        for s in o_slaves:
            ref = s.find("reference")
            assert ref is not None
            assert ref.get("sabc") == "0.10000000000000001"
            assert ref.get("enabled") == "true"
            # our reference rotation must be one the golden file carries
            assert ref.get("rotation") in g_by_ref
            # and the adjusted <rotation> paired with it must match too
            assert (s.find("rotation").text.split()
                    == g_by_ref[ref.get("rotation")]
                    .find("rotation").text.split())

    def test_camera_rig_linking_matches(self, ours, golden):
        def linking(root, n=20):
            out = []
            for cam in root.find("chunk/cameras").findall("camera")[:n]:
                out.append((cam.get("sensor_id"),
                            cam.get("master_id") is not None,
                            cam.find("transform") is not None))
            return out

        ow = linking(ours)
        gw = linking(golden)
        assert ow == gw  # same master/slave/transform pattern per frame

    def test_settings_accuracies_match(self, ours, golden):
        def props(root):
            return {p.get("name"): p.get("value")
                    for p in root.find("chunk/settings").findall("property")}

        assert props(ours) == props(golden)


class TestOffsetsTable:
    def test_covers_all_fisheyelike_slaves(self):
        views = [v for v, _, _ in build_views("fisheyelike")]
        assert set(MCS_FISHEYELIKE_SLAVE_OFFSETS) == set(views[1:])

    def test_standalone_generation_without_golden(self, tmp_path):
        root = _generate(tmp_path, n_frames=1)
        cams = root.find("chunk/cameras").findall("camera")
        assert len(cams) == 10
        assert cams[0].find("transform") is not None
        assert all(c.get("master_id") == cams[0].get("id")
                   for c in cams[1:])
