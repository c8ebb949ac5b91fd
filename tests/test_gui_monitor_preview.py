"""Headless tests for the round-2 GUI subsystems: the output-folder
progress monitor (gs360_GUI.py:19196-19267), the segmentation preview
sheet (:4531-5735), and the score-review frame preview (:15809-17790)."""

import csv

import numpy as np

from gs360x.gui.monitor import OutputMonitor, count_matches, patterns_for_outputs
from gs360x.gui.scorereview import ReviewSession, frame_thumbnail
from gs360x.gui.segpreview import preview_first_image, preview_segmentation


class TestOutputMonitor:
    def test_patterns_expand_frame_slots(self):
        pats = patterns_for_outputs(["clip_%07d_A.jpg", "clip_%07d_A.jpg",
                                     "one.png"])
        assert pats == ["clip_*_A.jpg", "one.png"]

    def test_counts_only_matches(self, tmp_path):
        (tmp_path / "clip_0000001_A.jpg").write_bytes(b"x")
        (tmp_path / "clip_0000002_A.jpg").write_bytes(b"x")
        (tmp_path / "other.txt").write_bytes(b"x")
        assert count_matches(tmp_path, ["clip_*_A.jpg"]) == 2

    def test_stepped_reports_until_total(self, tmp_path):
        reports = []
        mon = OutputMonitor(tmp_path, ["f_*.jpg"], 4,
                            lambda p, d, t: reports.append((p, d, t)))
        assert mon.poll_once(0) is True          # 0 files -> 0%
        for i in range(4):
            (tmp_path / f"f_{i}.jpg").write_bytes(b"x")
        assert mon.poll_once(0) is False         # 100% -> stop
        assert reports[0] == (0, 0, 4)
        assert reports[-1] == (100, 4, 4)

    def test_baseline_excludes_preexisting(self, tmp_path):
        (tmp_path / "f_0.jpg").write_bytes(b"x")
        reports = []
        mon = OutputMonitor(tmp_path, ["f_*.jpg"], 2,
                            lambda p, d, t: reports.append(d))
        initial = count_matches(tmp_path, ["f_*.jpg"])
        (tmp_path / "f_1.jpg").write_bytes(b"x")
        mon.poll_once(initial)
        assert reports[-1] == 1  # only the new file counts

    def test_unknown_total_reports_growth(self, tmp_path):
        reports = []
        mon = OutputMonitor(tmp_path, ["*"], 0,
                            lambda p, d, t: reports.append((p, d)))
        (tmp_path / "a.jpg").write_bytes(b"x")
        assert mon.poll_once(0) is True
        assert reports[-1] == (-1, 1)


class TestSegPreview:
    def test_overlay_and_rows(self):
        rng = np.random.default_rng(0)
        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        # random weights + tiny threshold yields structural detections
        overlay, rows = preview_segmentation(
            img, targets=("person",), score_thresh=0.0, mask_thresh=0.0)
        assert overlay.shape == img.shape and overlay.dtype == np.uint8
        for r in rows:
            assert set(r) == {"class_name", "score", "area_pct", "color"}

    def test_downscales_large_inputs(self):
        img = np.zeros((1400, 700, 3), np.uint8)
        overlay, _ = preview_segmentation(img, score_thresh=1.1)
        assert max(overlay.shape[:2]) <= 640

    def test_first_image_of_dir(self, tmp_path):
        from gs360x.io.image import write_image

        write_image(tmp_path / "b.png", np.zeros((32, 32, 3), np.uint8))
        write_image(tmp_path / "a.png", np.full((32, 32, 3), 99, np.uint8))
        name, (overlay, rows) = preview_first_image(
            tmp_path, score_thresh=1.1)
        assert name == "a.png"
        assert overlay.mean() > 90  # overlay of the untinted image


class TestFramePreview:
    def _session(self, tmp_path, filename):
        csv_path = tmp_path / "sel.csv"
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["index", "input_mode", "filename", "pair_base",
                        "x_filename", "y_filename", "score",
                        "brightness_mean", "group_score", "flow_motion",
                        "selected(1=keep)"])
            w.writerow([0, "single", filename, "", "", "", 1.0, 0.5, 1.0,
                        0.0, 1])
        return ReviewSession.load(csv_path)

    def test_thumbnail_of_cursor_frame(self, tmp_path):
        from gs360x.io.image import write_image

        write_image(tmp_path / "frame.png",
                    np.full((480, 640, 3), 200, np.uint8))
        session = self._session(tmp_path, "frame.png")
        thumb, caption = frame_thumbnail(session, tmp_path, max_edge=100)
        assert thumb is not None and max(thumb.shape[:2]) <= 100
        assert "frame.png" in caption and "640x480" in caption

    def test_missing_file_reports_reason(self, tmp_path):
        session = self._session(tmp_path, "gone.png")
        thumb, caption = frame_thumbnail(session, tmp_path)
        assert thumb is None and "not found" in caption
