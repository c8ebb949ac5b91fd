"""End-to-end tests for gs360x-frameselector and gs360x-video2frames."""

import csv
import math

import numpy as np
import pytest

from gs360x.io import image as im
from gs360x.io import video as vio
from gs360x.tools import frameselector as fs
from gs360x.tools import video2frames as v2f


def make_frame(sharpness: float, seed: int = 0, shape=(48, 64)):
    """Frame whose sharpness is controlled by blending noise into a flat
    image; higher 'sharpness' -> more high-frequency energy."""
    rng = np.random.default_rng(seed)
    noise = rng.random((*shape, 3))
    base = np.full((*shape, 3), 0.5)
    img = base * (1 - sharpness) + noise * sharpness
    return (img * 255).astype(np.uint8)


@pytest.fixture
def frames_dir(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    # 12 frames in 2 segments of 6; frame 3 and 9 are the sharpest
    sharpness = [0.2, 0.3, 0.25, 0.9, 0.2, 0.3,
                 0.2, 0.25, 0.3, 0.95, 0.25, 0.2]
    for i, s in enumerate(sharpness):
        im.write_image(d / f"frame_{i:04d}.png", make_frame(s, seed=i))
    return d


class TestSelection:
    def test_segment_selection_keeps_sharpest(self, frames_dir, capsys):
        rc = fs.main(["-i", str(frames_dir), "-n", "6", "-d",
                      "-c", "sel.csv", "--no_augment_gaps"])
        assert rc == 0
        rows = list(csv.DictReader(open(frames_dir / "sel.csv")))
        kept = [r["filename"] for r in rows if r["selected(1=keep)"] == "1"]
        assert "frame_0003.png" in kept
        assert "frame_0009.png" in kept

    def test_dry_run_moves_nothing(self, frames_dir):
        fs.main(["-i", str(frames_dir), "-n", "6", "-d"])
        assert len(list(frames_dir.glob("*.png"))) == 12
        assert not (frames_dir / "blur").exists()

    def test_real_run_moves_rejects(self, frames_dir):
        rc = fs.main(["-i", str(frames_dir), "-n", "6",
                      "--no_augment_gaps"])
        assert rc == 0
        kept = sorted(p.name for p in frames_dir.glob("*.png"))
        blurred = sorted(p.name for p in (frames_dir / "blur").glob("*.png"))
        assert len(kept) + len(blurred) == 12
        assert "frame_0003.png" in kept

    def test_apply_csv_replays_selection(self, frames_dir):
        fs.main(["-i", str(frames_dir), "-n", "6", "-d", "-c", "sel.csv",
                 "--no_augment_gaps"])
        rc = fs.main(["-i", str(frames_dir), "-a", "sel.csv"])
        assert rc == 0
        kept = sorted(p.name for p in frames_dir.glob("*.png"))
        rows = list(csv.DictReader(open(frames_dir / "sel.csv")))
        expected = sorted(r["filename"] for r in rows
                          if r["selected(1=keep)"] == "1")
        assert kept == expected

    def test_reselect_csv_skips_rescoring(self, frames_dir):
        fs.main(["-i", str(frames_dir), "-n", "6", "-d", "-c", "sel.csv",
                 "--no_augment_gaps"])
        rc = fs.main(["-i", str(frames_dir), "-r", "sel.csv", "-n", "3",
                      "-d", "--no_augment_gaps"])
        assert rc == 0
        rows = list(csv.DictReader(open(frames_dir / "sel.csv")))
        kept = [r for r in rows if r["selected(1=keep)"] == "1"]
        assert len(kept) == 4  # 12 frames / segment 3

    def test_per_frame_blur_percent(self, frames_dir, capsys):
        rc = fs.main(["-i", str(frames_dir), "-n", "0", "-d",
                      "--blur-percent", "25", "-c", "pf.csv"])
        assert rc == 0
        rows = list(csv.DictReader(open(frames_dir / "pf.csv")))
        dropped = [r for r in rows if r["selected(1=keep)"] == "0"]
        assert len(dropped) == 3  # 25% of 12

    def test_csv_schema(self, frames_dir):
        fs.main(["-i", str(frames_dir), "-n", "6", "-d", "-c", "s.csv"])
        with open(frames_dir / "s.csv") as f:
            header = f.readline().strip().split(",")
        assert header == fs.CSV_HEADER

    def test_lapvar_metric(self, frames_dir):
        rc = fs.main(["-i", str(frames_dir), "-n", "6", "-d", "-m", "lapvar",
                      "-c", "lv.csv", "--no_augment_gaps"])
        assert rc == 0
        rows = list(csv.DictReader(open(frames_dir / "lv.csv")))
        kept = [r["filename"] for r in rows if r["selected(1=keep)"] == "1"]
        assert "frame_0003.png" in kept

    def test_empty_dir(self, tmp_path, capsys):
        d = tmp_path / "empty"
        d.mkdir()
        assert fs.main(["-i", str(d)]) == 0


class TestPairMode:
    def test_xy_pairs_detected_and_moved_together(self, tmp_path):
        d = tmp_path / "pairs"
        d.mkdir()
        for i in range(6):
            s = 0.9 if i == 2 else 0.2
            im.write_image(d / f"f{i:03d}_X.png", make_frame(s, seed=i))
            im.write_image(d / f"f{i:03d}_Y.png", make_frame(s, seed=i + 50))
        rc = fs.main(["-i", str(d), "-n", "6", "--no_augment_gaps"])
        assert rc == 0
        kept = sorted(p.name for p in d.glob("*.png"))
        assert kept == ["f002_X.png", "f002_Y.png"]


class TestGrammarHelpers:
    def test_split_stem_suffix(self):
        assert fs.split_stem_suffix("a_X") == ("a", "X")
        assert fs.split_stem_suffix("a_Y") == ("a", "Y")
        assert fs.split_stem_suffix("a") == ("a", None)

    def test_sort_lastnum(self, tmp_path):
        d = tmp_path / "s"
        d.mkdir()
        for name in ["clip2_0010.png", "clip2_0002.png", "clip2_0001.png"]:
            im.write_image(d / name, make_frame(0.5))
        recs, _ = fs.gather_records(d, "all", "lastnum", "single")
        assert [r.file_paths[0].name for r in recs] == [
            "clip2_0001.png", "clip2_0002.png", "clip2_0010.png"]

    def test_augment_spacing_fills_gap(self):
        metrics = [fs.FrameMetrics(score=float(i % 3)) for i in range(30)]
        existing = list(range(30))
        out = fs.augment_spacing({0, 29}, existing, metrics,
                                 max_spacing=10, min_diff=2)
        assert len(out) > 2


class TestVideo2Frames:
    def test_extract(self, tmp_path, capsys):
        clip = tmp_path / "c.y4m"
        frames = [make_frame(0.5, seed=i, shape=(32, 64)) for i in range(10)]
        vio.write_y4m(clip, frames, fps=10.0)
        out = tmp_path / "out"
        rc = v2f.main(["-i", str(clip), "-o", str(out), "-f", "5",
                       "-e", "png"])
        assert rc == 0
        names = sorted(p.name for p in out.iterdir())
        assert names[0] == "out_0000000.png"
        assert len(names) == 5

    def test_overwrite_guard(self, tmp_path, capsys):
        clip = tmp_path / "c.y4m"
        vio.write_y4m(clip, [make_frame(0.5, shape=(32, 64))] * 3, fps=3.0)
        out = tmp_path / "out"
        assert v2f.main(["-i", str(clip), "-o", str(out), "-f", "1",
                         "-e", "png"]) == 0
        assert v2f.main(["-i", str(clip), "-o", str(out), "-f", "1",
                         "-e", "png"]) == 1
        assert "overwrite is disabled" in capsys.readouterr().err
        assert v2f.main(["-i", str(clip), "-o", str(out), "-f", "1",
                         "-e", "png", "--overwrite"]) == 0

    def test_name_suffix(self, tmp_path):
        clip = tmp_path / "c.y4m"
        vio.write_y4m(clip, [make_frame(0.5, shape=(32, 64))] * 2, fps=2.0)
        out = tmp_path / "sfx"
        rc = v2f.main(["-i", str(clip), "-o", str(out), "-f", "2",
                       "-e", "png", "--name-suffix", "_X"])
        assert rc == 0
        assert (out / "out_0000000_X.png").exists()

    def test_map_stream_parser(self):
        assert v2f.parse_map_stream_selector(None) is None
        assert v2f.parse_map_stream_selector("0:v:1") == 1
        assert v2f.parse_map_stream_selector("v:0") == 0
        assert v2f.parse_map_stream_selector("2") == 2
        with pytest.raises(ValueError):
            v2f.parse_map_stream_selector("a:1")

    def test_missing_video(self, tmp_path, capsys):
        assert v2f.main(["-i", str(tmp_path / "no.y4m"), "-f", "1"]) == 1
