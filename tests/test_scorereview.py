"""Score-review session tests: CSV round-trip, navigation, chart render."""

import csv

import numpy as np
import pytest

from gs360x.gui import scorereview
from gs360x.tools.frameselector import CSV_HEADER


def make_csv(path, n=30):
    rng = np.random.default_rng(0)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(CSV_HEADER)
        for i in range(n):
            score = 100.0 + 50.0 * float(rng.random())
            bright = 0.6
            if i == 7:          # low-score suspect
                score = 1.0
            if i == 21:         # dark suspect
                bright = 0.1
            w.writerow([i, "single", f"frame_{i:04d}.jpg", "", "", "",
                        score, bright, score, 0.5, 1 if i % 2 == 0 else 0])
    return path


@pytest.fixture
def session(tmp_path):
    path = make_csv(tmp_path / "sel.csv")
    return scorereview.ReviewSession.load(path), path


class TestSessionIO:
    def test_load(self, session):
        s, _ = session
        assert len(s.entries) == 30
        assert s.entries[0].keep and not s.entries[1].keep
        assert s.entries[7].score == 1.0

    def test_save_roundtrip_preserves_columns(self, session, tmp_path):
        s, path = session
        s.toggle(1)
        s.save(path)
        s2 = scorereview.ReviewSession.load(path)
        assert s2.entries[1].keep
        assert s2.entries[5].score == pytest.approx(s.entries[5].score)
        with open(path) as f:
            assert csv.DictReader(f).fieldnames == CSV_HEADER

    def test_missing_header_raises(self, tmp_path):
        p = tmp_path / "bad.csv"
        p.write_text("a,b\n1,2\n")
        with pytest.raises(ValueError):
            scorereview.ReviewSession.load(p)


class TestNavigation:
    def test_move_clamps(self, session):
        s, _ = session
        s.move(-5)
        assert s.cursor == 0
        s.move(100)
        assert s.cursor == 29

    def test_zoom_follows_cursor(self, session):
        s, _ = session
        s.cursor = 20
        s.zoom(0.5)
        assert s.view_count == 15
        assert s.view_start <= 20 < s.view_start + s.view_count

    def test_pan_clamps(self, session):
        s, _ = session
        s.zoom(0.5)
        s.pan(1000)
        assert s.view_start + s.view_count <= 30

    def test_suspects_found(self, session):
        s, _ = session
        sus = s.suspects()
        assert 7 in sus and 21 in sus

    def test_next_suspect_wraps(self, session):
        s, _ = session
        s.cursor = 0
        first = s.next_suspect()
        second = s.next_suspect()
        assert {first, second} >= {7, 21} or first != second
        s.cursor = 25
        assert s.next_suspect() in s.suspects()  # wrapped past end

    def test_toggle_counts(self, session):
        s, _ = session
        n = s.kept_count()
        s.cursor = 1
        s.toggle()
        assert s.kept_count() == n + 1


class TestRender:
    def test_chart_shape_and_colors(self, session):
        s, _ = session
        img = scorereview.render_chart(s, 640, 200)
        assert img.shape == (200, 640, 3)
        flat = img.reshape(-1, 3)
        assert (flat == scorereview.COLOR_KEEP).all(axis=1).any()
        assert (flat == scorereview.COLOR_DROP).all(axis=1).any()
        assert (flat == scorereview.COLOR_CURSOR).all(axis=1).any()
        assert (flat == scorereview.COLOR_SUSPECT).all(axis=1).any()

    def test_log_scale_changes_bars(self, session):
        s, _ = session
        a = scorereview.render_chart(s, 320, 160)
        s.log_scale = True
        b = scorereview.render_chart(s, 320, 160)
        assert (a != b).any()

    def test_empty_session(self):
        s = scorereview.ReviewSession([])
        img = scorereview.render_chart(s, 100, 80)
        assert img.shape == (80, 100, 3)
        assert "kept 0/0" in scorereview.summary_line(s)

    def test_summary_line(self, session):
        s, _ = session
        line = scorereview.summary_line(s)
        assert "frame 0" in line and "kept" in line

    def test_apply_argv(self, tmp_path):
        argv = scorereview.apply_argv(tmp_path / "x.csv", tmp_path)
        assert "--apply_csv" in argv and "-i" in argv
