"""Preset / camera-grammar parity tests.

Expected view lists, pitches, and naming are taken from the reference's
documented behavior (gs360_360PerspCut.py presets + parser grammar), checked
here against our declarative plan builder."""

import pathlib

import pytest

from gs360x.rig import presets as P
from gs360x.rig.presets import PerspCutConfig, build_view_plan

IMG = [pathlib.Path("/data/pano_0001.jpg")]
OUT = pathlib.Path("/out")


def view_ids(plan):
    return [j.view.view_id for j in plan.jobs]


class TestGrammar:
    def test_letter_tag(self):
        assert P.letter_tag(0) == "A"
        assert P.letter_tag(25) == "Z"
        assert P.letter_tag(26) == "27"

    def test_letter_to_index1(self):
        assert P.letter_to_index1("A") == 1
        assert P.letter_to_index1("j") == 10
        assert P.letter_to_index1("7") == 7
        with pytest.raises(ValueError):
            P.letter_to_index1("!")

    def test_extra_suffix(self):
        assert P.extra_suffix(30.0) == "_U"
        assert P.extra_suffix(-30.0) == "_D"
        assert P.extra_suffix(15.0) == "_U15"
        assert P.extra_suffix(-22.5) == "_D22.5"

    def test_addcam_bare_letter_gives_both(self):
        assert P.parse_addcam_spec("B", 30.0) == {2: [30.0, -30.0]}

    def test_addcam_directional(self):
        assert P.parse_addcam_spec("B:U", 30.0) == {2: [30.0]}
        assert P.parse_addcam_spec("D:D20", 30.0) == {4: [-20.0]}
        assert P.parse_addcam_spec("F=U15,F=D15", 30.0) == {6: [15.0, -15.0]}

    def test_addcam_invalid(self):
        with pytest.raises(ValueError):
            P.parse_addcam_spec("B:+10", 30.0)

    def test_delcam(self):
        assert P.parse_delcam_spec("B,D") == {2, 4}
        assert P.parse_delcam_spec("") == set()

    def test_setcam_absolute_relative(self):
        a, d, ea, ed = P.parse_setcam_spec("A=30,B:-5,C=U,D=D20,A_U=5,F_D:+3", 30.0)
        assert a == {1: 30.0, 3: 30.0, 4: -20.0}
        assert d == {2: -5.0}
        assert ea == {(1, "_U"): 5.0}
        assert ed == {(6, "_D"): 3.0}

    def test_setcam_requires_separator(self):
        with pytest.raises(ValueError):
            P.parse_setcam_spec("A", 30.0)

    def test_sensor_dimensions(self):
        assert P.parse_sensor_dimensions("36 36") == (36.0, 36.0)
        assert P.parse_sensor_dimensions("36x24") == (36.0, 24.0)
        assert P.parse_sensor_dimensions("36×24") == (36.0, 24.0)
        assert P.parse_sensor_dimensions("36") == (36.0,)


class TestDefaultPreset:
    def test_eight_views(self):
        plan = build_view_plan(PerspCutConfig(), IMG, OUT)
        assert view_ids(plan) == list("ABCDEFGH")
        assert plan.total == 8

    def test_yaws_are_45deg_steps(self):
        plan = build_view_plan(PerspCutConfig(), IMG, OUT)
        yaws = [j.view.yaw_deg for j in plan.jobs]
        assert yaws == [0.0, 45.0, 90.0, 135.0, 180.0, -135.0, -90.0, -45.0]

    def test_focal_and_fov(self):
        plan = build_view_plan(PerspCutConfig(), IMG, OUT)
        assert plan.focal_used_mm == 12.0
        assert plan.hfov_deg == pytest.approx(112.61986, abs=1e-4)
        assert plan.jobs[0].view.width == 1600

    def test_output_names(self):
        plan = build_view_plan(PerspCutConfig(), IMG, OUT)
        assert plan.jobs[0].output_name == "pano_0001_A.jpg"
        assert plan.jobs[-1].output_name == "pano_0001_H.jpg"

    def test_video_naming(self):
        cfg = PerspCutConfig(input_is_video=True, fps=2.0)
        plan = build_view_plan(cfg, [pathlib.Path("/data/clip.mp4")], OUT)
        assert plan.jobs[0].output_name == "clip_%07d_A.jpg"

    def test_metashape_line_constant(self):
        plan = build_view_plan(PerspCutConfig(), IMG, OUT)
        assert "533.33333" in plan.metashape_line


class TestFisheyelikePreset:
    def test_view_set(self):
        plan = build_view_plan(PerspCutConfig(preset="fisheyelike"), IMG, OUT)
        # 10 slots, C/D/H/I deleted, A/F get _U/_D additions = 10 views
        assert view_ids(plan) == [
            "A", "A_U", "A_D", "B", "E", "F", "F_U", "F_D", "G", "J"]
        assert plan.focal_used_mm == 17.0

    def test_yaw_step_36deg(self):
        plan = build_view_plan(PerspCutConfig(preset="fisheyelike"), IMG, OUT)
        by_id = {j.view.view_id: j.view for j in plan.jobs}
        assert by_id["B"].yaw_deg == pytest.approx(36.0)
        assert by_id["A_U"].pitch_deg == pytest.approx(30.0)
        assert by_id["A_D"].pitch_deg == pytest.approx(-30.0)

    def test_user_delcam_overrides_preset(self):
        cfg = PerspCutConfig(preset="fisheyelike", delcam="A")
        plan = build_view_plan(cfg, IMG, OUT)
        ids = view_ids(plan)
        assert "A" not in ids and "C" in ids  # preset deletions suppressed


class TestFull360Preset:
    def test_view_set(self):
        plan = build_view_plan(PerspCutConfig(preset="full360coverage"), IMG, OUT)
        assert view_ids(plan) == [
            "A", "B_U", "B_D", "C", "D_U", "D_D", "E", "F_U", "F_D", "G",
            "H_U", "H_D"]
        assert plan.focal_used_mm == 14.0
        assert "622.22222" in plan.metashape_line


class TestTwoViewsPreset:
    def test_front_back_only(self):
        plan = build_view_plan(PerspCutConfig(preset="2views"), IMG, OUT)
        assert view_ids(plan) == ["A", "E"]
        assert plan.jobs[0].view.width == 3600
        assert plan.focal_used_mm == 6.0

    def test_explicit_size_kept(self):
        cfg = PerspCutConfig(preset="2views", size=2000, size_explicit=True)
        plan = build_view_plan(cfg, IMG, OUT)
        assert plan.jobs[0].view.width == 2000


class TestEvenPitchPresets:
    def test_even_minus30(self):
        plan = build_view_plan(PerspCutConfig(preset="evenMinus30"), IMG, OUT)
        pitches = {j.view.view_id: j.view.pitch_deg for j in plan.jobs}
        assert pitches["A"] == 0.0 and pitches["B"] == -30.0
        assert pitches["D"] == -30.0 and pitches["E"] == 0.0

    def test_even_plus30(self):
        plan = build_view_plan(PerspCutConfig(preset="evenPlus30"), IMG, OUT)
        pitches = {j.view.view_id: j.view.pitch_deg for j in plan.jobs}
        assert pitches["B"] == 30.0 and pitches["H"] == 30.0


class TestFisheyeXYPreset:
    def test_two_fisheye_views(self):
        plan = build_view_plan(PerspCutConfig(preset="fisheyeXY"), IMG, OUT)
        assert view_ids(plan) == ["X", "Y"]
        x = plan.jobs[0].view
        assert x.projection == "fisheye_v360"
        assert x.width == 3600
        assert x.hfov_deg == 180.0
        assert x.yaw_deg == 0.0
        assert plan.jobs[1].view.yaw_deg == pytest.approx(180.0)

    def test_info_line_mentions_fov(self):
        plan = build_view_plan(PerspCutConfig(preset="fisheyeXY"), IMG, OUT)
        assert "fisheye_fov=180.0deg" in plan.preview_views_line


class TestModifiers:
    def test_add_top_bottom(self):
        cfg = PerspCutConfig(add_top=True, add_bottom=True)
        plan = build_view_plan(cfg, IMG, OUT)
        ids = view_ids(plan)
        assert ids[-2:] == ["I", "J"]
        by_id = {j.view.view_id: j.view for j in plan.jobs}
        assert by_id["I"].pitch_deg == 90.0
        assert by_id["J"].pitch_deg == -90.0
        assert by_id["I"].yaw_deg == 0.0

    def test_setcam_absolute(self):
        cfg = PerspCutConfig(setcam="A=15,B:-10")
        plan = build_view_plan(cfg, IMG, OUT)
        by_id = {j.view.view_id: j.view for j in plan.jobs}
        assert by_id["A"].pitch_deg == 15.0
        assert by_id["B"].pitch_deg == -10.0

    def test_setcam_on_added_view(self):
        cfg = PerspCutConfig(addcam="B", setcam="B_U=50")
        plan = build_view_plan(cfg, IMG, OUT)
        by_id = {j.view.view_id: j.view for j in plan.jobs}
        assert by_id["B_U"].pitch_deg == 50.0
        assert by_id["B_D"].pitch_deg == -30.0

    def test_pitch_clamped(self):
        cfg = PerspCutConfig(setcam="A=120")
        plan = build_view_plan(cfg, IMG, OUT)
        by_id = {j.view.view_id: j.view for j in plan.jobs}
        assert by_id["A"].pitch_deg == 90.0

    def test_hfov_overrides_focal(self):
        cfg = PerspCutConfig(hfov=90.0, hfov_explicit=True)
        plan = build_view_plan(cfg, IMG, OUT)
        assert plan.hfov_deg == 90.0
        assert plan.focal_used_mm == pytest.approx(18.0)

    def test_count_16(self):
        plan = build_view_plan(PerspCutConfig(count=16), IMG, OUT)
        assert plan.total == 16
        assert plan.jobs[1].view.yaw_deg == pytest.approx(22.5)

    def test_multiple_sources(self):
        files = [pathlib.Path("/d/a.jpg"), pathlib.Path("/d/b.jpg")]
        plan = build_view_plan(PerspCutConfig(), files, OUT)
        assert plan.total == 16
        assert plan.jobs[8].output_name == "b_A.jpg"

    def test_35mm_equivalent(self):
        cfg = PerspCutConfig(sensor_mm="24 24")
        plan = build_view_plan(cfg, IMG, OUT)
        assert plan.focal_35mm_equiv == pytest.approx(18.0)
