"""Pallas warp kernel tests (interpret mode on CPU) against the XLA backend."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gs360x.kernels import warp, warp_pallas


def lonlat_pano(w=1024, h=512):
    xs = (2.0 * np.arange(w) + 1.0) / w - 1.0
    ys = (2.0 * np.arange(h) + 1.0) / h - 1.0
    lon, lat = np.meshgrid(xs * math.pi, ys * math.pi / 2)
    return jnp.asarray(np.stack([
        0.5 + 0.5 * np.sin(lon),
        0.5 + 0.5 * np.sin(lat),
        0.5 + 0.5 * np.cos(3 * lon),
    ], -1).astype(np.float32))


SRC = lonlat_pano(512, 256)
KW = dict(width=256, height=128, hfov_deg=100.0, vfov_deg=60.0)


def xla_ref(yaws, pitches, rolls, interp):
    return np.asarray(warp.warp_equirect_to_views(
        SRC, np.asarray(yaws, np.float32), np.asarray(pitches, np.float32),
        np.asarray(rolls, np.float32), interp=interp, backend="xla", **KW))


class TestPallasCorrectness:
    @pytest.mark.parametrize("interp", [
        pytest.param("bicubic", marks=pytest.mark.slow), "bilinear"])
    def test_matches_xla_backend(self, interp):
        yaws = np.array([0.0, 45.0, 180.0])
        pitches = np.array([0.0, 10.0, -20.0])
        rolls = np.zeros(3)
        ref = xla_ref(yaws, pitches, rolls, interp)
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, yaws, pitches, rolls, interp=interp, interpret=True, **KW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)

    def test_seam_straddling_view(self):
        ref = xla_ref([180.0], [0.0], [0.0], "bicubic")
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([180.0]), np.array([0.0]), np.array([0.0]),
            interp="bicubic", interpret=True, **KW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)

    def test_planar_output_layout(self):
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([30.0]), np.array([5.0]), np.array([0.0]),
            interp="bilinear", interpret=True, planar=True, **KW)
        assert out.shape == (1, 3, 128, 256)
        hwc = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([30.0]), np.array([5.0]), np.array([0.0]),
            interp="bilinear", interpret=True, **KW)
        np.testing.assert_allclose(np.asarray(out[0, 0]),
                                   np.asarray(hwc[0, ..., 0]), atol=1e-7)

    def test_non_multiple_sizes_padded(self):
        # 256x120 isn't tile-aligned; wrapper pads the tile grid but the
        # ray angles must still divide by the TRUE view size (regression:
        # padded-dim NDC rendered a slightly wrong field of view)
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([0.0]), np.array([0.0]), np.array([0.0]),
            width=256, height=120, hfov_deg=100.0, vfov_deg=60.0,
            interp="bilinear", interpret=True)
        assert out.shape == (1, 120, 256, 3)
        ref = np.asarray(warp.warp_equirect_to_views(
            SRC, np.array([0.0], np.float32), np.array([0.0], np.float32),
            np.array([0.0], np.float32), width=256, height=120,
            hfov_deg=100.0, vfov_deg=60.0, interp="bilinear",
            backend="xla"))
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


class TestYawRingKernel:
    """pitch=roll=0 views route to the specialized yaw-ring kernel (u is
    row-independent; shared horizontal resample) — parity against XLA."""

    @pytest.mark.parametrize("interp", ["bicubic", "bilinear"])
    def test_yaw_ring_matches_xla(self, interp):
        yaws = np.array([0.0, 90.0, 180.0, 270.0])  # incl. seam at 180
        zeros = np.zeros(4)
        ref = xla_ref(yaws, zeros, zeros, interp)
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, yaws, zeros, zeros, interp=interp, interpret=True, **KW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)

    def test_mixed_yaw_and_tilted_view_order(self):
        # yaw-class + narrow-class in one call: partitioned across both
        # kernels, output order must match the request order
        yaws = np.array([10.0, 20.0, 30.0])
        pitches = np.array([0.0, 15.0, 0.0])
        rolls = np.zeros(3)
        ref = xla_ref(yaws, pitches, rolls, "bicubic")
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, yaws, pitches, rolls, interp="bicubic", interpret=True,
            **KW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)

    def test_full_turn_yaw_is_yaw_class(self):
        # pitch=360/roll=-360 normalize to the yaw class (mod-360 gate)
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([45.0]), np.array([360.0]), np.array([-360.0]),
            interp="bilinear", interpret=True, **KW)
        ref = xla_ref([45.0], [360.0], [-360.0], "bilinear")
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


class TestTiltWindowClass:
    """Pitched views stretch horizontally toward high latitudes
    (du/dj ~ 1/cos lat); the tilted narrow class (640-col windows,
    152-row budget) serves them without the wide kernel's dynamic
    block loop."""

    @pytest.mark.slow
    def test_pitch30_routes_tilt_and_matches_xla(self):
        src = lonlat_pano(1024, 512)
        b = warp_pallas.plan_view(256, 128, 112.6, 73.7, 45.0, -30.0,
                                  0.0, 1024, 512, true_w=256, true_h=128)
        bt = warp_pallas.plan_view(
            256, 128, 112.6, 73.7, 45.0, -30.0, 0.0, 1024, 512,
            true_w=256, true_h=128,
            row_classes=warp_pallas.TILT_ROW_CLASSES,
            win_cols=warp_pallas.TILT_WIN_COLS)
        assert b is None and bt is not None
        assert bt.win_cols == warp_pallas.TILT_WIN_COLS
        ref = np.asarray(warp.warp_equirect_to_views(
            src, np.array([45.0], np.float32),
            np.array([-30.0], np.float32), np.array([0.0], np.float32),
            interp="bicubic", backend="xla", width=256, height=128,
            hfov_deg=112.6, vfov_deg=73.7))
        out = warp_pallas.warp_equirect_to_views_pallas(
            src, np.array([45.0]), np.array([-30.0]), np.array([0.0]),
            width=256, height=128, hfov_deg=112.6, vfov_deg=73.7,
            interp="bicubic", interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestWideWindowKernel:
    """Views the narrow budget rejects now run on the wide-window kernel
    (full-width short windows) — parity against the XLA backend."""

    # near-pole tolerance: d(u)/d(phi) blows up toward the poles, so the
    # ~1e-7 rad atan2/asin polynomial error (vs XLA's transcendentals)
    # magnifies into ~1e-4 of pixel value at steep-gradient texels; the
    # pole-pad formula's `+ v_pad` f32 reassociation (vs the XLA twin's
    # unpadded v) adds <=1 ulp of v on a handful of pole-crossing taps
    # (measured: <=4 px/view at <=1.3e-3 — 0.33 u8 LSB).  u8 SEMANTICS
    # are gated independently for both backends at <=2 LSB by
    # tests/test_v360_oracle.py; this test pins backend-vs-backend f32
    # agreement below u8 quantization, not bit equality.
    POLE_ATOL = 2e-3

    # pitch 90 plans the tallest windows — its bicubic interpret run
    # alone cost ~40s, so it rides the slow tier (bilinear keeps the
    # exact-pole geometry in the default tier)
    @pytest.mark.parametrize("pitch,interp", [
        pytest.param(90.0, "bicubic", marks=pytest.mark.slow),
        (90.0, "bilinear"), (-90.0, "bicubic"), (-90.0, "bilinear"),
        (75.0, "bicubic"), (75.0, "bilinear"),
        (-75.0, "bicubic"), (-75.0, "bilinear")])
    def test_pole_and_near_pole_views(self, pitch, interp):
        ref = xla_ref([0.0], [pitch], [0.0], interp)
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([0.0]), np.array([pitch]), np.array([0.0]),
            interp=interp, interpret=True, **KW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=self.POLE_ATOL)

    def test_pole_view_with_seam_crossing(self):
        ref = xla_ref([180.0], [88.0], [30.0], "bicubic")
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([180.0]), np.array([88.0]), np.array([30.0]),
            interp="bicubic", interpret=True, **KW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=self.POLE_ATOL)

    def test_extreme_hfov_slope(self):
        # 150 deg hfov at 512 px: horizontal slope exceeds the narrow
        # budget away from center; wide class must serve it
        kw = dict(width=256, height=128, hfov_deg=150.0, vfov_deg=70.0)
        ref = np.asarray(warp.warp_equirect_to_views(
            SRC, np.array([45.0], np.float32), np.array([0.0], np.float32),
            np.array([0.0], np.float32), interp="bicubic", backend="xla",
            **kw))
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([45.0]), np.array([0.0]), np.array([0.0]),
            interp="bicubic", interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)

    @pytest.mark.slow
    def test_mixed_narrow_and_wide_view_order(self):
        # equator + pole in one call: partitioned across both kernels,
        # output order must match the request order
        yaws = np.array([0.0, 10.0, 20.0])
        pitches = np.array([0.0, 90.0, -10.0])
        rolls = np.zeros(3)
        ref = xla_ref(yaws, pitches, rolls, "bilinear")
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, yaws, pitches, rolls, interp="bilinear", interpret=True,
            **KW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)

    @pytest.mark.parametrize("rows", warp_pallas.WIDE_ROW_CLASSES[:4])
    def test_each_wide_row_class_resamples(self, rows):
        # drive _resample_tile_wide at every practical row class via a
        # synthetic pitch chosen to stress vertical spans; classes beyond
        # src_h are skipped by the planner itself
        if rows > SRC.shape[0]:
            pytest.skip("row class exceeds source height")
        b = warp_pallas.plan_view_wide(
            256, 128, 100.0, 60.0, 0.0, 90.0, 0.0,
            int(SRC.shape[1]), int(SRC.shape[0]))
        assert b is not None  # pole view plans into some wide class


class TestFallback:
    def test_pole_view_served_by_wide_kernel(self):
        # regression: pole views used to raise PallasFallback; the wide
        # kernel now serves them (parity tested above)
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([0.0]), np.array([90.0]), np.array([0.0]),
            interp="bicubic", interpret=True, **KW)
        assert out.shape == (1, 128, 256, 3)

    def test_unknown_projection_falls_back(self):
        with pytest.raises(warp_pallas.PallasFallback):
            warp_pallas.warp_equirect_to_views_pallas(
                SRC, np.array([0.0]), np.array([0.0]), np.array([0.0]),
                projection="cylindrical", interp="bilinear",
                interpret=True, **KW)


class TestFisheyeOutputs:
    """Fisheye output projections (v360 equidistant + lens equisolid) run
    on the wide-window kernel — the image-circle rim sweeps all
    longitudes, so only full-width windows can hold its tiles."""

    FKW = dict(width=128, height=128, hfov_deg=180.0, vfov_deg=180.0)

    # equisolid runs bilinear to keep interpret-mode runtime sane; the
    # projection math under test is identical across interps
    @pytest.mark.parametrize("projection,interp", [
        pytest.param("fisheye_v360", "bicubic", marks=pytest.mark.slow),
        ("equisolid", "bilinear")])
    def test_matches_xla(self, projection, interp):
        ref = np.asarray(warp.warp_equirect_to_views(
            SRC, np.array([30.0], np.float32), np.array([0.0], np.float32),
            np.array([0.0], np.float32), interp=interp, backend="xla",
            projection=projection, **self.FKW))
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([30.0]), np.array([0.0]), np.array([0.0]),
            interp=interp, projection=projection, interpret=True,
            **self.FKW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    @pytest.mark.slow
    def test_fisheye_pair_front_back(self):
        # the fisheyeXY preset shape: front + back 180-deg hemispheres
        yaws = np.array([0.0, 180.0])
        zeros = np.zeros(2)
        ref = np.asarray(warp.warp_equirect_to_views(
            SRC, yaws.astype(np.float32), zeros.astype(np.float32),
            zeros.astype(np.float32), interp="bilinear", backend="xla",
            projection="fisheye_v360", **self.FKW))
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, yaws, zeros, zeros, interp="bilinear",
            projection="fisheye_v360", interpret=True, **self.FKW)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
        # corners are outside the image circle -> filled with 0
        assert np.asarray(out)[0, 0, 0].max() == 0.0

    def test_auto_backend_transparent_fallback(self):
        # pitch-90 view via the public API with backend='auto' must succeed
        out = warp.warp_equirect_to_views(
            SRC, np.array([0.0]), np.array([90.0]), np.array([0.0]),
            interp="bilinear", backend="auto", **KW)
        assert out.shape == (1, 128, 256, 3)


class TestKernelTrigPolyfills:
    def test_atan2_accuracy(self):
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.uniform(-2, 2, 10000).astype(np.float32))
        x = jnp.asarray(rng.uniform(-2, 2, 10000).astype(np.float32))
        got = np.asarray(warp_pallas._atan2(y, x))
        ref = np.arctan2(np.asarray(y, np.float64), np.asarray(x, np.float64))
        assert np.abs(got - ref).max() < 1e-6

    def test_asin_accuracy(self):
        y = jnp.asarray(np.linspace(-0.999, 0.999, 5001).astype(np.float32))
        got = np.asarray(warp_pallas._asin(y))
        ref = np.arcsin(np.asarray(y, np.float64))
        assert np.abs(got - ref).max() < 2e-6


class TestWide3Kernel:
    """Wide v3 (de-sheared residual windows, row-invariant-column lane
    gathers + per-pixel vreg select AFTER the sublane gather) — parity
    against the XLA twin via a direct kernel call, plus planner gates.

    Design regression this guards: lane gathers must use a row-invariant
    column index (the horizontal shear is folded into an extended tap
    sweep), and the residual-vreg select must happen after the vertical
    sublane gather — both per-row-index formulations mix columns across
    sublanes (0.8+ max error on any tilted view)."""

    # narrow rejects nothing here — we call the wide3 kernel directly on
    # a small tilted view (pitch 35, fov 40x18) that plans win=48
    W, H, HF, VF = 128, 32, 40.0, 18.0
    YPR = (20.0, 35.0, 0.0)

    def _direct(self, interp):
        import math
        y, p, r = self.YPR
        plan = warp_pallas._wide3_plan_view(
            self.W, self.H, self.HF, self.VF, y, p, r, 512, 256,
            self.W, self.H, "perspective", interp)
        assert plan is not None
        (win_rows, resid_lo, resid_hi, spread_lo, max_rounds, span_cls,
         tab, cs) = plan
        assert resid_hi in warp_pallas.WIDE3_RESID_CLASSES
        assert span_cls in warp_pallas.WIDE3_SHEAR_CLASSES
        assert int(cs.max()) <= (win_rows - min(resid_lo, resid_hi)) // 8
        mb = max_rounds * warp_pallas.WIDE2_BPR
        planar_src = warp_pallas._planar_source(
            SRC.reshape(256, 512 * 3), interpret=True,
            max_win_cols=warp_pallas.TILT_WIN_COLS)
        rot = warp_pallas._rot_matrix(y, p, r)
        table = np.zeros((1, 16), np.float32)
        table[0, 0:9] = rot.astype(np.float32).reshape(-1)
        table[0, 9] = math.tan(math.radians(self.HF) / 2.0)
        table[0, 10] = math.tan(math.radians(self.VF) / 2.0)
        tab3, cs3 = warp_pallas._wide3_tables_device(
            ("test-w3", self.W, self.H, interp), [tab], [cs], mb)
        out = warp_pallas._warp_call_wide3(
            planar_src, jnp.asarray(table), tab3, cs3,
            width=self.W, height=self.H, true_w=self.W, true_h=self.H,
            src_w=512, src_h=256, interp=interp, win_rows=win_rows,
            resid_lo=resid_lo, resid_hi=resid_hi, spread_lo=spread_lo,
            n_views=1,
            mb=mb, projection="perspective", interpret=True)
        # planar (1, 3, H, W) -> HWC
        return np.transpose(np.asarray(out), (0, 2, 3, 1))

    @pytest.mark.parametrize("interp", ["bicubic", "bilinear"])
    def test_tilted_view_matches_xla(self, interp):
        y, p, r = self.YPR
        ref = np.asarray(warp.warp_equirect_to_views(
            SRC, np.array([y], np.float32), np.array([p], np.float32),
            np.array([r], np.float32), interp=interp, backend="xla",
            width=self.W, height=self.H, hfov_deg=self.HF,
            vfov_deg=self.VF))
        out = self._direct(interp)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("route", ["wide3_chunk", "wide2"])
    def test_grazing_pole_both_routes_match_xla(self, route, monkeypatch):
        # pole-grazing shear: half the groups exceed the wide3 span cap
        # and run the in-kernel chunk branch (route wide3_chunk, the
        # default); GS360X_WIDE3=0 pins the wide2 kernel — BOTH must
        # reproduce the twin's BOTTOM pole-reflection taps (v360
        # reflecty + half-width shift, served by the padded planar
        # source's reflected rows)
        kw = dict(width=256, height=32, hfov_deg=60.0, vfov_deg=22.0)
        p = warp_pallas._wide3_plan_view(
            256, 32, 60.0, 22.0, 20.0, -82.0, 0.0, 512, 256, 256, 32,
            "perspective", "bicubic")
        assert p is not None
        ng = warp_pallas.TILE_ROWS // 8
        assert (p[6][:, 3:3 + ng] == warp_pallas.WIDE3_FLAG_CHUNK).any()
        if route == "wide2":
            monkeypatch.setenv("GS360X_WIDE3", "0")
        ref = np.asarray(warp.warp_equirect_to_views(
            SRC, np.array([20.0], np.float32),
            np.array([-82.0], np.float32), np.array([0.0], np.float32),
            interp="bicubic", backend="xla", **kw))
        out = warp_pallas.warp_equirect_to_views_pallas(
            SRC, np.array([20.0]), np.array([-82.0]), np.array([0.0]),
            interp="bicubic", interpret=True, **kw)
        # pole rows gate at ~1 u8 LSB, not the interior 2e-4: with real
        # (reflected) content past the pole, the in-kernel angle
        # polynomials' tap-weight error is no longer masked by
        # clamp-flattened rows (measured max 1.9e-3 = 0.5 LSB on 7 of
        # 24,576 px; docs/V360_PARITY.md gates the same geometry vs the
        # independent oracle at <=2 LSB)
        np.testing.assert_allclose(np.asarray(out), ref, atol=4.5e-3)

    def test_perspective_wholesale_fallback_still_exists(self):
        # a pole-CENTERED view (cube up face) is majority-chunk — the
        # planner must decline so the whole view serves on wide2
        assert warp_pallas._wide3_plan_view(
            256, 256, 105.0, 105.0, 0.0, 90.0, 0.0, 2048, 1024, 256,
            256, "perspective", "bicubic") is None

    @pytest.mark.slow
    def test_wide_fov_tilted_view_chunk_route_matches_xla(self):
        # evenPlus30-shaped geometry (extra-wide fov, pitch 30, view
        # reaching near-pole latitudes): the old all-or-nothing shear
        # cap rejected it to wide2; it must now plan with a small chunk
        # fraction (the near-pole groups) and match the twin
        src = lonlat_pano(2048, 1024)
        kw = dict(width=256, height=128, hfov_deg=112.6, vfov_deg=100.0)
        p = warp_pallas._wide3_plan_view(
            256, 128, 112.6, 100.0, 0.0, 30.0, 0.0, 2048, 1024, 256,
            128, "perspective", "bicubic")
        assert p is not None
        ng = warp_pallas.TILE_ROWS // 8
        flags = p[6][:, 3:3 + ng]
        assert (flags == warp_pallas.WIDE3_FLAG_CHUNK).any()
        assert (flags != warp_pallas.WIDE3_FLAG_CHUNK).mean() > 0.5
        ref = np.asarray(warp.warp_equirect_to_views(
            src, np.array([0.0], np.float32),
            np.array([30.0], np.float32), np.array([0.0], np.float32),
            interp="bicubic", backend="xla", **kw))
        out = warp_pallas.warp_equirect_to_views_pallas(
            src, np.array([0.0]), np.array([30.0]), np.array([0.0]),
            interp="bicubic", interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_plan_view_budget_vs_emulated_taps(self):
        # planner invariant on a non-trivial tilted geometry: for every
        # (tile, block, column) the CLAMPED tap extrema fit the residual
        # window [rm + 8*cs, rm + 8*cs + RS)
        plan = warp_pallas._wide3_plan_view(
            128, 128, 100.0, 100.0, 20.0, 35.0, 0.0, 512, 256, 128, 128,
            "perspective", "bicubic")
        assert plan is not None
        win_rows, resid_lo, resid_hi, spread_lo, _, _, tab, cs = plan
        ng = warp_pallas.TILE_ROWS // 8
        rot = warp_pallas._rot_matrix(20.0, 35.0, 0.0)
        u, v = warp_pallas._np_view_coords_strided(
            128, 128, 100.0, 100.0, rot, 512, 256, stride=1,
            true_w=128, true_h=128, projection="perspective")
        vcl = np.clip(v, 0.0, 255.0)
        y0 = np.floor(vcl).astype(np.int64)
        TR, TC = warp_pallas.TILE_ROWS, warp_pallas.TILE_COLS
        n_tx = 128 // TC
        for t in range(tab.shape[0]):
            ty, tx = divmod(t, n_tx)
            b0, nblk, anc = tab[t, 0], tab[t, 1], tab[t, 2]
            ut = u[ty * TR:(ty + 1) * TR, tx * TC:(tx + 1) * TC]
            ua = anc + np.mod(ut - anc + 256.0, 512.0) - 256.0
            x0 = np.floor(ua).astype(np.int64)
            y0t = y0[ty * TR:(ty + 1) * TR, tx * TC:(tx + 1) * TC]
            for b in range(nblk):
                rm = int(tab[t, 3 + ng + b])
                bcol = (b0 + b) * 128
                for g in range(TR // 8):
                    gr = slice(g * 8, (g + 1) * 8)
                    resid_g = resid_hi if tab[t, 3 + g] else resid_lo
                    for k in range(4):
                        xi = x0[gr] + (k - 1)
                        m = (xi >= bcol) & (xi < bcol + 128)
                        if not m.any():
                            continue
                        j = xi[m] - bcol
                        lo = rm + 8 * cs[t, b, g][j]
                        taps_lo = np.clip(y0t[gr][m] - 1, 0, 255)
                        taps_hi = np.clip(y0t[gr][m] + 2, 0, 255)
                        assert (taps_lo >= lo).all()
                        assert (taps_hi <= lo + resid_g - 1).all()

    def test_single_branch_mode_matches_xla(self):
        # force spread_lo=0 (all groups on the HI/absolute chain): the
        # kernel's single-branch instantiation must agree with the twin
        import math
        y, p, r = self.YPR
        base = warp_pallas._wide3_plan_view(
            self.W, self.H, self.HF, self.VF, y, p, r, 512, 256,
            self.W, self.H, "perspective", "bicubic")
        plan = warp_pallas._wide3_plan_view(
            self.W, self.H, self.HF, self.VF, y, p, r, 512, 256,
            self.W, self.H, "perspective", "bicubic",
            force=(base[0], base[2], base[2], 0))
        assert plan is not None and plan[3] == 0
        (win_rows, resid_lo, resid_hi, spread_lo, max_rounds, _,
         tab, cs) = plan
        assert (tab[:, 3:3 + warp_pallas.TILE_ROWS // 8] == 1).all()
        mb = max_rounds * warp_pallas.WIDE2_BPR
        planar_src = warp_pallas._planar_source(
            SRC.reshape(256, 512 * 3), interpret=True,
            max_win_cols=warp_pallas.TILT_WIN_COLS)
        rot = warp_pallas._rot_matrix(y, p, r)
        table = np.zeros((1, 16), np.float32)
        table[0, 0:9] = rot.astype(np.float32).reshape(-1)
        table[0, 9] = math.tan(math.radians(self.HF) / 2.0)
        table[0, 10] = math.tan(math.radians(self.VF) / 2.0)
        tab3, cs3 = warp_pallas._wide3_tables_device(
            ("test-w3-single", self.W, self.H), [tab], [cs], mb)
        out = warp_pallas._warp_call_wide3(
            planar_src, jnp.asarray(table), tab3, cs3,
            width=self.W, height=self.H, true_w=self.W, true_h=self.H,
            src_w=512, src_h=256, interp="bicubic", win_rows=win_rows,
            resid_lo=resid_lo, resid_hi=resid_hi, spread_lo=0,
            n_views=1, mb=mb, projection="perspective", interpret=True)
        out = np.transpose(np.asarray(out), (0, 2, 3, 1))
        ref = np.asarray(warp.warp_equirect_to_views(
            SRC, np.array([y], np.float32), np.array([p], np.float32),
            np.array([r], np.float32), interp="bicubic", backend="xla",
            width=self.W, height=self.H, hfov_deg=self.HF,
            vfov_deg=self.VF))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.slow
    def test_mixed_branch_deep_shear_matches_xla(self):
        # pitch-60 110-deg geometry: rlo=24 / rhi=40 with ~half the
        # groups on each branch and shear spans near the class cap —
        # exercises the deep HI absolute chains and the LO relative
        # chain side by side in one call
        import math
        W, H, HF, VF = 384, 64, 110.0, 30.0
        y, p, r = 20.0, 60.0, 0.0
        src = lonlat_pano(1024, 512)
        plan = warp_pallas._wide3_plan_view(
            W, H, HF, VF, y, p, r, 1024, 512, W, H,
            "perspective", "bicubic")
        assert plan is not None
        (win_rows, resid_lo, resid_hi, spread_lo, max_rounds, _,
         tab, cs) = plan
        ng = warp_pallas.TILE_ROWS // 8
        flags = tab[:, 3:3 + ng]
        assert spread_lo > 0 and resid_lo < resid_hi
        assert 0.2 < (flags == 1).mean() < 0.8   # genuinely mixed
        mb = max_rounds * warp_pallas.WIDE2_BPR
        planar_src = warp_pallas._planar_source(
            src.reshape(512, 1024 * 3), interpret=True,
            max_win_cols=warp_pallas.TILT_WIN_COLS)
        rot = warp_pallas._rot_matrix(y, p, r)
        table = np.zeros((1, 16), np.float32)
        table[0, 0:9] = rot.astype(np.float32).reshape(-1)
        table[0, 9] = math.tan(math.radians(HF) / 2.0)
        table[0, 10] = math.tan(math.radians(VF) / 2.0)
        tab3, cs3 = warp_pallas._wide3_tables_device(
            ("test-w3-mixed", W, H), [tab], [cs], mb)
        out = warp_pallas._warp_call_wide3(
            planar_src, jnp.asarray(table), tab3, cs3,
            width=W, height=H, true_w=W, true_h=H,
            src_w=1024, src_h=512, interp="bicubic",
            win_rows=win_rows, resid_lo=resid_lo, resid_hi=resid_hi,
            spread_lo=spread_lo, n_views=1, mb=mb,
            projection="perspective", interpret=True)
        out = np.transpose(np.asarray(out), (0, 2, 3, 1))
        ref = np.asarray(warp.warp_equirect_to_views(
            src, np.array([y], np.float32), np.array([p], np.float32),
            np.array([r], np.float32), interp="bicubic", backend="xla",
            width=W, height=H, hfov_deg=HF, vfov_deg=VF))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.slow
    def test_mixed_view_force_replan_matches_xla(self):
        # two wide views whose per-view plans disagree on win_rows,
        # resid_hi AND spread_lo (pitch -35: 96/32/32/4; pitch -60:
        # 152/32/40/8) — the dispatch must re-plan the outlier with the
        # call-level classes pinned and still match the twin
        src = lonlat_pano(1024, 512)
        kw = dict(width=256, height=32, hfov_deg=100.0, vfov_deg=25.0)
        p_a = warp_pallas._wide3_plan_view(
            256, 32, 100.0, 25.0, 20.0, -35.0, 0.0, 1024, 512, 256, 32,
            "perspective", "bicubic")
        p_b = warp_pallas._wide3_plan_view(
            256, 32, 100.0, 25.0, 20.0, -60.0, 0.0, 1024, 512, 256, 32,
            "perspective", "bicubic")
        assert p_a is not None and p_b is not None
        assert (p_a[0], p_a[2], p_a[3]) != (p_b[0], p_b[2], p_b[3])
        yaws = np.array([20.0, 20.0])
        pitches = np.array([-35.0, -60.0])
        rolls = np.zeros(2)
        ref = np.asarray(warp.warp_equirect_to_views(
            src, yaws.astype(np.float32), pitches.astype(np.float32),
            rolls.astype(np.float32), interp="bicubic", backend="xla",
            **kw))
        out = warp_pallas.warp_equirect_to_views_pallas(
            src, yaws, pitches, rolls, interp="bicubic",
            interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_fisheye_plan_mixes_simd_and_chunk_groups(self):
        # d190 fisheye: the pano poles sit inside the image circle, so
        # pole/rim groups legitimately sweep thousands of columns — the
        # planner must serve them on the chunk branch (flag 2) while
        # most groups stay SIMD (valid-MASKED shear stats; the unmasked
        # stats would chunk nearly everything)
        p = warp_pallas._wide3_plan_view(
            128, 128, 190.0, 190.0, 0.0, 0.0, 0.0, 512, 256, 128, 128,
            "fisheye_v360", "bicubic")
        assert p is not None
        win_rows, rlo, rhi, slo, max_rounds, _, tab, cs = p
        ng = warp_pallas.TILE_ROWS // 8
        flags = tab[:, 3:3 + ng]
        n_chunk = (flags == warp_pallas.WIDE3_FLAG_CHUNK).sum()
        n_simd = ((flags == warp_pallas.WIDE3_FLAG_LO)
                  | (flags == warp_pallas.WIDE3_FLAG_HI)).sum()
        assert n_chunk > 0 and n_simd > 2 * n_chunk
        # cs storage is capped for fisheye outputs
        assert cs.shape[1] == min(max_rounds * warp_pallas.WIDE2_BPR,
                                  warp_pallas.WIDE3_CS_BLOCKS)

    def test_fisheye_plan_cs_cap_binds_on_wide_source(self):
        # a pole-enclosing tile sweeps ~src_w/128 blocks; the cs table
        # must stay capped at WIDE3_CS_BLOCKS with the far groups on
        # the chunk branch (an uncapped cs would cost 100s of MB at 8K)
        p = warp_pallas._wide3_plan_view(
            384, 384, 190.0, 190.0, 0.0, 0.0, 0.0, 1536, 768, 384, 384,
            "fisheye_v360", "bilinear")
        assert p is not None
        mb = p[4] * warp_pallas.WIDE2_BPR
        assert mb > warp_pallas.WIDE3_CS_BLOCKS   # cap binds
        assert p[7].shape[1] == warp_pallas.WIDE3_CS_BLOCKS
        ng = warp_pallas.TILE_ROWS // 8
        flags = p[6][:, 3:3 + ng]
        assert (flags == warp_pallas.WIDE3_FLAG_CHUNK).any()

    @pytest.mark.slow
    def test_fisheye_wide3_overflow_blocks_match_xla(self, monkeypatch):
        # overflow rounds past the cs cap (traced block index → clamped
        # cs read, chunk-only service) against the XLA twin; the cap is
        # lowered so the geometry stays interpret-affordable
        monkeypatch.setattr(warp_pallas, "WIDE3_CS_BLOCKS", 4)
        # the tighter cap pushes the chunk fraction past the wholesale-
        # fallback policy; the policy is routing, not correctness —
        # relax it so the capped kernel path actually runs
        monkeypatch.setattr(warp_pallas, "_WIDE3_CHUNK_FRAC_MAX", 0.95)
        warp_pallas._wide3_plan_view.cache_clear()
        try:
            src = lonlat_pano(768, 384)
            kw = dict(width=128, height=128, hfov_deg=190.0,
                      vfov_deg=190.0)
            p = warp_pallas._wide3_plan_view(
                128, 128, 190.0, 190.0, 0.0, 0.0, 0.0, 768, 384,
                128, 128, "fisheye_v360", "bilinear")
            assert p is not None
            assert p[4] * warp_pallas.WIDE2_BPR > 4   # cap binds
            assert p[7].shape[1] == 4
            ng = warp_pallas.TILE_ROWS // 8
            flags = p[6][:, 3:3 + ng]
            # a real mix: SIMD groups coexist with chunk groups
            assert (flags == warp_pallas.WIDE3_FLAG_LO).any()
            assert (flags == warp_pallas.WIDE3_FLAG_CHUNK).any()
            ref = np.asarray(warp.warp_equirect_to_views(
                src, np.array([0.0], np.float32),
                np.array([0.0], np.float32),
                np.array([0.0], np.float32), interp="bilinear",
                backend="xla", projection="fisheye_v360", **kw))
            out = warp_pallas.warp_equirect_to_views_pallas(
                src, np.array([0.0]), np.array([0.0]),
                np.array([0.0]), interp="bilinear",
                projection="fisheye_v360", interpret=True, **kw)
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
        finally:
            warp_pallas._wide3_plan_view.cache_clear()

    def test_packed_rg_planar_source_exact(self):
        # MXU packed permutation: plane0 must be exactly 256*R + G and
        # plane1 exactly B (u8 values are exact in bf16; the 2-term f32
        # accumulate is exact), at INTEGER scale
        rng = np.random.default_rng(3)
        src8 = (rng.random((256, 512, 3)) * 255).astype(np.uint8)
        rows = src8.reshape(256, 512 * 3)
        planes = np.asarray(warp_pallas._planar_source(
            jnp.asarray(rows), interpret=True, pack_rg=True))
        assert planes.shape[0] == 2
        w = 512
        exp0 = src8[:, :, 0].astype(np.float64) * 256 \
            + src8[:, :, 1].astype(np.float64)
        np.testing.assert_array_equal(planes[0, :256, :w], exp0)
        np.testing.assert_array_equal(planes[1, :256, :w],
                                      src8[:, :, 2].astype(np.float64))
        # seam wrap columns carry the same packing
        np.testing.assert_array_equal(planes[0, :256, w:w + 8],
                                      exp0[:, :8])

    def test_packed_rgb3_planar_source_exact(self):
        # pack 3: the single plane must be exactly 65536*R + 256*G + B
        # (each bf16 product exact, 3-term f32 sum < 2^24)
        rng = np.random.default_rng(5)
        src8 = (rng.random((256, 512, 3)) * 255).astype(np.uint8)
        src8[:2, :2] = 255                     # exercise the maximum
        rows = src8.reshape(256, 512 * 3)
        planes = np.asarray(warp_pallas._planar_source(
            jnp.asarray(rows), interpret=True, pack_rg=3))
        assert planes.shape[0] == 1
        w = 512
        exp = (src8[:, :, 0].astype(np.float64) * 65536
               + src8[:, :, 1].astype(np.float64) * 256
               + src8[:, :, 2].astype(np.float64))
        np.testing.assert_array_equal(planes[0, :256, :w], exp)
        np.testing.assert_array_equal(planes[0, :256, w:w + 8],
                                      exp[:, :8])

    # mode "2" (non-default) parity rides the slow tier; the default
    # "3" pack keeps both scenarios in the default tier
    @pytest.mark.parametrize("scenario,mode", [
        pytest.param("tilt", "2", marks=pytest.mark.slow),
        pytest.param("fisheye", "2", marks=pytest.mark.slow),
        ("tilt", "3"), ("fisheye", "3")])
    def test_packed_matches_unpacked(self, scenario, mode, monkeypatch):
        # GS360X_WIDE3_PACK (u8 sources): fewer gather chains and less
        # window DMA via packed planes (256*R+G / B for "2"; the single
        # 65536*R+256*G+B plane for "3"), unpacked per tap in-kernel
        # with the /255 folded into the output write — must agree with
        # the unpacked wide3 path to f32 rounding (the /255 placement
        # is the only reordering; every pack/unpack step is exact)
        rng = np.random.default_rng(0)
        src8 = (rng.random((256, 512, 3)) * 255).astype(np.uint8)
        if scenario == "tilt":
            kw = dict(width=128, height=32, hfov_deg=40.0,
                      vfov_deg=18.0, interp="bicubic", interpret=True)
            y, p = np.array([20.0]), np.array([35.0])
        else:
            kw = dict(width=128, height=128, hfov_deg=190.0,
                      vfov_deg=190.0, projection="fisheye_v360",
                      interp="bilinear", interpret=True)
            y, p = np.array([0.0]), np.array([0.0])
        r = np.zeros(1)
        monkeypatch.setenv("GS360X_WIDE3_PACK", "0")
        ref = np.asarray(warp_pallas.warp_equirect_to_views_pallas(
            src8, y, p, r, **kw))
        monkeypatch.setenv("GS360X_WIDE3_PACK", mode)
        out = np.asarray(warp_pallas.warp_equirect_to_views_pallas(
            src8, y, p, r, **kw))
        np.testing.assert_allclose(out, ref, atol=2e-6)

    def test_public_dispatch_routes_wide3(self):
        # narrow/tilt reject this (steep horizontal slope at lat -50),
        # wide2 AND wide3 plan it -> dispatch must build the per-group
        # cs tables and serve it on wide3 (GS360X_WIDE3 default-on)
        src = lonlat_pano(1024, 512)
        kw = dict(width=256, height=32, hfov_deg=100.0, vfov_deg=25.0)
        assert warp_pallas.plan_view(
            256, 32, 100.0, 25.0, 20.0, -50.0, 0.0, 1024, 512,
            true_w=256, true_h=32) is None
        assert warp_pallas._wide3_plan_view(
            256, 32, 100.0, 25.0, 20.0, -50.0, 0.0, 1024, 512, 256, 32,
            "perspective", "bicubic") is not None
        ref = np.asarray(warp.warp_equirect_to_views(
            src, np.array([20.0], np.float32),
            np.array([-50.0], np.float32), np.array([0.0], np.float32),
            interp="bicubic", backend="xla", **kw))
        out = warp_pallas.warp_equirect_to_views_pallas(
            src, np.array([20.0]), np.array([-50.0]), np.array([0.0]),
            interp="bicubic", interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
