"""Batched wide-v3 remap vs the XLA twin (cv2.remap semantics).

The SFM10 dual-fisheye chain's maps are smooth static arrays
(``gs360_DualFisheyeDistortionCalibration.py:1996-2055``);
``PreparedRemapBatch`` plans them through the wide-v3 machinery and runs
every view in one launch. Parity gate: the batch path must match
``warp.remap`` (clip borders) on the same maps.
"""

import numpy as np
import pytest

from gs360x.kernels import remap_pallas as rp
from gs360x.kernels import warp as warp_xla

SRC = 384
OUT = 256


@pytest.fixture(scope="module")
def src():
    rng = np.random.default_rng(3)
    img = rng.random((SRC, SRC, 3)).astype(np.float32)
    return img


def _smooth_maps(kind: str, out=OUT):
    """Synthetic smooth maps in the SFM10 family: perspective-ish cuts
    with rotation/scale/radial terms, plus a validity circle."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, out), np.linspace(-1, 1, out),
                         indexing="ij")
    if kind == "affine":
        ang = 0.35
        mx = SRC / 2 + (np.cos(ang) * xx - np.sin(ang) * yy) * SRC * 0.33
        my = SRC / 2 + (np.sin(ang) * xx + np.cos(ang) * yy) * SRC * 0.30
        valid = None
    elif kind == "radial":
        r2 = xx * xx + yy * yy
        k = 1.0 + 0.35 * r2
        mx = SRC / 2 + xx * k * SRC * 0.30
        my = SRC / 2 + yy * k * SRC * 0.30
        valid = r2 <= 1.0
    elif kind == "shear":
        mx = SRC / 2 + (xx + 0.45 * yy) * SRC * 0.30
        my = SRC / 2 + (yy + 0.25 * xx * xx) * SRC * 0.32
        valid = None
    else:
        raise ValueError(kind)
    return mx.astype(np.float32), my.astype(np.float32), valid


@pytest.mark.parametrize("interp", [
    pytest.param("bicubic", marks=pytest.mark.slow), "bilinear"])
def test_batch_matches_xla_twin(src, interp):
    maps = [_smooth_maps(k) for k in ("affine", "radial", "shear")]
    batch = rp.PreparedRemapBatch(maps, src_w=SRC, src_h=SRC,
                                  interp=interp)
    out = np.asarray(batch(src, interpret=True))       # (V, 3, H, W)
    assert out.shape == (3, 3, OUT, OUT)
    for vi, (mx, my, valid) in enumerate(maps):
        ref = np.asarray(warp_xla.remap(
            src, mx, my, interp=interp, wrap_x=False,
            valid=None if valid is None else np.asarray(valid)))
        got = out[vi].transpose(1, 2, 0)
        mask = np.ones((OUT, OUT), bool) if valid is None else valid
        diff = np.abs(got - ref)[mask]
        assert float(diff.max()) <= 2e-5, \
            f"view {vi}: max diff {diff.max():.2e}"


def test_batch_uint8_packed_matches_float(src):
    maps = [_smooth_maps("radial")]
    batch = rp.PreparedRemapBatch(maps, src_w=SRC, src_h=SRC)
    u8 = np.clip(np.rint(src * 255), 0, 255).astype(np.uint8)
    out_u8 = np.asarray(batch(u8, interpret=True))[0]
    ref = np.asarray(warp_xla.remap(
        u8.astype(np.float32) / 255.0, maps[0][0], maps[0][1],
        interp="bicubic", wrap_x=False,
        valid=np.asarray(maps[0][2]))).transpose(2, 0, 1)
    mask = maps[0][2]
    diff = np.abs(out_u8 - ref)[:, mask]
    assert float(diff.max()) <= 5e-5


def test_batch_fill_value(src):
    maps = [_smooth_maps("radial")]
    batch = rp.PreparedRemapBatch(maps, src_w=SRC, src_h=SRC)
    out = np.asarray(batch(src, fill=0.25, interpret=True))[0]
    inval = ~maps[0][2]
    assert np.allclose(out[:, inval], 0.25, atol=1e-6)


def test_out_of_budget_map_raises():
    # a map whose taps leave the image (left edge) must fall back
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64),
                         indexing="ij")
    mx = (xx * 40.0 - 1.5).astype(np.float32)          # taps below 0
    my = (20 + yy * 40).astype(np.float32)
    with pytest.raises(rp.PallasFallback):
        rp.PreparedRemapBatch([(mx, my, None)], src_w=SRC, src_h=SRC)
