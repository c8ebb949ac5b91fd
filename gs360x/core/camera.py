"""Camera projection models and field-of-view algebra.

Two tiers live here:

* **Scalar algebra** (plain Python floats) — focal↔FOV conversions used when
  building render plans and metadata. Behavior-parity targets:
  ``/root/reference/cli_tools/gs360_360PerspCut.py:77-86``
  (``fov_from_focal_mm`` / ``focal_from_hfov_deg`` / ``v_fov_from_hfov``).

* **Ray models** (jax.numpy, shape-static) — map output pixel grids to unit
  ray directions in the *camera* frame, and unit rays in the *source* frame
  to source pixel coordinates. These are the building blocks the warp engine
  composes: ``dst pixel → ray → rotate → src UV → resample``.

Geometry conventions (chosen to match ffmpeg's ``v360`` filter, the engine
the reference delegates all reprojection to — see
``/root/reference/cli_tools/gs360_360PerspCut.py:310-314``):

* camera frame: ``+x`` right, ``+y`` down, ``+z`` forward;
* equirectangular longitude ``phi = atan2(x, z)`` grows to the right and maps
  to image ``u``; latitude ``theta = asin(y)`` grows downward and maps to
  ``v`` (image top = looking up);
* pixel centers sit at half-integer offsets: the sample position for source
  pixel column ``u`` is ``u + 0.5`` in continuous coordinates;
* positive yaw pans right, positive pitch looks **up**, positive roll tilts
  clockwise (see :func:`gs360x.core.pose.rotation_yaw_pitch_roll`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# --------------------------------------------------------------------------
# Scalar FOV / focal algebra (host-side, plan building)
# --------------------------------------------------------------------------


def hfov_from_focal_mm(f_mm: float, sensor_w_mm: float) -> float:
    """Horizontal FOV (deg) of a rectilinear lens: 2*atan(w / 2f)."""
    return math.degrees(2.0 * math.atan(sensor_w_mm / (2.0 * f_mm)))


def focal_mm_from_hfov(hfov_deg: float, sensor_w_mm: float) -> float:
    """Rectilinear focal length (mm) from horizontal FOV (deg)."""
    return sensor_w_mm / (2.0 * math.tan(math.radians(hfov_deg) / 2.0))


def vfov_from_hfov(hfov_deg: float, width: int, height: int) -> float:
    """Vertical FOV (deg) implied by an hfov and a pixel aspect ratio."""
    half_h = math.tan(math.radians(hfov_deg) / 2.0) * (height / float(width))
    return math.degrees(2.0 * math.atan(half_h))


def vfov_from_sensor(f_mm: float, sensor_h_mm: float) -> float:
    """Vertical FOV (deg) from focal length and sensor height."""
    return math.degrees(2.0 * math.atan(sensor_h_mm / (2.0 * f_mm)))


def focal_px(f_mm: float, sensor_w_mm: float, width_px: int) -> float:
    """Focal length in pixels (the Metashape 'f' users precalibrate with)."""
    return f_mm / (sensor_w_mm / float(width_px))


def focal_35mm_equivalent(f_mm: float, sensor_long_mm: float) -> float:
    """35mm-equivalent focal length (reference quotes this for RealityScan)."""
    return f_mm * (36.0 / sensor_long_mm)


# --------------------------------------------------------------------------
# Pixel grids
# --------------------------------------------------------------------------


def _pixel_ndc(width: int, height: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized device coords at pixel centers, in [-1, 1].

    Matches v360's convention ``(2*i + 1)/W - 1`` so that the outermost pixel
    centers sit half a pixel inside the FOV boundary.
    Returns ``(nx, ny)`` each of shape ``(height, width)``; ``ny`` grows
    downward.
    """
    xs = (2.0 * jnp.arange(width, dtype=dtype) + 1.0) / width - 1.0
    ys = (2.0 * jnp.arange(height, dtype=dtype) + 1.0) / height - 1.0
    return jnp.meshgrid(xs, ys)


# --------------------------------------------------------------------------
# Destination models: pixel grid -> unit rays (camera frame)
# --------------------------------------------------------------------------


def perspective_rays(width: int, height: int, hfov_deg: float, vfov_deg: float,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Unit rays for a rectilinear (perspective) image. Shape (H, W, 3)."""
    nx, ny = _pixel_ndc(width, height, dtype)
    half_w = math.tan(math.radians(hfov_deg) / 2.0)
    half_h = math.tan(math.radians(vfov_deg) / 2.0)
    x = nx * half_w
    y = ny * half_h
    z = jnp.ones_like(x)
    d = jnp.stack([x, y, z], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def fisheye_rays(width: int, height: int, dfov_deg: float, *,
                 model: str = "equidistant", dtype=jnp.float32
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit rays for a circular-fisheye image. Shape (H, W, 3) plus validity.

    ``model='equidistant'`` reproduces ffmpeg v360's ``output=fisheye``
    (theta grows linearly with radius; the reference's fisheyeXY preset,
    ``/root/reference/cli_tools/gs360_360PerspCut.py:375-379``).
    ``model='equisolid'`` uses r = 2 f sin(theta/2) like the DJI Osmo lens
    model in the dual-fisheye tool
    (``/root/reference/cli_tools/gs360_DualFisheyeDistortionCalibration.py:1008-1051``).

    Returns ``(rays, valid)`` where ``valid`` masks pixels inside the image
    circle (radius 1 in NDC).
    """
    nx, ny = _pixel_ndc(width, height, dtype)
    r = jnp.sqrt(nx * nx + ny * ny)
    half_fov = math.radians(dfov_deg) / 2.0
    if model == "equidistant":
        theta = r * half_fov
    elif model == "equisolid":
        # r_ndc==1 at theta==half_fov: r = sin(theta/2)/sin(half_fov/2)
        s = jnp.clip(r * math.sin(half_fov / 2.0), -1.0, 1.0)
        theta = 2.0 * jnp.arcsin(s)
    else:
        raise ValueError(f"unknown fisheye model: {model!r}")
    valid = r <= 1.0
    sin_t = jnp.sin(theta)
    # avoid 0/0 at the exact center
    safe_r = jnp.where(r > 1e-12, r, 1.0)
    x = sin_t * (nx / safe_r)
    y = sin_t * (ny / safe_r)
    z = jnp.cos(theta)
    return jnp.stack([x, y, z], axis=-1), valid


def equirect_rays(width: int, height: int, dtype=jnp.float32) -> jnp.ndarray:
    """Unit rays for every pixel of an equirectangular image. Shape (H, W, 3)."""
    nx, ny = _pixel_ndc(width, height, dtype)
    phi = nx * math.pi            # longitude, + right
    theta = ny * (math.pi / 2.0)  # latitude, + down
    cos_t = jnp.cos(theta)
    return jnp.stack([cos_t * jnp.sin(phi), jnp.sin(theta), cos_t * jnp.cos(phi)],
                     axis=-1)


# --------------------------------------------------------------------------
# Source models: unit rays (source frame) -> continuous pixel coords
# --------------------------------------------------------------------------


def equirect_uv(rays: jnp.ndarray, width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map unit rays to equirect pixel coords (continuous, pixel-center at .0).

    ``u`` wraps horizontally; the caller is responsible for modulo-W wrapping
    when gathering. Follows v360's xyz_to_equirect:
    ``u = (phi/pi + 1) * W/2 - 0.5``.
    """
    x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
    phi = jnp.arctan2(x, z)
    theta = jnp.arcsin(jnp.clip(y, -1.0, 1.0))
    u = (phi / math.pi + 1.0) * (width / 2.0) - 0.5
    v = (theta / (math.pi / 2.0) + 1.0) * (height / 2.0) - 0.5
    return u, v


def fisheye_uv(rays: jnp.ndarray, width: int, height: int, dfov_deg: float, *,
               model: str = "equidistant"
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Map unit rays to circular-fisheye pixel coords. Returns (u, v, valid)."""
    x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    half_fov = math.radians(dfov_deg) / 2.0
    if model == "equidistant":
        r = theta / half_fov
    elif model == "equisolid":
        r = jnp.sin(theta / 2.0) / math.sin(half_fov / 2.0)
    else:
        raise ValueError(f"unknown fisheye model: {model!r}")
    h = jnp.sqrt(x * x + y * y)
    safe_h = jnp.where(h > 1e-12, h, 1.0)
    nx = r * x / safe_h
    ny = r * y / safe_h
    valid = (r <= 1.0) & (theta <= half_fov)
    u = (nx + 1.0) * (width / 2.0) - 0.5
    v = (ny + 1.0) * (height / 2.0) - 0.5
    return u, v, valid


def perspective_uv(rays: jnp.ndarray, width: int, height: int,
                   hfov_deg: float, vfov_deg: float
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Map unit rays to rectilinear pixel coords. Returns (u, v, valid)."""
    x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
    valid = z > 1e-6
    safe_z = jnp.where(valid, z, 1.0)
    half_w = math.tan(math.radians(hfov_deg) / 2.0)
    half_h = math.tan(math.radians(vfov_deg) / 2.0)
    nx = (x / safe_z) / half_w
    ny = (y / safe_z) / half_h
    valid = valid & (jnp.abs(nx) <= 1.0) & (jnp.abs(ny) <= 1.0)
    u = (nx + 1.0) * (width / 2.0) - 0.5
    v = (ny + 1.0) * (height / 2.0) - 0.5
    return u, v, valid


# --------------------------------------------------------------------------
# Brown–Conrady distortion (Metashape-style), used by the calibration tool
# --------------------------------------------------------------------------


def brown_distort(xn: jnp.ndarray, yn: jnp.ndarray, k1: float, k2: float,
                  k3: float, k4: float, p1: float, p2: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply Brown–Conrady radial/tangential distortion to normalized coords.

    Metashape's model (same parameterization the reference applies at
    ``/root/reference/cli_tools/gs360_DualFisheyeDistortionCalibration.py:975-1005``):
    ``r2 = x²+y²; radial = 1 + k1 r² + k2 r⁴ + k3 r⁶ + k4 r⁸``
    plus the standard tangential terms.
    """
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    xd = xn * radial + p1 * (r2 + 2.0 * xn * xn) + 2.0 * p2 * xn * yn
    yd = yn * radial + p2 * (r2 + 2.0 * yn * yn) + 2.0 * p1 * xn * yn
    return xd, yd
