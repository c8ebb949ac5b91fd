"""RenderPlan executor: the device-centric replacement for the reference's
ffmpeg process fan-out.

Where the reference runs one ffmpeg per (frame × view) — re-decoding the
whole video per view (SURVEY §3.1) — this executor decodes each frame once,
moves it to the device once, and warps **all** views in one batched jitted
program, streaming encodes through the async writer pool. Progress,
cancellation, and resume semantics mirror the reference:

* progress printed in ≥5%% steps (``gs360_360PerspCut.py:67-75``),
* cooperative stop via an Event (SIGINT handler escalation,
  ``gs360_360PerspCut.py:535-561``),
* manifest resume = skip outputs that already exist, like Video2Frames'
  overwrite guard (``gs360_Video2Frames.py:442-455``).
"""

from __future__ import annotations

import functools
import pathlib
import queue as queuelib
import sys
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gs360x.io import image as imagelib
from gs360x.io import video as videolib
from gs360x.kernels import warp as warplib
from gs360x.rig.spec import RenderPlan
from gs360x.runtime.profiling import StageTimers, maybe_trace

PROGRESS_INTERVAL = 5


@dataclass
class ExecutionReport:
    ok: int = 0
    failed: int = 0
    skipped: int = 0
    total: int = 0
    seconds: float = 0.0
    errors: List[str] = field(default_factory=list)
    stage_seconds: Dict[str, float] = field(default_factory=dict)

    @property
    def stopped(self) -> bool:
        return self.ok + self.failed + self.skipped < self.total


class ProgressPrinter:
    """Throttled single-line progress, same cadence as the reference."""

    def __init__(self, label: str = "Progress", stream=None):
        self.label = label
        self._stream = stream  # None -> current sys.stdout at write time
        self._last = -1

    @property
    def stream(self):
        return self._stream if self._stream is not None else sys.stdout

    def update(self, completed: int, total: int) -> None:
        if total <= 0:
            return
        pct = int(completed * 100 / total)
        if self._last < 0 or pct >= 100 or (pct - self._last) >= PROGRESS_INTERVAL:
            self.stream.write(f"{self.label}... {pct:3d}% ({completed}/{total})\r")
            self.stream.flush()
            self._last = pct

    def finish(self) -> None:
        if self._last >= 0:
            self.stream.write("\n")
            self.stream.flush()


class _Prefetcher:
    """Background decode thread: overlaps host decode/IO of item N+1 with
    device work on item N (the reference gets this overlap for free from
    its per-frame ffmpeg processes; here decode and warp share one
    process, so the overlap is explicit)."""

    _DONE = object()

    def __init__(self, iterator, stop_event, depth: int = 2):
        self._q: "queuelib.Queue" = queuelib.Queue(maxsize=depth)
        self._stop = stop_event
        self._thread = threading.Thread(
            target=self._pump, args=(iterator,), daemon=True)
        self._thread.start()

    def _pump(self, iterator):
        try:
            for item in iterator:
                while True:
                    if self._stop.is_set():
                        return
                    try:
                        self._q.put(item, timeout=0.25)
                        break
                    except queuelib.Full:
                        continue
            self._q.put(self._DONE)
        except Exception as exc:  # surfaced on the consumer side
            self._q.put(exc)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                return
            if isinstance(item, Exception):
                raise item
            yield item


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def _quantize_device(arr, bit_depth: int):
    """Round float [0,1] to uint8/uint16 on device: device→host output
    transfers shrink 4x (2x for 16-bit) — the pipeline's dominant
    transfer is the warped views, ~15x the source pixel count."""
    scale = 65535.0 if bit_depth > 8 else 255.0
    dt = jnp.uint16 if bit_depth > 8 else jnp.uint8
    return jnp.rint(jnp.clip(arr, 0.0, 1.0) * scale).astype(dt)


def _warp_frame_views(frame: np.ndarray, views, *, interp: str,
                      backend: str, keep_rec709: Optional[bool] = None,
                      quantize_bits: Optional[int] = None):
    """Warp one decoded frame through all plan views.

    Returns [(parent, view_idx, planar_bool), ...] in view order, where
    ``parent`` is the group's BATCHED device result shared across its
    views — consumers fetch each parent once (one tunnel RPC) and slice
    on host via :class:`_ViewFetcher`; fetching ``parent[j]`` per view
    would pay one RPC plus one device slice program per view (measured
    ~2.5 s/view over the axon tunnel). The pallas fast path consumes the
    frame as (H, W*3) rows (free host reshape) and returns planar
    (3, h, w) outputs; the channel interleave happens in the encode
    threads. Ineligible views (fisheye projections, extreme geometry)
    fall back to the XLA HWC path. When ``keep_rec709`` is not None the
    video color move runs on device — on the warped planar outputs
    (pointwise, so it commutes with resampling within interpolation
    tolerance, and touches ~15x fewer pixels than the source).
    """
    from gs360x.core import color as colorlib
    from gs360x.kernels import warp_pallas

    results: List = [None] * len(views)
    h, w = frame.shape[:2]
    rows = None
    src_f32 = None

    groups: Dict[tuple, List[int]] = {}
    for i, view in enumerate(views):
        key = (view.projection, view.width, view.height,
               round(view.hfov_deg, 6), round(view.vfov_deg, 6))
        groups.setdefault(key, []).append(i)

    def color(arr, planar):
        if keep_rec709 is not None:
            arr = (colorlib.video_color_move_planar(
                arr, keep_rec709=keep_rec709) if planar
                else colorlib.video_color_move(arr,
                                                keep_rec709=keep_rec709))
        if quantize_bits is not None:
            arr = _quantize_device(arr, quantize_bits)
        return arr

    for (projection, vw, vh, hfov, vfov), idxs in groups.items():
        yaws = np.array([views[i].yaw_deg for i in idxs], np.float64)
        pitches = np.array([views[i].pitch_deg for i in idxs], np.float64)
        rolls = np.array([views[i].roll_deg for i in idxs], np.float64)
        done = False
        if backend in ("auto", "pallas") \
                and warplib.default_device_platform() == "tpu":
            try:
                if rows is None:
                    # transfer in the source dtype (uint8 = 4x less tunnel
                    # traffic); normalization happens on device in the pad
                    rows = jnp.asarray(np.ascontiguousarray(frame)
                                       .reshape(h, w * 3))
                out = warp_pallas.warp_equirect_to_views_pallas(
                    rows, yaws, pitches, rolls, width=vw, height=vh,
                    hfov_deg=hfov, vfov_deg=vfov, projection=projection,
                    interp=interp if interp in ("bicubic", "bilinear")
                    else "bilinear", planar=True)
                out = color(out, True)
                for j, i in enumerate(idxs):
                    results[i] = (out, j, True)
                done = True
            except warp_pallas.PallasFallback:
                pass
        if not done:
            if src_f32 is None:
                src_f32 = jnp.asarray(imagelib.to_float01(frame)) \
                    if frame.dtype != np.float32 else jnp.asarray(frame)
            src = src_f32
            out = warplib._warp_equirect_to_views_xla(
                src, jnp.asarray(yaws, jnp.float32),
                jnp.asarray(pitches, jnp.float32),
                jnp.asarray(rolls, jnp.float32), width=vw, height=vh,
                hfov_deg=hfov, vfov_deg=vfov, projection=projection,
                interp=interp)
            out = color(out, False)
            for j, i in enumerate(idxs):
                results[i] = (out, j, False)
    return results


class _ViewFetcher:
    """Lazy bulk fetch for per-view warp outputs.

    Outputs arrive as ``(parent, view_idx, planar)`` triples whose
    parents are shared across a frame's views. Each distinct parent is
    ``jax.device_get`` exactly once, on first use — one tunnel RPC per
    (group, frame) instead of one per view, while overwrite-skipped
    entries stay free. ``view_idx is None`` means the entry is already
    a per-view array (the sharded batch path pre-fetches in bulk)."""

    def __init__(self, timers):
        self._timers = timers
        self._cache: Dict[int, np.ndarray] = {}

    def __call__(self, parent, view_idx):
        buf = self._cache.get(id(parent))
        if buf is None:
            with self._timers.stage("fetch"):
                buf = np.asarray(jax.device_get(parent))
            self._cache[id(parent)] = buf
        return buf if view_idx is None else buf[view_idx]


def run_plan(plan: RenderPlan, *,
             backend: str = "xla",
             overwrite: bool = True,
             writer_workers: int = 8,
             stop_event: Optional[threading.Event] = None,
             progress: Optional[Callable[[int, int], None]] = None,
             quiet: bool = False,
             stats: bool = False) -> ExecutionReport:
    """Execute a RenderPlan (image-dir or video mode) on the default device."""
    t0 = time.time()
    stop_event = stop_event or threading.Event()
    report = ExecutionReport(total=plan.total if not plan.video_mode else 0)
    out_dir = plan.out_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    printer = None if quiet else ProgressPrinter()

    def tick(done: int, total: int) -> None:
        if progress:
            progress(done, total)
        if printer:
            printer.update(done, total)

    jpeg_quality = 95 if plan.jpeg_quality_95 else None
    interp = plan.interpolation

    timers = StageTimers()
    with maybe_trace("run_plan"), \
            imagelib.AsyncImageWriter(workers=writer_workers) as writer:
        if plan.video_mode:
            _run_video(plan, writer, report, stop_event, tick, backend,
                       interp, jpeg_quality, overwrite, timers)
        else:
            _run_images(plan, writer, report, stop_event, tick, backend,
                        interp, jpeg_quality, overwrite, timers)
    if printer:
        printer.finish()
    report.seconds = time.time() - t0
    report.stage_seconds = dict(timers.totals)
    if stats and not quiet:
        print(f"[STATS] {timers.report()} | wall {report.seconds:.2f}s")
    return report


def _run_images(plan, writer, report, stop_event, tick, backend, interp,
                jpeg_quality, overwrite, timers) -> None:
    by_source: Dict[pathlib.Path, List] = {}
    for job in plan.jobs:
        by_source.setdefault(job.source, []).append(job)

    done = 0
    work = []  # (source, jobs-to-run) after the overwrite guard
    for source, jobs in by_source.items():
        todo = []
        for job in jobs:
            out_path = plan.out_dir / job.output_name
            if not overwrite and out_path.exists():
                report.skipped += 1
                done += 1
            else:
                todo.append(job)
        if todo:
            work.append((source, todo))
    tick(done, report.total)

    def decode(items):
        for source, jobs in items:
            try:
                with timers.stage("decode"):
                    img = imagelib.read_image(source)
            except Exception as exc:
                yield source, jobs, None, exc
                continue
            yield source, jobs, img, None

    inflight = None  # (jobs, outs) warped on device, not yet fetched

    def drain(entry):
        nonlocal done
        jobs, outs = entry
        fetch = _ViewFetcher(timers)
        for job, (out, j, planar) in zip(jobs, outs):
            arr = fetch(out, j)
            img = arr if arr.dtype != np.float32 else \
                imagelib.from_float01(arr, 16 if plan.bit_depth > 8 else 8)
            writer.submit(plan.out_dir / job.output_name, img,
                          jpeg_quality=jpeg_quality, planar=planar)
            report.ok += 1
            done += 1
            tick(done, report.total)

    # software pipeline: decode N+1 (thread) || warp N+1 (device queue)
    # || fetch+encode N (here + writer pool)
    for source, jobs, src, exc in _Prefetcher(decode(work), stop_event):
        if stop_event.is_set():
            return
        if exc is not None:
            report.failed += len(jobs)
            report.errors.append(f"{source.name}: {exc}")
            done += len(jobs)
            tick(done, report.total)
            continue
        with timers.stage("warp_dispatch"):
            outs = _warp_frame_views(
                src, [j.view for j in jobs], interp=interp, backend=backend,
                quantize_bits=16 if plan.bit_depth > 8 else 8)
        if inflight is not None:
            drain(inflight)
        inflight = (jobs, outs)
    if inflight is not None and not stop_event.is_set():
        drain(inflight)


def _warp_frames_batch(frames, views, *, interp, keep_rec709,
                       quantize_bits, mesh, backend="auto"):
    """Batched multi-device warp: ``frames`` is a list of (H, W, 3) uint8
    arrays (one per device slot). Returns per-frame result lists shaped
    like :func:`_warp_frame_views`. Prefers the per-device PALLAS fast
    path (each chip runs the Mosaic kernel on its frame shard, planar
    outputs); views outside the kernel budgets fall back per-group to the
    sharded XLA lowering (HWC outputs)."""
    from gs360x.kernels import warp_pallas
    from gs360x.runtime import mesh as meshlib

    batch = None      # (B, H, W, 3) HWC for the XLA path, built lazily
    rows = None       # (B, H, W*3) flattened rows for the pallas path
    results = [[None] * len(views) for _ in frames]
    groups: Dict[tuple, List[int]] = {}
    for i, view in enumerate(views):
        key = (view.projection, view.width, view.height,
               round(view.hfov_deg, 6), round(view.vfov_deg, 6))
        groups.setdefault(key, []).append(i)
    for (projection, vw, vh, hfov, vfov), idxs in groups.items():
        yaws = np.array([views[i].yaw_deg for i in idxs], np.float64)
        pitches = np.array([views[i].pitch_deg for i in idxs], np.float64)
        rolls = np.array([views[i].roll_deg for i in idxs], np.float64)
        done = False
        if backend in ("auto", "pallas") \
                and warplib.default_device_platform() == "tpu" \
                and projection == "perspective":
            try:
                if rows is None:
                    h, w = frames[0].shape[:2]
                    rows = jnp.asarray(np.stack(
                        [np.ascontiguousarray(f).reshape(h, w * 3)
                         for f in frames]))
                out = meshlib.warp_frames_sharded_pallas(
                    mesh, rows, yaws, pitches, rolls, width=vw, height=vh,
                    hfov_deg=hfov, vfov_deg=vfov,
                    interp=interp if interp in ("bicubic", "bilinear")
                    else "bilinear",
                    keep_rec709=keep_rec709, quantize_bits=quantize_bits)
                # ONE host fetch per (group, batch): per-(f, j) device
                # slices each bake a distinct sliced-SPMD program (~4s
                # compile apiece on a CPU mesh) and pay one tunnel RPC
                # per view on TPU — a single bulk transfer wins on both
                out_np = np.asarray(out)
                for f in range(len(frames)):
                    for j, i in enumerate(idxs):
                        results[f][i] = (out_np[f, j], None, True)
                done = True
            except warp_pallas.PallasFallback:
                pass
        if not done:
            if batch is None:
                batch = jnp.asarray(np.stack(frames))
            out = meshlib.warp_frames_sharded(
                mesh, batch, np.asarray(yaws, np.float32),
                np.asarray(pitches, np.float32),
                np.asarray(rolls, np.float32), width=vw, height=vh,
                hfov_deg=hfov, vfov_deg=vfov, interp=interp,
                projection=projection, keep_rec709=keep_rec709,
                quantize_bits=quantize_bits)
            out_np = np.asarray(out)
            for f in range(len(frames)):
                for j, i in enumerate(idxs):
                    results[f][i] = (out_np[f, j], None, False)
    return results


def _run_video_sharded(plan, writer, report, stop_event, tick, interp,
                       jpeg_quality, overwrite, timers, n_batch,
                       backend="auto") -> None:
    """Batched video path: frames batch ``n_batch`` at a time, shard over
    the data mesh, and run as ONE device program per batch (all frames x
    views in a single launch — per-launch latency amortizes even on one
    chip; image-dir mode stays per-source — its overwrite guard makes
    view sets ragged)."""
    from gs360x.runtime.mesh import data_mesh

    # TPU: shard over every chip. CPU (tests, dev boxes): a 1-device mesh
    # — XLA's CPU SPMD pays pathological compile times on multi-device
    # host meshes (~40-400s for this tiny program), and the virtual-mesh
    # sharding logic is covered by runtime/mesh tests + the driver dryrun.
    # NOTE: devices must come from the pinned platform — under a TPU
    # plugin with jax_default_device=cpu (the test env), jax.devices()
    # still leads with the TPU and a "CPU" run would land on the chip.
    plat = warplib.default_device_platform()
    if plat == "tpu":
        devs = jax.devices()
    else:
        devs = jax.devices(plat)[:1]
    mesh = data_mesh(devs)
    source = plan.jobs[0].source
    views = plan.unique_views()
    name_patterns = [plan.jobs[i].output_name for i in range(len(views))]
    qbits = 16 if plan.bit_depth > 8 else 8
    frame_iter = videolib.iter_frames(source, fps=plan.fps,
                                      start=plan.start_time,
                                      end=plan.end_time)
    n_dev = len(devs)
    done = 0
    total_est = report.total
    pending = None  # (idxs, results) on device, not yet fetched

    def drain(entry):
        nonlocal done
        idxs, results = entry
        fetch = _ViewFetcher(timers)
        for idx, outs in zip(idxs, results):
            if idx is None:
                continue  # tail padding
            for pattern, (out, j, planar) in zip(name_patterns, outs):
                name = pattern.replace("%07d", f"{idx:07d}")
                out_path = plan.out_dir / name
                if not overwrite and out_path.exists():
                    report.skipped += 1
                else:
                    arr = fetch(out, j)
                    img = arr if arr.dtype != np.float32 else \
                        imagelib.from_float01(arr, qbits)
                    writer.submit(out_path, img, jpeg_quality=jpeg_quality,
                                  planar=planar)
                    report.ok += 1
                done += 1
                if total_est:
                    tick(done, total_est)

    batch_idx: List = []
    batch_rgb: List = []

    def flush():
        nonlocal pending, batch_idx, batch_rgb
        if not batch_rgb:
            return
        idxs = list(batch_idx)
        rgbs = list(batch_rgb)
        while len(rgbs) < n_batch:   # pad the tail batch
            idxs.append(None)
            rgbs.append(rgbs[-1])
        with timers.stage("warp_dispatch"):
            results = _warp_frames_batch(
                rgbs, views, interp=interp,
                keep_rec709=plan.keep_rec709 if plan.video_mode else None,
                quantize_bits=qbits, mesh=mesh, backend=backend)
        if pending is not None:
            drain(pending)
        pending = (idxs, results)
        batch_idx, batch_rgb = [], []

    for idx, _t, rgb in _Prefetcher(
            timers.wrap_iter("decode", frame_iter), stop_event,
            depth=n_batch + 1):
        if stop_event.is_set():
            return
        if plan.selected_frames is not None \
                and idx not in plan.selected_frames:
            continue  # CSV frame selection
        batch_idx.append(idx)
        batch_rgb.append(np.ascontiguousarray(rgb))
        if len(batch_rgb) == n_batch:
            flush()
    flush()
    if pending is not None and not stop_event.is_set():
        drain(pending)
    report.total = done


def _run_video(plan, writer, report, stop_event, tick, backend, interp,
               jpeg_quality, overwrite, timers) -> None:
    source = plan.jobs[0].source
    views = plan.unique_views()
    name_patterns = [plan.jobs[i].output_name for i in range(len(views))]
    info = videolib.probe_video(source)
    est_frames = None
    if info.n_frames and info.fps and plan.fps:
        span = info.n_frames / info.fps
        if plan.start_time or plan.end_time:
            t0 = plan.start_time or 0.0
            t1 = min(plan.end_time, span) if plan.end_time else span
            span = max(0.0, t1 - t0)
        est_frames = int(span * plan.fps) + 1
    total_est = (est_frames or 0) * len(views)
    report.total = total_est

    plat = warplib.default_device_platform()
    n_dev = len(jax.devices()) if plat == "tpu" else 1
    if backend in ("auto", "xla", "pallas"):
        # batched path: frames group into one device program per batch
        # (sharded across chips when there are several; >=4 frames per
        # launch on TPU to amortize launch latency — launch cost is
        # negligible on CPU and bigger batches just slow compiles)
        per_launch = 4 if plat == "tpu" else 1
        n_batch = n_dev * max(1, -(-per_launch // n_dev))
        _run_video_sharded(plan, writer, report, stop_event, tick, interp,
                           jpeg_quality, overwrite, timers, n_batch,
                           backend=backend)
        return

    frame_iter = videolib.iter_frames(source, fps=plan.fps, start=plan.start_time,
                                      end=plan.end_time)
    done = 0
    pending = None  # (idx, outs) warped on device, not yet fetched

    def drain(entry):
        nonlocal done
        idx, outs = entry
        fetch = _ViewFetcher(timers)
        for pattern, (out, j, planar) in zip(name_patterns, outs):
            name = pattern.replace("%07d", f"{idx:07d}")
            out_path = plan.out_dir / name
            if not overwrite and out_path.exists():
                report.skipped += 1
            else:
                arr = fetch(out, j)
                img = arr if arr.dtype != np.float32 else \
                    imagelib.from_float01(arr, 16 if plan.bit_depth > 8 else 8)
                writer.submit(out_path, img, jpeg_quality=jpeg_quality,
                              planar=planar)
                report.ok += 1
            done += 1
            if total_est:
                tick(done, total_est)

    # software pipeline: decode N+1 (thread) || warp N+1 (device queue)
    # || fetch+encode N (here + writer pool)
    for idx, _t, rgb in _Prefetcher(
            timers.wrap_iter("decode", frame_iter), stop_event):
        if stop_event.is_set():
            return
        if plan.selected_frames is not None \
                and idx not in plan.selected_frames:
            continue  # CSV frame selection: original numbering preserved
        # video color chain (Rec709 -> SMPTE170M [+ sRGB trc]) fused into
        # the warp call (applied on the warped planar outputs)
        with timers.stage("warp_dispatch"):
            outs = _warp_frame_views(rgb, views, interp=interp,
                                     backend=backend,
                                     keep_rec709=plan.keep_rec709,
                                     quantize_bits=16 if plan.bit_depth > 8
                                     else 8)
        if pending is not None:
            drain(pending)
        pending = (idx, outs)
    if pending is not None and not stop_event.is_set():
        drain(pending)
    report.total = done
