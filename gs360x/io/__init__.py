"""Host-side IO: images, video, point clouds, camera-format hub.

Everything here feeds or drains the device pipeline; nothing computes on
pixels (that's :mod:`gs360x.kernels`). External-binary dependencies are
optional: an ffmpeg-backed video reader is used when ffmpeg is on PATH,
with pure-Python Y4M / MJPEG-AVI codecs as the always-available fallback.
"""
