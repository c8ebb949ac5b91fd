"""Process-wide JAX configuration for the device kernels.

The reference's per-view ffmpeg processes have no compile step; our batched
XLA/Mosaic programs do (~tens of seconds for the 8K warp). A persistent
compilation cache makes that a one-time cost per (shape, kernel) across CLI
invocations instead of per process. Importing :mod:`gs360x.kernels` applies
this automatically; set ``GS360X_NO_JAX_CACHE=1`` to opt out.
"""

from __future__ import annotations

import os
import pathlib

_configured = False


def enable_persistent_cache() -> None:
    """Point JAX's compilation cache at a per-user directory (idempotent)."""
    global _configured
    if _configured or os.environ.get("GS360X_NO_JAX_CACHE"):
        return
    _configured = True
    import jax

    cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or str(pathlib.Path.home() / ".cache" / "gs360x"
                        / "jax_cache"))
    try:
        pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these knobs — in-process cache only
