"""Persistent JAX compilation cache, repo-wide.

Cold Mosaic compiles on the axon remote-compile helper are the round-4
bottleneck that shaped what got measured and shipped: a bf16-dot Pallas
kernel takes ~9 min cold, the textured wavefront superstep >10 min
(which is why bench.py's envtex stage was opt-in until round 5). The
persistent cache makes those costs once-per-machine instead of
once-per-process: compiled executables are keyed on (HLO, jaxlib,
flags) and reloaded from disk on later runs.

Every entry point that may compile big graphs calls
``enable_compilation_cache()`` (bench.py, cli.py, tools/tpu_session.py);
it is idempotent and safe on any backend (CPU tests benefit too).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: <repo>/.jax_cache, gitignored). Returns the directory, or
    None if the cache could not be enabled (old jax, read-only fs) —
    callers never need to handle failure, everything still works cold."""
    global _enabled
    if _enabled:
        return _DEFAULT_DIR
    d = cache_dir or os.environ.get("VIMG_JAX_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(d, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every compile that costs >=2s wall (the default 1s floor
        # plus margin keeps the many tiny test jits off the disk)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return None
    _enabled = True
    return d
