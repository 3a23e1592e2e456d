"""Runtime/JAX environment setup shared by all entry points.

Centralizes the persistent compilation cache (first TPU compiles take
20-40s; cached reruns are instant) and small config knobs.  Call
``setup()`` once at process start; it is idempotent.
"""
from __future__ import annotations

import os

_DONE = False


def setup(platform: str | None = None, cache_dir: str | None = None) -> None:
    global _DONE
    platform = platform or os.environ.get("DDP_TPU_PLATFORM")
    if platform is not None:
        os.environ["JAX_PLATFORMS"] = platform
    if _DONE:
        return
    import jax

    if platform is not None:
        # This environment's TPU plugin registers itself at interpreter
        # start and force-sets jax_platforms via jax.config, which takes
        # precedence over the JAX_PLATFORMS env var — so an explicit
        # platform request (arg or DDP_TPU_PLATFORM) must also go through
        # jax.config to take effect.  Works as long as no backend has been
        # initialized yet, which holds at entry-point start.
        jax.config.update("jax_platforms", platform)

    if cache_dir is None:
        cache_dir = os.environ.get(
            "DDP_TPU_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _DONE = True


def profile(trace_dir: str | None = None):
    """First-class tracing/profiling hook (the reference has none —
    SURVEY.md §5): context manager wrapping jax.profiler.trace.  Enable
    globally with DDP_TPU_PROFILE=<dir> or use as
    ``with runtime.profile("/tmp/trace"): ...``; view with xprof/tensorboard.
    """
    import contextlib

    trace_dir = trace_dir or os.environ.get("DDP_TPU_PROFILE")
    if not trace_dir:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.trace(trace_dir)
