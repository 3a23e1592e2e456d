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
    _enable_persistent_cache_on_axon()
    _DONE = True


def _enable_persistent_cache_on_axon() -> None:
    """Allow jax's persistent compilation cache on the 'axon' TPU platform.

    jax gates the persistent cache on a platform whitelist
    (compilation_cache.is_cache_used: ["tpu", "gpu", "cpu", "neuron"]); the
    axon PJRT plugin registers platform name "axon", so on the real chip the
    cache is silently DISABLED — every process recompiles everything.  This
    was the root cause of the cross-process cache miss behind the bench's
    compile lottery workaround: the cache probe
    (results/compile_lottery_cache.json) shows the per-entry cache keys are
    IDENTICAL across two processes, yet the second still cold-compiles.

    The wrapper defers to jax's own answer first and only flips the verdict
    for the axon platform when the cache is enabled and the backend supports
    executable serialization (the same conditions jax applies to tpu/gpu).
    Cache write/read failures stay non-fatal (jax warns and recompiles).
    """
    from jax._src import compilation_cache as cc

    if getattr(cc, "_axon_whitelist_patch", False):
        return
    orig_is_cache_used = cc.is_cache_used

    def is_cache_used(backend):
        used = orig_is_cache_used(backend)
        if (
            not used
            and getattr(backend, "platform", "") == "axon"
            and cc._is_cache_enabled()
            and getattr(backend, "supports_executable_serialization", True)
        ):
            with cc._cache_initialized_mutex:
                cc._cache_checked = True
                cc._cache_used = True
            used = True
        return used

    cc.is_cache_used = is_cache_used
    cc._axon_whitelist_patch = True


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
