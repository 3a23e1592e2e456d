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


# ---------------------------------------------------------------------------
# Compile-lottery mitigation: absolute step-time targets + cache eviction.
#
# XLA's TPU compile of the sampler scan is a lottery across compiles (same
# program, step times 146/172/410 ms — BASELINE.md).  The round-3 mitigation
# validated a draw only by the step/fwd RATIO, which accepts the ~172 ms
# "mediocre" draw and can pin it into the persistent cache forever (ADVICE
# r3).  These helpers give every entry point a shared, self-calibrating
# ABSOLUTE target instead: the best step time ever measured for a given
# executable signature is persisted; a draw is acceptable only within
# `tolerance` of that best, and beating the best updates the record.
# ---------------------------------------------------------------------------


def _targets_file() -> str:
    return os.environ.get(
        "DDP_TPU_STEP_TARGETS",
        os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir,
                         "results", "step_targets.json")),
    )


def _load_targets() -> dict:
    import json

    try:
        with open(_targets_file()) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def record_step_time(sig: str, ms: float) -> float:
    """Record a measured per-step time for executable signature ``sig``;
    keeps the minimum ever seen.  Returns the current best."""
    import json

    targets = _load_targets()
    best = targets.get(sig)
    if best is None or ms < best:
        targets[sig] = best = round(float(ms), 3)
        path = _targets_file()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(targets, fh, indent=1, sort_keys=True)
        os.replace(tmp, path)
    return best


def step_time_ok(sig: str, ms: float, tolerance: float = 1.15):
    """(ok, best_ms): is ``ms`` within ``tolerance`` of the best recorded
    step time for this signature?  ok=True when no record exists yet (the
    caller should then record_step_time to calibrate)."""
    best = _load_targets().get(sig)
    if best is None:
        return True, None
    return ms <= tolerance * best, best


def evict_compile_caches(newer_than: float | None = None) -> int:
    """Re-roll the XLA schedule lottery: drop persistent-cache entries
    (all of them, or only files created after ``newer_than`` — used to
    evict just the executables a failed validation compiled) and clear the
    in-memory jit caches.  Returns the number of files removed."""
    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    n = 0
    try:
        for f in os.listdir(cache_dir):
            p = os.path.join(cache_dir, f)
            if not os.path.isfile(p):
                continue
            if newer_than is not None and os.path.getmtime(p) <= newer_than:
                continue
            os.remove(p)
            n += 1
    except OSError:
        pass
    jax.clear_caches()
    return n


def snapshot_compile_cache(tag: str = "best") -> int:
    """Copy the persistent compile cache aside (``<cache_dir>_<tag>``).

    The validate-and-pin loop re-rolls the XLA schedule lottery by evicting
    the cache and recompiling — which also destroys the fast executable a
    previous draw produced (round-4: exploration left the cache holding the
    LAST draw, so every later cold process was served a mediocre ~170 ms
    schedule instead of the measured-fast 147 ms one).  Snapshotting after
    a best-so-far draw and restoring at the end makes the cache
    deterministically serve the fastest validated executable.  Returns the
    number of files snapshotted."""
    import shutil

    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    snap = f"{cache_dir.rstrip(os.sep)}_{tag}"
    shutil.rmtree(snap, ignore_errors=True)
    os.makedirs(snap, exist_ok=True)
    n = 0
    try:
        for f in os.listdir(cache_dir):
            p = os.path.join(cache_dir, f)
            if os.path.isfile(p):
                shutil.copy2(p, os.path.join(snap, f))
                n += 1
    except OSError:
        pass
    return n


def restore_compile_cache(tag: str = "best") -> int:
    """Replace the persistent compile cache with a snapshot taken by
    snapshot_compile_cache (no-op when the snapshot does not exist).
    Returns the number of files restored, or -1 when no snapshot exists."""
    import shutil

    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    snap = f"{cache_dir.rstrip(os.sep)}_{tag}"
    if not os.path.isdir(snap):
        return -1
    evict_compile_caches()
    n = 0
    for f in os.listdir(snap):
        p = os.path.join(snap, f)
        if os.path.isfile(p):
            shutil.copy2(p, os.path.join(cache_dir, f))
            n += 1
    return n


_GUARD_STRIKES: dict = {}


def steady_state_guard(sig: str, step_ms: float, tolerance: float = 1.5,
                       reroll_allowed: bool = True,
                       strikes_required: int = 2) -> bool:
    """Per-epoch steady-state throughput check (training runs have no
    retry path of their own — BASELINE.md compile lottery).  Compares the
    measured per-step time against the best recorded for ``sig``; a clean
    epoch updates the record, a pathological one logs a visible warning
    and — after ``strikes_required`` CONSECUTIVE pathological epochs (one
    slow epoch is usually host contention: async checkpoint saves were
    measured inflating an epoch to 36 s/step vs a 168 ms best, and a
    single-strike guard then evicted the whole compile cache for nothing)
    — evicts the compile caches (if ``reroll_allowed`` and
    DDP_TPU_RECOMPILE_ON_SLOW != 0) so the caller's next jit re-rolls the
    lottery.  Returns True iff an eviction was performed."""
    import logging

    log = logging.getLogger(__name__)
    ok, target = step_time_ok(sig, step_ms, tolerance=tolerance)
    if ok:
        record_step_time(sig, step_ms)
        _GUARD_STRIKES[sig] = 0
        return False
    strikes = _GUARD_STRIKES.get(sig, 0) + 1
    _GUARD_STRIKES[sig] = strikes
    log.warning(
        "steady-state guard: %.0f ms/step vs best recorded %.0f ms (%s) — "
        "pathological epoch (strike %d/%d)", step_ms, target, sig,
        strikes, strikes_required)
    if strikes < strikes_required:
        return False
    if reroll_allowed and os.environ.get(
            "DDP_TPU_RECOMPILE_ON_SLOW", "1") != "0":
        n = evict_compile_caches()
        log.warning(
            "steady-state guard: evicted %d cache entries; the next jit "
            "recompiles", n)
        _GUARD_STRIKES[sig] = 0
        return True
    return False


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
