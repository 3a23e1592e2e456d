"""runtime.setup environment wiring.

The axon persistent-cache patch is the round-3 fix for the cross-process
compile-cache miss (results/compile_lottery_cache.json: identical cache
keys, no hit — jax's is_cache_used whitelist does not include the 'axon'
platform name the TPU plugin registers).  These tests exercise the wrapper
against fake backends so the fix can't silently regress; the on-chip proof
is the cache-probe rerun (results/compile_lottery_cache_fixed.json).
"""
import types

from diffdock_pocket_tpu import runtime


def _with_cache_state(checked, used):
    """Snapshot + set jax's memoized cache verdict; returns a restore fn."""
    from jax._src import compilation_cache as cc

    prev = (cc._cache_checked, cc._cache_used)
    cc._cache_checked, cc._cache_used = checked, used

    def restore():
        cc._cache_checked, cc._cache_used = prev

    return cc, restore


def _fake_backend(platform, supports_serialization=True):
    b = types.SimpleNamespace(platform=platform)
    if supports_serialization is not None:
        b.supports_executable_serialization = supports_serialization
    return b


def test_axon_platform_is_whitelisted():
    runtime._enable_persistent_cache_on_axon()
    # memoized verdict "not used" (what a fresh axon process computes)
    cc, restore = _with_cache_state(checked=True, used=False)
    try:
        assert cc.is_cache_used(_fake_backend("axon")) is True
        # and the verdict is re-memoized as used
        assert cc._cache_used is True
    finally:
        restore()


def test_axon_without_serialization_stays_disabled():
    runtime._enable_persistent_cache_on_axon()
    cc, restore = _with_cache_state(checked=True, used=False)
    try:
        assert cc.is_cache_used(
            _fake_backend("axon", supports_serialization=False)) is False
        assert cc._cache_used is False
    finally:
        restore()


def test_other_platform_verdict_untouched():
    runtime._enable_persistent_cache_on_axon()
    cc, restore = _with_cache_state(checked=True, used=False)
    try:
        # an unknown platform that jax rejected stays rejected
        assert cc.is_cache_used(_fake_backend("weird")) is False
    finally:
        restore()


def test_patch_is_idempotent():
    from jax._src import compilation_cache as cc

    runtime._enable_persistent_cache_on_axon()
    fn1 = cc.is_cache_used
    runtime._enable_persistent_cache_on_axon()
    assert cc.is_cache_used is fn1  # not re-wrapped


# ---------------------------------------------------------------------------
# round-4: absolute step-time targets + steady-state guard
# ---------------------------------------------------------------------------
import os


def _isolate_targets(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "DDP_TPU_STEP_TARGETS", str(tmp_path / "targets.json"))


def test_step_targets_record_and_check(tmp_path, monkeypatch):
    _isolate_targets(tmp_path, monkeypatch)
    ok, best = runtime.step_time_ok("sig_a", 100.0)
    assert ok and best is None  # no record yet -> calibrating
    assert runtime.record_step_time("sig_a", 100.0) == 100.0
    ok, best = runtime.step_time_ok("sig_a", 110.0)  # within 15%
    assert ok and best == 100.0
    ok, _ = runtime.step_time_ok("sig_a", 120.0)  # 20% over
    assert not ok
    # beating the record updates it
    assert runtime.record_step_time("sig_a", 80.0) == 80.0
    ok, _ = runtime.step_time_ok("sig_a", 100.0)
    assert not ok
    # independent signatures don't interact
    ok, best = runtime.step_time_ok("sig_b", 9999.0)
    assert ok and best is None


def test_steady_state_guard_rerolls_on_slow_epoch(tmp_path, monkeypatch):
    _isolate_targets(tmp_path, monkeypatch)
    evictions = []
    monkeypatch.setattr(
        runtime, "evict_compile_caches", lambda *a, **k: evictions.append(1) or 3)
    # calibration epoch: records, no reroll
    assert runtime.steady_state_guard("t_sig", 200.0) is False
    assert not evictions
    # clean epoch within tolerance (1.5x): records-if-better, no reroll
    assert runtime.steady_state_guard("t_sig", 250.0) is False
    assert not evictions
    # FIRST pathological epoch (>1.5x best): strike only — one slow epoch
    # is usually host contention (async checkpoint saves measured 36 s/step
    # against a 168 ms best), not a compile pathology
    assert runtime.steady_state_guard("t_sig", 600.0) is False
    assert not evictions
    # a clean epoch in between resets the strikes
    assert runtime.steady_state_guard("t_sig", 210.0) is False
    assert runtime.steady_state_guard("t_sig", 600.0) is False
    assert not evictions
    # SECOND consecutive pathological epoch: evicts
    assert runtime.steady_state_guard("t_sig", 600.0) is True
    assert len(evictions) == 1
    # reroll_allowed=False (trainer only re-rolls once per run): no eviction
    assert runtime.steady_state_guard("t_sig", 600.0) is False
    assert runtime.steady_state_guard(
        "t_sig", 600.0, reroll_allowed=False) is False
    assert len(evictions) == 1
    # DDP_TPU_RECOMPILE_ON_SLOW=0 disables eviction entirely
    monkeypatch.setenv("DDP_TPU_RECOMPILE_ON_SLOW", "0")
    assert runtime.steady_state_guard("t_sig", 600.0) is False
    assert len(evictions) == 1


def test_corrupt_targets_file_is_tolerated(tmp_path, monkeypatch):
    _isolate_targets(tmp_path, monkeypatch)
    with open(os.environ["DDP_TPU_STEP_TARGETS"], "w") as fh:
        fh.write("{not json")
    ok, best = runtime.step_time_ok("x", 1.0)
    assert ok and best is None
    assert runtime.record_step_time("x", 5.0) == 5.0


def test_snapshot_and_restore_compile_cache(tmp_path, monkeypatch):
    """snapshot after a best draw + restore at the end must leave the cache
    holding exactly the snapshotted entries (the fast executable), not
    whatever the last lottery draw produced."""
    import jax

    cache = tmp_path / "cache"
    cache.mkdir()
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(cache))
    monkeypatch.setattr(
        runtime, "evict_compile_caches",
        lambda *a, **k: [p.unlink() for p in cache.iterdir() if p.is_file()])

    (cache / "fast_exec").write_bytes(b"FAST")
    n = runtime.snapshot_compile_cache(tag="t")
    assert n == 1
    # a re-roll evicts the cache and compiles a slow executable
    (cache / "fast_exec").unlink()
    (cache / "slow_exec").write_bytes(b"SLOW")
    n = runtime.restore_compile_cache(tag="t")
    assert n == 1
    assert (cache / "fast_exec").read_bytes() == b"FAST"
    assert not (cache / "slow_exec").exists()
    # restoring a missing snapshot is a no-op
    assert runtime.restore_compile_cache(tag="nope") == -1
    assert (cache / "fast_exec").exists()
    jax.config.update("jax_compilation_cache_dir", prev)
