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
