"""bench.py driver-safety: the re-roll loops must not starve JSON emission.

Round-4 regression (BENCH_r04.json: rc=124, parsed=null): bench.py's
evict-and-re-roll loops stacked up to ~3 full recompile cycles past the
driver's wall-clock budget, so the final JSON line never printed.  The fix
routes every retry through ``bench.reroll_until``, which (a) always runs the
first draw, (b) refuses to start another cycle unless the remaining budget
can fund one, and (c) returns the best payload either way — so the caller
can always emit.  These tests pin that contract without any device work.
"""
import importlib.util
import os
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    path = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_first_draw_always_runs_even_with_zero_budget(bench):
    calls = []

    def draw():
        calls.append(1)
        return 1.0, "payload"

    result, n = bench.reroll_until(
        draw, lambda p: False, lambda: None,
        max_attempts=5, budget_left_fn=lambda: 0.0, log=lambda m: None)
    assert result == "payload"
    assert n == 1  # budget gate must not suppress the mandatory first draw


def test_retries_stop_when_budget_cannot_fund_a_cycle(bench):
    budget = {"left": 1000.0}

    def draw():
        budget["left"] -= 400.0  # each cycle eats 400s
        return 400.0, budget["left"]

    evictions = []
    result, n = bench.reroll_until(
        draw, lambda p: False, lambda: evictions.append(1),
        max_attempts=10, budget_left_fn=lambda: budget["left"],
        cycle_est=400.0, log=lambda m: None)
    # 1000s budget, 400s cycles with 1.2x + 30s slack => draw 1 (600 left,
    # 510 needed -> retry), draw 2 (200 left, cannot fund) -> stop at 2,
    # never the 10 the attempt cap alone would allow
    assert n == 2
    assert len(evictions) == 1


def test_acceptable_draw_short_circuits(bench):
    draws = []

    def draw():
        draws.append(1)
        return 1.0, len(draws)

    result, n = bench.reroll_until(
        draw, lambda p: True, lambda: None,
        max_attempts=5, budget_left_fn=lambda: 1e9, log=lambda m: None)
    assert n == 1 and result == 1


def test_min_draws_exploration_respects_budget(bench):
    """Calibration mode (BENCH_MIN_DRAWS) must also be budget-bounded."""
    def draw():
        return 100.0, "x"

    result, n = bench.reroll_until(
        draw, lambda p: True, lambda: None,
        max_attempts=5, min_draws=5, budget_left_fn=lambda: 0.0,
        cycle_est=100.0, log=lambda m: None)
    assert n == 1  # wanted 5 exploration draws, budget allows only the first
    assert result == "x"


def test_best_payload_wins_across_draws(bench):
    walls = iter([5.0, 2.0, 7.0])

    def draw():
        w = next(walls)
        return w, w

    result, n = bench.reroll_until(
        draw, lambda p: False, lambda: None,
        max_attempts=3, budget_left_fn=lambda: 1e9, log=lambda m: None)
    assert n == 3
    assert result == 2.0


def test_featurize_cache_roundtrip_and_invalidation(bench, tmp_path):
    """_featurize_cached: host featurization is disk-cached keyed on the
    input files' stat + featurizer source; a changed input invalidates."""
    import shutil
    import uuid

    inp = tmp_path / "input.sdf"
    inp.write_text("v1")
    tag = f"t_{uuid.uuid4().hex[:8]}"
    cache_dir = os.path.join(
        os.path.dirname(bench.__file__), "results", "bench_feat_cache")
    calls = []

    def builder():
        calls.append(1)
        return {"payload": len(calls)}

    try:
        first = bench._featurize_cached(tag, [str(inp)], builder)
        again = bench._featurize_cached(tag, [str(inp)], builder)
        assert first == {"payload": 1}
        assert again == {"payload": 1}  # served from disk, builder not rerun
        assert len(calls) == 1

        inp.write_text("v2-different")  # size change -> new key
        fresh = bench._featurize_cached(tag, [str(inp)], builder)
        assert fresh == {"payload": 2}
        assert len(calls) == 2
    finally:
        if os.path.isdir(cache_dir):
            for f in os.listdir(cache_dir):
                if f.startswith(tag):
                    os.remove(os.path.join(cache_dir, f))
