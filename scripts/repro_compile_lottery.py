"""Root-cause harness for the XLA TPU compile lottery (judge r2 ask #2).

Symptom (BASELINE.md): the jitted 20-step sampler scan compiles to a fast
(~150 ms/step) or a pathologically scheduled slow (~410 ms/step) executable
NONDETERMINISTICALLY for the same program, and the persistent compilation
cache does not reliably pin the fast one.  bench.py currently works around
it by detecting the slow variant and re-exec'ing.

This script isolates it:

  mode=trial   (subprocess) build the bench-shaped sampler program with a
               chosen cache dir + XLA_FLAGS, compile, time per-step, emit
               one JSON line on stdout.
  mode=cache   two sequential trial subprocesses SHARING a fresh cache dir,
               with jax compilation-cache DEBUG logging on the second →
               shows whether the persistent cache hits and, if not, the
               logged miss reason.
  mode=sweep   (default) N fresh-cache trials per XLA-flag config →
               results/compile_lottery.json with the step-time distribution
               per config.  A config whose N trials are all fast is the
               deterministic fix.

Run on an IDLE chip (single-client rule):
    python scripts/repro_compile_lottery.py            # sweep
    TRIALS=3 CONFIGS=baseline,no_lhs python scripts/repro_compile_lottery.py
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Flag configs to sweep.  The latency-hiding scheduler is the prime suspect:
# it schedules async copies/collectives under a compile-time budget and is
# known to produce different schedules run to run when the search is cut off.
FLAG_CONFIGS = {
    "baseline": "",
    "no_lhs": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "lhs_rerun": "--xla_latency_hiding_scheduler_rerun=3",
    "vmem_128": "--xla_tpu_scoped_vmem_limit_kib=131072",
}


def trial(cache_dir: str, label: str):
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    from diffdock_pocket_tpu import runtime

    runtime.setup(cache_dir=cache_dir)

    import jax

    from diffdock_pocket_tpu import graph as graphlib, pipeline, sampling
    from diffdock_pocket_tpu.data import featurize
    from diffdock_pocket_tpu.models.config import BIG_SCORE_CONFIG

    example = os.path.join(REPO, "example_data")
    data = featurize.build_complex(
        os.path.join(example, "3dpf_ligand.sdf"),
        os.path.join(example, "3dpf_protein.pdb"),
        featurize.DataConfig(),
        name="3dpf",
    )
    g1 = graphlib.from_raw(data.raw)
    batch = int(os.environ.get("BENCH_BATCH", "20"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    cfg = BIG_SCORE_CONFIG
    g_ex = graphlib.replicate(g1, batch)
    variables = pipeline.init_random_variables(cfg, g_ex)
    pipe = pipeline.DockingPipeline(
        model_cfg=cfg,
        variables=variables,
        sampler_cfg=sampling.SamplerConfig(inference_steps=steps,
                                           flexible_sidechains=True),
        samples_per_complex=batch,
        batch_size=batch,
    )
    t0 = time.time()
    pipe.dock(data, jax.random.PRNGKey(0))
    compile_s = time.time() - t0
    t0 = time.time()
    pipe.dock(data, jax.random.PRNGKey(1))
    wall = time.time() - t0
    step_ms = wall / steps * 1e3
    # platform_version is hashed verbatim into the persistent cache key
    # (jax cache_key.py::_hash_platform); record it so a per-process
    # varying substring (e.g. the plugin's session id) is directly visible
    # when two trial processes' keys disagree.
    backend = jax.devices()[0].client
    print(json.dumps({
        "label": label,
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "compile_s": round(compile_s, 1),
        "wall_s": round(wall, 2),
        "step_ms": round(step_ms, 1),
        "poses_per_s": round(batch / wall, 2),
        "platform_version": getattr(backend, "platform_version", ""),
    }))


def run_trial_subprocess(cache_dir: str, label: str, xla_flags: str,
                         extra_env=None, timeout=1800):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + xla_flags).strip()
    env["LOTTERY_MODE"] = "trial"
    env["LOTTERY_CACHE"] = cache_dir
    env["LOTTERY_LABEL"] = label
    env.update(extra_env or {})
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    out = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    if out is None:
        out = {"label": label, "error": (p.stderr or "")[-2000:]}
    out["stderr_tail"] = (p.stderr or "")[-500:]
    out["stderr_full"] = p.stderr or ""
    return out


def mode_cache():
    """Does the persistent cache hit for this program across processes?"""
    with tempfile.TemporaryDirectory(prefix="lottery_cache_") as cache:
        # jax._src.cache_key DEBUG logs the per-entry hash (computation,
        # backend version, accelerator_config, ...) — if the key differs
        # across processes this pinpoints WHICH entry varies (suspect:
        # platform_version embedding a per-process axon session id)
        dbg = ("jax._src.compilation_cache,jax._src.compiler,"
               "jax._src.cache_key")
        first = run_trial_subprocess(
            cache, "cache_populate", "",
            extra_env={"JAX_DEBUG_LOG_MODULES": dbg})
        print("first:", json.dumps({k: first.get(k) for k in
                                    ("compile_s", "step_ms")}))
        second = run_trial_subprocess(
            cache, "cache_reuse", "",
            extra_env={"JAX_DEBUG_LOG_MODULES": dbg},
        )
        print("second:", json.dumps({k: second.get(k) for k in
                                     ("compile_s", "step_ms")}))
        hit = second.get("compile_s", 1e9) < max(
            30.0, 0.25 * first.get("compile_s", 1e9))
        print(f"persistent cache hit: {hit}")
        # per-entry cache-key hashes from both processes: any entry whose
        # hash differs across the two runs explains a structural miss
        def key_lines(r):
            return [ln for ln in (r.get("stderr_full") or "").splitlines()
                    if "get_cache_key hash" in ln]

        import re

        def parse_entries(lines):
            ents = {}
            for ln in lines:
                m = re.search(r"hash of serialized (\w[\w ]*): ([0-9a-f]+)", ln)
                if m:
                    ents.setdefault(m.group(1), set()).add(m.group(2))
            return ents
        pf, ps = parse_entries(key_lines(first)), parse_entries(key_lines(second))
        entry_diff = {k: ("SAME" if pf.get(k) == ps.get(k) else "DIFFERS")
                      for k in sorted(set(pf) | set(ps))}
        for k, v in entry_diff.items():
            print(f"key entry {k}: {v}")
        out = {"first": first, "second": second, "cache_hit": hit,
               "entry_diff": entry_diff,
               "first_key_entries": key_lines(first),
               "second_key_entries": key_lines(second)}
        for r in (first, second):
            r.pop("stderr_full", None)
        path = os.path.join(REPO, "results", "compile_lottery_cache.json")
        json.dump(out, open(path, "w"), indent=2)
        print("wrote", path)


def mode_sweep():
    trials = int(os.environ.get("TRIALS", "4"))
    names = os.environ.get("CONFIGS", ",".join(FLAG_CONFIGS)).split(",")
    results = []
    for name in names:
        flags = FLAG_CONFIGS[name]
        for i in range(trials):
            # fresh cache dir per trial: every compile is cold
            with tempfile.TemporaryDirectory(prefix="lottery_") as cache:
                r = run_trial_subprocess(cache, f"{name}#{i}", flags)
            r["config"] = name
            r.pop("stderr_full", None)
            results.append(r)
            print(json.dumps({k: r.get(k) for k in
                              ("label", "compile_s", "step_ms", "error")}))
            path = os.path.join(REPO, "results", "compile_lottery.json")
            json.dump(results, open(path, "w"), indent=2)
    # summarize
    for name in names:
        ms = [r["step_ms"] for r in results
              if r.get("config") == name and "step_ms" in r]
        if ms:
            print(f"{name}: step_ms min={min(ms)} max={max(ms)} "
                  f"spread={max(ms)/min(ms):.2f}x over {len(ms)} trials")


if __name__ == "__main__":
    mode = os.environ.get("LOTTERY_MODE",
                          sys.argv[1] if len(sys.argv) > 1 else "sweep")
    if mode == "trial":
        trial(os.environ["LOTTERY_CACHE"], os.environ.get("LOTTERY_LABEL", ""))
    elif mode == "cache":
        mode_cache()
    else:
        mode_sweep()
