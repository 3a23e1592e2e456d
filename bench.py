"""Benchmark: poses/sec on the canonical 3dpf x 40-sample x 20-step config
with the big all-atom score model (ns=60, nv=10, 6 conv layers, sh_lmax=1 —
reference README.md:72 training config; reference README.md:28 inference
config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the estimated reference throughput on A100
(see BASELINE.md: ~2.7 poses/s for the 40-sample/20-step config).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_POSES_PER_SEC = 2.7  # estimated reference-on-A100 (BASELINE.md)


def main():
    from diffdock_pocket_tpu import runtime

    runtime.setup()

    import jax

    from diffdock_pocket_tpu import graph as graphlib
    from diffdock_pocket_tpu import pipeline, sampling
    from diffdock_pocket_tpu.data import featurize
    from diffdock_pocket_tpu.models.config import BIG_SCORE_CONFIG

    example = os.path.join(os.path.dirname(os.path.abspath(__file__)), "example_data")
    protein = os.path.join(example, "3dpf_protein.pdb")
    ligand = os.path.join(example, "3dpf_ligand.sdf")

    samples = int(os.environ.get("BENCH_SAMPLES", "40"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))

    data = featurize.build_complex(ligand, protein, featurize.DataConfig(), name="3dpf")
    g1 = graphlib.from_raw(data.raw)
    print(
        f"bench: buckets lig={g1.n_lig} rec={g1.n_rec} atom={g1.n_atom} "
        f"tor={g1.n_tor} sc={g1.n_sc}; batch={batch} samples={samples} steps={steps}",
        file=sys.stderr,
    )

    cfg = BIG_SCORE_CONFIG
    g_ex = graphlib.replicate(g1, batch)
    t0 = time.time()
    variables = pipeline.init_random_variables(cfg, g_ex)
    jax.block_until_ready(variables)
    print(f"bench: init {time.time() - t0:.1f}s", file=sys.stderr)

    pipe = pipeline.DockingPipeline(
        model_cfg=cfg,
        variables=variables,
        sampler_cfg=sampling.SamplerConfig(
            inference_steps=steps, flexible_sidechains=True,
            temp_sampling=(1.17, 2.06, 7.04, 1.0),
            temp_psi=(1.26, 0.90, 0.96, 0.0),
        ),
        samples_per_complex=batch,  # warmup: one chunk
        batch_size=batch,
    )

    t0 = time.time()
    pipe.dock(data, jax.random.PRNGKey(0))
    print(f"bench: warmup (compile + run) {time.time() - t0:.1f}s", file=sys.stderr)

    pipe.samples_per_complex = samples
    t0 = time.time()
    result = pipe.dock(data, jax.random.PRNGKey(1))
    wall = time.time() - t0
    poses_per_sec = samples / wall
    print(
        f"bench: {samples} poses in {wall:.2f}s -> {poses_per_sec:.2f} poses/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "poses_per_sec_3dpf_40x20_big_model",
                "value": round(poses_per_sec, 3),
                "unit": "poses/s",
                "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
