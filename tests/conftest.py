"""Test configuration: run everything on a virtual 8-device CPU mesh.

Bench/production code targets TPU; tests exercise the identical jitted code
paths on CPU (XLA semantics are the same) with 8 virtual devices so the
multi-chip sharding paths can be validated without hardware.
"""
import os

# The environment pre-sets JAX_PLATFORMS=axon (the real TPU tunnel) AND
# pre-imports jax at interpreter startup, so env-var overrides are too late.
# jax.config.update works as long as no backend has been initialized yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# XLA compiles are pathologically slow in this environment (~10s for trivial
# traces); the persistent cache turns repeat test runs from minutes to seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# keep the steady-state-guard step-time records (runtime.record_step_time)
# out of the repo's committed results/ during test runs
os.environ.setdefault(
    "DDP_TPU_STEP_TARGETS", "/tmp/ddp_tpu_test_step_targets.json"
)
