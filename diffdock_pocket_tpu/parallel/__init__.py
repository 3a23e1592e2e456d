"""Multi-chip parallelism: device meshes and sharded train/inference steps."""
