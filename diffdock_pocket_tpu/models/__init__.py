"""SE(3)-equivariant score/confidence models (flax)."""
