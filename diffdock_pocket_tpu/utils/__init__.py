"""Shared utilities: checkpointing, EMA, config IO, logging, metrics."""
