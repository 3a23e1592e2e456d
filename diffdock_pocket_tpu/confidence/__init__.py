"""Confidence (filtering) model stack: self-distillation dataset generation
and the confidence trainer."""
