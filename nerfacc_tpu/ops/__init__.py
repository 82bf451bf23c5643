"""Pallas TPU kernels for the hot ops (XLA fallback / interpret on CPU)."""

from .cp_encoder import cp_level_features

__all__ = ["cp_level_features"]
