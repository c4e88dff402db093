"""Tensorization + optimization core: dense padded packing (FitSpec),
jit-compiled while_loop descent (fit), optimizer registry."""

from .fit import FitConfig, FitResult, fit_gains_and_foregrounds
from .optimizers import OPTIMIZERS, get_optimizer
from .tensorize import ChunkArrays, ChunkMeta, FitSpec, chunk_fitting_groups

__all__ = [
    "FitSpec",
    "ChunkArrays",
    "ChunkMeta",
    "chunk_fitting_groups",
    "FitConfig",
    "FitResult",
    "fit_gains_and_foregrounds",
    "OPTIMIZERS",
    "get_optimizer",
]
