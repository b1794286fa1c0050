"""Profiling + cost analysis (reference torch.profiler replacement)."""
from .profiler import create_profiler, save_profile

__all__ = ["create_profiler", "save_profile"]
