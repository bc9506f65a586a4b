"""Spatial analytics: H-Plot tumor-border metrics and CME graph clustering."""

from .cme import cme_generation
from .hplot import hplot_generation

__all__ = ["cme_generation", "hplot_generation"]
