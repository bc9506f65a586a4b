"""Inference engine: host decode pipeline + sharded jitted forward."""

from .runner import run_inference

__all__ = ["run_inference"]
