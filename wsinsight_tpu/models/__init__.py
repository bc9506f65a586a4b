"""Flax model zoo: architecture registry and constructors.

Architecture names accept the aliases used by wsinfer-zoo model configs
(reference model layer: wsinsight/modellib/models.py:24-36; config schema keys
at cli/infer.py:843-847).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from ..errors import UnknownArchitectureError
from .inception_v4 import inception_v4, inception_v4nobn
from .resnet import preactresnet34, resnet34, resnet50
from .vgg import vgg16

_REGISTRY: dict[str, Callable] = {}


def _register(fn: Callable, *names: str) -> None:
    for n in names:
        _REGISTRY[n.lower().replace("-", "_")] = fn


_register(resnet34, "resnet34")
_register(resnet50, "resnet50")
_register(preactresnet34, "preactresnet34", "preact_resnet34")
_register(inception_v4, "inception_v4", "inceptionv4")
_register(
    inception_v4nobn, "inception_v4nobn", "inceptionv4nobn", "inception_v4_no_batchnorm",
    "inceptionv4_no_batchnorm",
)
_register(vgg16, "vgg16", "vgg16mod", "vgg16_mod")

from .cellvit import (  # noqa: E402
    cellvit_256,
    cellvit_sam_b,
    cellvit_sam_h,
    cellvit_sam_l,
    cellvit_virchow,
)

_register(cellvit_sam_h, "cellvit_sam_h", "cellvit-sam-h")
_register(cellvit_sam_l, "cellvit_sam_l", "cellvit-sam-l")
_register(cellvit_sam_b, "cellvit_sam_b", "cellvit-sam-b")
_register(cellvit_256, "cellvit_256", "cellvit-256")
_register(cellvit_virchow, "cellvit_virchow", "cellvit-virchow")

from .hovernet import hovernet_fast  # noqa: E402

_register(hovernet_fast, "hovernet_fast", "hovernet-fast", "hovernet_fast_pannuke")


def _hoptimus(num_classes: int = 0, dtype: Any = jnp.float32):
    """H-Optimus-0 foundation encoder (pooled cls embedding; no head —
    num_classes is accepted for registry-signature compatibility)."""
    del num_classes
    from .vit import HOPTIMUS_VIT_G, FoundationViT

    return FoundationViT(HOPTIMUS_VIT_G, dtype=dtype)


_register(_hoptimus, "hoptimus", "hoptimus0", "h_optimus_0")


def available_architectures() -> list[str]:
    return sorted(_REGISTRY)


def create_model(architecture: str, num_classes: int, dtype: Any = jnp.float32):
    """Instantiate the flax module for a zoo architecture name."""
    key = architecture.lower().replace("-", "_")
    if key not in _REGISTRY:
        raise UnknownArchitectureError(
            f"unknown architecture '{architecture}'; known: {available_architectures()}"
        )
    return _REGISTRY[key](num_classes=num_classes, dtype=dtype)
