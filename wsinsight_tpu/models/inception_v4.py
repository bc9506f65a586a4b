"""Flax InceptionV4 (Cadene layout) with optional batch norm.

Serves `breast-tumor-inception_v4.tcga-brca` (BN variant) and the TIL model
`pancancer-lymphocytes-inceptionv4.tcga` (no-BN variant with conv biases, per
the reference's TF-Slim conversion, reference:
scripts/convert_tf_to_pytorch_til_inceptionv4.py:34-204). Layer names follow
the torch key layout of those state dicts (`features.N...`, `last_linear`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    EvalBN,
    TorchConv,
    TorchLinear,
    avg_pool_torch,
    global_avg_pool,
    max_pool_torch,
)

Dtype = Any


class InceptionV4(nn.Module):
    num_classes: int = 2
    batch_norm: bool = True
    bn_eps: float = 1e-3
    dtype: Dtype = jnp.float32

    def _basic_conv(self, x, name, out_ch, k, s=(1, 1), p=(0, 0)):
        """BasicConv2d: conv(+bn)+relu; no-BN variant uses conv bias instead."""
        y = TorchConv(
            out_ch, k, s, p, use_bias=not self.batch_norm, dtype=self.dtype,
            name=f"{name}.conv",
        )(x)
        if self.batch_norm:
            y = EvalBN(out_ch, eps=self.bn_eps, name=f"{name}.bn")(y)
        return nn.relu(y)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bc = self._basic_conv
        x = x.astype(self.dtype)

        x = bc(x, "features.0", 32, (3, 3), (2, 2))
        x = bc(x, "features.1", 32, (3, 3))
        x = bc(x, "features.2", 64, (3, 3), p=(1, 1))

        # Mixed_3a
        x = jnp.concatenate(
            [max_pool_torch(x, (3, 3), (2, 2)), bc(x, "features.3.conv", 96, (3, 3), (2, 2))],
            axis=-1,
        )

        # Mixed_4a
        b0 = bc(x, "features.4.branch0.0", 64, (1, 1))
        b0 = bc(b0, "features.4.branch0.1", 96, (3, 3))
        b1 = bc(x, "features.4.branch1.0", 64, (1, 1))
        b1 = bc(b1, "features.4.branch1.1", 64, (1, 7), p=(0, 3))
        b1 = bc(b1, "features.4.branch1.2", 64, (7, 1), p=(3, 0))
        b1 = bc(b1, "features.4.branch1.3", 96, (3, 3))
        x = jnp.concatenate([b0, b1], axis=-1)

        # Mixed_5a
        x = jnp.concatenate(
            [bc(x, "features.5.conv", 192, (3, 3), (2, 2)), max_pool_torch(x, (3, 3), (2, 2))],
            axis=-1,
        )

        # InceptionA x4 (features 6-9)
        for i in range(6, 10):
            f = f"features.{i}"
            b0 = bc(x, f + ".branch0", 96, (1, 1))
            b1 = bc(x, f + ".branch1.0", 64, (1, 1))
            b1 = bc(b1, f + ".branch1.1", 96, (3, 3), p=(1, 1))
            b2 = bc(x, f + ".branch2.0", 64, (1, 1))
            b2 = bc(b2, f + ".branch2.1", 96, (3, 3), p=(1, 1))
            b2 = bc(b2, f + ".branch2.2", 96, (3, 3), p=(1, 1))
            b3 = avg_pool_torch(x, (3, 3), (1, 1), (1, 1), count_include_pad=False)
            b3 = bc(b3, f + ".branch3.1", 96, (1, 1))
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # ReductionA (features.10)
        b0 = bc(x, "features.10.branch0", 384, (3, 3), (2, 2))
        b1 = bc(x, "features.10.branch1.0", 192, (1, 1))
        b1 = bc(b1, "features.10.branch1.1", 224, (3, 3), p=(1, 1))
        b1 = bc(b1, "features.10.branch1.2", 256, (3, 3), (2, 2))
        b2 = max_pool_torch(x, (3, 3), (2, 2))
        x = jnp.concatenate([b0, b1, b2], axis=-1)

        # InceptionB x7 (features 11-17)
        for i in range(11, 18):
            f = f"features.{i}"
            b0 = bc(x, f + ".branch0", 384, (1, 1))
            b1 = bc(x, f + ".branch1.0", 192, (1, 1))
            b1 = bc(b1, f + ".branch1.1", 224, (1, 7), p=(0, 3))
            b1 = bc(b1, f + ".branch1.2", 256, (7, 1), p=(3, 0))
            b2 = bc(x, f + ".branch2.0", 192, (1, 1))
            b2 = bc(b2, f + ".branch2.1", 192, (7, 1), p=(3, 0))
            b2 = bc(b2, f + ".branch2.2", 224, (1, 7), p=(0, 3))
            b2 = bc(b2, f + ".branch2.3", 224, (7, 1), p=(3, 0))
            b2 = bc(b2, f + ".branch2.4", 256, (1, 7), p=(0, 3))
            b3 = avg_pool_torch(x, (3, 3), (1, 1), (1, 1), count_include_pad=False)
            b3 = bc(b3, f + ".branch3.1", 128, (1, 1))
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # ReductionB (features.18)
        b0 = bc(x, "features.18.branch0.0", 192, (1, 1))
        b0 = bc(b0, "features.18.branch0.1", 192, (3, 3), (2, 2))
        b1 = bc(x, "features.18.branch1.0", 256, (1, 1))
        b1 = bc(b1, "features.18.branch1.1", 256, (1, 7), p=(0, 3))
        b1 = bc(b1, "features.18.branch1.2", 320, (7, 1), p=(3, 0))
        b1 = bc(b1, "features.18.branch1.3", 320, (3, 3), (2, 2))
        b2 = max_pool_torch(x, (3, 3), (2, 2))
        x = jnp.concatenate([b0, b1, b2], axis=-1)

        # InceptionC x3 (features 19-21)
        for i in range(19, 22):
            f = f"features.{i}"
            b0 = bc(x, f + ".branch0", 256, (1, 1))
            b1_0 = bc(x, f + ".branch1_0", 384, (1, 1))
            b1a = bc(b1_0, f + ".branch1_1a", 256, (1, 3), p=(0, 1))
            b1b = bc(b1_0, f + ".branch1_1b", 256, (3, 1), p=(1, 0))
            b2_0 = bc(x, f + ".branch2_0", 384, (1, 1))
            b2_1 = bc(b2_0, f + ".branch2_1", 448, (3, 1), p=(1, 0))
            b2_2 = bc(b2_1, f + ".branch2_2", 512, (1, 3), p=(0, 1))
            b2a = bc(b2_2, f + ".branch2_3a", 256, (1, 3), p=(0, 1))
            b2b = bc(b2_2, f + ".branch2_3b", 256, (3, 1), p=(1, 0))
            b3 = avg_pool_torch(x, (3, 3), (1, 1), (1, 1), count_include_pad=False)
            b3 = bc(b3, f + ".branch3.1", 256, (1, 1))
            x = jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)

        x = global_avg_pool(x)
        return TorchLinear(self.num_classes, dtype=self.dtype, name="last_linear")(x).astype(
            jnp.float32
        )


def inception_v4(num_classes: int, dtype: Dtype = jnp.float32) -> InceptionV4:
    return InceptionV4(num_classes=num_classes, batch_norm=True, dtype=dtype)


def inception_v4nobn(num_classes: int, dtype: Dtype = jnp.float32) -> InceptionV4:
    return InceptionV4(num_classes=num_classes, batch_norm=False, dtype=dtype)
