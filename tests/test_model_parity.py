"""Torch->flax parity: converted random-weight checkpoints produce matching
logits (the cross-framework budget is 1e-3 on logits, BASELINE.md; these
same-weights tests assert much tighter)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from wsinsight_tpu.models import create_model
from wsinsight_tpu.models.convert import convert_torch_state_dict, state_dict_to_arrays

import torch_refs


def _randomize_bn(model: torch.nn.Module, seed: int = 0) -> None:
    """Give batch norms non-trivial running stats so parity is meaningful."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def _parity(torch_model, arch: str, num_classes: int, size: int, atol: float = 2e-4):
    torch_model.eval()
    _randomize_bn(torch_model)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, size, size)).astype(np.float32) * 0.5

    with torch.no_grad():
        expected = torch_model(torch.from_numpy(x)).numpy()

    params = convert_torch_state_dict(state_dict_to_arrays(torch_model.state_dict()))
    model = create_model(arch, num_classes)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))

    np.testing.assert_allclose(got, expected, atol=atol, rtol=1e-4)


def test_resnet34_parity():
    _parity(torch_refs.torch_resnet34(2), "resnet34", 2, 64)


def test_resnet50_parity():
    _parity(torch_refs.torch_resnet50(3), "resnet50", 3, 64)


def test_preactresnet34_parity():
    _parity(torch_refs.torch_preactresnet34(2), "preactresnet34", 2, 64)


def test_vgg16_parity():
    _parity(torch_refs.torch_vgg16(2), "vgg16mod", 2, 64, atol=5e-4)


@pytest.mark.parametrize("bn", [True, False])
def test_inceptionv4_parity(bn):
    arch = "inception_v4" if bn else "inception_v4nobn"
    _parity(torch_refs.torch_inceptionv4(2, bn=bn), arch, 2, 128, atol=5e-4)


def test_unknown_architecture():
    from wsinsight_tpu.errors import UnknownArchitectureError

    with pytest.raises(UnknownArchitectureError):
        create_model("not_a_net", 2)
