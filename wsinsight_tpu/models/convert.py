"""Torch-checkpoint -> flax-params conversion and checkpoint persistence.

The reference ships TorchScript weights for every zoo model (reference:
wsinsight/modellib/models.py:51-108, scripts/convert_to_torchscript.py:22-45).
wsinsight-tpu owns the architectures in flax; this module converts torch state
dicts into the matching flax param trees. Because flax modules are named with
the torch dotted keys (see models/layers.py), conversion is mechanical:

* conv weight (O, I, kh, kw)  -> kernel (kh, kw, I, O)
* linear weight (O, I)        -> kernel (I, O)
* batchnorm weight/bias/running_mean/running_var -> copied verbatim
* num_batches_tracked         -> dropped
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Mapping

import numpy as np

try:  # torch is optional at runtime; required only for .pt/.ts ingestion.
    import torch

    HAS_TORCH = True
except Exception:  # pragma: no cover
    HAS_TORCH = False


def state_dict_to_arrays(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Convert a torch state dict (tensors) to plain numpy arrays."""
    out: dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _strip_wrapper_prefixes(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop DataParallel/Lightning-style wrappers ('module.', 'model.')
    when every key carries the same prefix."""
    keys = list(sd.keys())
    for prefix in ("module.", "model.", "_orig_mod."):
        if keys and all(k.startswith(prefix) for k in keys):
            return _strip_wrapper_prefixes({k[len(prefix):]: v for k, v in sd.items()})
    return dict(sd)


def convert_torch_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """Build the flax `params` tree from torch-named numpy arrays."""
    sd = _strip_wrapper_prefixes({k: np.asarray(v) for k, v in sd.items()})
    modules: dict[str, dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        mod, _, leaf = key.rpartition(".")
        modules.setdefault(mod, {})[leaf] = val

    params: dict[str, dict[str, np.ndarray]] = {}
    for mod, leaves in modules.items():
        entry: dict[str, np.ndarray] = {}
        if "running_mean" in leaves:  # batch norm
            for name in ("weight", "bias", "running_mean", "running_var"):
                if name in leaves:
                    entry[name] = leaves[name].astype(np.float32)
        else:
            w = leaves.get("weight")
            if w is not None:
                if w.ndim == 4 and ("deconv" in mod or "upsampler" in mod.rsplit(".", 1)[-1]):
                    # ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out).
                    # NOTE: validated structurally; revisit flip semantics when
                    # real CellViT checkpoints are converted.
                    entry["kernel"] = np.transpose(w, (2, 3, 0, 1)).astype(np.float32)
                elif w.ndim == 4:
                    entry["kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
                elif w.ndim == 2:
                    entry["kernel"] = np.transpose(w, (1, 0)).astype(np.float32)
                else:
                    entry["kernel"] = w.astype(np.float32)
            if "bias" in leaves:
                entry["bias"] = leaves["bias"].astype(np.float32)
        params[mod] = entry
    return params


def load_torch_weights(path: str | os.PathLike) -> dict[str, np.ndarray]:
    """Load a torch checkpoint (.pt state dict or TorchScript) as numpy arrays."""
    if not HAS_TORCH:  # pragma: no cover
        raise RuntimeError("torch is required to ingest .pt checkpoints")
    try:
        obj = torch.jit.load(str(path), map_location="cpu")
        return state_dict_to_arrays(obj.state_dict())
    except Exception:
        obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return state_dict_to_arrays(obj)


# ---------------------------------------------------------------------------
# Flax checkpoint persistence (msgpack via flax.serialization)
# ---------------------------------------------------------------------------


def save_flax_params(params: Any, path: str | os.PathLike) -> str:
    """Serialize a params pytree to msgpack; returns sha256 of the file."""
    from flax import serialization

    data = serialization.msgpack_serialize(_to_pure_dict(params))
    with open(path, "wb") as fh:
        fh.write(data)
    return hashlib.sha256(data).hexdigest()


def load_flax_params(path: str | os.PathLike) -> dict:
    from flax import serialization

    with open(path, "rb") as fh:
        return serialization.msgpack_restore(fh.read())


def _to_pure_dict(tree: Any) -> Any:
    if hasattr(tree, "items"):
        return {k: _to_pure_dict(v) for k, v in tree.items()}
    return np.asarray(tree)


def sha256_file(path: str | os.PathLike) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
