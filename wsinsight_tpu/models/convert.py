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


def _is_deconv_path(mod: str) -> bool:
    """Torch-naming heuristic for ConvTranspose modules.

    Matches explicit 'deconv'/'*upsampler' leaves AND an indexed position
    directly inside an upsampler Sequential (e.g. 'decoder3_upsampler.3',
    the terminal ConvTranspose) — but NOT the regular convs nested deeper
    (e.g. 'decoder3_upsampler.0.conv').
    """
    parts = mod.split(".")
    if "deconv" in parts[-1] or "upsampler" in parts[-1]:
        return True
    return parts[-1].isdigit() and len(parts) >= 2 and "upsampler" in parts[-2]


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
                if w.ndim == 4 and _is_deconv_path(mod):
                    # ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out)
                    # PLUS a spatial flip: torch computes the gradient-of-conv
                    # (cross-correlation transposed), while lax.conv_transpose
                    # applies the kernel unflipped. Verified numerically against
                    # torch (tests/test_model_parity.py::test_convtranspose_*).
                    entry["kernel"] = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].astype(
                        np.float32
                    )
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


def convert_with_template(
    sd: Mapping[str, np.ndarray],
    template: Mapping[str, Any],
    strict: bool = True,
    problems_out: list | None = None,
) -> dict:
    """Convert a torch state dict into the EXACT shape of a flax param tree.

    ``template`` is a params pytree from ``model.init`` — its nesting and leaf
    names drive the conversion, so models whose flax trees are nested (the
    ViT/CellViT/HoVer-Net families) convert correctly, unlike the flat
    dotted-path output of :func:`convert_torch_state_dict` (which matches the
    flat-named classifier models only).

    Rules per torch leaf:
    * target leaf ``kernel``: 4-D weights become conv (O,I,kh,kw)->(kh,kw,I,O)
      or transposed-conv (I,O,kh,kw)->(kh,kw,I,O)+spatial flip — disambiguated
      by the template leaf's shape (falling back to a name heuristic when
      I == O makes both fit); 2-D weights transpose (O,I)->(I,O).
    * target leaf ``scale`` (LayerNorm/GroupNorm): copied from torch
      ``weight``.
    * batch-norm leaves and direct parameters (cls_token, pos_embed,
      rel_pos_*) copy verbatim.

    strict=True raises with a per-layer report when any template leaf is
    unmatched or any torch tensor is left over (num_batches_tracked is always
    ignored).
    """
    sd = _strip_wrapper_prefixes({k: np.asarray(v) for k, v in sd.items()})
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    # Flatten the template: dotted module path -> {leaf name: shape}
    flat_template: dict[str, dict[str, tuple]] = {}

    def walk(node: Mapping[str, Any], prefix: str) -> None:
        for name, child in node.items():
            path = f"{prefix}.{name}" if prefix else str(name)
            if hasattr(child, "items"):
                walk(child, path)
            else:
                mod, _, leaf = path.rpartition(".")
                flat_template.setdefault(mod, {})[leaf] = tuple(np.shape(child))

    walk(template, "")

    converted: dict[str, dict[str, np.ndarray]] = {}
    problems: list[str] = []

    def place(mod: str, leaf: str, value: np.ndarray) -> None:
        converted.setdefault(mod, {})[leaf] = value.astype(np.float32)

    for key, w in sd.items():
        mod, _, torch_leaf = key.rpartition(".")
        leaves = flat_template.get(mod)
        if leaves is None:
            problems.append(f"torch module {mod!r} (from {key!r}) has no template match")
            continue
        if torch_leaf == "weight":
            if "kernel" in leaves:
                want = leaves["kernel"]
                if w.ndim == 4:
                    as_conv = np.transpose(w, (2, 3, 1, 0))
                    as_deconv = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
                    conv_fits = as_conv.shape == want
                    deconv_fits = as_deconv.shape == want
                    if conv_fits and deconv_fits:
                        # I == O: both layouts fit; decide by torch naming
                        is_deconv = _is_deconv_path(mod)
                        place(mod, "kernel", as_deconv if is_deconv else as_conv)
                    elif deconv_fits:
                        place(mod, "kernel", as_deconv)
                    elif conv_fits:
                        place(mod, "kernel", as_conv)
                    else:
                        problems.append(
                            f"{key!r}: no conv layout of {w.shape} fits template {want}"
                        )
                elif w.ndim == 2:
                    place(mod, "kernel", np.transpose(w, (1, 0)))
                else:
                    place(mod, "kernel", w)
            elif "scale" in leaves:
                place(mod, "scale", w)
            elif "weight" in leaves:  # EvalBN keeps torch naming
                place(mod, "weight", w)
            else:
                problems.append(f"{key!r}: template has no kernel/scale/weight leaf")
        elif torch_leaf in leaves:
            place(mod, torch_leaf, w)
        else:
            problems.append(f"{key!r}: leaf {torch_leaf!r} not in template {sorted(leaves)}")

    # verify coverage + shapes
    for mod, leaves in flat_template.items():
        got = converted.get(mod, {})
        for leaf, shape in leaves.items():
            if leaf not in got:
                problems.append(f"template leaf {mod}.{leaf} not filled from torch")
            elif tuple(got[leaf].shape) != shape:
                problems.append(
                    f"{mod}.{leaf}: shape {got[leaf].shape} != template {shape}"
                )
    if problems_out is not None:
        problems_out.extend(problems)
    if problems and strict:
        report = "\n  ".join(problems[:40])
        raise ValueError(f"torch->flax conversion mismatches ({len(problems)}):\n  {report}")

    # re-nest following the template structure
    def rebuild(node: Mapping[str, Any], prefix: str) -> dict:
        out: dict[str, Any] = {}
        for name, child in node.items():
            path = f"{prefix}.{name}" if prefix else str(name)
            if hasattr(child, "items"):
                out[name] = rebuild(child, path)
            else:
                mod, _, leaf = path.rpartition(".")
                out[name] = converted.get(mod, {}).get(leaf, np.asarray(child))
        return out

    return rebuild(template, "")


def conversion_report(
    sd: Mapping[str, np.ndarray], template: Mapping[str, Any]
) -> dict:
    """Per-layer mapping coverage of a torch state dict against a flax
    template: how many template leaves filled, how many torch tensors used,
    and every mismatch (the `wsinsight models convert --report` payload —
    VERDICT r3 #6's ingestion report)."""
    problems: list[str] = []
    converted = convert_with_template(sd, template, strict=False, problems_out=problems)

    def count_leaves(node) -> int:
        if hasattr(node, "items"):
            return sum(count_leaves(v) for v in node.values())
        return 1

    n_template = count_leaves(template)
    clean_sd = _strip_wrapper_prefixes({k: np.asarray(v) for k, v in sd.items()})
    n_torch = sum(1 for k in clean_sd if not k.endswith("num_batches_tracked"))
    unfilled = sum(1 for pr in problems if "not filled" in pr)
    return {
        "template_leaves": n_template,
        "template_filled": n_template - unfilled,
        "torch_tensors": n_torch,
        "problems": problems,
        "ok": not problems,
        "params": converted,
    }


def normalize_hovernet_keys(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Rewrite released hover_net state-dict spellings onto this repo's names.

    Upstream net_desc.py names submodules with '/' inside its OrderedDict
    Sequentials — the stem conv is literally named '/' ('conv0./.weight'),
    batch norms are 'preact/bn', 'conv1/bn', 'conv2/bn', 'preact_bna/bn' —
    and UpSample2x registers a constant 'unpool_mat' unfold buffer.  This
    maps 'conv0./.' -> 'conv0.conv.', '<x>/bn.' -> '<x>_bn.' and drops the
    buffer, matching models/hovernet.py naming. Idempotent on dicts that are
    already normalized (TorchScript re-exports may sanitize names upstream).
    """
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("unpool_mat"):
            continue
        k = k.replace("conv0./.", "conv0.conv.")
        k = k.replace("/bn.", "_bn.")
        out[k] = v
    return out


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
# Keras-HDF5 -> flax (StarDist 2D_versatile_he) — no TensorFlow required
# ---------------------------------------------------------------------------


def _keras_h5_weights(path: str | os.PathLike) -> list[tuple[str, dict[str, np.ndarray]]]:
    """Parse a Keras ``save_weights`` HDF5 file into ordered
    (layer_name, {leaf: array}) pairs, skipping weightless layers.

    The format: root attr ``layer_names`` lists layers in graph order; each
    layer group's ``weight_names`` attr lists datasets like
    ``<layer>/kernel:0``. Parsed directly with h5py so the converter runs in
    this TF-free environment.
    """
    import h5py

    def _names(attr) -> list[str]:
        return [n.decode() if isinstance(n, bytes) else str(n) for n in attr]

    out: list[tuple[str, dict[str, np.ndarray]]] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for layer in _names(root.attrs["layer_names"]):
            group = root[layer]
            leaves: dict[str, np.ndarray] = {}
            for wname in _names(group.attrs.get("weight_names", [])):
                leaf = wname.rsplit("/", 1)[-1].split(":", 1)[0]  # kernel:0 -> kernel
                leaves[leaf] = np.asarray(group[wname])
            if leaves:
                out.append((layer, leaves))
    return out


# Layers of the released 2D_versatile_he graph that carry their own names
# (stardist/models/model2d.py names the unet_block convs and the heads; the
# two grid-stem convs are anonymous Conv2D layers).
_STARDIST_HE_NAMED = frozenset(
    [f"down_level_{n}_no_{i}" for n in range(3) for i in range(2)]
    + [f"up_level_{n}_no_{i}" for n in range(3) for i in range(2)]
    + ["middle_0", "middle_1", "features", "prob", "dist"]
)
_STARDIST_STEM_SHAPES = [(3, 3, 3, 32), (3, 3, 32, 32)]


def convert_stardist_keras_h5(path: str | os.PathLike) -> dict:
    """Convert the released StarDist ``2D_versatile_he`` Keras weights file
    into the flax param tree of :class:`..models.stardist.StarDistUNet`.

    Keras Conv2D kernels are already (kh, kw, in, out) — flax's layout — so
    named layers map verbatim; the two anonymous grid-stem convs are
    identified by their position and validated by shape. The analogue of the
    reference's TF->torch converters
    (/root/reference/scripts/convert_tf_to_pytorch_til_inceptionv4.py:34).
    """
    params: dict[str, dict[str, np.ndarray]] = {}
    stem: list[tuple[str, dict[str, np.ndarray]]] = []
    unexpected: list[str] = []
    for layer, leaves in _keras_h5_weights(path):
        if layer in _STARDIST_HE_NAMED:
            params[layer] = {
                "kernel": np.asarray(leaves["kernel"], np.float32),
                "bias": np.asarray(leaves["bias"], np.float32),
            }
        elif "kernel" in leaves and np.ndim(leaves["kernel"]) == 4:
            stem.append((layer, leaves))
        else:
            unexpected.append(layer)
    if unexpected:
        raise ValueError(f"unrecognized weighted layers in {path}: {unexpected}")
    if len(stem) != len(_STARDIST_STEM_SHAPES):
        raise ValueError(
            f"expected {len(_STARDIST_STEM_SHAPES)} anonymous grid-stem convs,"
            f" found {len(stem)}: {[n for n, _ in stem]}"
        )
    for i, ((layer, leaves), want) in enumerate(zip(stem, _STARDIST_STEM_SHAPES)):
        got = tuple(leaves["kernel"].shape)
        if got != want:
            raise ValueError(f"stem conv {layer}: kernel shape {got}, expected {want}")
        params[f"stem_conv_{i}"] = {
            "kernel": np.asarray(leaves["kernel"], np.float32),
            "bias": np.asarray(leaves["bias"], np.float32),
        }

    missing = _STARDIST_HE_NAMED - params.keys()
    if missing:
        raise ValueError(f"layers missing from {path}: {sorted(missing)}")
    return params


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
