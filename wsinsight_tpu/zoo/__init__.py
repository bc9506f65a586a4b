"""Model registry: the wsinfer-zoo surface the pipeline consumes.

Reimplements the subset of `wsinfer_zoo.client` the reference uses (reference:
wsinsight/modellib/models.py:24-36, cli/patch.py:668-816, cli/infer.py:831-1026):
``load_registry`` honoring ``WSINFER_ZOO_REGISTRY_PATH``, ``Registry
.get_model_by_name``, ``ModelConfiguration(.from_dict)`` with the WSInsight
extension keys (object_based, mixed_precision, stain_normalization,
object_detection, halo_size_pixels), and local-model handles.

Weights resolution order for registered models:
1. ``WSINSIGHT_MODEL_DIR/<name>.msgpack`` (converted flax checkpoint)
2. ``WSINSIGHT_MODEL_DIR/<name>.pt`` (torch checkpoint, converted on load)
3. huggingface_hub download of the upstream TorchScript (when network + torch
   are available), converted on load.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Optional, Sequence

from ..errors import WsinsightException

_BUNDLED_REGISTRY = Path(__file__).parent / "registry.json"


class ModelNotFoundError(WsinsightException):
    pass


class WeightsNotFoundError(WsinsightException):
    pass


@dataclasses.dataclass
class TransformConfigurationItem:
    name: str
    arguments: Optional[dict] = None


@dataclasses.dataclass
class ObjectDetectionConfiguration:
    name: str | None = None
    normalization_pmin: float = 1.0
    normalization_pmax: float = 99.8


@dataclasses.dataclass
class ModelConfiguration:
    """Model-config JSON contents (wsinfer-zoo schema + WSInsight extensions)."""

    architecture: str
    num_classes: int
    class_names: Sequence[str]
    patch_size_pixels: int
    spacing_um_px: float
    transform: Sequence[TransformConfigurationItem] = dataclasses.field(default_factory=list)
    # WSInsight extensions (reference: cli/infer.py:843-847, cli/patch.py:680-684)
    object_based: bool = False
    mixed_precision: bool = False
    stain_normalization: bool = False
    object_detection: ObjectDetectionConfiguration | None = None
    halo_size_pixels: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfiguration":
        transform = [
            TransformConfigurationItem(name=t["name"], arguments=t.get("arguments"))
            for t in d.get("transform", [])
        ]
        od = d.get("object_detection")
        od_cfg = None
        if od:
            od_cfg = ObjectDetectionConfiguration(
                name=od.get("name"),
                normalization_pmin=od.get("normalization_pmin", 1.0),
                normalization_pmax=od.get("normalization_pmax", 99.8),
            )
        return cls(
            architecture=d["architecture"],
            num_classes=d["num_classes"],
            class_names=list(d["class_names"]),
            patch_size_pixels=d["patch_size_pixels"],
            spacing_um_px=d["spacing_um_px"],
            transform=transform,
            object_based=bool(d.get("object_based", False)),
            mixed_precision=bool(d.get("mixed_precision", False)),
            stain_normalization=bool(d.get("stain_normalization", False)),
            object_detection=od_cfg,
            halo_size_pixels=int(d.get("halo_size_pixels", 0)),
        )

    def to_dict(self) -> dict:
        d: dict[str, Any] = {
            "architecture": self.architecture,
            "num_classes": self.num_classes,
            "class_names": list(self.class_names),
            "patch_size_pixels": self.patch_size_pixels,
            "spacing_um_px": self.spacing_um_px,
            "transform": [
                {"name": t.name, **({"arguments": t.arguments} if t.arguments else {})}
                for t in self.transform
            ],
        }
        if self.object_based:
            d["object_based"] = True
        if self.mixed_precision:
            d["mixed_precision"] = True
        if self.stain_normalization:
            d["stain_normalization"] = True
        if self.halo_size_pixels:
            d["halo_size_pixels"] = self.halo_size_pixels
        if self.object_detection is not None:
            d["object_detection"] = {
                "name": self.object_detection.name,
                "normalization_pmin": self.object_detection.normalization_pmin,
                "normalization_pmax": self.object_detection.normalization_pmax,
            }
        return d


@dataclasses.dataclass
class ModelHandle:
    """A resolvable model: configuration + a way to obtain flax params."""

    name: str
    config: ModelConfiguration
    weights_path: str | None = None  # local flax msgpack or torch checkpoint
    hf_repo_id: str | None = None
    hf_revision: str | None = None

    def load_flax_params(self) -> dict:
        from ..models.convert import (
            convert_with_template,
            load_flax_params,
            load_torch_weights,
        )

        path = self._resolve_weights()
        if path.suffix in (".msgpack", ".flax"):
            return load_flax_params(path)
        # Torch checkpoint: convert against the architecture's own init tree,
        # which drives nesting + leaf naming and verifies full coverage.
        sd = load_torch_weights(path)
        if self.config.architecture.lower().replace("-", "_").startswith("hovernet"):
            from ..models.convert import normalize_hovernet_keys

            sd = normalize_hovernet_keys(sd)
        return convert_with_template(sd, self._init_template())

    def _init_template(self) -> dict:
        import jax
        import jax.numpy as jnp

        from ..models import create_model

        model = create_model(self.config.architecture, self.config.num_classes)
        if hasattr(model, "halo_size") and self.config.halo_size_pixels is not None:
            model = model.clone(halo_size=self.config.halo_size_pixels)
        from ..ops.preprocess import TransformSpec

        # transform may resize; the template shape must match the model input
        resize = TransformSpec.from_config(self.config.transform).size
        p = int(resize[0]) if resize is not None else self.config.patch_size_pixels
        with jax.default_device(jax.devices("cpu")[0]):
            return model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, p, p, 3), jnp.float32)
            )["params"]

    def _resolve_weights(self) -> Path:
        if self.weights_path:
            p = Path(self.weights_path)
            if p.exists():
                return p
            raise WeightsNotFoundError(f"weights not found: {p}")
        model_dir = os.getenv("WSINSIGHT_MODEL_DIR")
        if model_dir:
            for suffix in (".msgpack", ".pt", ".pth", ".ts"):
                cand = Path(model_dir) / f"{self.name}{suffix}"
                if cand.exists():
                    return cand
        if self.hf_repo_id:
            try:
                from huggingface_hub import hf_hub_download  # type: ignore

                try:  # prefer the local HF cache; avoids retry storms offline
                    return Path(
                        hf_hub_download(
                            self.hf_repo_id,
                            "torchscript_model.pt",
                            revision=self.hf_revision,
                            local_files_only=True,
                        )
                    )
                except Exception:
                    pass
                return Path(
                    hf_hub_download(
                        self.hf_repo_id, "torchscript_model.pt", revision=self.hf_revision
                    )
                )
            except Exception as err:
                raise WeightsNotFoundError(
                    f"could not obtain weights for '{self.name}': {err}. Place a"
                    f" converted checkpoint at $WSINSIGHT_MODEL_DIR/{self.name}.msgpack"
                ) from err
        raise WeightsNotFoundError(f"no weights source for model '{self.name}'")


# Back-compat aliases matching the reference's type names (wsinfer_zoo surface).
HFModelTorchScript = ModelHandle
LocalModelTorchScript = ModelHandle
Model = ModelHandle


class Registry:
    def __init__(self, models: dict[str, dict]):
        self._models = models

    @property
    def models(self) -> dict[str, dict]:
        return self._models

    def get_model_by_name(self, name: str) -> ModelHandle:
        if name not in self._models:
            raise ModelNotFoundError(
                f"model '{name}' not found in registry; known models:"
                f" {sorted(self._models)}"
            )
        entry = self._models[name]
        return ModelHandle(
            name=name,
            config=ModelConfiguration.from_dict(entry["config"]),
            hf_repo_id=entry.get("hf_repo_id"),
            hf_revision=entry.get("hf_revision"),
        )


def load_registry(registry_file: Path | str | None = None) -> Registry:
    """Load the model registry, honoring WSINFER_ZOO_REGISTRY_PATH."""
    if registry_file is None:
        env = os.getenv("WSINFER_ZOO_REGISTRY_PATH")
        if env:
            if not Path(env).exists():
                # a typo'd override must not silently run the bundled registry
                raise FileNotFoundError(
                    f"WSINFER_ZOO_REGISTRY_PATH points to a missing file: {env}"
                )
            registry_file = env
        else:
            registry_file = _BUNDLED_REGISTRY
    with open(registry_file) as fh:
        data = json.load(fh)
    return Registry(data["models"])


def get_registered_model(name: str) -> ModelHandle:
    """Registry lookup (reference: modellib/models.py:24-36)."""
    return load_registry().get_model_by_name(name)


def load_local_model(config_path: str | Path, weights_path: str | Path) -> ModelHandle:
    """Local --config/--model-path pair (reference: cli/infer.py:511-528)."""
    with open(config_path) as fh:
        cfg = ModelConfiguration.from_dict(json.load(fh))
    return ModelHandle(name=Path(config_path).stem, config=cfg, weights_path=str(weights_path))


def make_random_local_model(
    architecture: str,
    num_classes: int,
    out_dir: str | Path,
    *,
    class_names: Sequence[str] | None = None,
    patch_size_pixels: int = 350,
    spacing_um_px: float = 0.25,
    resize_size: int = 224,
    seed: int = 0,
) -> tuple[Path, Path]:
    """Author a local config + random-weight flax checkpoint (tests/dev).

    Returns (config_path, weights_path).
    """
    import jax
    import jax.numpy as jnp

    from ..models import create_model
    from ..models.convert import save_flax_params

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    is_cell = architecture.lower().replace("-", "_").startswith(("cellvit", "hovernet"))
    if is_cell:
        if patch_size_pixels == 350:  # classifier default: use the cell default
            patch_size_pixels = 256
        if patch_size_pixels % 16:
            raise ValueError(
                f"cell architectures need patch_size_pixels divisible by 16"
                f" (ViT patch embed + decoder upsampling), got {patch_size_pixels}"
            )
        halo = 46
        cfg = ModelConfiguration(
            architecture=architecture,
            num_classes=num_classes,
            class_names=list(class_names or [f"class{i}" for i in range(num_classes)]),
            patch_size_pixels=patch_size_pixels,
            spacing_um_px=spacing_um_px,
            transform=[
                TransformConfigurationItem("ToTensor", None),
                TransformConfigurationItem(
                    "Normalize", {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]}
                ),
            ],
            object_based=True,
            object_detection=ObjectDetectionConfiguration(name="end2end"),
            halo_size_pixels=halo,
        )
        init_size = patch_size_pixels
    else:
        cfg = ModelConfiguration(
            architecture=architecture,
            num_classes=num_classes,
            class_names=list(class_names or [f"class{i}" for i in range(num_classes)]),
            patch_size_pixels=patch_size_pixels,
            spacing_um_px=spacing_um_px,
            transform=[
                TransformConfigurationItem("Resize", {"size": resize_size}),
                TransformConfigurationItem("ToTensor", None),
                TransformConfigurationItem(
                    "Normalize",
                    {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]},
                ),
            ],
        )
        init_size = resize_size
    model = create_model(architecture, num_classes)
    if is_cell and hasattr(model, "halo_size"):
        model = model.clone(halo_size=cfg.halo_size_pixels)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, init_size, init_size, 3), jnp.float32)
    )["params"]
    config_path = out_dir / "config.json"
    weights_path = out_dir / "weights.msgpack"
    config_path.write_text(json.dumps(cfg.to_dict(), indent=2))
    save_flax_params(params, weights_path)
    return config_path, weights_path
