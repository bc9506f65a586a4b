"""wsinsight-tpu: a TPU-native whole-slide-image pathology inference engine.

Ground-up JAX/XLA/Pallas re-design of huangch/wsinsight: tissue segmentation and
patch planning, batched sharded model inference for the WSInfer model zoo,
CellViT cell detection, spatial analytics (H-Plot, CME), and byte-compatible
CSV / GeoJSON / OME-CSV artifact writers.
"""

from ._version import __version__

__all__ = ["__version__"]
