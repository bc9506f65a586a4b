"""Single-cell (object-based end2end) inference: CellViT -> stitcher -> instances.

TPU re-design of the reference's end2end branch (reference:
wsinsight/modellib/run_inference.py:431-535): the per-batch forward plus the
stitcher's device half (softmax / resize / HV scaling) run as one jitted step
sharded over the data mesh; host canvases collect the maps; the watershed
finalize runs on CPU threads with the native C++ flood fill.
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np
import tqdm

from ..uri_path import URIPath
from ..zoo import ModelHandle
from ..utils.workers import governed_workers
from .data import PatchBatchSource
from .stitch import TileRemapStitcher

logger = logging.getLogger(__name__)


class CellEngine:
    """Jitted (preprocess -> CellViT forward) step over the data mesh."""

    def __init__(
        self,
        model_info: ModelHandle,
        mixed_precision: bool = False,
        max_devices: int | None = None,
        init_random: bool = False,
    ):
        import os

        import jax
        import jax.numpy as jnp

        from ..models import create_model
        from ..ops.preprocess import TransformSpec, make_preprocess_fn
        from ..parallel.mesh import (
            batch_sharding,
            enable_compilation_cache,
            get_data_mesh,
            replicated_sharding,
        )

        enable_compilation_cache()
        cfg = model_info.config
        compute_dtype = jnp.bfloat16 if mixed_precision else jnp.float32
        self.config = cfg
        self.mixed_precision = mixed_precision
        self.model = create_model(cfg.architecture, cfg.num_classes, dtype=compute_dtype)
        # CellViT halo: the model crops its maps to the halo interior.
        if hasattr(self.model, "halo_size"):
            self.model = self.model.clone(halo_size=cfg.halo_size_pixels)

        if init_random:
            p = cfg.patch_size_pixels
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, p, p, 3), jnp.float32)
            )["params"]
        else:
            self.params = model_info.load_flax_params()

        spec = TransformSpec.from_config(cfg.transform)
        preprocess = make_preprocess_fn(spec, compute_dtype)

        self.mesh = get_data_mesh(max_devices)
        self.n_devices = self.mesh.devices.size
        self._rep = replicated_sharding(self.mesh)
        self._bsh = batch_sharding(self.mesh)
        self.params = jax.device_put(self.params, self._rep)

        # "high" = 3-pass bf16: ~f32 accuracy at ~2x the 6-pass "float32" MXU
        # rate (measured 2.1e-6 max logit drift on the classifier path; the
        # cell maps' downstream is a 0.5 threshold, far less sensitive).
        precision = os.getenv(
            "WSINSIGHT_PRECISION", "default" if mixed_precision else "high"
        )

        def step(params, batch_u8):
            with jax.default_matmul_precision(precision):
                if batch_u8.ndim == 3:
                    # YUV 4:2:0 wire (WSINSIGHT_WIRE=yuv420): reconstruct RGB
                    # on device; rank makes the format self-describing.
                    from ..ops.preprocess import yuv420_to_rgb

                    batch_u8 = yuv420_to_rgb(batch_u8).astype(jnp.uint8)
                x = preprocess(batch_u8)
                return self.model.apply({"params": params}, x)

        self._step = jax.jit(
            step, in_shardings=(self._rep, self._bsh), out_shardings=self._rep
        )

    def pad_batch(self, n: int) -> int:
        d = self.n_devices
        return -(-n // d) * d

    def run_batch(self, images_u8: np.ndarray) -> dict:
        return self._step(self.params, images_u8)


def _cell_wire() -> str | None:
    """Cell-path wire format from WSINSIGHT_WIRE (yuv420 or exact RGB).

    The lossy half-scale decode is classifier-only (cell models consume the
    full-resolution patch — there is no downstream resize to hide it), so
    cell sources pin decode_scale=1 and take only the wire choice from env.
    """
    import os

    return "yuv420" if os.getenv("WSINSIGHT_WIRE", "").lower() == "yuv420" else None


def run_cell_inference(
    engine: CellEngine,
    *,
    wsi_path: URIPath,
    patch_path: URIPath,
    use_hdf5_images: bool,
    slide_width: int,
    slide_height: int,
    mpp: float,
    halo_size_px: int,
    batch_size: int,
    num_workers: int,
    stitch_workers: int | None,
    min_object_size: int = 20,
) -> tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
    """Run the model over all patches and stitch instances.

    Returns (coords (N,4) [x,y,w,h], probs (N,K), polygons list[(Mi,2)]).
    Geometry contract matches the reference (run_inference.py:309-311):
    model_output = patch_px - 2*halo; slide sizes scaled by spacing/mpp.
    """
    import os

    cfg = engine.config
    model_output_size_px = cfg.patch_size_pixels - 2 * halo_size_px
    slide_patch_size = int(round(model_output_size_px * cfg.spacing_um_px / mpp))
    slide_halo_size = int(round(halo_size_px * cfg.spacing_um_px / mpp))

    # Banded streaming is the default cell engine: maps stay HBM-resident and
    # the host tail overlaps the forward stream (measured faster than the
    # host-canvas path on the bench host). WSINSIGHT_STREAM_CELLS=0 forces
    # the classic path; slides whose bands exceed the HBM budget — or the
    # engine's per-band instance cap — fall back automatically.
    if os.getenv("WSINSIGHT_STREAM_CELLS", "1") not in ("0", ""):
        from .stream_cells import (
            StreamingCapacityError,
            pick_num_flushers,
            run_streaming_cell_inference,
            streaming_fits,
        )

        n_flushers = pick_num_flushers(stitch_workers)
        if streaming_fits(
            slide_width, cfg.num_classes, slide_patch_size, num_flushers=n_flushers
        ):
            try:
                return run_streaming_cell_inference(
                    engine,
                    wsi_path=wsi_path,
                    patch_path=patch_path,
                    use_hdf5_images=use_hdf5_images,
                    slide_width=slide_width,
                    slide_height=slide_height,
                    mpp=mpp,
                    halo_size_px=halo_size_px,
                    batch_size=batch_size,
                    num_workers=num_workers,
                    min_object_size=min_object_size,
                    stitch_workers=stitch_workers,
                )
            except StreamingCapacityError as err:
                logger.warning(
                    f"streaming engine capacity exceeded ({err}); rerunning the"
                    " slide on the host-canvas path"
                )
        else:
            logger.info("banded streaming requested but bands exceed the HBM"
                        " budget; using the host-canvas path")

    stitcher = TileRemapStitcher(
        n_classes=cfg.num_classes,
        slide_width=slide_width,
        slide_height=slide_height,
        slide_patch_size=slide_patch_size,
        slide_halo_size=slide_halo_size,
        slide_mpp=mpp,
        model_mpp=cfg.spacing_um_px,
        min_object_size=min_object_size,
        transfer_dtype=None,  # quantized default: uint8 NP/TP + bf16 HV (see TileRemapStitcher); env-overridable
    )

    src = None
    try:
        src = PatchBatchSource(
            wsi_path=wsi_path,
            patch_path=patch_path,
            use_hdf5_images=use_hdf5_images,
            batch_size=engine.pad_batch(batch_size),
            num_threads=governed_workers(num_workers or 4),
            wire=_cell_wire(),
            decode_scale=1,  # cell models take full-res patches (no resize)
        )
        with tqdm.tqdm(
            total=src.num_batches, desc="Inference", position=1, leave=False
        ) as qbar:
            # One-deep software pipeline: jax dispatch is asynchronous, so the
            # forward + device post-process of batch i+1 runs on the chip while
            # batch i's resized maps transfer and scatter into the host canvases.
            pending = None  # (device maps, coords, n_valid)
            for batch in src:
                pred = engine.run_batch(batch.images)
                # Keep maps on device: the stitcher's jitted half (softmax,
                # resize, HV scaling) consumes them there; only the resized
                # maps cross to host, once per batch.
                pred = {k: v for k, v in pred.items() if k != "tissue_types"}
                maps = stitcher.device_postprocess(pred)
                if pending is not None:
                    stitcher.scatter(*pending)
                    qbar.update(1)
                pending = (maps, batch.coords, batch.n_valid)
            if pending is not None:
                stitcher.scatter(*pending)
                qbar.update(1)

        with tqdm.tqdm(desc="Stitching", position=1, leave=False) as qbar:
            inst, probs, polys = stitcher.finalize(pbar=qbar, num_workers=stitch_workers)
    finally:
        if src is not None:
            src.close()
        stitcher.close()

    if not inst:
        return np.zeros((0, 4), np.int32), np.zeros((0, cfg.num_classes), np.float32), []
    coords_arr = np.concatenate(inst, axis=0)
    probs_arr = np.concatenate(probs, axis=0)
    return coords_arr, probs_arr, polys
