"""Batched sharded inference over precomputed patches -> model-output CSVs.

TPU-native re-design of the reference engine (reference:
wsinsight/modellib/run_inference.py:45-738):

* torch Dataset/DataLoader/DataParallel -> threaded uint8 decode
  (engine/data.py) + one jitted step (preprocess -> forward -> softmax) with
  batch sharded over a 1-D device mesh,
* per-patch CPU transforms -> fused on-device resize/normalize/stain
  (ops/preprocess.py, ops/stain.py),
* device pick: WSINFER_FORCE_CPU env honored (reference: :151-160),
* branches preserved: patch classification (default), QuPath TSV / GeoJSON
  pseudo-models, object-based end2end (CellViT -> stitcher), references-dir
  overlay (with the annot_prob_* values actually filled — the reference left
  them NaN, SURVEY.md §2.11),
* resume: slides with existing CSVs are skipped (reference: :219-225),
* output CSV columns: minx,miny,width,height,prob_<class>... (reference:
  :568-607).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import List

import h5py
import numpy as np
import pandas as pd
import tqdm

from .. import errors
from ..uri_path import URIPath
from ..wsi import _validate_wsi_directory
from ..zoo import ModelHandle
from ..utils.workers import governed_workers
from .data import PatchBatchSource

logger = logging.getLogger(__name__)

EPSILON = 1e-8
I_0 = 255


class ClassifierEngine:
    """Jitted (preprocess -> forward -> probs) step, batch-sharded on a mesh."""

    def __init__(
        self,
        model_info: ModelHandle,
        mixed_precision: bool = False,
        w_est: np.ndarray | None = None,
        w_def: np.ndarray | None = None,
        max_devices: int | None = None,
    ):
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
        self.jax = jax
        cfg = model_info.config
        compute_dtype = jnp.bfloat16 if mixed_precision else jnp.float32
        self.model = create_model(cfg.architecture, cfg.num_classes, dtype=compute_dtype)
        self.params = model_info.load_flax_params()
        self.spec = TransformSpec.from_config(cfg.transform)
        if mixed_precision:
            # Speed mode: the bit-exact resize runs int32 accumulation off the
            # MXU; use the f32 matmul path instead (<=1 uint8 level of drift).
            self.spec = dataclasses.replace(self.spec, exact_resize=False)
        preprocess = make_preprocess_fn(self.spec, compute_dtype)
        # Fused Pallas preprocess: resize + normalize in one VMEM pass
        # (measured 12,407 -> 14,077 patches/s on the bf16 v5e path, +13%).
        # Default ON wherever its f32-weight resize already IS the contract
        # (mixed precision relaxes the bit-exact int32 resize above);
        # WSINSIGHT_PALLAS_PREPROCESS=1 forces it for the parity path too
        # (<=1 uint8 level of resize drift), =0 disables everywhere.
        pallas_env = os.getenv("WSINSIGHT_PALLAS_PREPROCESS", "")
        use_pallas = (
            pallas_env not in ("0",) if pallas_env else not self.spec.exact_resize
        )
        if use_pallas:
            from ..ops.pallas_preprocess import make_fused_preprocess_fn

            fused = make_fused_preprocess_fn(
                self.spec if not self.spec.exact_resize
                else dataclasses.replace(self.spec, exact_resize=False)
            )
            if fused is not None:
                base = fused
                preprocess = lambda x: base(x).astype(compute_dtype)  # noqa: E731

        self.mesh = get_data_mesh(max_devices)
        self.n_devices = self.mesh.devices.size
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)
        self.params = jax.device_put(self.params, self._replicated)

        self._use_stain = w_est is not None and w_def is not None
        # Stain matrices are runtime ARGUMENTS, not closure constants: they
        # differ per slide (Macenko is estimated per slide), and baking them
        # into the graph would force a recompile for every slide.
        self._w_est = jnp.asarray(w_est, jnp.float32) if self._use_stain else jnp.eye(3)
        self._w_def = jnp.asarray(w_def, jnp.float32) if self._use_stain else jnp.eye(3)
        use_stain = self._use_stain

        # Matmul/conv precision: "high" (3-pass bf16, ~f32 accuracy at ~2x the
        # MXU rate of 6-pass "float32") for parity with the torch reference —
        # measured max |dlogit| 2.1e-6 on ResNet34@224 vs torch f32 (1e-3
        # budget; "float32" measures 1.6e-7, single-pass "default" 7e-4).
        # mixed_precision opts into the bf16 fast path (the reference exposes
        # the same trade via autocast, run_inference.py:446-456).
        # WSINSIGHT_PRECISION overrides.
        precision = os.getenv(
            "WSINSIGHT_PRECISION", "default" if mixed_precision else "high"
        )

        def step(params, batch_u8, w_est_arr, w_def_arr):
            with jax.default_matmul_precision(precision):
                if batch_u8.ndim == 3:
                    # Planar YUV 4:2:0 wire (B, H*3/2, W): the thin-link
                    # format (WSINSIGHT_WIRE=yuv420) — reconstruct RGB on
                    # device. Rank makes the format self-describing, so a
                    # source that fell back to RGB (odd dims) still works.
                    from ..ops.preprocess import yuv420_to_rgb

                    x = yuv420_to_rgb(batch_u8)
                else:
                    x = batch_u8.astype(jnp.float32)
                if use_stain:
                    from ..ops.stain import deconvolution_based_normalization

                    x = deconvolution_based_normalization(x + EPSILON, w_est_arr, w_def_arr)
                    # The reference round-trips through uint8 PIL (data.py:300).
                    x = jnp.clip(jnp.round(x), 0.0, 255.0)
                x = preprocess(x.astype(jnp.uint8))
                logits = self.model.apply({"params": params}, x)
                if logits.ndim > 1 and logits.shape[1] > 1:
                    return jax.nn.softmax(logits, axis=1)
                return jax.nn.sigmoid(logits[:, 0])[:, None]

        self._step = jax.jit(
            step,
            in_shardings=(self._replicated, self._batch_sharding, self._replicated, self._replicated),
            out_shardings=self._replicated,
        )

    def set_stains(self, w_est: np.ndarray, w_def: np.ndarray) -> None:
        """Swap the per-slide Macenko matrices without retracing."""
        import jax.numpy as jnp

        assert self._use_stain, "engine was built without stain normalization"
        self._w_est = jnp.asarray(w_est, jnp.float32)
        self._w_def = jnp.asarray(w_def, jnp.float32)

    def pad_batch(self, n: int) -> int:
        """Global batch size: requested size rounded up to the device count."""
        d = self.n_devices
        return -(-n // d) * d

    def run_batch(self, images_u8: np.ndarray, n_valid: int) -> np.ndarray:
        probs = self._step(self.params, images_u8, self._w_est, self._w_def)
        return np.asarray(probs)[:n_valid]

    def dispatch(self, images_u8):
        """Async dispatch: returns the device array without blocking, so the
        next batch's host decode + transfer overlaps this batch's compute."""
        return self._step(self.params, images_u8, self._w_est, self._w_def)

    def put(self, images_u8: np.ndarray):
        """Async host->device transfer onto the batch sharding (returns
        immediately; the jit step accepts the committed array without a second
        transfer). Pairs with PatchBatchSource.device_prefetch."""
        import jax

        return jax.device_put(images_u8, self._batch_sharding)


def _one_hot_probs(indexer: np.ndarray, n: int, k: int) -> np.ndarray:
    probs = np.zeros((n, k), dtype=np.float32)
    valid = indexer >= 0
    probs[np.nonzero(valid)[0], indexer[valid]] = 1.0
    return probs


def _norm_names(series: pd.Series) -> pd.Series:
    return series.str.strip().str.replace(" ", "_").str.lower()


def _parse_geojson_rows(slide_geojson, qupath_name_as_class: bool):
    """(centroid, class-name, objectType) per polygon feature of a QuPath
    GeoJSON export; multi-part geometries use their first exterior ring."""
    from ..geometry import polygon_centroid

    feats = json.loads(slide_geojson.read_text()).get("features", [])
    rows, names, obj_types = [], [], []
    for feat in feats:
        geom = feat.get("geometry") or {}
        props = feat.get("properties") or {}
        coords_list = geom.get("coordinates") or []
        if geom.get("type") == "Polygon" and coords_list:
            ring = np.asarray(coords_list[0], dtype=np.float64)
        elif geom.get("type") == "MultiPolygon" and coords_list:
            ring = np.asarray(coords_list[0][0], dtype=np.float64)
        else:
            continue
        cx, cy = polygon_centroid(ring)
        rows.append((cx, cy))
        cls = props.get("classification")
        names.append(
            props.get("name")
            if qupath_name_as_class
            else (cls.get("name") if isinstance(cls, dict) else cls)
        )
        obj_types.append(props.get("objectType", ""))
    return rows, names, obj_types


def run_inference(
    wsi_dir: URIPath | None,
    slide_paths: List[URIPath] | None,
    results_dir: URIPath,
    references_dir: str | URIPath | None = None,
    qupath_detection_dir: str | URIPath | None = None,
    qupath_geojson_detection_dir: str | URIPath | None = None,
    qupath_geojson_annotation_dir: str | URIPath | None = None,
    qupath_name_as_class: bool = False,
    model_info: ModelHandle | None = None,
    halo_size_px: int = 46,
    batch_size: int = 32,
    num_workers: int = 4,
    speedup: bool = False,
    stain_normalization: bool = False,
    object_based: bool = False,
    object_detection: str | None = None,
    mixed_precision: bool = False,
    stitch_workers: int | None = None,
) -> tuple[list[str], list[str]]:
    """Run batched inference on precomputed patches; emit per-slide CSVs.

    Returns (failed_patching, failed_inference) slide-stem lists
    (reference: run_inference.py:45-105).
    """
    from ..parallel.mesh import force_cpu_if_requested

    force_cpu_if_requested()

    # `speedup` is the CLI's name for the bf16 fast path; API callers get the
    # same semantics the CLI pre-folds at cli/infer.py:255.
    mixed_precision = mixed_precision or speedup

    if wsi_dir:
        if not wsi_dir.exists():
            raise errors.WholeSlideImageDirectoryNotFound(f"directory not found: {wsi_dir}")
        _validate_wsi_directory(wsi_dir)
    if not results_dir.exists():
        raise errors.ResultsDirectoryNotFound(str(results_dir))

    patch_dir = results_dir / "patches"
    if not patch_dir.exists():
        raise errors.PatchDirectoryNotFound(
            "The 'patches' directory was not found in results directory. This can"
            " happen for a few reasons: 1) no tissue was detected in the slides,"
            " 2) the physical spacing (MPP) could not be read from any of the"
            " slides, or 3) something else... Please read the logs above for"
            " potential errors."
        )
    patch_paths = [p for p in patch_dir.iterdir() if p.is_file()]
    if slide_paths:
        stems = {s.stem for s in slide_paths}
        patch_paths = [p for p in patch_paths if p.stem in stems]

    # Multi-host fan-out: shard slides round-robin across jax processes
    # (SURVEY.md §5 — per-slide sharding over DCN; no collectives needed).
    from ..parallel.multihost import maybe_initialize_distributed, shard_slides_for_host

    if maybe_initialize_distributed():
        patch_paths = shard_slides_for_host(sorted(patch_paths))

    model_output_dir = results_dir / "model-outputs-csv"
    model_output_dir.mkdir(exist_ok=True)

    is_pseudo = (
        qupath_detection_dir is not None
        or qupath_geojson_detection_dir is not None
        or qupath_geojson_annotation_dir is not None
    )

    failed_patching = [p.stem for p in patch_paths if not p.exists()]
    failed_inference: list[str] = []

    engine: ClassifierEngine | None = None
    cell_engine = None

    # Cross-slide overlap: while slide i drains, a background thread opens
    # slide i+1's patch source and STARTS its decode producer, so the first
    # batches are already in the prefetch queue when its turn comes (the
    # reference pays a cold DataLoader spin-up per slide instead,
    # run_inference.py:288-299). Only plain classification slides prefetch —
    # stain estimation and pseudo-models need per-slide setup first.
    import threading as _threading

    _prefetch_lock = _threading.Lock()
    _prefetched: dict[str, tuple] = {}

    def _spawn_source_prefetch(
        next_patch_path, eng, num_workers_, batch_size_, host_resize_, wire_=None
    ):
        def work():
            src = None
            try:
                local = (
                    next_patch_path.materialize()
                    if isinstance(next_patch_path, URIPath)
                    else next_patch_path
                )
                with h5py.File(local, "r") as f:
                    use_imgs = "/images" in f
                    nxt_wsi = URIPath(f["/slide"].attrs["slide_path"])
                if (model_output_dir / nxt_wsi.with_suffix(".csv").name).exists():
                    return
                src = PatchBatchSource(
                    wsi_path=nxt_wsi,
                    patch_path=next_patch_path,
                    use_hdf5_images=use_imgs,
                    batch_size=eng.pad_batch(batch_size_),
                    num_threads=governed_workers(num_workers_ or 4),
                    host_resize=host_resize_,
                    wire=wire_,
                )
                it = iter(src)  # starts the producer thread
                with _prefetch_lock:
                    _prefetched[str(next_patch_path)] = (src, it)
            except Exception:
                if src is not None:
                    src.close()

        _threading.Thread(target=work, daemon=True).start()

    from ..utils.profiling import maybe_trace

    with maybe_trace("inference"), tqdm.tqdm(
        total=len(patch_paths), desc="Images", position=0
    ) as pbar:
        for slide_idx, patch_path in enumerate(patch_paths):
            local_h5 = patch_path.materialize() if isinstance(patch_path, URIPath) else patch_path
            with h5py.File(local_h5, "r") as f:
                use_hdf5_images = "/images" in f
                g_slide = f["/slide"]
                wsi_path = URIPath(g_slide.attrs["slide_path"])
                mpp = float(g_slide.attrs["slide_mpp"])
                slide_width = int(g_slide.attrs["slide_width"])
                slide_height = int(g_slide.attrs["slide_height"])

            slide_csv_name = wsi_path.with_suffix(".csv").name
            slide_csv = model_output_dir / slide_csv_name
            if slide_csv.exists():
                print("Output CSV exists... skipping.")
                print(slide_csv)
                pbar.update(1)
                continue

            slide_superior_structure = None

            if object_based and qupath_detection_dir is not None and not (
                qupath_geojson_detection_dir or qupath_geojson_annotation_dir
            ):
                # QuPath TSV pseudo-model (reference: :318-357).
                cfg = model_info.config
                slide_det = URIPath(qupath_detection_dir) / wsi_path.with_suffix(".txt").name
                if not slide_det.exists():
                    failed_inference.append(wsi_path.stem)
                    pbar.update(1)
                    continue
                try:
                    qpdet_df = pd.read_csv(slide_det.materialize(), delimiter="\t")
                    half = round(cfg.patch_size_pixels / 2)
                    x = np.rint(qpdet_df["Centroid X µm"] / mpp - half).astype(np.int32)
                    y = np.rint(qpdet_df["Centroid Y µm"] / mpp - half).astype(np.int32)
                    coords_arr = np.column_stack(
                        [x, y, np.full_like(x, cfg.patch_size_pixels), np.full_like(y, cfg.patch_size_pixels)]
                    )
                    det_mask = (qpdet_df["Object type"] == "Detection") | (
                        qpdet_df["Object type"] == "Cell"
                    )
                    col = "Name" if qupath_name_as_class else "Classification"
                    # Index over ALL rows, masking non-detections to -1, so
                    # probs stay row-aligned with coords. The reference
                    # indexes the det_mask SUBSET but scatters its positions
                    # into the full-length probs (run_inference.py:342-353),
                    # shifting every class one row up past a non-Detection
                    # row — silent output corruption we do not reproduce
                    # (same rule as the GeoJSON branch below).
                    indexer = pd.Index(cfg.class_names).get_indexer(
                        _norm_names(qpdet_df[col])
                    )
                    indexer = np.where(det_mask.to_numpy(), indexer, -1)
                    probs_arr = _one_hot_probs(indexer, len(qpdet_df), len(cfg.class_names))
                    slide_superior_structure = qpdet_df["Parent"]
                except Exception as err:
                    # one malformed TSV (e.g. missing Name column under
                    # --qupath-name-as-class) must not kill the cohort
                    logger.error(f"QuPath TSV parse failed for {wsi_path}", exc_info=err)
                    failed_inference.append(wsi_path.stem)
                    pbar.update(1)
                    continue

            elif object_based and qupath_geojson_detection_dir is not None and not (
                qupath_detection_dir or qupath_geojson_annotation_dir
            ):
                # QuPath GeoJSON pseudo-model (reference: :359-416).
                cfg = model_info.config
                slide_geojson = (
                    URIPath(qupath_geojson_detection_dir) / wsi_path.with_suffix(".geojson").name
                )
                if not slide_geojson.exists():
                    failed_inference.append(wsi_path.stem)
                    pbar.update(1)
                    continue
                half = round(cfg.patch_size_pixels / 2)
                rows, names, obj_types = _parse_geojson_rows(
                    slide_geojson, qupath_name_as_class
                )
                if not rows:
                    failed_inference.append(wsi_path.stem)
                    pbar.update(1)
                    continue
                centers = np.asarray(rows)
                x = np.rint(centers[:, 0] / mpp - half).astype(np.int32)
                y = np.rint(centers[:, 1] / mpp - half).astype(np.int32)
                coords_arr = np.column_stack(
                    [x, y, np.full_like(x, cfg.patch_size_pixels), np.full_like(y, cfg.patch_size_pixels)]
                )
                name_series = pd.Series([n if n is not None else "" for n in names])
                indexer = pd.Index(cfg.class_names).get_indexer(_norm_names(name_series))
                keep = np.isin(np.array(obj_types), ["detection", "cell"])
                indexer = np.where(keep, indexer, -1)
                probs_arr = _one_hot_probs(indexer, len(centers), len(cfg.class_names))

            elif qupath_geojson_annotation_dir is not None:
                # QuPath GeoJSON ANNOTATION pseudo-model: one row per
                # annotation region, one-hot by its class name. The reference
                # declares this mode (cli/infer.py:967-1024 builds the pseudo
                # model with object_based=False) but its run_inference branch
                # is an empty stub (run_inference.py:419-429) that falls
                # through to the CSV writer with unbound/stale arrays — we
                # complete the branch with the detection-GeoJSON semantics,
                # filtered to annotation features.
                cfg = model_info.config
                slide_geojson = (
                    URIPath(qupath_geojson_annotation_dir)
                    / wsi_path.with_suffix(".geojson").name
                )
                if not slide_geojson.exists():
                    failed_inference.append(wsi_path.stem)
                    pbar.update(1)
                    continue
                half = round(cfg.patch_size_pixels / 2)
                rows, names, obj_types = _parse_geojson_rows(
                    slide_geojson, qupath_name_as_class
                )
                if not rows:
                    failed_inference.append(wsi_path.stem)
                    pbar.update(1)
                    continue
                centers = np.asarray(rows)
                x = np.rint(centers[:, 0] / mpp - half).astype(np.int32)
                y = np.rint(centers[:, 1] / mpp - half).astype(np.int32)
                coords_arr = np.column_stack(
                    [x, y, np.full_like(x, cfg.patch_size_pixels),
                     np.full_like(y, cfg.patch_size_pixels)]
                )
                name_series = pd.Series([n if n is not None else "" for n in names])
                indexer = pd.Index(cfg.class_names).get_indexer(_norm_names(name_series))
                # QuPath exports annotations with objectType "annotation";
                # accept missing objectType for hand-rolled files.
                keep = np.isin(np.array(obj_types), ["annotation", ""])
                indexer = np.where(keep, indexer, -1)
                probs_arr = _one_hot_probs(indexer, len(centers), len(cfg.class_names))

            elif object_based and object_detection == "end2end":
                # CellViT/HoVer-Net single-cell path (reference: :431-535).
                from .cells import run_cell_inference

                if cell_engine is None:
                    from .cells import CellEngine

                    cell_engine = CellEngine(
                        model_info, mixed_precision=mixed_precision
                    )
                try:
                    coords_arr, probs_arr, polys = run_cell_inference(
                        cell_engine,
                        wsi_path=wsi_path,
                        patch_path=patch_path,
                        use_hdf5_images=use_hdf5_images,
                        slide_width=slide_width,
                        slide_height=slide_height,
                        mpp=mpp,
                        halo_size_px=halo_size_px,
                        batch_size=batch_size,
                        num_workers=num_workers,
                        stitch_workers=stitch_workers,
                    )
                except Exception as err:
                    logger.error(f"cell inference failed for {wsi_path}", exc_info=err)
                    failed_inference.append(wsi_path.stem)
                    pbar.update(1)
                    continue
                if polys is not None and len(polys) > 0:
                    from ..patchlib.io import write_polygons_group

                    with patch_path.open("rb+" if patch_path.exists() else "wb+") as fh:
                        with h5py.File(fh, "a") as f:
                            write_polygons_group(f, polys, f["/coords"].compression)

            else:
                # Default patch-classification branch (reference: :537-558).
                w_est = w_def = None
                if stain_normalization:
                    from ..ops.stain import default_target_stains, estimate_stains_from_batch

                    try:
                        sample_src = PatchBatchSource(
                            wsi_path=wsi_path,
                            patch_path=patch_path,
                            use_hdf5_images=use_hdf5_images,
                            batch_size=min(256, 256),
                            num_threads=governed_workers(num_workers or 4),
                            shuffle_seed=0,
                        )
                        sample = next(iter(sample_src))
                        sample_src.close()
                        w_est = estimate_stains_from_batch(sample.images[: sample.n_valid])
                        w_def = default_target_stains()
                    except Exception as err:
                        logger.error(f"stain estimation failed for {wsi_path}", exc_info=err)
                        failed_inference.append(wsi_path.stem)
                        pbar.update(1)
                        continue

                if engine is None:
                    engine = ClassifierEngine(
                        model_info,
                        mixed_precision=mixed_precision,
                        w_est=w_est,
                        w_def=w_def,
                    )
                elif stain_normalization:
                    # Same compiled step across slides; only the Macenko
                    # matrices (runtime args) change per slide.
                    engine.set_stains(w_est, w_def)
                # WSINSIGHT_HOST_RESIZE=1 moves the (downscaling) resize into
                # the decode threads — the reference's own CPU placement — to
                # cut host->device bytes on hosts with a thin transfer link.
                # The device's fixed-point resize is bit-exact PIL, so the
                # probabilities are unchanged. Skipped under stain
                # normalization, which must see the un-resized patch first
                # (reference order: decode -> stain -> transform).
                host_resize = None
                if (
                    os.getenv("WSINSIGHT_HOST_RESIZE", "0") not in ("0", "")
                    and not stain_normalization
                    and engine.spec.size is not None
                ):
                    host_resize = engine.spec.size
                # WSINSIGHT_WIRE=yuv420: ship patches as planar YUV 4:2:0
                # (1.5 B/px) and reconstruct on device — for hosts whose
                # device link bounds the pipeline. Opt-in (chroma is lossy);
                # the stain SAMPLE below always reads the exact RGB wire
                # because Macenko estimation runs on host pixels.
                wire = (
                    "yuv420"
                    if os.getenv("WSINSIGHT_WIRE", "").lower() == "yuv420"
                    else None
                )
                with _prefetch_lock:
                    pre = _prefetched.pop(str(patch_path), None)
                src_iter = None
                if pre is not None:
                    src, src_iter = pre
                else:
                    try:
                        src = PatchBatchSource(
                            wsi_path=wsi_path,
                            patch_path=patch_path,
                            use_hdf5_images=use_hdf5_images,
                            batch_size=engine.pad_batch(batch_size),
                            num_threads=governed_workers(num_workers or 4),
                            host_resize=host_resize,
                            wire=wire,
                        )
                    except Exception as err:
                        logger.error(f"could not open patches for {wsi_path}", exc_info=err)
                        failed_inference.append(wsi_path.stem)
                        pbar.update(1)
                        continue
                # overlap: start the NEXT slide's source while this one runs
                if (
                    not is_pseudo
                    and not object_based
                    and not stain_normalization
                    and slide_idx + 1 < len(patch_paths)
                ):
                    _spawn_source_prefetch(
                        patch_paths[slide_idx + 1],
                        engine,
                        num_workers,
                        batch_size,
                        host_resize,
                        wire,
                    )

                slide_coords: list[np.ndarray] = []
                slide_probs: list[np.ndarray] = []
                # Two-deep pipeline: dispatch batch i+1 before fetching batch
                # i's probabilities, so decode/H2D overlaps device compute.
                from collections import deque

                pending: deque = deque()
                with tqdm.tqdm(total=src.num_batches, position=1, leave=False) as qbar:
                    for batch in src.device_prefetch(engine.put, depth=2, it=src_iter):
                        pending.append(
                            (engine.dispatch(batch.images), batch.n_valid, batch.coords)
                        )
                        if len(pending) > 2:
                            out, n_valid, coords = pending.popleft()
                            slide_probs.append(np.asarray(out)[:n_valid])
                            slide_coords.append(coords[:n_valid])
                            qbar.update(1)
                    while pending:
                        out, n_valid, coords = pending.popleft()
                        slide_probs.append(np.asarray(out)[:n_valid])
                        slide_coords.append(coords[:n_valid])
                        qbar.update(1)
                src.close()
                coords_arr = np.concatenate(slide_coords, axis=0)
                probs_arr = np.concatenate(slide_probs, axis=0)

            if len(coords_arr) == 0:
                pbar.update(1)
                continue

            slide_df = pd.DataFrame(
                dict(
                    minx=coords_arr[:, 0],
                    miny=coords_arr[:, 1],
                    width=coords_arr[:, 2],
                    height=coords_arr[:, 3],
                )
            )
            prob_colnames = [f"prob_{c}" for c in model_info.config.class_names]
            slide_df.loc[:, prob_colnames] = probs_arr
            if slide_superior_structure is not None:
                slide_df.loc[:, "qupath_detection_parent"] = slide_superior_structure

            if references_dir is not None and object_based:
                _apply_references_overlay(slide_df, URIPath(references_dir), slide_csv_name)

            with slide_csv.open("w") as fh:
                slide_df.to_csv(fh, index=False)
            pbar.update(1)

    # Close any lookahead sources whose slide was skipped/failed after the
    # prefetch was issued (their producer threads park on the bounded queue).
    with _prefetch_lock:
        for leftover_src, _ in _prefetched.values():
            leftover_src.close()
        _prefetched.clear()

    return failed_patching, failed_inference


def _apply_references_overlay(
    slide_df: pd.DataFrame, references_dir: URIPath, slide_csv_name: str
) -> None:
    """Point-in-box overlay of a prior run's tile CSV onto per-cell rows.

    Chunked, vectorized containment + largest-area tie-break (reference:
    run_inference.py:613-729). Unlike the reference — whose value-fill lines
    were commented out, leaving annot_prob_* always NaN (SURVEY.md §2.11) —
    the matched tile probabilities are actually written.
    """
    annot_csv = references_dir / "model-outputs-csv" / slide_csv_name
    annot_df = pd.read_csv(
        annot_csv.materialize() if isinstance(annot_csv, URIPath) else annot_csv,
        engine="c",
        low_memory=False,
    )
    cx = (slide_df["minx"] + slide_df["width"] * 0.5).to_numpy()
    cy = (slide_df["miny"] + slide_df["height"] * 0.5).to_numpy()

    ax0 = annot_df["minx"].to_numpy()
    ay0 = annot_df["miny"].to_numpy()
    ax1 = (annot_df["minx"] + annot_df["width"]).to_numpy()
    ay1 = (annot_df["miny"] + annot_df["height"]).to_numpy()
    area = (annot_df["width"] * annot_df["height"]).to_numpy()
    prob_cols = [c for c in annot_df.columns if c.startswith("prob_")]
    probs_mat = annot_df[prob_cols].to_numpy(dtype=np.float32)

    n_points = len(slide_df)
    for c in prob_cols:
        slide_df["annot_prob_" + c] = np.nan

    chunk = max(1000, min(200_000 // max(1, len(annot_df) // 1000 + 1), n_points or 1))
    for s in range(0, n_points, chunk):
        e = min(n_points, s + chunk)
        mask = (
            (cx[s:e, None] >= ax0[None, :])
            & (cx[s:e, None] <= ax1[None, :])
            & (cy[s:e, None] >= ay0[None, :])
            & (cy[s:e, None] <= ay1[None, :])
        )
        has_hit = mask.any(axis=1)
        cand = np.where(mask, area[None, :], -np.inf)
        best = cand.argmax(axis=1)
        for j, c in enumerate(prob_cols):
            vals = np.full(e - s, np.nan, dtype=np.float32)
            vals[has_hit] = probs_mat[best[has_hit], j]
            slide_df.loc[slide_df.index[s:e], "annot_prob_" + c] = vals
