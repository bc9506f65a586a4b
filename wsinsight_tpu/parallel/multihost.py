"""Multi-host (pod-scale) execution helpers.

The reference is single-node only (SURVEY.md §2.8); the TPU-native scale-out
design is: ICI data-parallelism within a host via the 1-D mesh
(parallel/mesh.py), and DCN across hosts by sharding *slides* — inference is
embarrassingly parallel over patches and slides, per-shard CSVs are exact
because patch order is deterministic from the grid, so host-level fan-out
needs no collectives at all (SURVEY.md §5 "Distributed communication
backend").

Usage on a multi-host slice: call `maybe_initialize_distributed()` early
(reads the standard JAX coordinator env vars), then filter work with
`shard_slides_for_host(...)`. Every host runs the same CLI command against a
shared results directory; the per-slide resume contract makes retries and
stragglers idempotent.
"""

from __future__ import annotations

import os
from typing import Sequence, TypeVar

T = TypeVar("T")


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Controlled by the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or auto-detection on Cloud TPU pods.
    Returns True when running multi-process.
    """
    import jax

    if os.getenv("JAX_COORDINATOR_ADDRESS"):
        # Idempotence: the CLI entry initializes before any backend exists
        # (cli/cli.py); API callers may reach this a second time after
        # compute has run, when jax raises "must be called before any JAX
        # calls" rather than "already initialized" — so check the
        # distributed client directly instead of pattern-matching messages.
        try:
            from jax._src import distributed as _dist

            if getattr(_dist.global_state, "client", None) is not None:
                return jax.process_count() > 1
        except Exception:
            pass
        # jax.distributed.initialize() reads JAX_COORDINATOR_ADDRESS itself
        # but (as of this jax) NOT the process-count/id pair — pass those
        # explicitly from the same env contract.
        kwargs = {}
        if os.getenv("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.getenv("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as err:
            # "already initialized" is fine (idempotent callers); anything
            # else means every host would silently fall back to running the
            # WHOLE cohort (process_count 1) and race the shared results dir
            # — that must be loud, not a pass.
            if "already initialized" not in str(err).lower():
                raise RuntimeError(
                    "jax.distributed.initialize() failed with a coordinator"
                    f" configured (JAX_COORDINATOR_ADDRESS set): {err}. Refusing"
                    " to degrade to independent single-host runs against a"
                    " shared results directory."
                ) from err
    return jax.process_count() > 1


def process_info() -> tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def shard_slides_for_host(items: Sequence[T]) -> list[T]:
    """Deterministic round-robin shard of the slide list for this host."""
    idx, count = process_info()
    if count <= 1:
        return list(items)
    return [item for i, item in enumerate(items) if i % count == idx]
