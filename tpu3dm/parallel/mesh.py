"""Device mesh and distributed-runtime helpers.

The reference has NO distributed layer (SURVEY.md §2.3 — single process,
single thread); this module is designed from scratch for TPU pods.  Axis
conventions used across the framework:

  - ``pair``  — data parallelism over cloud *pairs* (many registrations in
    flight; the throughput axis of BASELINE.json's cloud-pairs/sec metric).
  - ``block`` — the within-pair axis, reused by stage (the scaling-book
    pattern of one mesh axis serving multiple parallelism forms):
      * RANSAC: hypothesis parallelism — each device fits/scores a shard of
        the hypothesis batch, best-of elected with a psum/argmax collective;
      * NN search / ICP on huge clouds: spatial parallelism — target points
        sharded, ring-rotated with ppermute (ring_nn.py).

Collectives ride ICI within a slice; ``initialize_distributed`` wires up
multi-host (DCN) runs via jax.distributed.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PAIR_AXIS = "pair"
BLOCK_AXIS = "block"


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime (no-op for single-process runs).

    On TPU pods the arguments default from the environment
    (jax.distributed.initialize auto-detection).
    """
    if num_processes is not None and num_processes > 1 or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    n_pair: int | None = None,
    n_block: int | None = None,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(pair, block)`` mesh over the available devices.

    Defaults: all devices on the pair axis (pure DP).  ``n_pair * n_block``
    must cover the device count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_pair is None and n_block is None:
        n_pair, n_block = n, 1
    elif n_pair is None:
        n_pair = n // n_block
    elif n_block is None:
        n_block = n // n_pair
    if n_pair * n_block != n:
        raise ValueError(f"mesh {n_pair}x{n_block} != {n} devices")
    arr = np.asarray(devices).reshape(n_pair, n_block)
    return Mesh(arr, (PAIR_AXIS, BLOCK_AXIS))


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pair) axis; replicate within a pair."""
    return NamedSharding(mesh, P(PAIR_AXIS))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (point-block) axis within a pair group."""
    return NamedSharding(mesh, P(BLOCK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
