"""Multi-host initialisation helpers.

The reference has no distributed story at all (SURVEY.md section 2.4); on
TPU pods the recipe is: ``jax.distributed.initialize()`` per host, build one
global mesh over all devices, shard batches by global position.  DCN only
carries the input pipeline; all tensor collectives ride ICI.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax

from .mesh import create_mesh

__all__ = ["initialize_multihost", "global_mesh", "host_local_batch_slice"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed (no-op on single-host / TPU pods where
    the runtime auto-detects)."""
    if jax.process_count() > 1:
        return  # already initialised by the runtime
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_mesh(axes: Dict[str, int]):
    """Mesh over ALL processes' devices (``jax.devices()`` is global)."""
    return create_mesh(axes)


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should feed (hosts load
    disjoint shards; jax.make_array_from_process_local_data assembles)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
