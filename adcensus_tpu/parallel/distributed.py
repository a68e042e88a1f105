"""Multi-host runtime glue (net-new vs the single-process reference —
SURVEY.md §5 "Distributed comm backend").

The compute path never talks to a network library directly: collectives
are XLA ops (`ppermute`/`all_to_all`/`all_gather`) emitted inside
``shard_map`` (parallel/sharded.py). This module owns process bring-up
and fail-fast validation around them.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from adcensus_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up multi-host JAX. Arguments default to the standard env
    variables (JAX_COORDINATOR_ADDRESS etc. / cloud-TPU auto-detect).
    Fail-fast: any inconsistency raises immediately rather than hanging
    the pod (the reference's analogue is its hard `return false` input
    guards, ADCensusStereo.cpp:71-76)."""
    if (num_processes is None) != (process_id is None):
        raise ValueError(
            "num_processes and process_id must be given together "
            f"(got num_processes={num_processes}, process_id={process_id})"
        )
    if num_processes is not None:
        if num_processes <= 0:
            raise ValueError(f"num_processes must be > 0, got {num_processes}")
        if not (0 <= process_id < num_processes):
            raise ValueError(
                f"process_id {process_id} out of range "
                f"[0, {num_processes})"
            )
    coord = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is not None and num_processes > 1 and not coord:
        raise ValueError(
            "multi-process initialization needs a coordinator_address "
            "(argument or JAX_COORDINATOR_ADDRESS)"
        )
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def pod_mesh(n_data: Optional[int] = None):
    """Mesh over every addressable chip in the pod slice: pairs (data)
    over hosts/DCN, row tiles over the intra-host chips/ICI."""
    n_dev = len(jax.devices())
    if n_data is None:
        n_data = max(1, jax.process_count())
    if n_dev % n_data:
        n_data = 1
    return make_mesh(n_data=n_data, n_tile=n_dev // n_data)
