"""Multi-host launch: process-group init + global mesh construction.

SURVEY.md §2.8 / BASELINE north star: scale 1 chip -> 1 host -> N hosts. On a
TPU pod slice each host runs the same program; jax.distributed wires the
processes together and `jax.devices()` then spans the whole slice. The mesh
layout below puts the 'model' (TP) axis on intra-host chips — collectives ride
ICI — and the 'data' (DP) axis across hosts over DCN, the standard placement
(scaling-book recipe: TP inside the fast domain, DP outside).

Typical pod usage (same command on every host):

    from mi_optimize_tpu.parallel import launch
    launch.initialize_multihost()          # no-op on single-process setups
    mesh = launch.global_mesh(n_model=4)   # 4-way TP per host, DP across rest
    model = shard_model(model, mesh)
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX process group.

    With no arguments, relies on the TPU environment's auto-bootstrap
    (GKE/queued-resources set the coordinator env vars). Safe to call on a
    single process — it logs and returns.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        log.info("jax.distributed initialized: process %d/%d, %d global devices",
                 jax.process_index(), jax.process_count(), len(jax.devices()))
    except Exception as e:  # single-host / unsupported backend
        log.info("multi-host init skipped (%s); continuing single-process", e)


def global_mesh(n_model: Optional[int] = None) -> Mesh:
    """('data','model') mesh over ALL devices in the job.

    n_model defaults to the local device count, so tensor parallelism stays
    within each host's ICI domain and data parallelism spans hosts (DCN).
    """
    devices = jax.devices()
    if n_model is None:
        n_model = jax.local_device_count()
    n_model = min(n_model, len(devices))
    if len(devices) % n_model:
        raise ValueError(f"{len(devices)} devices not divisible by n_model={n_model}")
    n_data = len(devices) // n_model
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def per_host_batch_slice(global_batch: int) -> slice:
    """The rows of a global batch this host should feed (DP across hosts)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
