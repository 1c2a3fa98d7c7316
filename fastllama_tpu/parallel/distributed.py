"""Multi-host initialization — the TPU-native "communication backend".

The reference has NO distributed layer (SURVEY §5: no NCCL/MPI/Gloo; its
"distribution" is a semaphore-driven thread pool).  On TPU pods the
idiomatic equivalent is ``jax.distributed.initialize`` + one global mesh:
every host runs the same program, XLA inserts ICI collectives within a
slice and DCN collectives across hosts, and failure semantics are
initialize-or-die (matching the reference's init-failure error flag,
threadparallel.hpp:249-252 — no elasticity, by design).

Usage (one process per host, e.g. under `gcloud compute tpus tpu-vm ssh
--worker=all`)::

    from fastllama_tpu.parallel import distributed
    distributed.initialize()                  # env-driven on Cloud TPU
    mesh = distributed.global_mesh("data=2,model=8")

On a single host this is a no-op and the mesh covers local devices, so the
same serving script runs anywhere.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from fastllama_tpu.parallel.sharding import make_mesh
from fastllama_tpu.utils.logging import log_info


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime.  On Cloud TPU all arguments are
    discovered from the metadata/env; pass them explicitly elsewhere
    (coordinator 'host:port', world size, rank).  Safe to call on a single
    host with no arguments outside a pod — it becomes a no-op."""
    if jax.process_count() > 1:
        return                                   # already initialized
    explicit = coordinator_address or num_processes or process_id is not None
    on_pod = any(k in os.environ for k in
                 ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                  "CLOUD_TPU_TASK_ID"))
    if not (explicit or on_pod):
        log_info("distributed.initialize: single-host run (no-op)")
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # backend already initialized (e.g. single-host run with pod-like
        # env vars): keep going single-process — matches calling it late
        # on one host, where there is nothing to join
        log_info(f"distributed.initialize skipped: {e}")
        return
    log_info(f"distributed: process {jax.process_index()}/"
             f"{jax.process_count()}, {jax.device_count()} global devices "
             f"({jax.local_device_count()} local)")


def global_mesh(spec: str = ""):
    """Mesh over ALL processes' devices.  Convention: put the 'data' axis
    outermost so it maps to DCN (host boundaries) and 'model' rides ICI —
    weights all-gather/reduce-scatter never cross hosts."""
    return make_mesh(spec, jax.devices())
