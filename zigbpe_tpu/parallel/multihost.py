"""Multi-host runtime helpers.

The reference is a single process (SURVEY.md §2.2). For pod-slice training
the framework uses JAX's single-controller-per-host SPMD model: every host
calls :func:`initialize`, loads only its contiguous corpus slice
(utils/fileio.host_slice), and runs the same data-parallel chunk
(parallel/train_dp) over a global mesh; selection verifies candidate pairs
with exact integer psums over ICI within a host and DCN across hosts, and
the merge table + upper-bound table stay replicated — so merges are
bit-identical to single-host runs (SURVEY.md §7 stage 4).

This module cannot be exercised on single-host CI; it is covered by the
multi-chip dry run (virtual device mesh) plus these thin, testable shims.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed from explicit args or the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    No-op when running single-process."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info():
    """(process_id, process_count) of this host."""
    return jax.process_index(), jax.process_count()


def global_data_mesh():
    """A ('data',) mesh over every device in the job (all hosts)."""
    from .train_dp import data_mesh

    return data_mesh(jax.devices())
