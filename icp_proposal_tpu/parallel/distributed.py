"""Multi-host initialization and chain partitioning.

The reference is single-process (SURVEY §5.8).  This module is the
multi-host entry: ``jax.distributed`` initialization, a global chain mesh
over all devices of a slice, and per-host chain allocation — chains never
communicate during stepping, so DCN traffic is limited to the pooled
diagnostics in ``runner.py`` and final gathers.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def raise_cpu_collective_timeouts(warn: int = 600, terminate: int = 1200) -> None:
    """On a virtual CPU mesh the device "threads" timeshare the physical
    cores, so shards can reach a pooled-diagnostics all-reduce minutes
    apart on small hosts; XLA's CPU rendezvous kills the process after 40 s
    of skew by default.  Must run BEFORE the backend initializes (the flags
    are parsed at backend creation)."""
    flags = os.environ.get("XLA_FLAGS", "")
    for f in (
        f"--xla_cpu_collective_call_warn_stuck_timeout_seconds={warn}",
        f"--xla_cpu_collective_call_terminate_timeout_seconds={terminate}",
    ):
        if f.split("=")[0] not in flags:
            flags += " " + f
    os.environ["XLA_FLAGS"] = flags.strip()


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (no-op on a single host with no coordinator configured)."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def global_chain_mesh(axis_name: str = "chains"):
    """Mesh over ALL devices in the (possibly multi-host) slice."""
    import numpy as np

    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def chains_for_host(total_chains: int) -> int:
    """Chains this host should initialize (global batch is sharded evenly)."""
    n = jax.process_count()
    base = total_chains // n
    extra = 1 if jax.process_index() < total_chains % n else 0
    return base + extra
