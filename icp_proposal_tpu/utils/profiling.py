"""Profiling / tracing utilities.

The reference's tracing is wall-clock prints (``ICP-Timing: N sec``,
``IcpProposalRegistration.scala:41-46``; SURVEY §5.1).  Here: the same
coarse timers plus XLA-profiler trace capture and a samples/s counter —
per-kernel timing comes from the captured trace (view with TensorBoard or
xprof)."""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def wall_timer(tag: str = "ICP", verbose: bool = True):
    """Reference-style coarse timing print: ``ICP-Timing: N sec``."""
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        holder["seconds"] = time.perf_counter() - t0
        if verbose:
            print(f"{tag}-Timing: {holder['seconds']} sec")


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace around a block (per-kernel timings)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputCounter:
    """Streaming samples/s/chip counter for chain drivers."""

    def __init__(self, n_devices: int = 1):
        self.n_devices = n_devices
        self.t0 = time.perf_counter()
        self.samples = 0

    def add(self, n: int):
        self.samples += n

    @property
    def samples_per_sec(self) -> float:
        return self.samples / max(time.perf_counter() - self.t0, 1e-9)

    @property
    def samples_per_sec_per_chip(self) -> float:
        return self.samples_per_sec / self.n_devices


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache: warm starts skip the ~7-minute
    cold compile of the flagship program on the tunneled TPU (VERDICT r2
    bench-rigor item).  Call before the first jit executes."""
    import os

    import jax

    cache_dir = cache_dir or os.environ.get(
        "ICP_TPU_COMPILE_CACHE", "/root/repo/.jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
