"""Throughput metrics + structured logging (SURVEY.md §6 aux subsystems).

The reference's observability is timestamped stderr progress lines; here
every pass reports wall time and reads/s (the driver's metric) through a
structured logger that emits either human lines or JSON records.
"""

from __future__ import annotations

import json
import sys
import time


class Metrics:
    def __init__(self, stream=None, as_json: bool = False):
        self.stream = stream or sys.stderr
        self.as_json = as_json
        self.records: list[dict] = []

    def event(self, name: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": name, **fields}
        self.records.append(rec)
        if self.as_json:
            self.stream.write(json.dumps(rec) + "\n")
        else:
            kv = " ".join(f"{k}={v}" for k, v in fields.items())
            self.stream.write(
                f"[kbbq-tpu {time.strftime('%H:%M:%S')}] {name} {kv}\n")
        self.stream.flush()

    def pass_timer(self, name: str, num_reads: int):
        return _PassTimer(self, name, num_reads)


class _PassTimer:
    def __init__(self, metrics: Metrics, name: str, num_reads: int):
        self.metrics = metrics
        self.name = name
        self.num_reads = num_reads

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        self.metrics.event(
            self.name, wall_s=round(dt, 3),
            reads_per_s=round(self.num_reads / max(dt, 1e-9), 1))
        return False


def profile_trace(path: str):
    """Context manager around jax.profiler for pass-level device traces."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def cm():
        jax.profiler.start_trace(path)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    return cm()
