"""Metrics collection, mirroring the reference's metric names.

Reference docs/crates/metrics.md:10-25 pins the primary metrics:
execute_*_time_ms, trace_gen_time_ms, stark_prove_excluding_trace_time_ms,
total_proof_time_ms, insns, main_cells_used, total_cells_used; plus
execute_e1_insn_mi/s gauges (crates/vm/src/arch/interpreter.rs:121-129).
`run_with_metric_collection` writes a JSON file when OUTPUT_PATH is set,
like the reference's stark-sdk helper.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

_METRICS: dict = defaultdict(list)
_LABELS: dict = {}


def set_label(key: str, value) -> None:
    _LABELS[key] = value


def gauge(name: str, value, **labels) -> None:
    _METRICS[name].append({"value": value, **_LABELS, **labels})


def counter(name: str, value=1, **labels) -> None:
    gauge(name, value, **labels)


@contextlib.contextmanager
def timed(name: str, **labels):
    t0 = time.time()
    yield
    gauge(name, round((time.time() - t0) * 1000, 3), **labels)


def snapshot() -> dict:
    return {k: list(v) for k, v in _METRICS.items()}


def reset() -> None:
    _METRICS.clear()
    _LABELS.clear()


@contextlib.contextmanager
def run_with_metric_collection(output_path: str | None = None):
    """Collect metrics for a scope; dump JSON to OUTPUT_PATH (or arg)."""
    reset()
    yield
    path = output_path or os.environ.get("OUTPUT_PATH")
    if path:
        with open(path, "w") as f:
            json.dump(snapshot(), f, indent=1)
