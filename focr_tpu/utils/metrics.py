"""Observability: profiler spans + opt-in structured metrics.

SURVEY.md §5.1/§5.5: the reference's only instrumentation is verbose stderr
timing; the rebuild keeps the stdout-is-data / stderr-is-diagnostics contract
and adds (a) `jax.profiler` traces behind --profile and (b) JSON metrics
behind --metrics-json. Neither is on by default, so default output is
byte-identical to the reference contract.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field


@dataclass
class MetricsRun:
    seconds: float = 0.0
    extra: dict = field(default_factory=dict)


@contextlib.contextmanager
def metrics_run(profile_dir: str | None = None):
    """Time a decode region; optionally wrap it in a jax.profiler trace."""
    run = MetricsRun()
    trace = None
    if profile_dir is not None:
        import jax

        trace = jax.profiler.trace(profile_dir)
        trace.__enter__()
    t0 = time.perf_counter()
    try:
        yield run
    finally:
        run.seconds = time.perf_counter() - t0
        if trace is not None:
            trace.__exit__(None, None, None)


def write_metrics(path: str, **fields) -> None:
    """One JSON object per run; '-' writes to stderr (stdout stays data-only)."""
    blob = json.dumps(fields, sort_keys=True)
    if path == "-":
        print(blob, file=sys.stderr)
    else:
        with open(path, "w") as f:
            f.write(blob + "\n")
