"""Tracing / profiling / metrics.

The reference has only whole-batch criterion timing (benches/benches.rs) and
eval-script time deltas (SURVEY §5).  Here: per-phase wall timers with DP
cells/s throughput counters, structured JSONL run logs, and an optional
`jax.profiler` trace context for TPU timeline capture.
"""

import contextlib
import json
import os
import sys
import time


class PhaseTimer:
    """Named phase timing + derived throughput metrics."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name, cells=None, items=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            rec = self.phases.setdefault(
                name, {"seconds": 0.0, "cells": 0, "items": 0, "calls": 0}
            )
            rec["seconds"] += dt
            rec["calls"] += 1
            if cells:
                rec["cells"] += int(cells)
            if items:
                rec["items"] += int(items)

    def summary(self):
        out = {}
        for name, rec in self.phases.items():
            s = dict(rec)
            if rec["seconds"] > 0:
                if rec["cells"]:
                    s["cells_per_s"] = rec["cells"] / rec["seconds"]
                if rec["items"]:
                    s["items_per_s"] = rec["items"] / rec["seconds"]
            out[name] = s
        return out


def force(tree):
    """Synchronize on device results for wall-clock timing.

    ``jax.block_until_ready`` returns immediately on some remote-device
    backends without waiting for execution (measured on a tunneled TPU:
    a 5x heavy-matmul loop "completed" in 0.5 ms by block_until_ready vs
    1.8 s real device time).  Fetching a scalar that data-depends on each
    output buffer is a sync that provably waits.  Each fetch pays one
    link round-trip (~30 ms through the tunnel), so prefer force_last()
    when one sync point covers the whole tree.  Returns the number of
    arrays forced.
    """
    import jax

    n = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            # any single element requires the producing computation done
            float(leaf.ravel()[0].astype("float32"))
            n += 1
    return n


def force_last(tree):
    """One-fetch sync: waits until everything enqueued so far has run.

    A single TPU executes computations in dispatch order (verified on the
    tunneled device: a fetch of a later tiny op's output waits out an
    earlier heavy call), and all outputs of one execution become ready
    together — so fetching one element of the LAST array leaf proves every
    previously dispatched computation finished, at the cost of a single
    link round-trip.  Use inside timing loops; use force() when dispatch
    order to the device is not known.
    """
    import jax

    last = None
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            last = leaf
    if last is not None:
        float(last.ravel()[0].astype("float32"))
    return 0 if last is None else 1


def dp_cells(n, window=31):
    """DP cell-update count of one McCaskill run: inside + outside wavefronts,
    counting the bounded 2-loop window per pair cell."""
    n = int(n)
    return 2 * (n * n * (window * window) // 2 + n**3 // 6)


@contextlib.contextmanager
def device_trace(log_dir):
    """jax.profiler trace context (TensorBoard-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RunLog:
    """Structured JSONL event log (metrics/observability; SURVEY §5)."""

    def __init__(self, path=None):
        self.path = path or os.environ.get("RNA_ALGOS_RUNLOG")
        self._f = open(self.path, "a") if self.path else None

    def event(self, kind, **fields):
        rec = {"ts": time.time(), "event": kind, **fields}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        elif os.environ.get("RNA_ALGOS_VERBOSE"):
            print(json.dumps(rec), file=sys.stderr)

    def close(self):
        if self._f:
            self._f.close()
