"""Debug configuration: NaN/Inf detection for the pure-functional DP.

The reference's data-race safety comes from Rust's scoped-threadpool borrow
discipline (SURVEY §5); the JAX equivalent is pure-functional state — there
is no shared mutable state to race on.  The remaining numeric hazard class
is NaN/+inf leaking into a DP state table (the `lse_pair` contract requires
finite-or--inf operands, numerics/logsumexp.py).  This module is the
SURVEY-prescribed debug configuration for that class:

* ``RNA_ALGOS_DEBUG=nans`` (or ``enable_nan_checks()``) turns on
  ``jax_debug_nans``: any NaN produced under jit re-runs the offending
  primitive un-jitted and raises with the source location.
* ``check_finite_states(pytree)`` is the in-test assertion helper: every
  leaf must be finite or -inf (never NaN/+inf).

Import-time activation: `rna_algos_tpu.utils` imports this module lazily;
call ``maybe_enable_from_env()`` early (the CLIs and FoldEngine do) so the
env var works for every entry point.
"""

import os

import numpy as np


def enable_nan_checks():
    import jax

    jax.config.update("jax_debug_nans", True)


def disable_nan_checks():
    import jax

    jax.config.update("jax_debug_nans", False)


def maybe_enable_from_env():
    """Activate debug modes named in RNA_ALGOS_DEBUG (comma-separated)."""
    modes = os.environ.get("RNA_ALGOS_DEBUG", "")
    active = {m.strip() for m in modes.split(",") if m.strip()}
    if "nans" in active:
        enable_nan_checks()
    return active


def check_finite_states(tree, name="state"):
    """Assert the lse_pair operand contract: finite or -inf, no NaN/+inf."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        bad = np.isnan(arr) | (np.isposinf(arr))
        if bad.any():
            idx = tuple(int(i) for i in np.argwhere(bad)[0])
            raise AssertionError(
                f"{name}{jax.tree_util.keystr(path)}: NaN/+inf at {idx} "
                f"(value {arr[idx]!r}) — violates the lse_pair operand "
                "contract (numerics/logsumexp.py)"
            )
