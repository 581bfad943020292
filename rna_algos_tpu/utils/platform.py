"""Placement-aware TPU detection for the Mosaic-kernel dispatchers.

``jax.default_backend()`` alone is not enough on this environment: the axon
TPU plugin pins ``jax_platforms="axon,cpu"`` so the backend reports "tpu"
even when computations are being routed to host CPU devices via
``jax.default_device(...)`` (the test suite's RNA_ALGOS_TEST_CPU=1 mode, or
any user doing the same).  Dispatching a compiled (non-interpret) Mosaic
kernel onto a CPU device fails with "Only interpret mode is supported on
CPU backend", so every fused-path availability check must consider the
*effective default device*, not just the backend.
"""

import os


def on_tpu():
    """True iff a default-placed computation would land on a TPU device."""
    import jax

    try:
        if jax.default_backend() in ("cpu",):
            return False
    except Exception:
        return False
    if os.environ.get("RNA_ALGOS_TEST_CPU") == "1":
        return False
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None and getattr(dev, "platform", None) == "cpu":
        return False
    return True
