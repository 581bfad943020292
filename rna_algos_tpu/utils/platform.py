"""Placement-aware TPU detection for the Mosaic-kernel dispatchers.

``jax.default_backend()`` alone is not enough on this environment: the axon
TPU plugin pins ``jax_platforms="axon,cpu"`` so the backend reports "tpu"
even when computations are being routed to host CPU devices via
``jax.default_device(...)`` (the test suite's CPU-forced mode, or any user
doing the same).  Dispatching a compiled (non-interpret) Mosaic kernel onto
a CPU device fails with "Only interpret mode is supported on CPU backend",
so every fused-path availability check must consider the *effective default
device*, not just the backend.

The decision is made from JAX state only (backend + ``jax_default_device``);
the test suite forces CPU through ``jax.default_device`` in its conftest
fixture, which this function observes — no out-of-band env vars are
consulted, so a stray test-suite variable in a production environment cannot
silently disable the fused paths (ADVICE round 3).
"""


def on_tpu():
    """True iff a default-placed computation would land on a TPU device."""
    import jax

    try:
        if jax.default_backend() in ("cpu",):
            return False
    except Exception:
        return False
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None and getattr(dev, "platform", None) == "cpu":
        return False
    return True
