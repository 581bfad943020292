"""MXU-friendly small-table lookups.

The per-sequence score-matrix precompute gathers from tiny tables
(5..5^4 entries) at every (i, d) cell.  TPU gathers run on the scalar unit
and dominate the fused-path precompute; a one-hot contraction computes the
same lookup exactly (one 1.0 per row, f32 mul/add with 0/1 is exact) and
rides the MXU instead.

``lookup(table, *idx)`` fuses the trailing index dims into one flat class
index and contracts a one-hot of it against the flattened table.  Falls back
to plain gathers off-TPU (where XLA gathers are fine and the one-hot wastes
memory).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _use_onehot():
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def lookup(table, *idx):
    """table[idx_0, ..., idx_k] with all idx broadcast to a common shape.

    Exact equivalent of advanced-indexing gathers; one-hot MXU contraction
    on TPU backends.
    """
    table = jnp.asarray(table)
    k = len(idx)
    assert table.ndim == k, (table.shape, k)
    idx = jnp.broadcast_arrays(*(jnp.asarray(x) for x in idx))
    if not _use_onehot() or table.size > 4096:
        return table[tuple(idx)]
    flat_idx = idx[0]
    for d in range(1, k):
        flat_idx = flat_idx * table.shape[d] + idx[d]
    K = int(np.prod(table.shape))
    shape = flat_idx.shape
    flat_idx = flat_idx.reshape(-1)
    onehot = (
        flat_idx[:, None] == jnp.arange(K, dtype=flat_idx.dtype)[None, :]
    ).astype(table.dtype)
    out = jnp.dot(
        onehot, table.reshape(-1), preferred_element_type=table.dtype
    )
    return out.reshape(shape)
