"""Fused batch skew: [p, q] -> [p, d] diagonal re-layout in one VMEM pass.

The score-matrix precompute converts every position-pair table M[p, q] to
the diagonal layout V[p, d] = M[p, p + d] the fold kernels consume
(ops/diag.skew_pq).  In XLA each of the log2(N) shift levels materializes a
full (B, N, N) concat+select round trip through HBM, and the precompute
skews ~8 (CONTRA) / ~18 (Turner) tables — measured ~0.4 ms per table-batch
at B=192, N=128 (~490 GB/s, HBM-bound by construction).

This kernel does the whole permutation in VMEM: stage 1 handles the
8-aligned part of each row's shift as one statically-unrolled block copy
per 8-row group (row p shifts by (p & ~7), constant within the group), and
stage 2 applies the residual 1/2/4-lane shifts as three select levels
staged through a single scratch.  One HBM read + one write per table
instead of ~7 materialized levels; all tables of a sequence share one
grid step.

Rows are independent (row p only shifts its own lanes), so large N adds a
row-chunk grid dimension: blocks become (1, RS, N) and stage 1's global
shift base is resolved by a static ``pl.when`` unroll over chunks (slice
sizes must be static).  N <= 512 keeps the original single-chunk program.

Fill semantics match diag.skew_pq(M, 0.0): columns past the matrix edge
(p + d >= N) read 0.0.  Bitwise-identical output (pure permutation + zero
fill; validated in tests/test_pallas.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _skew_kernel(*refs, T, N, RS, inv=False):
    ins = refs[:T]
    outs = refs[T : 2 * T]
    S = refs[2 * T]
    C = N // RS
    c = pl.program_id(1) if C > 1 else 0
    riota = jax.lax.broadcasted_iota(jnp.int32, (RS, 1), 0)
    for X, Y in zip(ins, outs):
        # stage 1: 8-aligned shifts — row p shifts by (p & ~7), constant
        # within each 8-row group, so one static two-slice copy per group.
        # The shift base c*RS is grid-dependent; slice sizes must be
        # static, so each chunk's copies live under a static pl.when.
        # ``inv`` reverses the direction (rows shift RIGHT — the unskew
        # square[i, j] = P[i, j - i]).
        def stage1(cc):
            for b in range(RS // 8):
                sh = cc * RS + 8 * b
                rows = pl.ds(8 * b, 8)
                if sh == 0:
                    Y[0, rows, :] = X[0, rows, :]
                elif inv:
                    Y[0, rows, pl.ds(sh, N - sh)] = X[0, rows, pl.ds(0, N - sh)]
                    Y[0, rows, pl.ds(0, sh)] = jnp.zeros((8, sh), jnp.float32)
                else:
                    Y[0, rows, pl.ds(0, N - sh)] = X[0, rows, pl.ds(sh, N - sh)]
                    Y[0, rows, pl.ds(N - sh, sh)] = jnp.zeros(
                        (8, sh), jnp.float32
                    )

        if C == 1:
            stage1(0)
        else:
            for cc in range(C):
                pl.when(c == cc)(functools.partial(stage1, cc))
        # stage 2: residual 1/2/4-lane shifts, staged through the scratch;
        # the residual (p & 7) pattern repeats every 8 rows, so the local
        # row iota selects correctly in every chunk
        for k in (1, 2, 4):
            if inv:
                S[pl.ds(0, RS), pl.ds(k, N - k)] = Y[
                    0, pl.ds(0, RS), pl.ds(0, N - k)
                ]
                S[pl.ds(0, RS), pl.ds(0, k)] = jnp.zeros((RS, k), jnp.float32)
            else:
                S[pl.ds(0, RS), pl.ds(0, N - k)] = Y[
                    0, pl.ds(0, RS), pl.ds(k, N - k)
                ]
                S[pl.ds(0, RS), pl.ds(N - k, k)] = jnp.zeros(
                    (RS, k), jnp.float32
                )
            Y[0] = jnp.where((riota & k) != 0, S[pl.ds(0, RS), :], Y[0])


def _nn(RS, N):
    return pl.BlockSpec(
        (1, RS, N), lambda b, c=0: (b, c, 0), memory_space=pltpu.VMEM
    )


def skew_pq_batch(mats, interpret=False, inv=False):
    """Skew a list of (B, N, N) [p, q] tables to [p, d] (fill 0.0).

    Returns the skewed tables in input order; callers transpose to the
    [d, i] layout (XLA fuses the transpose into the consumer).  Falls back
    to diag.skew_pq off-TPU.  ``inv=True`` applies the INVERSE permutation
    (rows shift right: out[i, j] = in[i, j - i] for j >= i, 0 below the
    diagonal) — the [i, d] -> square conversion of the final BPPs, which
    as an XLA take_along_axis is a full gather pass.
    """
    from . import diag

    mats = [jnp.asarray(m) for m in mats]
    B, N, _ = mats[0].shape
    from ..utils.platform import on_tpu as _on_tpu

    on_tpu = _on_tpu()
    # Past 512 the kernel row-chunks at RS=128, so N must divide evenly
    # (C = N // RS floors: a stray remainder would leave the last rows
    # unvisited — silent garbage, not a crash).
    if not (on_tpu or interpret) or N % 8 or (N > 512 and N % 128):
        fn = diag.unskew_pq if inv else diag.skew_pq
        return [jax.vmap(lambda m: fn(m, 0.0))(m) for m in mats]
    T = len(mats)
    RS = N if N <= 512 else 128   # row-chunk past the all-VMEM budget
    C = N // RS
    kernel = functools.partial(_skew_kernel, T=T, N=N, RS=RS, inv=inv)
    outs = pl.pallas_call(
        kernel,
        grid=(B,) if C == 1 else (B, C),
        in_specs=[_nn(RS, N) for _ in range(T)],
        out_specs=tuple(_nn(RS, N) for _ in range(T)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(T)
        ),
        scratch_shapes=[pltpu.VMEM((RS, N), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*mats)
    return list(outs)
