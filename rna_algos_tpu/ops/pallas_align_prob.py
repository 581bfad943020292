"""Scaled probability-space Durbin pair-HMM kernels (fast mode).

The exact fused kernel (ops/pallas_align.py) runs the reference's 3-state
forward/backward (`/root/reference/src/durbin_algo.rs:79-199`) in log space,
paying a logsumexp per state combine.  Fast mode has no bit-parity contract,
so this module runs the SAME lane-batched anti-diagonal wavefront in **scaled
probability space** — every log-add becomes a multiply, every lse a plain
sum — mirroring ops/pallas_fold_prob.py for the fold kernels.

Scaling: a cell (i, j) covers ``i + j`` HMM steps, so states store
``S(i, j) * exp(-(i + j) * ln_sigma)`` for a per-pair constant ``ln_sigma``.
Each recurrence advances the step count by exactly the number of emissions it
consumes, so the powers fold into the host-side emission planes:

* match emits at (i, j) after a 2-step move:  MS' = exp(MS - 2 * ln_sigma),
* insert/delete emit after 1-step moves:      INS' = exp(INS - ln_sigma),
* transitions carry no steps and stay global: t' = exp(t).

The scaled partition function is the corner sum ``Z' = Z *
exp(-(n1 + n2 - 4) * ln_sigma)`` and the posterior is exactly
``p(i, j) = FM'(i, j) * SS'(i, j) / Z'`` — the backward context SS' carries
the complementary ``(n1 - 2 - i) + (n2 - 2 - j)`` power, so the span algebra
cancels (durbin_algo.rs:201-242).

float32 covers ~e+-87, so ``ln_sigma`` must sit within ~87/(n1+n2) of the
true per-step log growth.  The initial guess is the table-derived
match-dominated rate; the shared bisection-retry ``lax.while_loop``
(pallas_fold_prob._retrying) re-runs over/underflowed lanes without host
syncs.  Accuracy: hardware exp/mul instead of the reference's cubic
approximations; match probs sit ~1e-4 from exact mode (hw goldens at 5e-4).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PSEUDO_BASE
from . import pallas_align as PA
from .pallas_align import LANES, _shift_insert, _to_blocks, _reverse_seqs
from .pallas_fold_prob import _retrying


# ---------------------------------------------------------------------------
# Kernel: one anti-diagonal for one block of LANES pairs (probability space)
# ---------------------------------------------------------------------------

def _pairhmm_prob_kernel(
    SCAL,                     # (1, 1, 8) SMEM: exp'd m2m, m2i, ext, init_m/i
    NN,                       # (1, 8, L): row0 n1, row1 n2 (f32, per lane)
    P1,                       # (1, 5N, L): exp(MS[x1[i], b] - 2 ln_sigma)
    INS1,                     # (1, N, L): exp(INS[x1[i]] - ln_sigma)
    X2F,                      # (1, N, L): x2 base ids as f32
    INS2,                     # (1, N, L): exp(INS[x2[j]] - ln_sigma)
    OUT,                      # out block (1, N, L): M diag (fwd) or ssum (bwd)
    CORN_OUT,                 # out block (1, 8, L): corner M/I/D sums
    M1, I1, D1, M2, I2, D2,   # (N+8, L) scratch; row 1+i = state[i], row0 = 0
    X2W, I2W,                 # (N, L) sliding windows: value at [i] = f(x2[d-i])
    CORN,                     # (8, L) scratch corner accumulator
    *, N, emit_ss,
):
    d = pl.program_id(1)
    m2m = SCAL[0, 0, 0]
    m2i = SCAL[0, 0, 1]
    ext = SCAL[0, 0, 2]
    init_m = SCAL[0, 0, 3]
    init_i = SCAL[0, 0, 4]

    @pl.when(d == 0)
    def _init():
        for buf in (M1, I1, D1, M2, I2, D2):
            buf[:] = jnp.zeros_like(buf[:])
        X2W[:] = jnp.full_like(X2W[:], 99.0)  # matches no base id
        I2W[:] = jnp.zeros_like(I2W[:])
        CORN[:] = jnp.zeros_like(CORN[:])

    # slide the x2 windows: after insertion, X2W[i] = x2[d - i]
    r = jnp.minimum(d, N - 1)
    _shift_insert(X2W, X2F[0, pl.ds(r, 1), :])
    _shift_insert(I2W, INS2[0, pl.ds(r, 1), :])

    L = X2W.shape[1]
    i_f = lax.broadcasted_iota(jnp.int32, (N, 1), 0).astype(jnp.float32)
    j_f = d.astype(jnp.float32) - i_f
    n1r = NN[0, 0:1, :]
    n2r = NN[0, 1:2, :]
    row_ok = i_f < n1r - 1.0
    valid_j = (j_f >= 0.0) & (j_f < n2r - 1.0) & row_ok

    # emission for this diagonal: ms[i] = exp(MS[x1[i], x2[d-i]] - 2 ln_s)
    x2w = X2W[:]
    ms = jnp.zeros((N, L), jnp.float32)
    for b in range(5):
        ms = ms + jnp.where(x2w == float(b), P1[0, b * N:(b + 1) * N, :], 0.0)

    shM2 = M2[pl.ds(0, N), :]   # state[i-1] at diag d-2
    shI2 = I2[pl.ds(0, N), :]
    shD2 = D2[pl.ds(0, N), :]
    shM1 = M1[pl.ds(0, N), :]   # state[i-1] at diag d-1
    shI1 = I1[pl.ds(0, N), :]
    uM1 = M1[pl.ds(1, N), :]    # state[i] at diag d-1
    uD1 = D1[pl.ds(1, N), :]

    # match (durbin_algo.rs:92-108): lse3 -> multiply-accumulate
    t_mm = jnp.where((i_f == 1.0) & (j_f == 1.0), init_m, m2m)
    tm = shM2 * t_mm + (shI2 + shD2) * m2i
    fm = jnp.where((i_f >= 1.0) & (j_f >= 1.0) & valid_j, tm * ms, 0.0)
    fm = jnp.where((i_f == 0.0) & (j_f == 0.0) & row_ok, 1.0, fm)

    # insert: gap in seq2, from (i-1, j)
    t_mi = jnp.where((i_f == 1.0) & (j_f == 0.0), init_i, m2i)
    ti = shM1 * t_mi + shI1 * ext
    fi = jnp.where((i_f >= 1.0) & valid_j, ti * INS1[0, :, :], 0.0)

    # delete: gap in seq1, from (i, j-1)
    t_d = jnp.where((i_f == 0.0) & (j_f == 1.0), init_i, m2i)
    td = uM1 * t_d + uD1 * ext
    fd = jnp.where((j_f >= 1.0) & valid_j, td * I2W[:], 0.0)

    if emit_ss:
        # backward posterior context (durbin_algo.rs:227-236): in reversed
        # coordinates these are this kernel's own diagonal states and the
        # "ends" transition sits at (i'', j'') = (0, 0)
        t_end = jnp.where((i_f == 0.0) & (j_f == 0.0), 1.0, m2m)
        OUT[0, :, :] = fm * t_end + (fi + fd) * m2i
    else:
        OUT[0, :, :] = fm

    # partition-function corner (n1-2, n2-2) per lane (durbin_algo.rs:207-215)
    hit = (i_f == n1r - 2.0) & (j_f == n2r - 2.0)
    for idx, v in enumerate((fm, fi, fd)):
        cm = jnp.max(jnp.where(hit, v, 0.0), axis=0, keepdims=True)
        CORN[pl.ds(idx, 1), :] = jnp.maximum(CORN[pl.ds(idx, 1), :], cm)

    # rotate carries
    M2[:] = M1[:]
    I2[:] = I1[:]
    D2[:] = D1[:]
    M1[pl.ds(1, N), :] = fm
    I1[pl.ds(1, N), :] = fi
    D1[pl.ds(1, N), :] = fd

    @pl.when(d == 2 * N - 1)
    def _emit_corner():
        CORN_OUT[0, :, :] = CORN[:]


def _pairhmm_prob_call(SCAL, NN, P1, INS1, X2F, INS2, G, N, emit_ss,
                       interpret):
    kernel = functools.partial(_pairhmm_prob_kernel, N=N, emit_ss=emit_ss)

    def spec(rows):
        return pl.BlockSpec(
            (1, rows, LANES), lambda g, d: (g, 0, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kernel,
        grid=(G, 2 * N),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda g, d: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            spec(8), spec(5 * N), spec(N), spec(N), spec(N),
        ],
        out_specs=(
            pl.BlockSpec((1, N, LANES), lambda g, d: (g, d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda g, d: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, 2 * N * N, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N + 8, LANES), jnp.float32) for _ in range(6)
        ] + [
            pltpu.VMEM((N, LANES), jnp.float32),
            pltpu.VMEM((N, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(SCAL, NN, P1, INS1, X2F, INS2)


# ---------------------------------------------------------------------------
# XLA-side driver
# ---------------------------------------------------------------------------

def _durbin_prob_body(s1, n1, s2, n2, sc, lsp, N, interpret):
    """One scaled-probability fwd+bwd run at per-pair scale ``lsp``.

    Inputs are already padded to GL = G * LANES pairs.  Returns
    (match probs (GL, N, N), scaled partition function (GL,))."""
    GL = s1.shape[0]
    G = GL // LANES

    MS = jnp.asarray(sc["match_scores"], jnp.float32)
    INS = jnp.asarray(sc["insert_scores"], jnp.float32)

    def prep(seqs):
        p1 = jnp.exp(
            jnp.take(MS, seqs, axis=0) - 2.0 * lsp[:, None, None]
        )                                              # (GL, N, 5)
        p1 = jnp.transpose(p1, (0, 2, 1)).reshape(GL, 5 * N)
        ins = jnp.exp(jnp.take(INS, seqs, axis=0) - lsp[:, None])  # (GL, N)
        return _to_blocks(p1, G), _to_blocks(ins, G)

    def run(x1, x2, init_m, init_i, emit_ss):
        P1, INS1 = prep(x1)
        _, INS2 = prep(x2)
        X2F = _to_blocks(x2.astype(jnp.float32), G)
        NN = _to_blocks(
            jnp.stack(
                [n1.astype(jnp.float32), n2.astype(jnp.float32)]
                + [jnp.zeros((GL,), jnp.float32)] * 6,
                axis=1,
            ),
            G,
        )
        scal = jnp.broadcast_to(
            jnp.stack(
                [
                    jnp.exp(sc["match2match_score"]),
                    jnp.exp(sc["match2insert_score"]),
                    jnp.exp(sc["insert_extend_score"]),
                    jnp.exp(init_m), jnp.exp(init_i),
                    jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                ]
            ).astype(jnp.float32)[None, None],
            (G, 1, 8),
        )
        out, corn = _pairhmm_prob_call(
            scal, NN, P1, INS1, X2F, INS2, G, N, emit_ss, interpret
        )
        return out.reshape(G, 2 * N, N, LANES), corn

    zero = jnp.float32(0.0)   # log-space 0 -> unit init for the bwd pass
    fwd_m, corn = run(
        s1, s2, sc["init_match_score"], sc["init_insert_score"], False
    )
    x1r = _reverse_seqs(s1, n1, N)
    x2r = _reverse_seqs(s2, n2, N)
    bwd_ss, _ = run(x1r, x2r, zero, zero, True)

    FM = PA._unskew(fwd_m, N, fill=0.0)   # (G, L, N, N) forward match sums
    SS = PA._unskew(bwd_ss, N, fill=0.0)  # reversed-coordinate context

    # z = corner M + I + D (durbin_algo.rs:207-215), scaled
    z = corn[:, 0] + corn[:, 1] + corn[:, 2]              # (G, L)
    z = z.reshape(GL)

    # ssum[i, j] = SS[n1-2-i, n2-2-j]: flip + per-pair shift
    F = jnp.pad(
        SS[:, :, ::-1, ::-1].reshape(GL, N, N),
        ((0, 0), (0, N), (0, N)),
        constant_values=0.0,
    )

    def shift_one(f, s_i, s_j):
        return lax.dynamic_slice(f, (s_i, s_j), (N, N))

    ssum = jax.vmap(shift_one)(
        F, (N + 1 - n1).astype(jnp.int32), (N + 1 - n2).astype(jnp.int32)
    )

    pos = z > 0.0
    inv_z = jnp.where(pos, 1.0 / jnp.where(pos, z, 1.0), 0.0)
    p = FM.reshape(GL, N, N) * ssum * inv_z[:, None, None]
    ii = jnp.arange(N)[None, :, None]
    jj = jnp.arange(N)[None, None, :]
    inner = (
        (ii >= 1) & (ii <= n1[:, None, None] - 2)
        & (jj >= 1) & (jj <= n2[:, None, None] - 2)
    )
    return jnp.where(inner, p, 0.0), z


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def durbin_match_probs_batch_pallas_prob(seqs1, ns1, seqs2, ns2, sc, N,
                                         interpret=False):
    """Scaled-probability fused pair-HMM with automatic rescale retries.

    Same contract as pallas_align.durbin_match_probs_batch_pallas:
    (P, N) int32 sentinel-wrapped pairs -> (P, N, N) match probabilities.
    """
    P = seqs1.shape[0]
    G = max(1, math.ceil(P / LANES))
    GL = G * LANES

    def pad_pairs(x, fill):
        return jnp.concatenate(
            [x, jnp.full((GL - P,) + x.shape[1:], fill, x.dtype)]
        ) if GL > P else x

    s1 = pad_pairs(seqs1, PSEUDO_BASE)
    s2 = pad_pairs(seqs2, PSEUDO_BASE)
    n1 = pad_pairs(ns1, jnp.int32(3))  # dummy lanes: minimal wrapped pair
    n2 = pad_pairs(ns2, jnp.int32(3))

    MS = jnp.asarray(sc["match_scores"], jnp.float32)
    # match-dominated per-step log growth: a 2-step match move contributes
    # ms + m2m; inserts are rarer and slightly slower-growing, and the
    # bisection retries absorb the spread
    ls0 = 0.5 * (jnp.mean(MS[:4, :4]) + sc["match2match_score"])

    def run(ls):
        return _durbin_prob_body(s1, n1, s2, n2, sc, ls, N, interpret)

    probs, _ls = _retrying(run, GL, ls0=ls0)
    return probs[:P]
