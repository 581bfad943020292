"""Fused Pallas kernel for the Durbin 3-state pair-HMM (VMEM-resident wavefront).

Re-design of the pair-HMM fill (`/root/reference/src/durbin_algo.rs:79-199`)
for the TPU vector unit, replacing the XLA row-scan in models/durbin.py on
the hot path:

* **Lane-batched anti-diagonal wavefront.** 128 sequence *pairs* ride the
  lanes; sublanes hold ``i`` (position in seq1).  One grid step processes one
  anti-diagonal ``d = i + j`` for all 128 pairs at once: every cell of a
  diagonal depends only on diagonals ``d-1`` / ``d-2``, so there is **no**
  within-step recurrence at all — the row formulation's per-row
  ``associative_scan`` (models/durbin.py:_linrec_lse) disappears.
* **VMEM-resident carries.** The six state diagonals (M/I/D at d-1, d-2)
  persist in scratch across the sequential ``(block, diagonal)`` grid; state
  buffers keep a -inf guard row at offset 0 so the ``i-1`` reads of the
  recurrences are static sublane slices (Mosaic has no concat/rev).
* **Sliding emission window.** ``ms[i, j] = MATCH_SCORES[x1[i], x2[d-i]]``
  is built per step from 5 per-base score planes (``P1[b][i] =
  MATCH_SCORES[x1[i], b]``, precomputed with MXU one-hot lookups) and a
  sliding scratch holding ``x2[d-i]`` — one dynamic row read plus one
  sublane shift per step, mirroring ops/pallas_fold.py's sliding scratches.
* **Minimal HBM traffic.** The forward pass streams only the M diagonals
  (needed for the posterior) plus the three corner sums (the partition
  function, durbin_algo.rs:207-215); the backward pass (the same kernel on
  coordinate-reversed pairs with zero init scores, durbin_algo.rs:150-155)
  emits the posterior context term ``ssum`` (durbin_algo.rs:227-236)
  directly, so the I/D tables never leave VMEM.

The XLA-side driver unskews the diagonal outputs with log-depth
shift/select passes (no gathers) and finishes with the same posterior
formula as the row-scan model (durbin_algo.rs:201-242).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import NEG_INF, PSEUDO_BASE
from .. import numerics
from ..numerics import lse_pair, expf

LANES = 128


def _lse3(a, b, c):
    return lse_pair(lse_pair(a, b), c)


def _shift_insert(buf, row):
    """Slide a window scratch one row down and insert ``row`` at slot 0."""
    R = buf.shape[0]
    shifted = buf[pl.ds(0, R - 1), :]
    buf[pl.ds(1, R - 1), :] = shifted
    buf[pl.ds(0, 1), :] = row


# ---------------------------------------------------------------------------
# Kernel: one anti-diagonal for one block of LANES pairs
# ---------------------------------------------------------------------------

def _pairhmm_kernel(
    SCAL,                     # (1, 1, 8) SMEM: m2m, m2i, ext, init_m, init_i
    NN,                       # (1, 8, L): row0 n1, row1 n2 (f32, per lane)
    P1,                       # (1, 5N, L): P1[b*N+i, l] = MS[x1[i,l], b]
    INS1,                     # (1, N, L): INS[x1[i, l]]
    X2F,                      # (1, N, L): x2 base ids as f32
    INS2,                     # (1, N, L): INS[x2[j, l]]
    OUT,                      # out block (1, N, L): M diag (fwd) or ssum (bwd)
    CORN_OUT,                 # out block (1, 8, L): corner M/I/D sums
    M1, I1, D1, M2, I2, D2,   # (N+8, L) scratch; row 1+i = state[i], row0 -inf
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
            buf[:] = jnp.full_like(buf[:], NEG_INF)
        X2W[:] = jnp.full_like(X2W[:], 99.0)  # matches no base id
        I2W[:] = jnp.zeros_like(I2W[:])
        CORN[:] = jnp.full_like(CORN[:], NEG_INF)

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

    # emission for this diagonal: ms[i] = MS[x1[i], x2[d-i]]
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

    # match (durbin_algo.rs:92-108 / models.durbin row formulation)
    t_mm = jnp.where((i_f == 1.0) & (j_f == 1.0), init_m, m2m)
    tm = _lse3(shM2 + t_mm, shI2 + m2i, shD2 + m2i)
    fm = jnp.where(
        (i_f >= 1.0) & (j_f >= 1.0) & valid_j, tm + ms, NEG_INF
    )
    fm = jnp.where((i_f == 0.0) & (j_f == 0.0) & row_ok, 0.0, fm)

    # insert: gap in seq2, from (i-1, j)
    t_mi = jnp.where((i_f == 1.0) & (j_f == 0.0), init_i, m2i)
    ti = lse_pair(shM1 + t_mi, shI1 + ext)
    fi = jnp.where((i_f >= 1.0) & valid_j, ti + INS1[0, :, :], NEG_INF)

    # delete: gap in seq1, from (i, j-1)
    t_d = jnp.where((i_f == 0.0) & (j_f == 1.0), init_i, m2i)
    td = lse_pair(uM1 + t_d, uD1 + ext)
    fd = jnp.where((j_f >= 1.0) & valid_j, td + I2W[:], NEG_INF)

    if emit_ss:
        # backward posterior context (durbin_algo.rs:227-236): in reversed
        # coordinates BM1/BI1/BD1 are this kernel's own diagonal states and
        # the "ends" transition sits at (i'', j'') = (0, 0)
        t_end = jnp.where((i_f == 0.0) & (j_f == 0.0), 0.0, m2m)
        OUT[0, :, :] = _lse3(fm + t_end, fi + m2i, fd + m2i)
    else:
        OUT[0, :, :] = fm

    # partition-function corner (n1-2, n2-2) per lane (durbin_algo.rs:207-215)
    hit = (i_f == n1r - 2.0) & (j_f == n2r - 2.0)
    for idx, v in enumerate((fm, fi, fd)):
        cm = jnp.max(jnp.where(hit, v, NEG_INF), axis=0, keepdims=True)
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


def _pairhmm_call(SCAL, NN, P1, INS1, X2F, INS2, G, N, emit_ss, interpret):
    kernel = functools.partial(_pairhmm_kernel, N=N, emit_ss=emit_ss)

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

def _to_blocks(x, G):
    """(G*L, rows) -> (G, rows, L) lane-major blocks."""
    GL, rows = x.shape
    return jnp.transpose(x.reshape(G, LANES, rows), (0, 2, 1))


def _unskew(X, N, fill=NEG_INF):
    """(G, 2N, N, L) diag layout -> (G, L, N, N) matrices M[i, j] = X[i+j, i].

    Log-depth shift/select passes (no gathers): column i needs an upward
    shift by i along the diagonal axis; apply power-of-two shifts gated on
    the bits of i."""
    i_idx = jnp.arange(N)[None, None, :, None]
    k = 1
    while k < N:
        shifted = jnp.concatenate(
            [X[:, k:], jnp.full_like(X[:, :k], fill)], axis=1
        )
        X = jnp.where((i_idx & k) != 0, shifted, X)
        k *= 2
    return jnp.transpose(X[:, :N], (0, 3, 2, 1))


def _reverse_seqs(seqs, ns, N):
    """Per-pair coordinate reversal with PSEUDO_BASE padding (backward pass)."""
    idx = jnp.arange(N)

    def one(seq, n):
        return jnp.where(
            idx < n, jnp.take(seq, jnp.clip(n - 1 - idx, 0, N - 1)), PSEUDO_BASE
        )

    return jax.vmap(one)(seqs, ns)


def durbin_match_probs_batch_pallas(seqs1, ns1, seqs2, ns2, sc, N,
                                    interpret=False):
    """Posterior match probs for a padded batch of pairs via the fused kernel.

    Same contract as models.durbin.durbin_match_probs_batch with
    N1 == N2 == N: (P, N) int32 sentinel-wrapped pairs -> (P, N, N) probs.
    """
    return _durbin_pallas(
        seqs1, ns1, seqs2, ns2, sc, N=N, interpret=interpret,
        mode=numerics.get_mode(),
    )


@functools.partial(jax.jit, static_argnames=("N", "interpret", "mode"))
def _durbin_pallas(seqs1, ns1, seqs2, ns2, sc, N, interpret, mode):
    with numerics.force_mode(mode):
        return _durbin_pallas_body(seqs1, ns1, seqs2, ns2, sc, N, interpret)


def _durbin_pallas_body(seqs1, ns1, seqs2, ns2, sc, N, interpret):
    P = seqs1.shape[0]
    G = max(1, math.ceil(P / LANES))
    GL = G * LANES

    def pad_pairs(x, fill):
        return jnp.concatenate(
            [x, jnp.full((GL - P,) + x.shape[1:], fill, x.dtype)]
        ) if GL > P else x

    s1 = pad_pairs(seqs1, PSEUDO_BASE)
    s2 = pad_pairs(seqs2, PSEUDO_BASE)
    n1 = pad_pairs(ns1, 3)   # dummy lanes: minimal sentinel-wrapped pair
    n2 = pad_pairs(ns2, 3)

    MS = jnp.asarray(sc["match_scores"], jnp.float32)
    INS = jnp.asarray(sc["insert_scores"], jnp.float32)

    def prep(seqs):
        p1 = jnp.take(MS, seqs, axis=0)            # (GL, N, 5)
        p1 = jnp.transpose(p1, (0, 2, 1)).reshape(GL, 5 * N)
        ins = jnp.take(INS, seqs, axis=0)          # (GL, N)
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
                    sc["match2match_score"], sc["match2insert_score"],
                    sc["insert_extend_score"], init_m, init_i,
                    jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                ]
            ).astype(jnp.float32)[None, None],
            (G, 1, 8),
        )
        out, corn = _pairhmm_call(
            scal, NN, P1, INS1, X2F, INS2, G, N, emit_ss, interpret
        )
        return out.reshape(G, 2 * N, N, LANES), corn

    zero = jnp.float32(0.0)
    fwd_m, corn = run(
        s1, s2, sc["init_match_score"], sc["init_insert_score"], False
    )
    x1r = _reverse_seqs(s1, n1, N)
    x2r = _reverse_seqs(s2, n2, N)
    bwd_ss, _ = run(x1r, x2r, zero, zero, True)

    FM = _unskew(fwd_m, N)       # (G, L, N, N): forward match sums
    SS = _unskew(bwd_ss, N)      # reversed-coordinate posterior context

    # z = lse3 of the forward corner (durbin_algo.rs:207-215)
    z = _lse3(corn[:, 0], corn[:, 1], corn[:, 2])          # (G, L)

    # ssum[i, j] = SS[n1-2-i, n2-2-j]: flip + per-pair shift
    F = jnp.pad(
        SS[:, :, ::-1, ::-1].reshape(GL, N, N),
        ((0, 0), (0, N), (0, N)),
        constant_values=NEG_INF,
    )

    def shift_one(f, s_i, s_j):
        return lax.dynamic_slice(f, (s_i, s_j), (N, N))

    ssum = jax.vmap(shift_one)(
        F, (N + 1 - n1).astype(jnp.int32), (N + 1 - n2).astype(jnp.int32)
    )

    p = expf(FM.reshape(GL, N, N) + ssum - z.reshape(GL)[:, None, None])
    ii = jnp.arange(N)[None, :, None]
    jj = jnp.arange(N)[None, None, :]
    inner = (
        (ii >= 1) & (ii <= n1[:, None, None] - 2)
        & (jj >= 1) & (jj <= n2[:, None, None] - 2)
    )
    return jnp.where(inner, p, 0.0)[:P]


def pallas_available(N1, N2):
    """Fused pair-HMM applies: TPU placement, square pow-2 bucket <= 256."""
    from ..utils.platform import on_tpu

    return N1 == N2 and N1 <= 256 and (N1 & (N1 - 1)) == 0 and on_tpu()
