"""Sublane-stacked (G=8) scaled probability-space CONTRA McCaskill kernels.

The per-sequence fast kernels (ops/pallas_fold_prob.py) are ISSUE-bound:
each span step is ~30-40 Mosaic ops on (1, N) rows / small blocks, so a
span costs ~0.35-0.75 us regardless of how little data it touches, and a
192-seq batch serializes ~16k span steps on the one TensorCore.  This
module runs the SAME recurrences with G = 8 sequences interleaved along
sublanes: row ``t`` of every per-sequence table/scratch becomes row block
``t*8 + g``.  Consequences, all structural:

* every dynamic row read/write ``[d]`` becomes an 8-row block at offset
  ``8*d`` — exactly Mosaic's 8-aligned dynamic multi-row access pattern
  (unaligned dynamic loads fail to lower, see ops/pallas_fold.py);
* every (1, N) row op becomes an (8, N) op — one vreg at N = 128 — so the
  same instruction count serves 8 sequences;
* the banded 2-loop window matmul (see pallas_fold_prob._banded_kernel)
  becomes ONE (256, 256) @ (256, N+33) striped-block-diagonal matmul per
  span for all 8 sequences (KBIG[a*8+g, r*8+g] = K_g[a, r]);
* O(span) bifurcation sums become strided tree reductions (`_tree8`) that
  halve on multiples of 8 sublanes, preserving per-sequence alignment.

Per-sequence scalars (eu1, sigma powers, 1/Z) ride either lane-broadcast
(8, N) rows of a small VEC input or are folded into the score tables on
the host (`_merge_inside` / `_merge_outside`), which also drops the CANON
/ LEN-special reads from the span loop entirely.

Short sequences in a group of 8 run to the group's max length; the extra
spans produce exact zeros (CANON zeroes `close`, and everything else is
data-dependent on it), and the inside outputs are re-masked to the
per-sequence length before the outside auxiliaries — so results equal
the per-sequence kernels' up to float reassociation of the tree sums.

Reference recurrences: /root/reference/src/mccaskill_algo.rs:380-516
(inside), :612-723 (outside).  Gated to buckets N <= 256 since round 4:
with span-chunked table streaming and the measured 128 MB physical VMEM
(see CLAUDE.md), the stacked working set fits the Rfam-scale bucket too
(~60 MB inside / ~98 MB outside at N = 256, G = 32); larger buckets keep
the per-sequence chunked path.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MIN_SPAN_HAIRPIN_CLOSE
from . import pallas_fold as PF
from . import pallas_fold_prob as PP
from .pallas_fold import LPAD

import os as _os_g

# Sequences stacked per grid step.  8 = one f32 vreg of sublanes per row
# block (round 1-3).  With the aged lane-major window (see _WINDOW_MODE
# below) the striped-matmul dilution objection to deeper stacking is gone
# — the common-kernel matmul just gets wider — and with the span-chunked
# table streaming plus vmem_limit_bytes raised past the ~16 MB scoped
# default, deeper stacking fits: measured tRNA-headline CONTRA seqs/s
# 18.6k (G=8) / 21.6k (16) / 22.5k (32, default) / 22.6k (64 — saturated),
# Turner 11.2k / 11.7k / 12.5k, all bit-identical across G.  Outputs are
# exactly G-invariant because every reduction pairs rows of equal
# (family, sequence).  Must be a multiple of 8 (Mosaic dynamic multi-row
# loads are 8-aligned); batches pad to a multiple of G at dispatch.
G = int(_os_g.environ.get("RNA_ALGOS_G", "32"))
if G % 8 or G < 8:
    raise ValueError(f"RNA_ALGOS_G must be a positive multiple of 8, got {G}")
WB = 33 * G       # window scratch rows: insert block + 32 aged read blocks
# Turner window scratches carry one extra aged block: the K2 diagonal arm
# (r = a + 2) reads the window at a +2-block offset, so offset slices of
# 32 blocks need 34 blocks total (the top block is only ever read with a
# zero weight).
WBT = 34 * G

# Round-4 window mode (VERDICT r3, item 1).  "aged" (default): the banded
# 2-loop window matmul operand lives in a LANE-MAJOR scratch — sequences
# side by side in (N + 33)-lane segments, window age along sublanes — and
# is multiplied by sigma^-1 every span, so row r carries sigma^-(r+1)
# implicitly and the banded kernel is COMMON across sequences: the
# contraction is an UNDILUTED (32, 32) @ (32, 8*(N+33)) matmul instead of
# round 3's 8x-striped block-diagonal (256, 256) @ (256, N+33) (12.5%
# useful MXU work — the profiled ~2/3-of-kernel-time wall, BASELINE.md).
# The per-span sublane->lane relayout of the inserted close row (the
# round-3 blocker) is 8 static sublane-slice copies; the 4 special cells
# keep a 4-block sublane mini-window.  "striped" pins the round-3 kernels.
import os as _os

_WINDOW_MODE = _os.environ.get("RNA_ALGOS_WINDOW", "aged").lower()
if _WINDOW_MODE not in ("aged", "striped"):
    raise ValueError(
        f"RNA_ALGOS_WINDOW must be 'aged' or 'striped', got {_WINDOW_MODE!r}"
    )


# Spans processed per grid step in the aged kernels (round 5, VERDICT item
# 3: "multi-span grid steps").  The banded window kernels' first three
# columns are structurally zero (min live r = 3: (a,b)=(2,0) for Turner
# bulges / the CONTRA band minus its 4 special cells), so span d+1's
# window contraction never reads the span-d insert and both spans of a
# pair can contract the SAME window state — span d+1 through a
# column-shifted kernel (W_{d+1}[r] = sigma * W_d[r-1], so
# K @ W_{d+1} = sigma * (Kshift @ W_d) with Kshift[a, r] = K[a, r+1]).
# The pair then shares ONE window-aging copy (x sigma^2) and ONE
# FQ2-history shift (2 blocks + 2 lanes), halving the per-span copy
# traffic that dominates the issue-bound span steps.  "1" pins the
# round-4 single-span kernels.
_SPANS = int(_os.environ.get("RNA_ALGOS_SPANS", "2"))
if _SPANS not in (1, 2):
    raise ValueError(f"RNA_ALGOS_SPANS must be 1 or 2, got {_SPANS}")


def _seg(N):
    """Lane-major segment width: N data lanes + 33 pad (skew shifts <= 32
    stay inside the segment; segment pads hold exact zeros)."""
    return N + 33


def _skew_lane_asc(x):
    """Lane-major ascending skew-extract: result[q] = sum_a x[a, q+1+a].

    Same log-depth halving as pallas_fold_prob._skew_extract_sum
    (base_shift=1) but on global lanes: per-segment results land at lane
    q = g*SW + i with no residual offset; cross-segment mixing stays in
    the >= N pad lanes (total shift 32 <= 33 pad)."""
    x = x[:, 1:]
    h = 16
    while h >= 1:
        L = x.shape[1]
        x = x[:h, : L - h] + x[h:, h:]
        h //= 2
    return x


def _skew_lane_desc(x):
    """Lane-major descending skew-extract: result[q] = sum_a x[a, q+31-a]
    (base_shift=31: the residual global slice of the sublane variant is
    [0:], i.e. none)."""
    h = 16
    while h >= 1:
        L = x.shape[1]
        x = x[:h, h:] + x[h:, : L - h]
        h //= 2
    return x


def _winl_insert(WINL, ins, N, sig, lane_off=0):
    """Shift the lane-major window one age down — multiplying by the
    per-segment sigma^-1 row AS rows age, so row r carries sigma^-r with
    no separate aging pass — and insert ``ins`` (8, N) as row 0 (the
    sublane->lane relayout is 8 static slice copies).  The matmul result
    picks up the residual common sigma^-1 (row r needs sigma^-(r+1))."""
    SW = _seg(N)
    WINL[pl.ds(1, 31), :] = WINL[pl.ds(0, 31), :] * sig
    for g in range(G):
        WINL[pl.ds(0, 1), pl.ds(g * SW + lane_off, N)] = ins[g : g + 1, :]


def _lm_to_blk(TWO8, lm, N):
    """Per-segment result lanes of a lane-major row -> (8, N) scratch."""
    SW = _seg(N)
    for g in range(G):
        TWO8[pl.ds(g, 1), :] = lm[0:1, g * SW : g * SW + N]
    return TWO8[:]


# ---------------------------------------------------------------------------
# Host-side layout helpers
# ---------------------------------------------------------------------------

def ilv(x):
    """(B, R, C) -> (B/G, R*G, C): row t of seq k*G+g lands at [k, t*G+g]."""
    B, R, C = x.shape
    return (
        x.reshape(B // G, G, R, C).transpose(0, 2, 1, 3).reshape(B // G, R * G, C)
    )


def dilv(y):
    """Inverse of :func:`ilv`."""
    K, RG, C = y.shape
    R = RG // G
    return y.reshape(K, R, G, C).transpose(0, 2, 1, 3).reshape(K * G, R, C)


def dup2(y):
    """(K, T*G, C) G-striped -> (K, T*2G, C): each G-block duplicated, so
    row t*2G + fam*G + g carries the same data for both families (the
    shared multiplicand of a paired-history reduce)."""
    K, TG, C = y.shape
    T = TG // G
    out = jnp.broadcast_to(
        y.reshape(K, T, 1, G, C), (K, T, 2, G, C)
    )
    return out.reshape(K, T * 2 * G, C)


def _kbig(K):
    """(B, 32, 32) per-seq banded kernels -> (B/G, 256, 256) striped
    block-diagonal: KBIG[a*8+g, r*8+g'] = K[g, a, r] * delta(g, g')."""
    B = K.shape[0]
    Kg = K.reshape(B // G, G, 32, 32)
    eye = jnp.eye(G, dtype=K.dtype)
    # [k, a, g, r, g'] -> (k, 256, 256)
    out = jnp.einsum("kgar,gh->kagrh", Kg, eye)
    return out.reshape(B // G, 32 * G, 32 * G)


def _wcols8(KBb, K2b):
    """Interleaved weight columns for the decomposed Turner windows.

    (B, 32, 32) banded kernels -> (B/G, 4*32*G, 8): stacked families
    [kb_col (a=0, by r); kb_diag (r=a+1, by a); k2_col (a=1, by r);
    k2_diag (r=a+2, by a)], each 8-interleaved; lane dim is a small
    broadcast (the kernel reads column 0)."""
    kb_col = KBb[:, 0, :]
    kb_diag = jnp.pad(
        jnp.diagonal(KBb, offset=1, axis1=1, axis2=2), ((0, 0), (0, 1))
    )
    k2_col = K2b[:, 1, :]
    k2_diag = jnp.pad(
        jnp.diagonal(K2b, offset=2, axis1=1, axis2=2), ((0, 0), (0, 2))
    )
    fams = [
        ilv(f[:, :, None])
        for f in (kb_col, kb_diag, k2_col, k2_diag)
    ]
    w = jnp.concatenate(fams, axis=1)            # (K, 4*32*G, 1)
    return jnp.broadcast_to(w, w.shape[:2] + (8,))


def _bcast_rows(N, *cols):
    """Stack per-seq scalars (B,) as lane-broadcast rows: (B/G, 8*len, N)."""
    blocks = [
        jnp.broadcast_to(c.reshape(-1, G, 1, 1), (c.shape[0] // G, G, 1, N))
        for c in cols
    ]
    return jnp.concatenate(blocks, axis=2).transpose(0, 2, 1, 3).reshape(
        cols[0].shape[0] // G, len(cols) * G, N
    )


# ---------------------------------------------------------------------------
# Kernel-side helpers
# ---------------------------------------------------------------------------

def _tree8(x):
    """Per-sequence sublane sum: (t*8, N) -> (8, N), halving on multiples
    of 8 so row t*8+g only ever merges with rows of the same g."""
    return _tree_to(x, G)


def _tree_to(x, stop):
    """Halving tree down to ``stop`` rows; at 2G striping (row t*2G +
    fam*G + g) stopping at 2G keeps the two families separate while the
    per-family t-pairing equals :func:`_tree8`'s (bit-identical sums)."""
    while x.shape[0] > stop:
        h = x.shape[0] // 2
        x = x[:h] + x[h:]
    return x


def _shift_insert8(buf, blk, lane_off=0):
    """Slide a window scratch one 8-row block down, insert ``blk`` at 0."""
    R = buf.shape[0]
    buf[pl.ds(G, R - G), :] = buf[pl.ds(0, R - G), :]
    buf[pl.ds(0, G), pl.ds(lane_off, blk.shape[1])] = blk


def _skew_extract_sum8(OUT, N, base_shift, descending=False):
    """Stacked skew extraction: rows a*8+g, per-a lane shifts as in
    pallas_fold_prob._skew_extract_sum; returns (8, N)."""
    x = OUT if descending else OUT[:, base_shift:]
    h = 16
    while h >= 1:
        L = x.shape[1]
        hh = h * G
        if descending:
            x = x[:hh, h:] + x[hh:, : L - h]
        else:
            x = x[:hh, : L - h] + x[hh:, h:]
        h //= 2
    if descending:
        x = x[:, base_shift - 31:]
    return x[:, :N]


def _band_mm8(KREF, ROWS):
    """(256, 256) striped kernel @ 256 window rows (32 blocks of 8)."""
    kw = KREF[0, pl.ds(0, 32 * G), pl.ds(0, 32 * G)]
    rows = ROWS[pl.ds(0, 32 * G), :]
    return PP._mm_prec(kw, rows)


def _blk(ref, d):
    """(8, N) dynamic 8-row block read of a (1, R*8, C) input ref."""
    return ref[0, pl.ds(d * G, G), :]


# ---------------------------------------------------------------------------
# Inside kernel (stacked)
# ---------------------------------------------------------------------------

def _inside8_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 40, N): eu1 ebp mbu1 mbbp logmbu
    H, MBC, ACC, JS, STK, I11, B0R, B0L, JB,  # (1, N*8, N) merged [d*8+g, i]
    KBIG,                                    # (1, 256, 256)
    close_out, ext_out, one_out,             # (1, N*8, N)
    CJW, FQ2, EO, mbS, S1SC,
    *, N,
):
    """Stacked inside kernel with PAIRED history buffers (round 3).

    The two per-span history streams (rm for the external bifurcation, rmmb
    for the multibranch one) age, shift, multiply and tree-reduce the same
    way, so they ride ONE buffer at 2G striping — row ``t*2G + fam*G + g``
    holds stream ``fam`` of sequence ``g`` at age ``t`` — and likewise
    their multiplicands (the ext suffix ensembles and the one-or-more
    sums) share ``EO``.  One shift, one masked multiply and one halving
    tree serve both families per span.  The halving pairs rows of equal
    (fam, g), so each family's reduction order matches the former
    separate-buffer kernels; measured vs those kernels in interpret mode
    the ext stream is bit-identical and the mb stream agrees to ~3e-8
    relative (reassociation-level; goldens and the f64 anchors gate the
    result)."""
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    EU1 = VEC[0, pl.ds(0, G), :]
    EBP = VEC[0, pl.ds(G, G), :]
    MBU1 = VEC[0, pl.ds(2 * G, G), :]
    MBBP = VEC[0, pl.ds(3 * G, G), :]

    for buf in (CJW, FQ2, EO, mbS):
        buf[:] = jnp.zeros_like(buf[:])
    EO[pl.ds(0, G), :] = jnp.ones((G, N), jnp.float32)  # ext(i, i-1) = 1
    close_out[0] = jnp.zeros_like(close_out[0])
    ext_out[0] = jnp.zeros_like(ext_out[0])
    one_out[0] = jnp.zeros_like(one_out[0])
    S1SC[:] = jnp.zeros_like(S1SC[:])

    G2 = 2 * G
    NG = N * G
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    fam0_full = (sub2 // G) % 2 == 0
    zero_blk = jnp.zeros((G, N), jnp.float32)

    def span_step(d, carry):
        rm_prev, rmmb_prev, epow_prev = carry

        js_blk = _blk(JS, d)
        OUT = _band_mm8(KBIG, CJW)
        two = js_blk * _skew_extract_sum8(OUT, N, 1)
        two = two + _blk(STK, d) * CJW[pl.ds(G, G), pl.ds(1, N)]
        two = two + _blk(B0R, d) * CJW[pl.ds(2 * G, G), pl.ds(1, N)]
        two = two + _blk(B0L, d) * CJW[pl.ds(2 * G, G), pl.ds(2, N)]
        two = two + _blk(I11, d) * CJW[pl.ds(3 * G, G), pl.ds(2, N)]
        mb_in = mbS[pl.ds(G, G), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in * _blk(MBC, d), 0.0)
        close_new = _blk(H, d) + two + mb_term
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, 0.0
        )
        close_out[0, pl.ds(d * G, G), :] = close_new
        acc_new = close_new * _blk(ACC, d)

        rm_new = rm_prev * EU1 + acc_new * EBP
        rmmb_new = rmmb_prev * MBU1 + acc_new * MBBP
        epow = epow_prev * EU1

        def tail(ht):
            h2 = ht * G2
            tb = tb2_full[:h2]
            fam0 = fam0_full[:h2]
            shifted = FQ2[pl.ds(0, h2 - G2), pl.ds(1, N + 7)]
            FQ2[pl.ds(G2, h2 - G2), pl.ds(0, N + 7)] = shifted
            FQ2[pl.ds(0, G), pl.ds(0, N)] = rm_new
            FQ2[pl.ds(G, G), pl.ds(0, N)] = rmmb_new

            terms = jnp.where(
                (tb <= d - 1) & (fam0 | (tb >= 1)),
                FQ2[pl.ds(0, h2), pl.ds(0, N)] * EO[pl.ds(0, h2), :],
                0.0,
            )
            red = _tree_to(terms, G2)    # (2G, N): [ext(G); mb(G)]
            ext_new = epow + red[:G]
            s2 = red[G:]
            ext_out[0, pl.ds(d * G, G), :] = ext_new

            # telescoped sum_t rmmb_{d-t} * mbu1^t (flush-safe; see the
            # per-seq kernels): FQ2's fam-1 block at age 1 after this
            # span's shift holds rmmb_{d-1} at the aged lane alignment
            s1v = MBU1 * (
                FQ2[pl.ds(3 * G, G), pl.ds(0, N)]
                + S1SC[pl.ds(0, G), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
            one_new = rmmb_new + s1v + s2
            mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
            mbS[pl.ds(0, G), pl.ds(0, N)] = s2
            one_out[0, pl.ds(d * G, G), :] = one_new
            EO[pl.ds((d + 1) * G2, G), :] = ext_new
            EO[pl.ds((d + 1) * G2 + G, G), :] = one_new

        prev = 0
        for ht in PF._live_heights(N):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        _shift_insert8(CJW, close_new * _blk(JB, d))
        return (rm_new, rmmb_new, epow)

    lax.fori_loop(
        0, n_i, span_step, (zero_blk, zero_blk, jnp.ones((G, N), jnp.float32))
    )


def _inside8a_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 6G, N): eu1 ebp mbu1 mbbp logmbu sig1
    H, MBC, ACC, JS, STK, I11, B0R, B0L, JB,  # (1, R*G, N) chunk blocks
    KC,                                      # (1, 32, 32) common banded kernel
    SIGL,                                    # (1, 1, G*SW) sigma^-1 lane row
    close_out, ext_out, one_out,             # (1, R*G, N) chunk blocks
    CJS, WINL, TWO8, FQ2, EO, mbS, S1SC, CARRY,
    *, N, R,
):
    """Aged lane-major window variant of :func:`_inside8_kernel`.

    Identical span recurrences; the banded 2-loop window path changes:
    the matmul operand is the lane-major aged scratch ``WINL`` (see the
    module-level ``_WINDOW_MODE`` note), the kernel ``KC`` is common
    across sequences, and the 4 explicit special cells read the 4-block
    sublane mini-window ``CJS``.  The grid is (K, N // R): score tables
    and outputs stream per R-span chunk (the chunked-tier pattern,
    pallas_fold_prob._contra_inside_prob_kernel_chunked) while the DP
    state scratches persist across grid steps — which caps the VMEM
    working set and admits G = 16 stacking."""
    c = pl.program_id(1)
    base = c * R
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    EU1 = VEC[0, pl.ds(0, G), :]
    EBP = VEC[0, pl.ds(G, G), :]
    MBU1 = VEC[0, pl.ds(2 * G, G), :]
    MBBP = VEC[0, pl.ds(3 * G, G), :]
    SIG1 = VEC[0, pl.ds(5 * G, G), :]   # exp(-ln_sigma) per sequence

    @pl.when(c == 0)
    def _init():
        for buf in (CJS, WINL, FQ2, EO, mbS, S1SC):
            buf[:] = jnp.zeros_like(buf[:])
        EO[pl.ds(0, G), :] = jnp.ones((G, N), jnp.float32)  # ext(i,i-1)=1

    # dead spans must still produce deterministic (zero) output rows
    close_out[0] = jnp.zeros_like(close_out[0])
    ext_out[0] = jnp.zeros_like(ext_out[0])
    one_out[0] = jnp.zeros_like(one_out[0])

    G2 = 2 * G
    NG = N * G
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    fam0_full = (sub2 // G) % 2 == 0
    kw = KC[0, pl.ds(0, 32), pl.ds(0, 32)]
    sig = SIGL[0, pl.ds(0, 1), :]
    first = c == 0
    rm0 = jnp.where(first, 0.0, CARRY[pl.ds(0, G), :])
    rmmb0 = jnp.where(first, 0.0, CARRY[pl.ds(G, G), :])
    epow0 = jnp.where(first, 1.0, CARRY[pl.ds(2 * G, G), :])

    def span_step(d, carry):
        rm_prev, rmmb_prev, epow_prev = carry
        dl = d - base

        js_blk = _blk(JS, dl)
        OUT = PP._mm_prec(kw, WINL[pl.ds(0, 32), :])
        two = (js_blk * SIG1) * _lm_to_blk(TWO8, _skew_lane_asc(OUT), N)
        two = two + _blk(STK, dl) * CJS[pl.ds(G, G), pl.ds(1, N)]
        two = two + _blk(B0R, dl) * CJS[pl.ds(2 * G, G), pl.ds(1, N)]
        two = two + _blk(B0L, dl) * CJS[pl.ds(2 * G, G), pl.ds(2, N)]
        two = two + _blk(I11, dl) * CJS[pl.ds(3 * G, G), pl.ds(2, N)]
        mb_in = mbS[pl.ds(G, G), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in * _blk(MBC, dl), 0.0)
        close_new = _blk(H, dl) + two + mb_term
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, 0.0
        )
        close_out[0, pl.ds(dl * G, G), :] = close_new
        acc_new = close_new * _blk(ACC, dl)

        rm_new = rm_prev * EU1 + acc_new * EBP
        rmmb_new = rmmb_prev * MBU1 + acc_new * MBBP
        epow = epow_prev * EU1

        def tail(ht):
            h2 = ht * G2
            tb = tb2_full[:h2]
            fam0 = fam0_full[:h2]
            shifted = FQ2[pl.ds(0, h2 - G2), pl.ds(1, N - 1)]
            FQ2[pl.ds(G2, h2 - G2), pl.ds(0, N - 1)] = shifted
            FQ2[pl.ds(G2, h2 - G2), pl.ds(N - 1, 1)] = jnp.zeros(
                (h2 - G2, 1), jnp.float32
            )
            FQ2[pl.ds(0, G), pl.ds(0, N)] = rm_new
            FQ2[pl.ds(G, G), pl.ds(0, N)] = rmmb_new

            terms = jnp.where(
                (tb <= d - 1) & (fam0 | (tb >= 1)),
                FQ2[pl.ds(0, h2), pl.ds(0, N)] * EO[pl.ds(0, h2), :],
                0.0,
            )
            red = _tree_to(terms, G2)    # (2G, N): [ext(G); mb(G)]
            ext_new = epow + red[:G]
            s2 = red[G:]
            ext_out[0, pl.ds(dl * G, G), :] = ext_new

            s1v = MBU1 * (
                FQ2[pl.ds(3 * G, G), pl.ds(0, N)]
                + S1SC[pl.ds(0, G), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
            one_new = rmmb_new + s1v + s2
            mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
            mbS[pl.ds(0, G), pl.ds(0, N)] = s2
            one_out[0, pl.ds(dl * G, G), :] = one_new
            EO[pl.ds((d + 1) * G2, G), :] = ext_new
            EO[pl.ds((d + 1) * G2 + G, G), :] = one_new

        prev = 0
        for ht in PF._live_heights(N):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        ins = close_new * _blk(JB, dl)
        _shift_insert8(CJS, ins)
        _winl_insert(WINL, ins, N, sig)
        return (rm_new, rmmb_new, epow)

    rm, rmmb, epow = lax.fori_loop(
        base, jnp.minimum(base + R, n_i), span_step, (rm0, rmmb0, epow0)
    )
    CARRY[pl.ds(0, G), :] = rm
    CARRY[pl.ds(G, G), :] = rmmb
    CARRY[pl.ds(2 * G, G), :] = epow


def _winl_insert2(WINL, ins1, ins0s, N, sig2, lane_off=0, rows=32):
    """One double-step aging of the lane-major window: rows age TWO spans
    in a single copy (x sigma^2), then the pair's two inserts land at rows
    0 (newest, ``ins1``) and 1 (``ins0s`` — already carrying its one
    sigma^-1 of age)."""
    SW = _seg(N)
    WINL[pl.ds(2, rows - 2), :] = WINL[pl.ds(0, rows - 2), :] * sig2
    for g in range(G):
        WINL[pl.ds(1, 1), pl.ds(g * SW + lane_off, N)] = ins0s[g : g + 1, :]
        WINL[pl.ds(0, 1), pl.ds(g * SW + lane_off, N)] = ins1[g : g + 1, :]


def _inside8a2_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 6G, N): eu1 ebp mbu1 mbbp logmbu sig1
    H, MBC, ACC, JS, STK, I11, B0R, B0L, JB,  # (1, R*G, N) chunk blocks
    KC12,                                    # (1, 64, 32): [KC; KC column-shifted]
    SIGL,                                    # (1, 1, G*SW) sigma^-1 lane row
    close_out, ext_out, one_out,             # (1, R*G, N) chunk blocks
    CJS, WINL, TWO8, FQ2, EO, mbS, S1SC, CARRY,
    *, N, R,
):
    """Double-span variant of :func:`_inside8a_kernel` (``_SPANS == 2``).

    Each grid-loop iteration processes the span PAIR (d0, d0+1).  Safe
    because the banded kernel's first three columns are structurally zero
    (see ``_SPANS``), so span d0+1's window contraction is
    ``sigma * (KCshift @ W_d0)`` — both spans contract the SAME window
    state through one stacked (64, 32) matmul.  The pair then shares:

    * ONE window aging copy (30 rows x sigma^2 instead of 2 x 31 rows);
    * ONE FQ2 history shift (2 blocks down + 2 lanes left instead of two
      1-block shifts) — span d0's bifurcation reduction reads the
      PRE-shift state at a (+1 block-offset EO, +1 lane) alignment with
      its age-0 term taken from registers, span d0+1's reads the
      post-shift state in the canonical per-span form.

    Results differ from the single-span kernels only by float
    reassociation (the span-d0 reduction tree pairs ages 1.. instead of
    0..; sigma is applied to the d0+1 contraction result instead of to
    the window rows) — gated by the same goldens/oracle budgets.
    FQ2 is allocated (2NG, N + 8) here: lanes >= N stay zero so the
    +1/+2-lane offset reads are plain in-bounds slices.
    """
    c = pl.program_id(1)
    base = c * R
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    EU1 = VEC[0, pl.ds(0, G), :]
    EBP = VEC[0, pl.ds(G, G), :]
    MBU1 = VEC[0, pl.ds(2 * G, G), :]
    MBBP = VEC[0, pl.ds(3 * G, G), :]
    SIG1 = VEC[0, pl.ds(5 * G, G), :]
    SIG1SQ = SIG1 * SIG1

    @pl.when(c == 0)
    def _init():
        for buf in (CJS, WINL, FQ2, EO, mbS, S1SC):
            buf[:] = jnp.zeros_like(buf[:])
        EO[pl.ds(0, G), :] = jnp.ones((G, N), jnp.float32)

    close_out[0] = jnp.zeros_like(close_out[0])
    ext_out[0] = jnp.zeros_like(ext_out[0])
    one_out[0] = jnp.zeros_like(one_out[0])

    G2 = 2 * G
    NG = N * G
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    fam0_full = (sub2 // G) % 2 == 0
    kw12 = KC12[0, pl.ds(0, 64), pl.ds(0, 32)]
    sig = SIGL[0, pl.ds(0, 1), :]
    sig2 = sig * sig
    first = c == 0
    rm0c = jnp.where(first, 0.0, CARRY[pl.ds(0, G), :])
    rmmb0c = jnp.where(first, 0.0, CARRY[pl.ds(G, G), :])
    epow0c = jnp.where(first, 1.0, CARRY[pl.ds(2 * G, G), :])
    lim = jnp.minimum(base + R, n_i)

    def _close_at(dl, two):
        mb_in = mbS[pl.ds(G, G), pl.ds(1, N)]
        return two, mb_in

    def pair_step(q, carry):
        rm_p, rmmb_p, epow_p = carry
        dl0 = 2 * q
        dl1 = dl0 + 1
        d0 = base + dl0
        d1 = d0 + 1
        live1 = d1 < lim

        # ---- both spans' window contractions off the SAME window state
        OUT12 = PP._mm_prec(kw12, WINL[pl.ds(0, 32), :])

        # ---- span d0: close
        two0 = (_blk(JS, dl0) * SIG1) * _lm_to_blk(
            TWO8, _skew_lane_asc(OUT12[:32]), N
        )
        two0 = two0 + _blk(STK, dl0) * CJS[pl.ds(G, G), pl.ds(1, N)]
        two0 = two0 + _blk(B0R, dl0) * CJS[pl.ds(2 * G, G), pl.ds(1, N)]
        two0 = two0 + _blk(B0L, dl0) * CJS[pl.ds(2 * G, G), pl.ds(2, N)]
        two0 = two0 + _blk(I11, dl0) * CJS[pl.ds(3 * G, G), pl.ds(2, N)]
        mb_in0 = mbS[pl.ds(G, G), pl.ds(1, N)]          # s2_{d0-2}, aged
        mb0 = jnp.where(d0 >= 2, mb_in0 * _blk(MBC, dl0), 0.0)
        close0 = _blk(H, dl0) + two0 + mb0
        close0 = jnp.where(d0 + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close0, 0.0)
        close_out[0, pl.ds(dl0 * G, G), :] = close0
        acc0 = close0 * _blk(ACC, dl0)
        g0 = close0 * _blk(JB, dl0)
        _shift_insert8(CJS, g0)                          # d1 reads age 1 = g0

        # ---- span d1: close (sigma residual doubled; mb reads pre-tail mbS)
        two1 = (_blk(JS, dl1) * SIG1SQ) * _lm_to_blk(
            TWO8, _skew_lane_asc(OUT12[32:]), N
        )
        two1 = two1 + _blk(STK, dl1) * CJS[pl.ds(G, G), pl.ds(1, N)]
        two1 = two1 + _blk(B0R, dl1) * CJS[pl.ds(2 * G, G), pl.ds(1, N)]
        two1 = two1 + _blk(B0L, dl1) * CJS[pl.ds(2 * G, G), pl.ds(2, N)]
        two1 = two1 + _blk(I11, dl1) * CJS[pl.ds(3 * G, G), pl.ds(2, N)]
        mb_in1 = mbS[pl.ds(0, G), pl.ds(1, N)]           # s2_{d1-2} = s2_{d0-1}
        mb1 = jnp.where(d1 >= 2, mb_in1 * _blk(MBC, dl1), 0.0)
        close1 = _blk(H, dl1) + two1 + mb1
        close1 = jnp.where(
            (d1 + 1 >= MIN_SPAN_HAIRPIN_CLOSE) & live1, close1, 0.0
        )
        close_out[0, pl.ds(dl1 * G, G), :] = close1
        acc1 = close1 * _blk(ACC, dl1)
        g1 = close1 * _blk(JB, dl1)

        # ---- external/one-state recurrences for both spans
        rm0 = rm_p * EU1 + acc0 * EBP
        rmmb0 = rmmb_p * MBU1 + acc0 * MBBP
        epow0 = epow_p * EU1
        rm1 = rm0 * EU1 + acc1 * EBP
        rmmb1 = rmmb0 * MBU1 + acc1 * MBBP
        epow1 = epow0 * EU1

        # ---- span d0 tail: reduction from the PRE-shift FQ2 state
        def tail0(ht):
            h2 = ht * G2
            bulk = jnp.where(
                tb2_full[:h2] <= d0 - 2,
                FQ2[pl.ds(0, h2), pl.ds(1, N)]
                * EO[pl.ds(G2, h2), pl.ds(0, N)],
                0.0,
            )
            red = _tree_to(bulk, G2)
            ext0 = epow0 + red[:G] + rm0 * EO[pl.ds(0, G), :]
            s2_0 = red[G:]
            ext_out[0, pl.ds(dl0 * G, G), :] = ext0
            s1v = MBU1 * (
                FQ2[pl.ds(G, G), pl.ds(1, N)]
                + S1SC[pl.ds(0, G), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
            one0 = rmmb0 + s1v + s2_0
            mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
            mbS[pl.ds(0, G), pl.ds(0, N)] = s2_0
            one_out[0, pl.ds(dl0 * G, G), :] = one0
            EO[pl.ds((d0 + 1) * G2, G), :] = ext0
            EO[pl.ds((d0 + 1) * G2 + G, G), :] = one0

        prev = 0
        for ht in PF._live_heights(N):
            cond = d0 < ht if prev == 0 else (d0 >= prev) & (d0 < ht)
            pl.when(cond)(functools.partial(tail0, ht))
            prev = ht

        # ---- double FQ2 shift + both inserts, then span d1 tail
        def tail1(ht):
            h2 = ht * G2
            FQ2[pl.ds(2 * G2, h2 - 2 * G2), pl.ds(0, N)] = FQ2[
                pl.ds(0, h2 - 2 * G2), pl.ds(2, N)
            ]
            # age-1 inserts: lanes shift LEFT as rows age, so target lane
            # l holds rm0[l + 1]; lane N-1 is rm0[N] = 0
            FQ2[pl.ds(G2, G), pl.ds(0, N - 1)] = rm0[:, 1:]
            FQ2[pl.ds(G2, G), pl.ds(N - 1, 1)] = jnp.zeros(
                (G, 1), jnp.float32
            )
            FQ2[pl.ds(G2 + G, G), pl.ds(0, N - 1)] = rmmb0[:, 1:]
            FQ2[pl.ds(G2 + G, G), pl.ds(N - 1, 1)] = jnp.zeros(
                (G, 1), jnp.float32
            )
            FQ2[pl.ds(0, G), pl.ds(0, N)] = rm1
            FQ2[pl.ds(G, G), pl.ds(0, N)] = rmmb1

            tb = tb2_full[:h2]
            fam0 = fam0_full[:h2]
            terms = jnp.where(
                (tb <= d1 - 1) & (fam0 | (tb >= 1)),
                FQ2[pl.ds(0, h2), pl.ds(0, N)] * EO[pl.ds(0, h2), pl.ds(0, N)],
                0.0,
            )
            red = _tree_to(terms, G2)
            ext1 = epow1 + red[:G]
            s2_1 = red[G:]
            ext_out[0, pl.ds(dl1 * G, G), :] = ext1
            s1v = MBU1 * (
                FQ2[pl.ds(3 * G, G), pl.ds(0, N)]
                + S1SC[pl.ds(0, G), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
            one1 = rmmb1 + s1v + s2_1
            mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
            mbS[pl.ds(0, G), pl.ds(0, N)] = s2_1
            one_out[0, pl.ds(dl1 * G, G), :] = one1
            EO[pl.ds((d1 + 1) * G2, G), :] = ext1
            EO[pl.ds((d1 + 1) * G2 + G, G), :] = one1

        prev = 0
        for ht in PF._live_heights(N):
            cond = d1 < ht if prev == 0 else (d1 >= prev) & (d1 < ht)
            pl.when(cond & live1)(functools.partial(tail1, ht))
            prev = ht

        # ---- window/mini inserts for the NEXT pair
        _shift_insert8(CJS, g1)
        _winl_insert2(WINL, g1, g0 * SIG1, N, sig2)

        rm_o = jnp.where(live1, rm1, rm0)
        rmmb_o = jnp.where(live1, rmmb1, rmmb0)
        epow_o = jnp.where(live1, epow1, epow0)
        return (rm_o, rmmb_o, epow_o)

    npairs = jnp.maximum(0, lim - base + 1) // 2
    rm, rmmb, epow = lax.fori_loop(
        0, npairs, pair_step, (rm0c, rmmb0c, epow0c)
    )
    CARRY[pl.ds(0, G), :] = rm
    CARRY[pl.ds(G, G), :] = rmmb
    CARRY[pl.ds(2 * G, G), :] = epow


# ---------------------------------------------------------------------------
# Outside kernel (stacked)
# ---------------------------------------------------------------------------

def _outside8_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 16, N): logmbu, b0lo'
    CLOSE, MBC, ACCB, ACCMB, STKO, I11O, B0RO, JRB, JSN,  # (1, N*8, N)
    ONEP,                                    # (1, N*8, 2N) pre-rotated
    QONE,                                    # (1, N*8, N)
    EXTR,                                    # (1, 8, 2N) pre-rotated
    KBIG,                                    # (1, 256, 256)
    bppo_out,                                # (1, N*8, N)
    OG, XS, RP2, SONEF, REXT, P2SC, QASC,
    *, N, min_span,
):
    """pm|pm2 history rides one 2G-striped buffer RP2 (see
    :func:`_inside8_kernel`); QONE arrives fam-duplicated at 2G striping."""
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    LOGMBU = VEC[0, pl.ds(0, G), :]
    B0LOv = VEC[0, pl.ds(G, G), :]

    for buf in (OG, XS, RP2):
        buf[:] = jnp.zeros_like(buf[:])
    bppo_out[0] = jnp.zeros_like(bppo_out[0])
    G2 = 2 * G
    NG = N * G
    SONEF[pl.ds(0, NG), :] = ONEP[0, pl.ds(0, NG), :]
    REXT[pl.ds(0, G), :] = EXTR[0, pl.ds(0, G), :]
    P2SC[:] = jnp.zeros_like(P2SC[:])
    QASC[:] = jnp.zeros_like(QASC[:])
    MBU1 = jnp.exp(LOGMBU)

    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    C2 = SONEF.shape[1]

    def span_step(step, carry):
        d = N - 1 - step
        k = step - (N - n_i)
        span_ok = (d + 1) >= min_span

        close_blk = _blk(CLOSE, d)
        pos = close_blk > 0.0
        inv_close = jnp.where(
            pos, 1.0 / jnp.where(pos, close_blk, 1.0), 0.0
        )
        rt = REXT[pl.ds(0, G), pl.ds(0, N)]
        base = close_blk * _blk(ACCB, d) * rt

        jrb_blk = _blk(JRB, d)
        OUT = _band_mm8(KBIG, OG)
        two = jrb_blk * _skew_extract_sum8(OUT, N, 31, descending=True)
        two = two + _blk(STKO, d) * OG[pl.ds(G, G), pl.ds(31, N)]
        two = two + _blk(B0RO, d) * OG[pl.ds(2 * G, G), pl.ds(31, N)]
        two = two + jrb_blk * B0LOv * OG[pl.ds(2 * G, G), pl.ds(30, N)]
        two = two + _blk(I11O, d) * OG[pl.ds(3 * G, G), pl.ds(30, N)]
        two = two * close_blk
        acc_mb = close_blk * _blk(ACCMB, d)
        jsn_blk = _blk(JSN, d)
        mbc_blk = _blk(MBC, d)

        def tail(ht):
            hg = ht * G
            Xr = XS[pl.ds(0, hg), :]
            s_one = SONEF[pl.ds(0, hg), pl.ds(0, N)]
            pm_new = jnp.where(span_ok, _tree8(Xr * s_one), 0.0)
            # telescoped pm2_s = XS[0:G] + mbu1 * pm2_{s-1} (flush-safe)
            pm2_raw = (
                XS[pl.ds(0, G), pl.ds(0, N)]
                + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw
            pm2_new = jnp.where(span_ok, pm2_raw, 0.0)
            h2 = ht * G2
            tb2 = tb2_full[:h2]
            shifted = RP2[pl.ds(0, h2 - G2), pl.ds(0, N - 1)]
            RP2[pl.ds(G2, h2 - G2), pl.ds(1, N - 1)] = shifted
            RP2[pl.ds(G2, h2 - G2), pl.ds(0, 1)] = jnp.zeros(
                (h2 - G2, 1), jnp.float32
            )
            RP2[pl.ds(0, G), pl.ds(0, N)] = pm_new
            RP2[pl.ds(G, G), pl.ds(0, N)] = pm2_new

            # diagonally telescoped QA (see the per-seq kernels): RP2's
            # fam-0 block at age 1 after this span's shift holds pm_{s-1}
            # aged one lane
            qa_raw = (
                RP2[pl.ds(G2, G), pl.ds(0, N)]
                + MBU1 * QASC[pl.ds(0, G), pl.ds(0, N)]
            )
            QASC[pl.ds(0, G), pl.ds(1, N)] = qa_raw
            terms2 = jnp.where(
                tb2 >= 1,
                RP2[pl.ds(0, h2), pl.ds(0, N)] * QONE[0, pl.ds(0, h2), :],
                0.0,
            )
            red2 = _tree_to(terms2, G2)   # [pm-family(G); pm2-family(G)]
            mb_ctx = acc_mb * (red2[G:] + red2[:G] + qa_raw)

            bppo_new = base + two + mb_ctx
            bppo_new = jnp.where(pos & span_ok, bppo_new, 0.0)
            bppo_out[0, pl.ds(d * G, G), :] = bppo_new

            g2 = bppo_new * jsn_blk * inv_close
            _shift_insert8(OG, g2, lane_off=32)
            g_row = bppo_new * mbc_blk * inv_close
            shifted = XS[pl.ds(0, hg - G), :]
            XS[pl.ds(G, hg - G), :] = shifted
            XS[pl.ds(0, G), :] = g_row
            PF._rotate_right(SONEF, hg)
            PF._rotate_right(REXT, G)

        prev = 0
        for ht in PF._live_heights(N):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = (hi - lo) * G
                    wrap = SONEF[pl.ds(lo * G, rows), pl.ds(C2 - lo, lo)]
                    body = SONEF[pl.ds(lo * G, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo * G, rows), pl.ds(lo, C2 - lo)] = body
                    SONEF[pl.ds(lo * G, rows), pl.ds(0, lo)] = wrap

                pl.when(k == prev)(bulk)
            cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht
        return carry

    lax.fori_loop(N - n_i, N, span_step, 0)


def _outside8a_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 3G, N): logmbu, sig1, b0lo'
    CLOSE, MBC, ACCB, ACCMB, STKO, I11O, B0RO, JRB, JSN,  # (1, R*G, N)
    ONEP,                                    # (1, N*8, 2N) pre-rotated
    QONE,                                    # (1, N*8, N)
    EXTR,                                    # (1, 8, 2N) pre-rotated
    KC,                                      # (1, 32, 32) common banded kernel
    SIGL,                                    # (1, 1, G*SW)
    bppo_out,                                # (1, R*G, N) chunk blocks
    OGS, WINL, TWO8, XS, RP2, SONEF, REXT, P2SC, QASC,
    *, N, R, min_span,
):
    """Aged lane-major window variant of :func:`_outside8_kernel` (see
    :func:`_inside8a_kernel`); the outside window geometry inserts at a
    +32 per-segment lane offset and extracts descending (base 31).
    Grid (K, N // R): chunk c covers steps [c*R, (c+1)*R), i.e. spans
    DECREASE across chunks, so the span-indexed table blocks arrive in
    reverse chunk order (index map C-1-c).  VEC: [logmbu; sig1; b0lo']."""
    c = pl.program_id(1)
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    LOGMBU = VEC[0, pl.ds(0, G), :]
    SIG1 = VEC[0, pl.ds(G, G), :]
    B0LOv = VEC[0, pl.ds(2 * G, G), :]
    G2 = 2 * G
    NG = N * G

    @pl.when(c == 0)
    def _init():
        for buf in (OGS, WINL, XS, RP2, P2SC, QASC):
            buf[:] = jnp.zeros_like(buf[:])
        SONEF[pl.ds(0, NG), :] = ONEP[0, pl.ds(0, NG), :]
        REXT[pl.ds(0, G), :] = EXTR[0, pl.ds(0, G), :]

    bppo_out[0] = jnp.zeros_like(bppo_out[0])
    MBU1 = jnp.exp(LOGMBU)
    baseo = N - (c + 1) * R   # d offset of this chunk's table blocks

    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    C2 = SONEF.shape[1]
    kw = KC[0, pl.ds(0, 32), pl.ds(0, 32)]
    sig = SIGL[0, pl.ds(0, 1), :]

    def span_step(step, carry):
        d = N - 1 - step
        k = step - (N - n_i)
        dl = d - baseo
        span_ok = (d + 1) >= min_span

        close_blk = _blk(CLOSE, dl)
        pos = close_blk > 0.0
        inv_close = jnp.where(
            pos, 1.0 / jnp.where(pos, close_blk, 1.0), 0.0
        )
        rt = REXT[pl.ds(0, G), pl.ds(0, N)]
        base = close_blk * _blk(ACCB, dl) * rt

        jrb_blk = _blk(JRB, dl)
        OUT = PP._mm_prec(kw, WINL[pl.ds(0, 32), :])
        two = (jrb_blk * SIG1) * _lm_to_blk(TWO8, _skew_lane_desc(OUT), N)
        two = two + _blk(STKO, dl) * OGS[pl.ds(G, G), pl.ds(31, N)]
        two = two + _blk(B0RO, dl) * OGS[pl.ds(2 * G, G), pl.ds(31, N)]
        two = two + jrb_blk * B0LOv * OGS[pl.ds(2 * G, G), pl.ds(30, N)]
        two = two + _blk(I11O, dl) * OGS[pl.ds(3 * G, G), pl.ds(30, N)]
        two = two * close_blk
        acc_mb = close_blk * _blk(ACCMB, dl)
        jsn_blk = _blk(JSN, dl)
        mbc_blk = _blk(MBC, dl)

        def tail(ht):
            hg = ht * G
            Xr = XS[pl.ds(0, hg), :]
            s_one = SONEF[pl.ds(0, hg), pl.ds(0, N)]
            pm_new = jnp.where(span_ok, _tree8(Xr * s_one), 0.0)
            pm2_raw = (
                XS[pl.ds(0, G), pl.ds(0, N)]
                + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw
            pm2_new = jnp.where(span_ok, pm2_raw, 0.0)
            h2 = ht * G2
            tb2 = tb2_full[:h2]
            shifted = RP2[pl.ds(0, h2 - G2), pl.ds(0, N - 1)]
            RP2[pl.ds(G2, h2 - G2), pl.ds(1, N - 1)] = shifted
            RP2[pl.ds(G2, h2 - G2), pl.ds(0, 1)] = jnp.zeros(
                (h2 - G2, 1), jnp.float32
            )
            RP2[pl.ds(0, G), pl.ds(0, N)] = pm_new
            RP2[pl.ds(G, G), pl.ds(0, N)] = pm2_new

            qa_raw = (
                RP2[pl.ds(G2, G), pl.ds(0, N)]
                + MBU1 * QASC[pl.ds(0, G), pl.ds(0, N)]
            )
            QASC[pl.ds(0, G), pl.ds(1, N)] = qa_raw
            terms2 = jnp.where(
                tb2 >= 1,
                RP2[pl.ds(0, h2), pl.ds(0, N)] * QONE[0, pl.ds(0, h2), :],
                0.0,
            )
            red2 = _tree_to(terms2, G2)   # [pm-family(G); pm2-family(G)]
            mb_ctx = acc_mb * (red2[G:] + red2[:G] + qa_raw)

            bppo_new = base + two + mb_ctx
            bppo_new = jnp.where(pos & span_ok, bppo_new, 0.0)
            bppo_out[0, pl.ds(dl * G, G), :] = bppo_new

            g2 = bppo_new * jsn_blk * inv_close
            _shift_insert8(OGS, g2, lane_off=32)
            _winl_insert(WINL, g2, N, sig, lane_off=32)
            g_row = bppo_new * mbc_blk * inv_close
            shifted = XS[pl.ds(0, hg - G), :]
            XS[pl.ds(G, hg - G), :] = shifted
            XS[pl.ds(0, G), :] = g_row
            PF._rotate_right(SONEF, hg)
            PF._rotate_right(REXT, G)

        prev = 0
        for ht in PF._live_heights(N):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = (hi - lo) * G
                    wrap = SONEF[pl.ds(lo * G, rows), pl.ds(C2 - lo, lo)]
                    body = SONEF[pl.ds(lo * G, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo * G, rows), pl.ds(lo, C2 - lo)] = body
                    SONEF[pl.ds(lo * G, rows), pl.ds(0, lo)] = wrap

                pl.when(k == prev)(bulk)
            cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht
        return carry

    lax.fori_loop(
        jnp.maximum(c * R, N - n_i), (c + 1) * R, span_step, 0
    )


def _outside8a2_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 3G, N): logmbu, sig1, b0lo'
    CLOSE, MBC, ACCB, ACCMB, STKO, I11O, B0RO, JRB, JSN,  # (1, R*G, N)
    ONEP,                                    # (1, N*8, 2N) pre-rotated (even n)
    QONE,                                    # (1, N*8 + 4G, N) zero-padded rows
    EXTR,                                    # (1, 8, 2N) pre-rotated (even n)
    KC12,                                    # (1, 64, 32): [KC; KC col-shifted]
    SIGL,                                    # (1, 1, G*SW)
    bppo_out,                                # (1, R*G, N) chunk blocks
    OGS, WINL, TWO8, RED2, PMB, XS, RP2, SONEF, REXT, P2SC, QASC,
    *, N, R, min_span,
):
    """Double-span variant of :func:`_outside8a_kernel` (``_SPANS == 2``).

    Spans decrease, so each iteration processes the pair (da, da-1).  The
    same structural-zero argument as :func:`_inside8a2_kernel` lets both
    spans contract one window state (stacked [KC; KCshift] matmul); the
    pair then shares ONE XS shift (2 blocks), ONE RP2 shift (2 blocks + 2
    lanes) and ONE SONEF lane rotation (by 2) — span da reads the
    pre-update states at +1 block/lane offsets with its fresh terms taken
    from registers (the ``tb2 >= 1`` mask already excludes the
    just-inserted block, so da's bifurcation needs NO register term),
    span da-1 reads canonically after the batched update.

    Pair alignment: the host pre-rotates ONEP/EXTR for the group length
    ROUNDED UP TO EVEN and the loop starts at the even step
    ``N - n_even`` — when n is odd the extra leading span (d = n) executes
    harmlessly (its close row is identically zero, so every produced
    value/insert is an exact zero) and performs the one rotation the
    rounded pre-rotation already accounts for.  The whole pair dispatches
    at the YOUNGER span's live height (the elder's reductions see extra
    all-zero blocks — exact identities).
    """
    c = pl.program_id(1)
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    n_even = n_i + (n_i % 2)
    LOGMBU = VEC[0, pl.ds(0, G), :]
    SIG1 = VEC[0, pl.ds(G, G), :]
    SIG1SQ = SIG1 * SIG1
    B0LOv = VEC[0, pl.ds(2 * G, G), :]
    G2 = 2 * G
    NG = N * G

    @pl.when(c == 0)
    def _init():
        for buf in (OGS, WINL, XS, RP2, P2SC, QASC):
            buf[:] = jnp.zeros_like(buf[:])
        SONEF[pl.ds(0, NG), :] = ONEP[0, pl.ds(0, NG), :]
        SONEF[pl.ds(NG, G), :] = jnp.zeros((G, SONEF.shape[1]), jnp.float32)
        REXT[pl.ds(0, G), :] = EXTR[0, pl.ds(0, G), :]

    bppo_out[0] = jnp.zeros_like(bppo_out[0])
    MBU1 = jnp.exp(LOGMBU)
    baseo = N - (c + 1) * R

    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    C2 = SONEF.shape[1]
    kw12 = KC12[0, pl.ds(0, 64), pl.ds(0, 32)]
    sig = SIGL[0, pl.ds(0, 1), :]
    sig2 = sig * sig

    def pair_step(p, carry):
        s0 = c * R + 2 * p
        da = N - 1 - s0
        db = da - 1
        ka = s0 - (N - n_even)
        kb = ka + 1
        dla = da - baseo
        dlb = db - baseo
        ok_a = (da + 1) >= min_span
        ok_b = (db + 1) >= min_span

        OUT12 = PP._mm_prec(kw12, WINL[pl.ds(0, 32), :])
        E_a = _skew_lane_desc(OUT12[:32])
        E_b = _skew_lane_desc(OUT12[32:])

        def pair_body(ht):
            hg = ht * G
            h2 = ht * G2

            # ================= span da =================
            close_a = _blk(CLOSE, dla)
            pos_a = close_a > 0.0
            inv_a = jnp.where(pos_a, 1.0 / jnp.where(pos_a, close_a, 1.0), 0.0)
            rt_a = REXT[pl.ds(0, G), pl.ds(0, N)]
            base_a = close_a * _blk(ACCB, dla) * rt_a
            jrb_a = _blk(JRB, dla)
            two_a = (jrb_a * SIG1) * _lm_to_blk(TWO8, E_a, N)
            two_a = two_a + _blk(STKO, dla) * OGS[pl.ds(G, G), pl.ds(31, N)]
            two_a = two_a + _blk(B0RO, dla) * OGS[pl.ds(2 * G, G), pl.ds(31, N)]
            two_a = two_a + jrb_a * B0LOv * OGS[pl.ds(2 * G, G), pl.ds(30, N)]
            two_a = two_a + _blk(I11O, dla) * OGS[pl.ds(3 * G, G), pl.ds(30, N)]
            two_a = two_a * close_a
            acc_mb_a = close_a * _blk(ACCMB, dla)

            pm_a = jnp.where(
                ok_a,
                _tree8(
                    XS[pl.ds(0, hg), :] * SONEF[pl.ds(0, hg), pl.ds(0, N)]
                ),
                0.0,
            )
            pm2_raw = (
                XS[pl.ds(0, G), pl.ds(0, N)]
                + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw
            pm2_a = jnp.where(ok_a, pm2_raw, 0.0)

            # bifurcation terms: canonical state would be the single-shifted
            # RP2 with [pm_a; pm2_a] at block 0 — which the tb2 >= 1 mask
            # EXCLUDES, so the whole sum reads the pre-shift state:
            # RP2_post[t, l] = RP2_pre[t-1, l-1]
            bulk_a = (
                RP2[pl.ds(0, h2), pl.ds(0, N - 1)]
                * QONE[0, pl.ds(G2, h2), pl.ds(1, N - 1)]
            )
            red_a = _tree_to(bulk_a, G2)                 # lanes 1..N-1
            RED2[pl.ds(0, G2), pl.ds(1, N - 1)] = red_a
            RED2[pl.ds(0, G2), pl.ds(0, 1)] = jnp.zeros((G2, 1), jnp.float32)
            redf_a = RED2[pl.ds(0, G2), pl.ds(0, N)]
            # qa: canonical reads post-shift block 1 pm-fam = RP2_pre[0:G, l-1]
            PMB[pl.ds(0, G), pl.ds(1, N - 1)] = RP2[pl.ds(0, G), pl.ds(0, N - 1)]
            PMB[pl.ds(0, G), pl.ds(0, 1)] = jnp.zeros((G, 1), jnp.float32)
            qa_a = PMB[pl.ds(0, G), pl.ds(0, N)] + MBU1 * QASC[
                pl.ds(0, G), pl.ds(0, N)
            ]
            QASC[pl.ds(0, G), pl.ds(1, N)] = qa_a
            mb_ctx_a = acc_mb_a * (redf_a[G:] + redf_a[:G] + qa_a)

            bppo_a = base_a + two_a + mb_ctx_a
            bppo_a = jnp.where(pos_a & ok_a, bppo_a, 0.0)
            bppo_out[0, pl.ds(dla * G, G), :] = bppo_a
            g2_a = bppo_a * _blk(JSN, dla) * inv_a
            _shift_insert8(OGS, g2_a, lane_off=32)
            g_row_a = bppo_a * _blk(MBC, dla) * inv_a
            PF._rotate_right(REXT, G)

            # ================= span db =================
            close_b = _blk(CLOSE, dlb)
            pos_b = close_b > 0.0
            inv_b = jnp.where(pos_b, 1.0 / jnp.where(pos_b, close_b, 1.0), 0.0)
            rt_b = REXT[pl.ds(0, G), pl.ds(0, N)]
            base_b = close_b * _blk(ACCB, dlb) * rt_b
            jrb_b = _blk(JRB, dlb)
            two_b = (jrb_b * SIG1SQ) * _lm_to_blk(TWO8, E_b, N)
            two_b = two_b + _blk(STKO, dlb) * OGS[pl.ds(G, G), pl.ds(31, N)]
            two_b = two_b + _blk(B0RO, dlb) * OGS[pl.ds(2 * G, G), pl.ds(31, N)]
            two_b = two_b + jrb_b * B0LOv * OGS[pl.ds(2 * G, G), pl.ds(30, N)]
            two_b = two_b + _blk(I11O, dlb) * OGS[pl.ds(3 * G, G), pl.ds(30, N)]
            two_b = two_b * close_b
            acc_mb_b = close_b * _blk(ACCMB, dlb)

            # pm_b over XS' = [g_row_a; XS..] and SONEF' = rotate1(SONEF):
            # lanes >= 1 from body slices, lane 0 from the rotation wrap
            pm_body = _tree8(
                XS[pl.ds(0, hg), pl.ds(1, N - 1)]
                * SONEF[pl.ds(G, hg), pl.ds(0, N - 1)]
            ) + g_row_a[:, 1:] * SONEF[pl.ds(0, G), pl.ds(0, N - 1)]
            pm_l0 = _tree8(
                XS[pl.ds(0, hg), pl.ds(0, 1)]
                * SONEF[pl.ds(G, hg), pl.ds(C2 - 1, 1)]
            ) + g_row_a[:, :1] * SONEF[pl.ds(0, G), pl.ds(C2 - 1, 1)]
            PMB[pl.ds(0, G), pl.ds(1, N - 1)] = pm_body
            PMB[pl.ds(0, G), pl.ds(0, 1)] = pm_l0
            pm_b = jnp.where(ok_b, PMB[pl.ds(0, G), pl.ds(0, N)], 0.0)
            pm2_raw_b = g_row_a + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
            P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw_b
            pm2_b = jnp.where(ok_b, pm2_raw_b, 0.0)

            # bifurcation: canonical post-DOUBLE-shift state; block 1 holds
            # [pm_a; pm2_a] (registers), blocks >= 2 the pre state at
            # (+2 block, +2 lane)
            bulk_b = (
                RP2[pl.ds(0, h2), pl.ds(0, N - 2)]
                * QONE[0, pl.ds(2 * G2, h2), pl.ds(2, N - 2)]
            )
            red_b = _tree_to(bulk_b, G2)                 # lanes 2..N-1
            RED2[pl.ds(0, G2), pl.ds(2, N - 2)] = red_b
            RED2[pl.ds(0, G2), pl.ds(0, 2)] = jnp.zeros((G2, 2), jnp.float32)
            RED2[pl.ds(0, G), pl.ds(1, N - 1)] = (
                RED2[pl.ds(0, G), pl.ds(1, N - 1)]
                + pm_a[:, : N - 1] * QONE[0, pl.ds(G2, G), pl.ds(1, N - 1)]
            )
            RED2[pl.ds(G, G), pl.ds(1, N - 1)] = (
                RED2[pl.ds(G, G), pl.ds(1, N - 1)]
                + pm2_a[:, : N - 1] * QONE[0, pl.ds(G2 + G, G), pl.ds(1, N - 1)]
            )
            redf_b = RED2[pl.ds(0, G2), pl.ds(0, N)]
            PMB[pl.ds(0, G), pl.ds(1, N - 1)] = pm_a[:, : N - 1]
            PMB[pl.ds(0, G), pl.ds(0, 1)] = jnp.zeros((G, 1), jnp.float32)
            qa_b = PMB[pl.ds(0, G), pl.ds(0, N)] + MBU1 * QASC[
                pl.ds(0, G), pl.ds(0, N)
            ]
            QASC[pl.ds(0, G), pl.ds(1, N)] = qa_b
            mb_ctx_b = acc_mb_b * (redf_b[G:] + redf_b[:G] + qa_b)

            bppo_b = base_b + two_b + mb_ctx_b
            bppo_b = jnp.where(pos_b & ok_b, bppo_b, 0.0)
            bppo_out[0, pl.ds(dlb * G, G), :] = bppo_b
            g2_b = bppo_b * _blk(JSN, dlb) * inv_b
            _shift_insert8(OGS, g2_b, lane_off=32)
            g_row_b = bppo_b * _blk(MBC, dlb) * inv_b
            PF._rotate_right(REXT, G)

            # ================= batched pair updates =================
            XS[pl.ds(2 * G, hg - 2 * G), :] = XS[pl.ds(0, hg - 2 * G), :]
            XS[pl.ds(G, G), :] = g_row_a
            XS[pl.ds(0, G), :] = g_row_b

            RP2[pl.ds(2 * G2, h2 - 2 * G2), pl.ds(2, N - 2)] = RP2[
                pl.ds(0, h2 - 2 * G2), pl.ds(0, N - 2)
            ]
            RP2[pl.ds(2 * G2, h2 - 2 * G2), pl.ds(0, 2)] = jnp.zeros(
                (h2 - 2 * G2, 2), jnp.float32
            )
            RP2[pl.ds(G2, G), pl.ds(1, N - 1)] = pm_a[:, : N - 1]
            RP2[pl.ds(G2, G), pl.ds(0, 1)] = jnp.zeros((G, 1), jnp.float32)
            RP2[pl.ds(G2 + G, G), pl.ds(1, N - 1)] = pm2_a[:, : N - 1]
            RP2[pl.ds(G2 + G, G), pl.ds(0, 1)] = jnp.zeros(
                (G, 1), jnp.float32
            )
            RP2[pl.ds(0, G), pl.ds(0, N)] = pm_b
            RP2[pl.ds(G, G), pl.ds(0, N)] = pm2_b

            wrap = SONEF[pl.ds(0, hg), pl.ds(C2 - 2, 2)]
            body = SONEF[pl.ds(0, hg), pl.ds(0, C2 - 2)]
            SONEF[pl.ds(0, hg), pl.ds(2, C2 - 2)] = body
            SONEF[pl.ds(0, hg), pl.ds(0, 2)] = wrap

            _winl_insert2(WINL, g2_b, g2_a * SIG1, N, sig2, lane_off=32)

        prev = 0
        for ht in PF._live_heights(N):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = (hi - lo) * G
                    wrapb = SONEF[pl.ds(lo * G, rows), pl.ds(C2 - lo, lo)]
                    bodyb = SONEF[pl.ds(lo * G, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo * G, rows), pl.ds(lo, C2 - lo)] = bodyb
                    SONEF[pl.ds(lo * G, rows), pl.ds(0, lo)] = wrapb

                pl.when(ka == prev)(bulk)
            cond = kb < ht if prev == 0 else (kb >= prev) & (kb < ht)
            pl.when(cond)(functools.partial(pair_body, ht))
            prev = ht
        return carry

    p0 = jnp.maximum(0, (N - n_even) - c * R) // 2
    lax.fori_loop(p0, R // 2, pair_step, 0)


# ---------------------------------------------------------------------------
# Host-side table merging + call wrappers
# ---------------------------------------------------------------------------

def _nn(*shape):
    return pl.BlockSpec(
        (1,) + shape,
        lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )


_SMEM_SPEC = pl.BlockSpec(
    (1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
)


def _group_scal(ns, B):
    n_max = jnp.max(ns.reshape(B // G, G), axis=1).astype(jnp.float32)
    z = jnp.zeros((B // G,), jnp.float32)
    scal = jnp.stack([z] * 7 + [n_max], axis=1)
    return scal[:, None, :], n_max


def _merge_inside(pmats, LENp):
    """Fold CANON and the per-seq LEN special coefficients into the
    [d, i] tables (see the per-seq kernel's span body)."""
    canon = pmats["CANON"]
    js = pmats["JS"] * canon
    len10 = LENp[:, 1, 0][:, None, None]
    len01 = LENp[:, 0, 1][:, None, None]
    len11 = LENp[:, 1, 1][:, None, None]
    return {
        "H": pmats["H"] * canon,
        "MBC": pmats["MBC"] * canon,
        "ACC": pmats["ACC"],
        "JS": js,
        "STK": pmats["STK"] * canon,
        "I11": js * len11 * pmats["I11"],
        "B0R": js * len10 * pmats["B0R"],
        "B0L": js * len01 * pmats["B0L"],
        "JB": pmats["JB"],
    }


def _merge_outside(close, pmats, LENp, extL, glob, ebp, mbbp):
    """Fold EXTL / 1/Z / ebp / mbbp / LEN specials into the [d, i] tables.

    Same role swap as the per-sequence outside call: the inner-junction
    table JB plays the outer role (JRB) and JS the new-inner role (JSN)."""
    inv_glob = (1.0 / glob)[:, None, None]
    len10 = LENp[:, 1, 0][:, None, None]
    len01 = LENp[:, 0, 1][:, None, None]
    len11 = LENp[:, 1, 1][:, None, None]
    jrb = pmats["JB"]
    return {
        "CLOSE": close,
        "MBC": pmats["MBC"],
        "ACCB": pmats["ACC"] * extL[:, None, :] * inv_glob
        * ebp[:, None, None],
        "ACCMB": pmats["ACC"] * mbbp[:, None, None],
        "STKO": pmats["STKO"],
        "I11O": jrb * len11 * pmats["I11O"],
        "B0RO": jrb * len10 * pmats["B0RO"],
        "JRB": jrb,
        "JSN": pmats["JS"],
    }, len01[:, 0] * pmats["B0LO"]


def contra_prob_mats_merged(seqs, ns, ct, ln_sigma, N, interpret=False):
    """Merged probability-space precompute for the stacked aged kernels.

    Folds every _merge_inside / _merge_outside product (and the sigma-span
    powers, LEN specials and CANON masks) into [p, q] LOG space BEFORE the
    diagonal re-layout, so the whole table pipeline is: pq assembly (SEP
    sums + iota sigma terms, one fused XLA pass per table) -> exp -> ONE
    fused Pallas skew of the 11 distinct merged tables -> transpose.  The
    round-3 pipeline ran skew(8 log tables) -> transpose -> exp(13) ->
    merge(9 products) -> interleave, each a separate HBM round trip —
    profiled at ~5.6 ms of the 14 ms stage-split batch (the largest stage
    after the aged-window kernels).

    Returns (mi, mo_pre, ACC_di, b0lo): the inside merged [d, i] tables,
    the precompute-only outside merged tables (ACCB and CLOSE need the
    inside DP results and are assembled by the caller), the raw
    probability-space ACC grid, and the outside b0lo lane vector.
    Validated against the round-3 pipeline in interpret mode (identical
    kernel outputs) and by the hardware goldens."""
    from .pallas_skew import skew_pq_batch

    pq, vb0_m1, vb0_x1 = PF.contra_pq_tables(seqs, ns, ct, N)
    LENlog = PF._contra_len_di(ct)  # (W2, W) [b, a] log constants
    len11_log = LENlog[1, 1]
    len10_log = LENlog[1, 0]
    len01_log = LENlog[0, 1]
    hp_cum = ct["hairpin_scores_len_cumulative"]
    MAXL = hp_cum.shape[0] - 1

    def one(pqd, v_m1, v_x1, ls):
        p = jnp.arange(N)[:, None]
        q = jnp.arange(N)[None, :]
        span = (q - p + 1).astype(jnp.float32)
        canon = pqd["CANON"]
        JS, JB = pqd["JS"], pqd["JB"]
        STK, I11 = pqd["STK"], pqd["I11"]
        hlen = q - p - 1

        def sh(M, dp, dq):
            """M[p+dp, q+dq], 0.0 (log) fill — matches shift_b semantics."""
            r = jnp.roll(M, (-dp, -dq), axis=(0, 1))
            ok = (
                (p + dp >= 0) & (p + dp < N) & (q + dq >= 0) & (q + dq < N)
            )
            return jnp.where(ok, r, 0.0)

        e = jnp.exp
        qi = jnp.arange(N)
        vq2 = jnp.where(qi + 2 < N, jnp.roll(v_m1, -2), 0.0)
        tabs = {
            "H": canon * jnp.where(
                (hlen >= 0) & (hlen <= MAXL),
                e(hp_cum[jnp.clip(hlen, 0, MAXL)] + JS - span * ls),
                0.0,
            ),
            "MBC": canon * e(pqd["MBC"] - 2.0 * ls),
            "ACC": e(pqd["ACC"]),
            "JS": canon * e(JS),
            "STK": canon * e(STK - sh(JB, 1, -1) - 2.0 * ls),
            "I11": canon * e(JS + I11 + len11_log - 4.0 * ls),
            "B0R": canon * e(JS + v_m1[None, :] + len10_log - 3.0 * ls),
            "JB": e(JB),
            "STKO": e(sh(STK, -1, 1) - sh(JS, -1, 1) - 2.0 * ls),
            "I11O": e(JB + sh(I11, -2, 2) + len11_log - 4.0 * ls),
            "B0RO": e(JB + vq2[None, :] + len10_log - 3.0 * ls),
        }
        vecs = (
            e(v_x1 + len01_log - 3.0 * ls),   # B0L'm lane factor
            e(v_m1 + len01_log - 3.0 * ls),   # b0lo (outside)
        )
        return tabs, vecs

    tabs, (b0l_vec, b0lo) = jax.vmap(one)(pq, vb0_m1, vb0_x1, ln_sigma)
    names = sorted(tabs)
    skewed = skew_pq_batch([tabs[k] for k in names], interpret=interpret)
    di = {
        k: jnp.transpose(v, (0, 2, 1)) for k, v in zip(names, skewed)
    }
    mbbp = jnp.exp(ct["multibranch_score_basepair"])
    mi = {
        "H": di["H"],
        "MBC": di["MBC"],
        "ACC": di["ACC"],
        "JS": di["JS"],
        "STK": di["STK"],
        "I11": di["I11"],
        "B0R": di["B0R"],
        "B0L": di["JS"] * b0l_vec[:, None, :],
        "JB": di["JB"],
    }
    mo_pre = {
        "MBC": di["MBC"],
        "ACCMB": di["ACC"] * mbbp,
        "STKO": di["STKO"],
        "I11O": di["I11O"],
        "B0RO": di["B0RO"],
        "JRB": di["JB"],
        "JSN": di["JS"],
    }
    return mi, mo_pre, di["ACC"], b0lo


def _prob8_run_body(seqs, ns, ct, ln_sigma, N, allows_short_hairpins,
                    interpret, upto=None):
    """Fixed-``ln_sigma`` body of the stacked CONTRA path.

    ``upto`` (static; profiling only — see scripts/profile_prob8.py) stops
    after a named stage and returns its raw outputs: "iprep" (merged inside
    tables), "inside" (stacked inside kernel), "aux" (outside auxiliaries),
    "oprep" (merged outside tables)."""
    B = seqs.shape[0]
    K = B // G
    NG = N * G
    aged = _WINDOW_MODE == "aged"
    if aged:
        SW = _seg(N)
        # common (sigma-free) banded kernel + per-segment sigma^-1 lane rows
        LENc = jnp.exp(PF._contra_len_di(ct))[None]
        KBIG = PP._banded_window_kernel(LENc)
        SIGL = jnp.broadcast_to(
            jnp.exp(-ln_sigma).reshape(K, G, 1), (K, G, SW)
        ).reshape(K, 1, G * SW)
        mim, mo_pre, ACC_di, b0lo = contra_prob_mats_merged(
            seqs, ns, ct, ln_sigma, N, interpret=interpret
        )
    else:
        pmats = PP.contra_prob_mats(seqs, ns, ct, ln_sigma, N)
        LENp = PP._contra_len_prob(ct, ln_sigma)
        KBIG = _kbig(PP._banded_window_kernel(LENp))
    scal, n_max = _group_scal(ns, B)

    eu1 = jnp.exp(ct["external_score_unpair"] - ln_sigma)
    ebp = jnp.broadcast_to(jnp.exp(ct["external_score_basepair"]), (B,))
    mbu1 = jnp.exp(ct["multibranch_score_unpair"] - ln_sigma)
    mbbp = jnp.broadcast_to(
        jnp.exp(ct["multibranch_score_basepair"]), (B,)
    )
    logmbu = jnp.broadcast_to(
        ct["multibranch_score_unpair"] - ln_sigma, (B,)
    )
    sig1 = jnp.exp(-ln_sigma)
    if aged:
        vec_i = _bcast_rows(N, eu1, ebp, mbu1, mbbp, logmbu, sig1)
        mi = {k: ilv(v) for k, v in mim.items()}
    else:
        vec_i = _bcast_rows(N, eu1, ebp, mbu1, mbbp, logmbu)
        mi = {k: ilv(v) for k, v in _merge_inside(pmats, LENp).items()}
    if upto == "iprep":
        return mi, KBIG, vec_i

    out_shape = tuple(
        jax.ShapeDtypeStruct((K, NG, N), jnp.float32) for _ in range(3)
    )
    if aged:
        # R=16 at N=256: the outside working set measures 133 MB at R=32
        # against the 128 MB physical VMEM (chunk blocks scale with R*G)
        R = min(32, N) if N <= 128 else 16
        C = N // R
        # two-span pairing is validated (Mosaic + goldens) at N <= 128;
        # at N = 256 the outside pair kernel crashes the remote Mosaic
        # compiler (tpu_compile_helper exit 1, no diagnostic — suspected
        # trigger: the ht=256 ladder's (16384, N-2)-shaped odd-width
        # pair-offset operands), so the 256 bucket stays on the
        # single-span kernels
        two_span = _SPANS == 2 and N <= 128
        if two_span:
            kernel = functools.partial(_inside8a2_kernel, N=N, R=R)
            # stacked [KC; KC column-shifted] kernel for the span pair
            KIN = jnp.concatenate(
                [
                    KBIG,
                    jnp.concatenate(
                        [KBIG[:, :, 1:], jnp.zeros_like(KBIG[:, :, :1])],
                        axis=2,
                    ),
                ],
                axis=1,
            )
            ki_rows = 64
            fq2_scratch = pltpu.VMEM((2 * NG, N + 8), jnp.float32)
        else:
            kernel = functools.partial(_inside8a_kernel, N=N, R=R)
            KIN = KBIG
            ki_rows = 32
            fq2_scratch = pltpu.VMEM((2 * NG, N), jnp.float32)

        def _kc(*shape):
            return pl.BlockSpec(
                (1,) + shape, lambda k, c: (k, 0, 0),
                memory_space=pltpu.VMEM,
            )

        chunk = pl.BlockSpec(
            (1, R * G, N), lambda k, c: (k, c, 0), memory_space=pltpu.VMEM
        )
        close8, ext8, one8 = pl.pallas_call(
            kernel,
            grid=(K, C),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 8), lambda k, c: (k, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                _kc(6 * G, N),
                *(chunk for _ in range(9)),
                pl.BlockSpec(
                    (1, ki_rows, 32), lambda k, c: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                _kc(1, G * SW),
            ],
            out_specs=(chunk, chunk, chunk),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((4 * G, N + LPAD), jnp.float32),     # CJS (mini)
                pltpu.VMEM((40, G * SW), jnp.float32),          # WINL
                pltpu.VMEM((G, N), jnp.float32),                # TWO8
                fq2_scratch,                                    # FQ2
                pltpu.VMEM((2 * NG + 2 * G, N), jnp.float32),   # EO
                pltpu.VMEM((2 * G, N + 8), jnp.float32),        # mbS
                pltpu.VMEM((G, N + 8), jnp.float32),            # S1SC
                pltpu.VMEM((3 * G, N), jnp.float32),            # CARRY
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
        )(
            scal, vec_i,
            mi["H"], mi["MBC"], mi["ACC"], mi["JS"], mi["STK"],
            mi["I11"], mi["B0R"], mi["B0L"], mi["JB"], KIN, SIGL,
        )
    else:
        kernel = functools.partial(_inside8_kernel, N=N)
        close8, ext8, one8 = pl.pallas_call(
            kernel,
            grid=(K,),
            in_specs=[
                _SMEM_SPEC,
                _nn(5 * G, N),
                *(_nn(NG, N) for _ in range(9)),
                _nn(32 * G, 32 * G),
            ],
            out_specs=(_nn(NG, N), _nn(NG, N), _nn(NG, N)),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((WB, N + LPAD), jnp.float32),        # CJW
                pltpu.VMEM((2 * NG, N + 8), jnp.float32),       # FQ2 (rm|rmmb)
                pltpu.VMEM((2 * NG + 2 * G, N), jnp.float32),   # EO (ext|one)
                pltpu.VMEM((2 * G, N + 8), jnp.float32),        # mbS
                pltpu.VMEM((G, N + 8), jnp.float32),            # S1SC
            ],
            interpret=interpret,
        )(
            scal, vec_i,
            mi["H"], mi["MBC"], mi["ACC"], mi["JS"], mi["STK"],
            mi["I11"], mi["B0R"], mi["B0L"], mi["JB"], KBIG,
        )

    if upto == "inside":
        return close8, ext8, one8

    ext, one = dilv(ext8), dilv(one8)
    # re-mask rows past each sequence's own length: the group loop runs to
    # the group max, and the outside auxiliaries index rows by per-seq n
    live = jnp.arange(N)[None, :, None] < ns[:, None, None]
    ext = jnp.where(live, ext, 0.0)
    one = jnp.where(live, one, 0.0)

    n_rot_g = n_max.astype(jnp.int32)
    if aged and _SPANS == 2 and N <= 128:
        # the double-span outside pairs steps from an even-aligned start;
        # the rounded pre-rotation absorbs the (harmless, all-zero) extra
        # leading span executed when the group length is odd.  N > 128
        # stays on the single-span outside kernel (see two_span above),
        # which needs the UNROUNDED alignment.
        n_rot_g = n_rot_g + (n_rot_g % 2)
    ONEP, QONE, extL, extR, glob = PF.contra_outside_aux(
        ns, ext, one, N, neg=0.0, one_val=1.0,
        n_rot=jnp.repeat(n_rot_g, G),
    )
    if upto == "aux":
        return ONEP, QONE, extL, extR, glob

    if aged:
        # precompute-only outside tables were merged pre-skew; only ACCB
        # (needs extL + 1/Z) and CLOSE (the inside DP output, reused in
        # its interleaved form — no dilv/re-ilv round trip) remain
        accb = (
            ACC_di * extL[:, None, :] * (1.0 / glob)[:, None, None]
            * ebp[:, None, None]
        )
        mo8 = {k: ilv(v) for k, v in mo_pre.items()}
        mo8["ACCB"] = ilv(accb)
        mo8["CLOSE"] = close8
        vec_o = jnp.concatenate(
            [_bcast_rows(N, logmbu, sig1), ilv(b0lo[:, None, :])], axis=1
        )
    else:
        close = dilv(close8)
        mo, b0lo = _merge_outside(close, pmats, LENp, extL, glob, ebp, mbbp)
        mo8 = {k: ilv(v) for k, v in mo.items()}
        vec_o = jnp.concatenate(
            [_bcast_rows(N, logmbu), ilv(b0lo[:, None, :])], axis=1
        )
    ONEP8 = ilv(ONEP)
    QONE8 = dup2(ilv(QONE))
    EXTR8 = ilv(extR[:, None, :])
    if upto == "oprep":
        return mo8, ONEP8, QONE8, EXTR8, vec_o

    min_span = 2 if allows_short_hairpins else MIN_SPAN_HAIRPIN_CLOSE
    if aged:
        chunk_desc = pl.BlockSpec(
            (1, R * G, N), lambda k, c: (k, C - 1 - c, 0),
            memory_space=pltpu.VMEM,
        )
        if two_span:
            kernel_o = functools.partial(
                _outside8a2_kernel, N=N, R=R, min_span=min_span
            )
            # pair-offset bulk reads index QONE rows up to h2 + 2*G2
            QONE8 = jnp.concatenate(
                [
                    QONE8,
                    jnp.zeros((K, 4 * G, N), jnp.float32),
                ],
                axis=1,
            )
            qone_rows = 2 * NG + 4 * G
            extra_scr = [
                pltpu.VMEM((2 * G, N), jnp.float32),            # RED2
                pltpu.VMEM((G, N), jnp.float32),                # PMB
            ]
            sonef_scr = pltpu.VMEM((NG + G, 2 * N), jnp.float32)
        else:
            kernel_o = functools.partial(
                _outside8a_kernel, N=N, R=R, min_span=min_span
            )
            qone_rows = 2 * NG
            extra_scr = []
            sonef_scr = pltpu.VMEM((NG, 2 * N), jnp.float32)
        bppo8 = pl.pallas_call(
            kernel_o,
            grid=(K, C),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 8), lambda k, c: (k, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                _kc(3 * G, N),
                *(chunk_desc for _ in range(9)),
                _kc(NG, 2 * N),                    # ONEP
                _kc(qone_rows, N),                 # QONE (fam-duplicated)
                _kc(G, 2 * N),                     # EXTR
                pl.BlockSpec(
                    (1, ki_rows, 32), lambda k, c: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                _kc(1, G * SW),
            ],
            out_specs=chunk_desc,
            out_shape=jax.ShapeDtypeStruct((K, NG, N), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((4 * G, N + LPAD), jnp.float32),     # OGS (mini)
                pltpu.VMEM((40, G * SW), jnp.float32),          # WINL
                pltpu.VMEM((G, N), jnp.float32),                # TWO8
                *extra_scr,                                     # RED2, PMB
                pltpu.VMEM((NG, N), jnp.float32),               # XS
                pltpu.VMEM((2 * NG, N), jnp.float32),           # RP2
                sonef_scr,                                      # SONEF
                pltpu.VMEM((G, 2 * N), jnp.float32),            # REXT
                pltpu.VMEM((G, N), jnp.float32),                # P2SC
                pltpu.VMEM((G, N + 8), jnp.float32),            # QASC
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
        )(
            scal, vec_o,
            mo8["CLOSE"], mo8["MBC"], mo8["ACCB"], mo8["ACCMB"], mo8["STKO"],
            mo8["I11O"], mo8["B0RO"], mo8["JRB"], mo8["JSN"],
            ONEP8, QONE8, EXTR8, KIN, SIGL,
        )
        return dilv(bppo8), glob
    kernel_o = functools.partial(_outside8_kernel, N=N, min_span=min_span)
    bppo8 = pl.pallas_call(
        kernel_o,
        grid=(K,),
        in_specs=[
            _SMEM_SPEC,
            _nn(2 * G, N),
            *(_nn(NG, N) for _ in range(9)),
            _nn(NG, 2 * N),                    # ONEP
            _nn(2 * NG, N),                    # QONE (fam-duplicated)
            _nn(G, 2 * N),                     # EXTR
            _nn(32 * G, 32 * G),
        ],
        out_specs=_nn(NG, N),
        out_shape=jax.ShapeDtypeStruct((K, NG, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WB, N + LPAD), jnp.float32),        # OG
            pltpu.VMEM((NG, N), jnp.float32),               # XS
            pltpu.VMEM((2 * NG, N), jnp.float32),           # RP2 (pm|pm2)
            pltpu.VMEM((NG, 2 * N), jnp.float32),           # SONEF
            pltpu.VMEM((G, 2 * N), jnp.float32),            # REXT
            pltpu.VMEM((G, N), jnp.float32),                # P2SC
            pltpu.VMEM((G, N + 8), jnp.float32),            # QASC
        ],
        interpret=interpret,
    )(
        scal, vec_o,
        mo8["CLOSE"], mo8["MBC"], mo8["ACCB"], mo8["ACCMB"], mo8["STKO"],
        mo8["I11O"], mo8["B0RO"], mo8["JRB"], mo8["JSN"],
        ONEP8, QONE8, EXTR8, KBIG,
    )
    return dilv(bppo8), glob


@functools.partial(
    jax.jit, static_argnames=("N", "allows_short_hairpins", "interpret")
)
def mccaskill_contra_pallas_prob8(
    seqs, ns, ct, N, allows_short_hairpins=False, interpret=False
):
    """Stacked (G=8) scaled-probability CONTRA McCaskill with retries.

    Requires batch size a multiple of 8 (callers pad; see
    models.mccaskill).  Returns (bppo [d, i], ln_sigma per seq)."""

    def run(ls):
        return _prob8_run_body(
            seqs, ns, ct, ls, N, allows_short_hairpins, interpret
        )

    return PP._retrying(run, seqs.shape[0], ns=ns)


# ---------------------------------------------------------------------------
# Turner model, stacked (same machinery; 3 banded regions + 7 specials +
# 2 TM3 cells per span — see pallas_fold_prob's per-seq Turner kernels)
# ---------------------------------------------------------------------------

def _turner_inside8_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 56, N)
    H, MBC, ACC, AUGC, TMO1C, TMO2C, TMO3C,  # (1, N*8, N) merged
    SP00, SP01, SP10, SP11, SP12, SP21, SP22,
    AUGT, TMI1, TMI2, TMI3,
    KI,                                      # (1, 256, 256) / (1, 32, 32) aged
    WCOLS,                                   # (1, 4*32*G, 8) weight columns
    *rest,
    N, R=None, aged=False,
):
    """Paired-history-buffer tail as in :func:`_inside8_kernel` (round 3):
    rm|rmmb ride ``FQ2`` and ext|one ride ``EO`` at 2G striping.

    Round-3 window restructure: the Turner bulge (KB) and 2x3-edge (K2)
    banded kernels are 1-D families — one column (a = const) plus one
    diagonal (b = const) — so their striped-block-diagonal MXU matmuls
    (8x-diluted, ~100 MFLOP/span each at 3-pass precision) are replaced by
    a weighted sublane tree-sum (column arm) and one extra skew extraction
    over a +c-block offset slice (diagonal arm), with the per-sequence
    weights delivered as interleaved columns in ``WCOLS``
    [kb_col; kb_diag; k2_col; k2_diag].  Only the genuinely 2-D generic
    interior region (KI) keeps its matmul.

    Round-4 ``aged`` variant: GW1 (the KI matmul window) moves to the
    lane-major aged layout (see ``_WINDOW_MODE``); KI is common across
    sequences; the residual sigma^-1 on the matmul result reuses EU1
    (Turner external_unpair = 0, so EU1 == exp(-ln_sigma)); the grid
    grows a span-chunk dimension (tables/outputs streamed per R spans,
    state scratches persistent — see :func:`_inside8a_kernel`)."""
    if aged:
        (SIGL, close_out, ext_out, one_out,
         CAW, GW1, GW2, GW3, FQ2, EO, mbS, S1SC, TWO8, CARRY) = rest
        sig = SIGL[0, pl.ds(0, 1), :]
        c = pl.program_id(1)
    else:
        (close_out, ext_out, one_out,
         CAW, GW1, GW2, GW3, FQ2, EO, mbS, S1SC) = rest
        c = 0
    if R is None:
        R = N
    base = c * R
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    EU1 = VEC[0, pl.ds(0, G), :]
    EBP = VEC[0, pl.ds(G, G), :]
    MBU1 = VEC[0, pl.ds(2 * G, G), :]
    MBBP = VEC[0, pl.ds(3 * G, G), :]
    LENI32 = VEC[0, pl.ds(5 * G, G), :]
    LENI23 = VEC[0, pl.ds(6 * G, G), :]

    def _init():
        for buf in (CAW, GW1, GW2, GW3, FQ2, EO, mbS, S1SC):
            buf[:] = jnp.zeros_like(buf[:])
        EO[pl.ds(0, G), :] = jnp.ones((G, N), jnp.float32)

    if aged:
        pl.when(c == 0)(_init)
    else:
        _init()
    close_out[0] = jnp.zeros_like(close_out[0])
    ext_out[0] = jnp.zeros_like(ext_out[0])
    one_out[0] = jnp.zeros_like(one_out[0])

    G2 = 2 * G
    NG = N * G
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    fam0_full = (sub2 // G) % 2 == 0
    zero_blk = jnp.zeros((G, N), jnp.float32)

    W32 = 32 * G
    wcb = WCOLS[0, pl.ds(0, W32), pl.ds(0, 1)]
    wdb = WCOLS[0, pl.ds(W32, W32), pl.ds(0, 1)]
    wc2 = WCOLS[0, pl.ds(2 * W32, W32), pl.ds(0, 1)]
    wd2 = WCOLS[0, pl.ds(3 * W32, W32), pl.ds(0, 1)]
    if aged:
        first = c == 0
        carry0 = (
            jnp.where(first, 0.0, CARRY[pl.ds(0, G), :]),
            jnp.where(first, 0.0, CARRY[pl.ds(G, G), :]),
            jnp.where(first, 1.0, CARRY[pl.ds(2 * G, G), :]),
        )
    else:
        carry0 = (zero_blk, zero_blk, jnp.ones((G, N), jnp.float32))

    def span_step(d, carry):
        rm_prev, rmmb_prev, epow_prev = carry
        dl = d - base

        kb_sum = _tree8(CAW[pl.ds(0, W32), :] * wcb)[:, 1:1 + N]
        kb_sum = kb_sum + _skew_extract_sum8(
            CAW[pl.ds(G, W32), :] * wdb, N, 1
        )
        two = _blk(AUGC, dl) * kb_sum
        if aged:
            kiw = KI[0, pl.ds(0, 32), pl.ds(0, 32)]
            ki_term = EU1 * _lm_to_blk(
                TWO8,
                _skew_lane_asc(PP._mm_prec(kiw, GW1[pl.ds(0, 32), :])),
                N,
            )
        else:
            ki_term = _skew_extract_sum8(_band_mm8(KI, GW1), N, 1)
        two = two + _blk(TMO1C, dl) * ki_term
        k2_sum = _tree8(GW2[pl.ds(0, W32), :] * wc2)[:, 2:2 + N]
        k2_sum = k2_sum + _skew_extract_sum8(
            GW2[pl.ds(2 * G, W32), :] * wd2, N, 1
        )
        two = two + _blk(TMO2C, dl) * k2_sum
        two = two + _blk(TMO3C, dl) * (
            LENI32 * GW3[pl.ds(6 * G, G), pl.ds(3, N)]
            + LENI23 * GW3[pl.ds(6 * G, G), pl.ds(4, N)]
        )
        two = two + _blk(SP00, dl) * CAW[pl.ds(G, G), pl.ds(1, N)]
        two = two + _blk(SP01, dl) * CAW[pl.ds(2 * G, G), pl.ds(1, N)]
        two = two + _blk(SP10, dl) * CAW[pl.ds(2 * G, G), pl.ds(2, N)]
        two = two + _blk(SP11, dl) * CAW[pl.ds(3 * G, G), pl.ds(2, N)]
        two = two + _blk(SP12, dl) * CAW[pl.ds(4 * G, G), pl.ds(2, N)]
        two = two + _blk(SP21, dl) * CAW[pl.ds(4 * G, G), pl.ds(3, N)]
        two = two + _blk(SP22, dl) * CAW[pl.ds(5 * G, G), pl.ds(3, N)]
        mb_in = mbS[pl.ds(G, G), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in * _blk(MBC, dl), 0.0)
        close_new = _blk(H, dl) + two + mb_term
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, 0.0
        )
        close_out[0, pl.ds(dl * G, G), :] = close_new
        acc_new = close_new * _blk(ACC, dl)

        rm_new = rm_prev * EU1 + acc_new * EBP
        rmmb_new = rmmb_prev * MBU1 + acc_new * MBBP
        epow = epow_prev * EU1

        def tail(ht):
            h2 = ht * G2
            tb = tb2_full[:h2]
            fam0 = fam0_full[:h2]
            shifted = FQ2[pl.ds(0, h2 - G2), pl.ds(1, N - 1)]
            FQ2[pl.ds(G2, h2 - G2), pl.ds(0, N - 1)] = shifted
            FQ2[pl.ds(G2, h2 - G2), pl.ds(N - 1, 1)] = jnp.zeros(
                (h2 - G2, 1), jnp.float32
            )
            FQ2[pl.ds(0, G), pl.ds(0, N)] = rm_new
            FQ2[pl.ds(G, G), pl.ds(0, N)] = rmmb_new

            terms = jnp.where(
                (tb <= d - 1) & (fam0 | (tb >= 1)),
                FQ2[pl.ds(0, h2), pl.ds(0, N)] * EO[pl.ds(0, h2), :],
                0.0,
            )
            red = _tree_to(terms, G2)
            ext_new = epow + red[:G]
            s2 = red[G:]
            ext_out[0, pl.ds(dl * G, G), :] = ext_new

            # telescoped sum_t rmmb_{d-t} * mbu1^t (flush-safe; see the
            # per-seq kernels): FQ2's fam-1 block at age 1 after this
            # span's shift holds rmmb_{d-1} at the aged lane alignment
            s1v = MBU1 * (
                FQ2[pl.ds(3 * G, G), pl.ds(0, N)]
                + S1SC[pl.ds(0, G), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
            one_new = rmmb_new + s1v + s2
            mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
            mbS[pl.ds(0, G), pl.ds(0, N)] = s2
            one_out[0, pl.ds(dl * G, G), :] = one_new
            EO[pl.ds((d + 1) * G2, G), :] = ext_new
            EO[pl.ds((d + 1) * G2 + G, G), :] = one_new

        prev = 0
        for ht in PF._live_heights(N):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        g = close_new * _blk(AUGT, dl)
        _shift_insert8(CAW, g)
        if aged:
            _winl_insert(GW1, g * _blk(TMI1, dl), N, sig)
        else:
            _shift_insert8(GW1, g * _blk(TMI1, dl))
        _shift_insert8(GW2, g * _blk(TMI2, dl))
        _shift_insert8(GW3, g * _blk(TMI3, dl))
        return (rm_new, rmmb_new, epow)

    rm, rmmb, epow = lax.fori_loop(
        base, jnp.minimum(base + R, n_i), span_step, carry0
    )
    if aged:
        CARRY[pl.ds(0, G), :] = rm
        CARRY[pl.ds(G, G), :] = rmmb
        CARRY[pl.ds(2 * G, G), :] = epow


def _turner_inside8m_kernel(
    SCAL,                                    # (1, 1, 8) SMEM: [7] = max n
    VEC,                                     # (1, 56, N)
    H, MBC, ACC, AUGC, TMO1C, TMO2C, TMO3C,  # (1, R*G, N) chunk blocks
    SP00, SP01, SP10, SP11, SP12, SP21, SP22,
    AUGT, TMI1, TMI2, TMI3,
    KT12,                                    # (1, 192, 96): [KT; KT col-shifted]
    SIGL,                                    # (1, 1, G*SW)
    close_out, ext_out, one_out,
    MINI, WM, TWO8, FQ2, EO, mbS, S1SC, CARRY,
    *, N, R, spans=2,
):
    """Merged-family + double-span Turner inside kernel (round 5: VERDICT
    items 1 and 3 together).  ``spans=1`` keeps the merged window/matmul
    design but processes one span per iteration (canonical single-span
    tail and aging; KT12 then carries only the 96-row base kernel) — used
    at N = 256, where the pair kernels crash the remote Mosaic compiler.

    The round-4 aged kernel kept three SUBLANE window families (CAW raw
    close*aug for the bulge arms + specials, GW2 for the 2x3-edge arms,
    GW3 for the two TM3 cells), each shifted (33*G, N) rows per span —
    the G-scaled shift traffic that kept Turner from gaining with G.
    Here ALL three banded families live in ONE aged lane-major scratch
    ``WM`` (96 rows: ages 0..31 of g*TMI1 / g / g*TMI2), contracted by a
    block-diagonal COMMON (96, 96) kernel diag(KI, KB, K2) built from the
    sigma-free exp tables (the window aging supplies sigma^-r exactly as
    the round-4 KI path did; the bulge/2x3 column+diagonal VPU arms are
    the a=0 / r=a+1 rows of their bands, so the matmul subsumes them).
    The 7 small-loop specials (close*aug ages 1..5) and the two TM3 cells
    (g*TMI3 age 6) read ``MINI``, a single 13-block sublane shift
    register ([g ages 0..5 | g*TMI3 ages 0..6] — one (12*G, N) shift per
    span; the age-5 g row falling into the TMI3 region is overwritten by
    its insert).

    Double-span pairing works exactly as :func:`_inside8a2_kernel` (all
    three bands have structurally-zero first three kernel columns; KT12
    stacks the pair kernel [KT; KTshift] so one (192, 96) matmul serves
    both spans), sharing one window aging (x sigma^2) and one FQ2 shift
    per pair.  Reference recurrences:
    /root/reference/src/mccaskill_algo.rs:380-516."""
    c = pl.program_id(1)
    base = c * R
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    EU1 = VEC[0, pl.ds(0, G), :]
    EBP = VEC[0, pl.ds(G, G), :]
    MBU1 = VEC[0, pl.ds(2 * G, G), :]
    MBBP = VEC[0, pl.ds(3 * G, G), :]
    LENI32 = VEC[0, pl.ds(5 * G, G), :]
    LENI23 = VEC[0, pl.ds(6 * G, G), :]
    EU1SQ = EU1 * EU1

    @pl.when(c == 0)
    def _init():
        for buf in (MINI, WM, FQ2, EO, mbS, S1SC):
            buf[:] = jnp.zeros_like(buf[:])
        EO[pl.ds(0, G), :] = jnp.ones((G, N), jnp.float32)

    close_out[0] = jnp.zeros_like(close_out[0])
    ext_out[0] = jnp.zeros_like(ext_out[0])
    one_out[0] = jnp.zeros_like(one_out[0])

    G2 = 2 * G
    NG = N * G
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    fam0_full = (sub2 // G) % 2 == 0
    if spans == 2:
        kt12 = KT12[0, pl.ds(0, 192), pl.ds(0, 96)]
    sig = SIGL[0, pl.ds(0, 1), :]
    sig2 = sig * sig
    first = c == 0
    rm0c = jnp.where(first, 0.0, CARRY[pl.ds(0, G), :])
    rmmb0c = jnp.where(first, 0.0, CARRY[pl.ds(G, G), :])
    epow0c = jnp.where(first, 1.0, CARRY[pl.ds(2 * G, G), :])
    lim = jnp.minimum(base + R, n_i)
    M3 = 6 * G   # MINI row offset of the g*TMI3 region

    def _two_at(dl, out_rows, resid):
        """Banded-window + specials + TM3 sum for one span (out_rows =
        that span's 96 matmul output rows; resid = EU1 or EU1^2)."""
        e1 = _lm_to_blk(TWO8, _skew_lane_asc(out_rows[:32]), N)
        two = _blk(TMO1C, dl) * (resid * e1)
        ec = _lm_to_blk(TWO8, _skew_lane_asc(out_rows[32:64]), N)
        two = two + _blk(AUGC, dl) * (resid * ec)
        e2 = _lm_to_blk(TWO8, _skew_lane_asc(out_rows[64:]), N)
        two = two + _blk(TMO2C, dl) * (resid * e2)
        two = two + _blk(TMO3C, dl) * (
            LENI32 * MINI[pl.ds(M3 + 6 * G, G), pl.ds(3, N)]
            + LENI23 * MINI[pl.ds(M3 + 6 * G, G), pl.ds(4, N)]
        )
        two = two + _blk(SP00, dl) * MINI[pl.ds(G, G), pl.ds(1, N)]
        two = two + _blk(SP01, dl) * MINI[pl.ds(2 * G, G), pl.ds(1, N)]
        two = two + _blk(SP10, dl) * MINI[pl.ds(2 * G, G), pl.ds(2, N)]
        two = two + _blk(SP11, dl) * MINI[pl.ds(3 * G, G), pl.ds(2, N)]
        two = two + _blk(SP12, dl) * MINI[pl.ds(4 * G, G), pl.ds(2, N)]
        two = two + _blk(SP21, dl) * MINI[pl.ds(4 * G, G), pl.ds(3, N)]
        two = two + _blk(SP22, dl) * MINI[pl.ds(5 * G, G), pl.ds(3, N)]
        return two

    def _mini_insert(g, gt3):
        """One-block shift of the merged mini register + both inserts."""
        MINI[pl.ds(G, 12 * G), :] = MINI[pl.ds(0, 12 * G), :]
        MINI[pl.ds(0, G), pl.ds(0, N)] = g
        MINI[pl.ds(M3, G), pl.ds(0, N)] = gt3

    if spans == 1:
        kt = KT12[0, pl.ds(0, 96), pl.ds(0, 96)]
        SW1 = _seg(N)

        def span_step(d, carry):
            rm_p, rmmb_p, epow_p = carry
            dl = d - base
            OUT = PP._mm_prec(kt, WM[pl.ds(0, 96), :])
            two = _two_at(dl, OUT, EU1)
            mb_in = mbS[pl.ds(G, G), pl.ds(1, N)]
            mb = jnp.where(d >= 2, mb_in * _blk(MBC, dl), 0.0)
            close = _blk(H, dl) + two + mb
            close = jnp.where(d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close, 0.0)
            close_out[0, pl.ds(dl * G, G), :] = close
            acc = close * _blk(ACC, dl)
            g0 = close * _blk(AUGT, dl)
            rm = rm_p * EU1 + acc * EBP
            rmmb = rmmb_p * MBU1 + acc * MBBP
            epow = epow_p * EU1

            def tail(ht):
                h2 = ht * G2
                # lanes >= N of FQ2 stay zero, so the 1-lane-left shift's
                # zero fill rides the same store
                FQ2[pl.ds(G2, h2 - G2), pl.ds(0, N)] = FQ2[
                    pl.ds(0, h2 - G2), pl.ds(1, N)
                ]
                FQ2[pl.ds(0, G), pl.ds(0, N)] = rm
                FQ2[pl.ds(G, G), pl.ds(0, N)] = rmmb
                tb = tb2_full[:h2]
                fam0 = fam0_full[:h2]
                terms = jnp.where(
                    (tb <= d - 1) & (fam0 | (tb >= 1)),
                    FQ2[pl.ds(0, h2), pl.ds(0, N)]
                    * EO[pl.ds(0, h2), pl.ds(0, N)],
                    0.0,
                )
                red = _tree_to(terms, G2)
                ext = epow + red[:G]
                s2 = red[G:]
                ext_out[0, pl.ds(dl * G, G), :] = ext
                s1v = MBU1 * (
                    FQ2[pl.ds(3 * G, G), pl.ds(0, N)]
                    + S1SC[pl.ds(0, G), pl.ds(1, N)]
                )
                S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
                one = rmmb + s1v + s2
                mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
                mbS[pl.ds(0, G), pl.ds(0, N)] = s2
                one_out[0, pl.ds(dl * G, G), :] = one
                EO[pl.ds((d + 1) * G2, G), :] = ext
                EO[pl.ds((d + 1) * G2 + G, G), :] = one

            prev = 0
            for ht in PF._live_heights(N):
                cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
                pl.when(cond)(functools.partial(tail, ht))
                prev = ht

            _mini_insert(g0, g0 * _blk(TMI3, dl))
            WM[pl.ds(1, 95), :] = WM[pl.ds(0, 95), :] * sig
            for off, new in (
                (0, g0 * _blk(TMI1, dl)),
                (32, g0),
                (64, g0 * _blk(TMI2, dl)),
            ):
                for g in range(G):
                    WM[pl.ds(off, 1), pl.ds(g * SW1, N)] = new[g : g + 1, :]
            return (rm, rmmb, epow)

        rm, rmmb, epow = lax.fori_loop(
            base, lim, span_step, (rm0c, rmmb0c, epow0c)
        )
        CARRY[pl.ds(0, G), :] = rm
        CARRY[pl.ds(G, G), :] = rmmb
        CARRY[pl.ds(2 * G, G), :] = epow
        return

    def pair_step(q, carry):
        rm_p, rmmb_p, epow_p = carry
        dl0 = 2 * q
        dl1 = dl0 + 1
        d0 = base + dl0
        d1 = d0 + 1
        live1 = d1 < lim

        OUT12 = PP._mm_prec(kt12, WM[pl.ds(0, 96), :])

        # ---- span d0
        two0 = _two_at(dl0, OUT12[:96], EU1)
        mb_in0 = mbS[pl.ds(G, G), pl.ds(1, N)]
        mb0 = jnp.where(d0 >= 2, mb_in0 * _blk(MBC, dl0), 0.0)
        close0 = _blk(H, dl0) + two0 + mb0
        close0 = jnp.where(d0 + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close0, 0.0)
        close_out[0, pl.ds(dl0 * G, G), :] = close0
        acc0 = close0 * _blk(ACC, dl0)
        g0 = close0 * _blk(AUGT, dl0)
        _mini_insert(g0, g0 * _blk(TMI3, dl0))

        # ---- span d1
        two1 = _two_at(dl1, OUT12[96:], EU1SQ)
        mb_in1 = mbS[pl.ds(0, G), pl.ds(1, N)]
        mb1 = jnp.where(d1 >= 2, mb_in1 * _blk(MBC, dl1), 0.0)
        close1 = _blk(H, dl1) + two1 + mb1
        close1 = jnp.where(
            (d1 + 1 >= MIN_SPAN_HAIRPIN_CLOSE) & live1, close1, 0.0
        )
        close_out[0, pl.ds(dl1 * G, G), :] = close1
        acc1 = close1 * _blk(ACC, dl1)
        g1 = close1 * _blk(AUGT, dl1)

        # ---- ext/one-state recurrences
        rm0 = rm_p * EU1 + acc0 * EBP
        rmmb0 = rmmb_p * MBU1 + acc0 * MBBP
        epow0 = epow_p * EU1
        rm1 = rm0 * EU1 + acc1 * EBP
        rmmb1 = rmmb0 * MBU1 + acc1 * MBBP
        epow1 = epow0 * EU1

        # ---- tails (identical structure to _inside8a2_kernel)
        def tail0(ht):
            h2 = ht * G2
            bulk = jnp.where(
                tb2_full[:h2] <= d0 - 2,
                FQ2[pl.ds(0, h2), pl.ds(1, N)]
                * EO[pl.ds(G2, h2), pl.ds(0, N)],
                0.0,
            )
            red = _tree_to(bulk, G2)
            ext0 = epow0 + red[:G] + rm0 * EO[pl.ds(0, G), :]
            s2_0 = red[G:]
            ext_out[0, pl.ds(dl0 * G, G), :] = ext0
            s1v = MBU1 * (
                FQ2[pl.ds(G, G), pl.ds(1, N)]
                + S1SC[pl.ds(0, G), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
            one0 = rmmb0 + s1v + s2_0
            mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
            mbS[pl.ds(0, G), pl.ds(0, N)] = s2_0
            one_out[0, pl.ds(dl0 * G, G), :] = one0
            EO[pl.ds((d0 + 1) * G2, G), :] = ext0
            EO[pl.ds((d0 + 1) * G2 + G, G), :] = one0

        prev = 0
        for ht in PF._live_heights(N):
            cond = d0 < ht if prev == 0 else (d0 >= prev) & (d0 < ht)
            pl.when(cond)(functools.partial(tail0, ht))
            prev = ht

        def tail1(ht):
            h2 = ht * G2
            FQ2[pl.ds(2 * G2, h2 - 2 * G2), pl.ds(0, N)] = FQ2[
                pl.ds(0, h2 - 2 * G2), pl.ds(2, N)
            ]
            FQ2[pl.ds(G2, G), pl.ds(0, N - 1)] = rm0[:, 1:]
            FQ2[pl.ds(G2, G), pl.ds(N - 1, 1)] = jnp.zeros(
                (G, 1), jnp.float32
            )
            FQ2[pl.ds(G2 + G, G), pl.ds(0, N - 1)] = rmmb0[:, 1:]
            FQ2[pl.ds(G2 + G, G), pl.ds(N - 1, 1)] = jnp.zeros(
                (G, 1), jnp.float32
            )
            FQ2[pl.ds(0, G), pl.ds(0, N)] = rm1
            FQ2[pl.ds(G, G), pl.ds(0, N)] = rmmb1

            tb = tb2_full[:h2]
            fam0 = fam0_full[:h2]
            terms = jnp.where(
                (tb <= d1 - 1) & (fam0 | (tb >= 1)),
                FQ2[pl.ds(0, h2), pl.ds(0, N)] * EO[pl.ds(0, h2), pl.ds(0, N)],
                0.0,
            )
            red = _tree_to(terms, G2)
            ext1 = epow1 + red[:G]
            s2_1 = red[G:]
            ext_out[0, pl.ds(dl1 * G, G), :] = ext1
            s1v = MBU1 * (
                FQ2[pl.ds(3 * G, G), pl.ds(0, N)]
                + S1SC[pl.ds(0, G), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, G), pl.ds(0, N)] = s1v
            one1 = rmmb1 + s1v + s2_1
            mbS[pl.ds(G, G), :] = mbS[pl.ds(0, G), :]
            mbS[pl.ds(0, G), pl.ds(0, N)] = s2_1
            one_out[0, pl.ds(dl1 * G, G), :] = one1
            EO[pl.ds((d1 + 1) * G2, G), :] = ext1
            EO[pl.ds((d1 + 1) * G2 + G, G), :] = one1

        prev = 0
        for ht in PF._live_heights(N):
            cond = d1 < ht if prev == 0 else (d1 >= prev) & (d1 < ht)
            pl.when(cond & live1)(functools.partial(tail1, ht))
            prev = ht

        # ---- window/mini inserts for the next pair
        _mini_insert(g1, g1 * _blk(TMI3, dl1))
        # merged lane-major aging (one copy; fam-boundary overflow rows
        # are overwritten by the inserts below) + 6 insert row-writes
        WM[pl.ds(2, 94), :] = WM[pl.ds(0, 94), :] * sig2
        ins = (
            (0, g1 * _blk(TMI1, dl1), g0 * _blk(TMI1, dl0)),
            (32, g1, g0),
            (64, g1 * _blk(TMI2, dl1), g0 * _blk(TMI2, dl0)),
        )
        SW = _seg(N)
        for off, new0, new1s in ins:
            new1aged = new1s * EU1
            for g in range(G):
                WM[pl.ds(off + 1, 1), pl.ds(g * SW, N)] = new1aged[
                    g : g + 1, :
                ]
                WM[pl.ds(off, 1), pl.ds(g * SW, N)] = new0[g : g + 1, :]

        rm_o = jnp.where(live1, rm1, rm0)
        rmmb_o = jnp.where(live1, rmmb1, rmmb0)
        epow_o = jnp.where(live1, epow1, epow0)
        return (rm_o, rmmb_o, epow_o)

    npairs = jnp.maximum(0, lim - base + 1) // 2
    rm, rmmb, epow = lax.fori_loop(
        0, npairs, pair_step, (rm0c, rmmb0c, epow0c)
    )
    CARRY[pl.ds(0, G), :] = rm
    CARRY[pl.ds(G, G), :] = rmmb
    CARRY[pl.ds(2 * G, G), :] = epow


def _turner_outside8_kernel(
    SCAL,
    VEC,                                     # (1, 8, N): logmbu
    CLOSE, MBC, ACCB, ACCMB, AUGT, TMI1C, TMI2C, TMI3C,
    SP00, SP01, SP10, SP11, SP12, SP21, SP22,
    TMO1, TMO2, TMO3,
    ONEP, QONE, EXTR,
    KI,
    WCOLS,
    *rest,
    N, R=None, min_span, aged=False,
):
    """pm|pm2 history rides one 2G-striped buffer RP2 (see
    :func:`_inside8_kernel`); QONE arrives fam-duplicated at 2G striping;
    the KB/K2 window matmuls are decomposed into column + diagonal arms
    (see :func:`_turner_inside8_kernel`), here with the descending lane
    direction of the outside windows.  ``aged``: GW1 is the lane-major
    aged KI window; the residual sigma^-1 reuses MBU1 = exp(-ln_sigma)
    (Turner multibranch_unpair = 0)."""
    if aged:
        (SIGL, bppo_out,
         OG, GW1, GW2, GW3, XS, RP2, SONEF, REXT, P2SC, QASC, TWO8) = rest
        sig = SIGL[0, pl.ds(0, 1), :]
        c = pl.program_id(1)
    else:
        (bppo_out,
         OG, GW1, GW2, GW3, XS, RP2, SONEF, REXT, P2SC, QASC) = rest
        c = 0
    if R is None:
        R = N
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    LOGMBU = VEC[0, pl.ds(0, G), :]
    LENI32 = VEC[0, pl.ds(G, G), :]
    LENI23 = VEC[0, pl.ds(2 * G, G), :]
    G2 = 2 * G
    NG = N * G
    baseo = N - (c + 1) * R

    def _init():
        for buf in (OG, GW1, GW2, GW3, XS, RP2, P2SC, QASC):
            buf[:] = jnp.zeros_like(buf[:])
        SONEF[pl.ds(0, NG), :] = ONEP[0, pl.ds(0, NG), :]
        REXT[pl.ds(0, G), :] = EXTR[0, pl.ds(0, G), :]

    if aged:
        pl.when(c == 0)(_init)
    else:
        _init()
    bppo_out[0] = jnp.zeros_like(bppo_out[0])
    MBU1 = jnp.exp(LOGMBU)

    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    C2 = SONEF.shape[1]
    W32 = 32 * G
    wcb = WCOLS[0, pl.ds(0, W32), pl.ds(0, 1)]
    wdb = WCOLS[0, pl.ds(W32, W32), pl.ds(0, 1)]
    wc2 = WCOLS[0, pl.ds(2 * W32, W32), pl.ds(0, 1)]
    wd2 = WCOLS[0, pl.ds(3 * W32, W32), pl.ds(0, 1)]

    def span_step(step, carry):
        d = N - 1 - step
        k = step - (N - n_i)
        dl = d - baseo
        span_ok = (d + 1) >= min_span

        close_blk = _blk(CLOSE, dl)
        pos = close_blk > 0.0
        inv_close = jnp.where(
            pos, 1.0 / jnp.where(pos, close_blk, 1.0), 0.0
        )
        rt = REXT[pl.ds(0, G), pl.ds(0, N)]
        base = close_blk * _blk(ACCB, dl) * rt

        kb_sum = _tree8(OG[pl.ds(0, W32), :] * wcb)[:, 31:31 + N]
        kb_sum = kb_sum + _skew_extract_sum8(
            OG[pl.ds(G, W32), :] * wdb, N, 31, descending=True
        )
        two = _blk(AUGT, dl) * kb_sum
        if aged:
            kiw = KI[0, pl.ds(0, 32), pl.ds(0, 32)]
            ki_term = MBU1 * _lm_to_blk(
                TWO8,
                _skew_lane_desc(PP._mm_prec(kiw, GW1[pl.ds(0, 32), :])),
                N,
            )
        else:
            ki_term = _skew_extract_sum8(
                _band_mm8(KI, GW1), N, 31, descending=True
            )
        two = two + _blk(TMI1C, dl) * ki_term
        k2_sum = _tree8(GW2[pl.ds(0, W32), :] * wc2)[:, 30:30 + N]
        k2_sum = k2_sum + _skew_extract_sum8(
            GW2[pl.ds(2 * G, W32), :] * wd2, N, 31, descending=True
        )
        two = two + _blk(TMI2C, dl) * k2_sum
        two = two + _blk(TMI3C, dl) * (
            LENI32 * GW3[pl.ds(6 * G, G), pl.ds(29, N)]
            + LENI23 * GW3[pl.ds(6 * G, G), pl.ds(28, N)]
        )
        two = two + _blk(SP00, dl) * OG[pl.ds(G, G), pl.ds(31, N)]
        two = two + _blk(SP01, dl) * OG[pl.ds(2 * G, G), pl.ds(31, N)]
        two = two + _blk(SP10, dl) * OG[pl.ds(2 * G, G), pl.ds(30, N)]
        two = two + _blk(SP11, dl) * OG[pl.ds(3 * G, G), pl.ds(30, N)]
        two = two + _blk(SP12, dl) * OG[pl.ds(4 * G, G), pl.ds(30, N)]
        two = two + _blk(SP21, dl) * OG[pl.ds(4 * G, G), pl.ds(29, N)]
        two = two + _blk(SP22, dl) * OG[pl.ds(5 * G, G), pl.ds(29, N)]
        two = two * close_blk
        acc_mb = close_blk * _blk(ACCMB, dl)

        def tail(ht):
            hg = ht * G
            Xr = XS[pl.ds(0, hg), :]
            s_one = SONEF[pl.ds(0, hg), pl.ds(0, N)]
            pm_new = jnp.where(span_ok, _tree8(Xr * s_one), 0.0)
            # telescoped pm2_s = XS[0:G] + mbu1 * pm2_{s-1} (flush-safe)
            pm2_raw = (
                XS[pl.ds(0, G), pl.ds(0, N)]
                + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw
            pm2_new = jnp.where(span_ok, pm2_raw, 0.0)
            h2 = ht * G2
            tb2 = tb2_full[:h2]
            shifted = RP2[pl.ds(0, h2 - G2), pl.ds(0, N - 1)]
            RP2[pl.ds(G2, h2 - G2), pl.ds(1, N - 1)] = shifted
            RP2[pl.ds(G2, h2 - G2), pl.ds(0, 1)] = jnp.zeros(
                (h2 - G2, 1), jnp.float32
            )
            RP2[pl.ds(0, G), pl.ds(0, N)] = pm_new
            RP2[pl.ds(G, G), pl.ds(0, N)] = pm2_new

            # diagonally telescoped QA (see the per-seq kernels): RP2's
            # fam-0 block at age 1 after this span's shift holds pm_{s-1}
            # aged one lane
            qa_raw = (
                RP2[pl.ds(G2, G), pl.ds(0, N)]
                + MBU1 * QASC[pl.ds(0, G), pl.ds(0, N)]
            )
            QASC[pl.ds(0, G), pl.ds(1, N)] = qa_raw
            terms2 = jnp.where(
                tb2 >= 1,
                RP2[pl.ds(0, h2), pl.ds(0, N)] * QONE[0, pl.ds(0, h2), :],
                0.0,
            )
            red2 = _tree_to(terms2, G2)   # [pm-family(G); pm2-family(G)]
            mb_ctx = acc_mb * (red2[G:] + red2[:G] + qa_raw)

            bppo_new = base + two + mb_ctx
            bppo_new = jnp.where(pos & span_ok, bppo_new, 0.0)
            bppo_out[0, pl.ds(dl * G, G), :] = bppo_new

            g2 = bppo_new * _blk(AUGT, dl) * inv_close
            _shift_insert8(OG, g2, lane_off=32)
            if aged:
                _winl_insert(GW1, g2 * _blk(TMO1, dl), N, sig, lane_off=32)
            else:
                _shift_insert8(GW1, g2 * _blk(TMO1, dl), lane_off=32)
            _shift_insert8(GW2, g2 * _blk(TMO2, dl), lane_off=32)
            _shift_insert8(GW3, g2 * _blk(TMO3, dl), lane_off=32)
            g_row = bppo_new * _blk(MBC, dl) * inv_close
            shifted = XS[pl.ds(0, hg - G), :]
            XS[pl.ds(G, hg - G), :] = shifted
            XS[pl.ds(0, G), :] = g_row
            PF._rotate_right(SONEF, hg)
            PF._rotate_right(REXT, G)

        prev = 0
        for ht in PF._live_heights(N):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = (hi - lo) * G
                    wrap = SONEF[pl.ds(lo * G, rows), pl.ds(C2 - lo, lo)]
                    body = SONEF[pl.ds(lo * G, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo * G, rows), pl.ds(lo, C2 - lo)] = body
                    SONEF[pl.ds(lo * G, rows), pl.ds(0, lo)] = wrap

                pl.when(k == prev)(bulk)
            cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht
        return carry

    lax.fori_loop(
        jnp.maximum(c * R, N - n_i), (c + 1) * R, span_step, 0
    )


def _turner_outside8m_kernel(
    SCAL,
    VEC,                                     # (1, 3G, N): logmbu leni32 leni23
    CLOSE, MBC, ACCB, ACCMB, AUGT, TMI1C, TMI2C, TMI3C,
    SP00, SP01, SP10, SP11, SP12, SP21, SP22,
    TMO1, TMO2, TMO3,
    ONEP,                                    # (1, N*8, 2N) pre-rotated (even n)
    QONE,                                    # (1, N*8 + 4G, N) zero-padded rows
    EXTR,                                    # (1, 8, 2N) pre-rotated (even n)
    KT12,                                    # (1, 192, 96)
    SIGL,
    bppo_out,
    MINI, WM, TWO8, RED2, PMB, XS, RP2, SONEF, REXT, P2SC, QASC,
    *, N, R, min_span, spans=2,
):
    """Merged-family + double-span Turner OUTSIDE kernel: the descending
    counterpart of :func:`_turner_inside8m_kernel`, with the batched
    XS/RP2/SONEF pair updates of :func:`_outside8a2_kernel` (see both for
    the derivations).  Window fams [g2*TMO1 | g2 | g2*TMO2] under the same
    block-diagonal KT12; MINI = [g2 ages 0..5 | g2*TMO3 ages 0..6] at the
    outside +32 lane offset; residual sigma^-1 = MBU1 (Turner
    multibranch_unpair = 0).  ``spans=1``: merged windows with the
    canonical per-span tail/rotations (N = 256 — see
    :func:`_turner_inside8m_kernel`); ONEP/EXTR then arrive with the
    UNROUNDED per-group pre-rotation."""
    c = pl.program_id(1)
    n_i = SCAL[0, 0, 7].astype(jnp.int32)
    n_even = n_i + (n_i % 2) if spans == 2 else n_i
    LOGMBU = VEC[0, pl.ds(0, G), :]
    LENI32 = VEC[0, pl.ds(G, G), :]
    LENI23 = VEC[0, pl.ds(2 * G, G), :]
    G2 = 2 * G
    NG = N * G
    M3 = 6 * G

    @pl.when(c == 0)
    def _init():
        for buf in (MINI, WM, XS, RP2, P2SC, QASC):
            buf[:] = jnp.zeros_like(buf[:])
        SONEF[pl.ds(0, NG), :] = ONEP[0, pl.ds(0, NG), :]
        if spans == 2:
            SONEF[pl.ds(NG, G), :] = jnp.zeros(
                (G, SONEF.shape[1]), jnp.float32
            )
        REXT[pl.ds(0, G), :] = EXTR[0, pl.ds(0, G), :]

    bppo_out[0] = jnp.zeros_like(bppo_out[0])
    MBU1 = jnp.exp(LOGMBU)
    MBU1SQ = MBU1 * MBU1
    baseo = N - (c + 1) * R

    sub2 = jax.lax.broadcasted_iota(jnp.int32, (2 * NG, 1), 0)
    tb2_full = sub2 // G2
    C2 = SONEF.shape[1]
    if spans == 2:
        kt12 = KT12[0, pl.ds(0, 192), pl.ds(0, 96)]
    sig = SIGL[0, pl.ds(0, 1), :]
    sig2 = sig * sig
    SW = _seg(N)

    def _two_at(dl, out_rows, resid):
        e1 = _lm_to_blk(TWO8, _skew_lane_desc(out_rows[:32]), N)
        two = _blk(TMI1C, dl) * (resid * e1)
        ec = _lm_to_blk(TWO8, _skew_lane_desc(out_rows[32:64]), N)
        two = two + _blk(AUGT, dl) * (resid * ec)
        e2 = _lm_to_blk(TWO8, _skew_lane_desc(out_rows[64:]), N)
        two = two + _blk(TMI2C, dl) * (resid * e2)
        two = two + _blk(TMI3C, dl) * (
            LENI32 * MINI[pl.ds(M3 + 6 * G, G), pl.ds(29, N)]
            + LENI23 * MINI[pl.ds(M3 + 6 * G, G), pl.ds(28, N)]
        )
        two = two + _blk(SP00, dl) * MINI[pl.ds(G, G), pl.ds(31, N)]
        two = two + _blk(SP01, dl) * MINI[pl.ds(2 * G, G), pl.ds(31, N)]
        two = two + _blk(SP10, dl) * MINI[pl.ds(2 * G, G), pl.ds(30, N)]
        two = two + _blk(SP11, dl) * MINI[pl.ds(3 * G, G), pl.ds(30, N)]
        two = two + _blk(SP12, dl) * MINI[pl.ds(4 * G, G), pl.ds(30, N)]
        two = two + _blk(SP21, dl) * MINI[pl.ds(4 * G, G), pl.ds(29, N)]
        two = two + _blk(SP22, dl) * MINI[pl.ds(5 * G, G), pl.ds(29, N)]
        return two

    def _mini_insert(g, gt3):
        MINI[pl.ds(G, 12 * G), :] = MINI[pl.ds(0, 12 * G), :]
        MINI[pl.ds(0, G), pl.ds(32, N)] = g
        MINI[pl.ds(M3, G), pl.ds(32, N)] = gt3

    if spans == 1:
        kt = KT12[0, pl.ds(0, 96), pl.ds(0, 96)]

        def span_step(step, carry):
            d = N - 1 - step
            k = step - (N - n_i)
            dl = d - baseo
            ok = (d + 1) >= min_span

            close_v = _blk(CLOSE, dl)
            pos = close_v > 0.0
            inv_v = jnp.where(pos, 1.0 / jnp.where(pos, close_v, 1.0), 0.0)
            rt = REXT[pl.ds(0, G), pl.ds(0, N)]
            base_v = close_v * _blk(ACCB, dl) * rt
            OUT = PP._mm_prec(kt, WM[pl.ds(0, 96), :])
            two = _two_at(dl, OUT, MBU1) * close_v
            acc_mb = close_v * _blk(ACCMB, dl)

            def tail(ht):
                hg = ht * G
                h2 = ht * G2
                pm = jnp.where(
                    ok,
                    _tree8(
                        XS[pl.ds(0, hg), :]
                        * SONEF[pl.ds(0, hg), pl.ds(0, N)]
                    ),
                    0.0,
                )
                pm2_raw = (
                    XS[pl.ds(0, G), pl.ds(0, N)]
                    + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
                )
                P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw
                pm2 = jnp.where(ok, pm2_raw, 0.0)
                RP2[pl.ds(G2, h2 - G2), pl.ds(1, N - 1)] = RP2[
                    pl.ds(0, h2 - G2), pl.ds(0, N - 1)
                ]
                RP2[pl.ds(G2, h2 - G2), pl.ds(0, 1)] = jnp.zeros(
                    (h2 - G2, 1), jnp.float32
                )
                RP2[pl.ds(0, G), pl.ds(0, N)] = pm
                RP2[pl.ds(G, G), pl.ds(0, N)] = pm2

                qa_raw = (
                    RP2[pl.ds(G2, G), pl.ds(0, N)]
                    + MBU1 * QASC[pl.ds(0, G), pl.ds(0, N)]
                )
                QASC[pl.ds(0, G), pl.ds(1, N)] = qa_raw
                terms2 = jnp.where(
                    tb2_full[:h2] >= 1,
                    RP2[pl.ds(0, h2), pl.ds(0, N)]
                    * QONE[0, pl.ds(0, h2), :],
                    0.0,
                )
                red2 = _tree_to(terms2, G2)
                mb_ctx = acc_mb * (red2[G:] + red2[:G] + qa_raw)

                bppo_new = base_v + two + mb_ctx
                bppo_new = jnp.where(pos & ok, bppo_new, 0.0)
                bppo_out[0, pl.ds(dl * G, G), :] = bppo_new

                g2v = bppo_new * _blk(AUGT, dl) * inv_v
                _mini_insert(g2v, g2v * _blk(TMO3, dl))
                WM[pl.ds(1, 95), :] = WM[pl.ds(0, 95), :] * sig
                for off, new in (
                    (0, g2v * _blk(TMO1, dl)),
                    (32, g2v),
                    (64, g2v * _blk(TMO2, dl)),
                ):
                    for g in range(G):
                        WM[pl.ds(off, 1), pl.ds(g * SW + 32, N)] = new[
                            g : g + 1, :
                        ]
                g_row = bppo_new * _blk(MBC, dl) * inv_v
                XS[pl.ds(G, hg - G), :] = XS[pl.ds(0, hg - G), :]
                XS[pl.ds(0, G), :] = g_row
                PF._rotate_right(SONEF, hg)
                PF._rotate_right(REXT, G)

            prev = 0
            for ht in PF._live_heights(N):
                if prev:
                    def bulk1(lo=prev, hi=ht):
                        rows = (hi - lo) * G
                        wrapb = SONEF[
                            pl.ds(lo * G, rows), pl.ds(C2 - lo, lo)
                        ]
                        bodyb = SONEF[
                            pl.ds(lo * G, rows), pl.ds(0, C2 - lo)
                        ]
                        SONEF[pl.ds(lo * G, rows), pl.ds(lo, C2 - lo)] = bodyb
                        SONEF[pl.ds(lo * G, rows), pl.ds(0, lo)] = wrapb

                    pl.when(k == prev)(bulk1)
                cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
                pl.when(cond)(functools.partial(tail, ht))
                prev = ht
            return carry

        lax.fori_loop(
            jnp.maximum(c * R, N - n_i), (c + 1) * R, span_step, 0
        )
        return

    def pair_step(p, carry):
        s0 = c * R + 2 * p
        da = N - 1 - s0
        db = da - 1
        ka = s0 - (N - n_even)
        kb = ka + 1
        dla = da - baseo
        dlb = db - baseo
        ok_a = (da + 1) >= min_span
        ok_b = (db + 1) >= min_span

        OUT12 = PP._mm_prec(kt12, WM[pl.ds(0, 96), :])

        def pair_body(ht):
            hg = ht * G
            h2 = ht * G2

            # ================= span da =================
            close_a = _blk(CLOSE, dla)
            pos_a = close_a > 0.0
            inv_a = jnp.where(pos_a, 1.0 / jnp.where(pos_a, close_a, 1.0), 0.0)
            rt_a = REXT[pl.ds(0, G), pl.ds(0, N)]
            base_a = close_a * _blk(ACCB, dla) * rt_a
            two_a = _two_at(dla, OUT12[:96], MBU1) * close_a
            acc_mb_a = close_a * _blk(ACCMB, dla)

            pm_a = jnp.where(
                ok_a,
                _tree8(
                    XS[pl.ds(0, hg), :] * SONEF[pl.ds(0, hg), pl.ds(0, N)]
                ),
                0.0,
            )
            pm2_raw = (
                XS[pl.ds(0, G), pl.ds(0, N)]
                + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw
            pm2_a = jnp.where(ok_a, pm2_raw, 0.0)

            bulk_a = (
                RP2[pl.ds(0, h2), pl.ds(0, N - 1)]
                * QONE[0, pl.ds(G2, h2), pl.ds(1, N - 1)]
            )
            red_a = _tree_to(bulk_a, G2)
            RED2[pl.ds(0, G2), pl.ds(1, N - 1)] = red_a
            RED2[pl.ds(0, G2), pl.ds(0, 1)] = jnp.zeros((G2, 1), jnp.float32)
            redf_a = RED2[pl.ds(0, G2), pl.ds(0, N)]
            PMB[pl.ds(0, G), pl.ds(1, N - 1)] = RP2[pl.ds(0, G), pl.ds(0, N - 1)]
            PMB[pl.ds(0, G), pl.ds(0, 1)] = jnp.zeros((G, 1), jnp.float32)
            qa_a = PMB[pl.ds(0, G), pl.ds(0, N)] + MBU1 * QASC[
                pl.ds(0, G), pl.ds(0, N)
            ]
            QASC[pl.ds(0, G), pl.ds(1, N)] = qa_a
            mb_ctx_a = acc_mb_a * (redf_a[G:] + redf_a[:G] + qa_a)

            bppo_a = base_a + two_a + mb_ctx_a
            bppo_a = jnp.where(pos_a & ok_a, bppo_a, 0.0)
            bppo_out[0, pl.ds(dla * G, G), :] = bppo_a
            g2_a = bppo_a * _blk(AUGT, dla) * inv_a
            _mini_insert(g2_a, g2_a * _blk(TMO3, dla))
            g_row_a = bppo_a * _blk(MBC, dla) * inv_a
            PF._rotate_right(REXT, G)

            # ================= span db =================
            close_b = _blk(CLOSE, dlb)
            pos_b = close_b > 0.0
            inv_b = jnp.where(pos_b, 1.0 / jnp.where(pos_b, close_b, 1.0), 0.0)
            rt_b = REXT[pl.ds(0, G), pl.ds(0, N)]
            base_b = close_b * _blk(ACCB, dlb) * rt_b
            two_b = _two_at(dlb, OUT12[96:], MBU1SQ) * close_b
            acc_mb_b = close_b * _blk(ACCMB, dlb)

            pm_body = _tree8(
                XS[pl.ds(0, hg), pl.ds(1, N - 1)]
                * SONEF[pl.ds(G, hg), pl.ds(0, N - 1)]
            ) + g_row_a[:, 1:] * SONEF[pl.ds(0, G), pl.ds(0, N - 1)]
            pm_l0 = _tree8(
                XS[pl.ds(0, hg), pl.ds(0, 1)]
                * SONEF[pl.ds(G, hg), pl.ds(C2 - 1, 1)]
            ) + g_row_a[:, :1] * SONEF[pl.ds(0, G), pl.ds(C2 - 1, 1)]
            PMB[pl.ds(0, G), pl.ds(1, N - 1)] = pm_body
            PMB[pl.ds(0, G), pl.ds(0, 1)] = pm_l0
            pm_b = jnp.where(ok_b, PMB[pl.ds(0, G), pl.ds(0, N)], 0.0)
            pm2_raw_b = g_row_a + MBU1 * P2SC[pl.ds(0, G), pl.ds(0, N)]
            P2SC[pl.ds(0, G), pl.ds(0, N)] = pm2_raw_b
            pm2_b = jnp.where(ok_b, pm2_raw_b, 0.0)

            bulk_b = (
                RP2[pl.ds(0, h2), pl.ds(0, N - 2)]
                * QONE[0, pl.ds(2 * G2, h2), pl.ds(2, N - 2)]
            )
            red_b = _tree_to(bulk_b, G2)
            RED2[pl.ds(0, G2), pl.ds(2, N - 2)] = red_b
            RED2[pl.ds(0, G2), pl.ds(0, 2)] = jnp.zeros((G2, 2), jnp.float32)
            RED2[pl.ds(0, G), pl.ds(1, N - 1)] = (
                RED2[pl.ds(0, G), pl.ds(1, N - 1)]
                + pm_a[:, : N - 1] * QONE[0, pl.ds(G2, G), pl.ds(1, N - 1)]
            )
            RED2[pl.ds(G, G), pl.ds(1, N - 1)] = (
                RED2[pl.ds(G, G), pl.ds(1, N - 1)]
                + pm2_a[:, : N - 1] * QONE[0, pl.ds(G2 + G, G), pl.ds(1, N - 1)]
            )
            redf_b = RED2[pl.ds(0, G2), pl.ds(0, N)]
            PMB[pl.ds(0, G), pl.ds(1, N - 1)] = pm_a[:, : N - 1]
            PMB[pl.ds(0, G), pl.ds(0, 1)] = jnp.zeros((G, 1), jnp.float32)
            qa_b = PMB[pl.ds(0, G), pl.ds(0, N)] + MBU1 * QASC[
                pl.ds(0, G), pl.ds(0, N)
            ]
            QASC[pl.ds(0, G), pl.ds(1, N)] = qa_b
            mb_ctx_b = acc_mb_b * (redf_b[G:] + redf_b[:G] + qa_b)

            bppo_b = base_b + two_b + mb_ctx_b
            bppo_b = jnp.where(pos_b & ok_b, bppo_b, 0.0)
            bppo_out[0, pl.ds(dlb * G, G), :] = bppo_b
            g2_b = bppo_b * _blk(AUGT, dlb) * inv_b
            _mini_insert(g2_b, g2_b * _blk(TMO3, dlb))
            g_row_b = bppo_b * _blk(MBC, dlb) * inv_b
            PF._rotate_right(REXT, G)

            # ================= batched pair updates =================
            XS[pl.ds(2 * G, hg - 2 * G), :] = XS[pl.ds(0, hg - 2 * G), :]
            XS[pl.ds(G, G), :] = g_row_a
            XS[pl.ds(0, G), :] = g_row_b

            RP2[pl.ds(2 * G2, h2 - 2 * G2), pl.ds(2, N - 2)] = RP2[
                pl.ds(0, h2 - 2 * G2), pl.ds(0, N - 2)
            ]
            RP2[pl.ds(2 * G2, h2 - 2 * G2), pl.ds(0, 2)] = jnp.zeros(
                (h2 - 2 * G2, 2), jnp.float32
            )
            RP2[pl.ds(G2, G), pl.ds(1, N - 1)] = pm_a[:, : N - 1]
            RP2[pl.ds(G2, G), pl.ds(0, 1)] = jnp.zeros((G, 1), jnp.float32)
            RP2[pl.ds(G2 + G, G), pl.ds(1, N - 1)] = pm2_a[:, : N - 1]
            RP2[pl.ds(G2 + G, G), pl.ds(0, 1)] = jnp.zeros(
                (G, 1), jnp.float32
            )
            RP2[pl.ds(0, G), pl.ds(0, N)] = pm_b
            RP2[pl.ds(G, G), pl.ds(0, N)] = pm2_b

            wrap = SONEF[pl.ds(0, hg), pl.ds(C2 - 2, 2)]
            body = SONEF[pl.ds(0, hg), pl.ds(0, C2 - 2)]
            SONEF[pl.ds(0, hg), pl.ds(2, C2 - 2)] = body
            SONEF[pl.ds(0, hg), pl.ds(0, 2)] = wrap

            # merged window aging + 6 inserts (outside +32 lane offset)
            WM[pl.ds(2, 94), :] = WM[pl.ds(0, 94), :] * sig2
            ins = (
                (0, g2_b * _blk(TMO1, dlb), g2_a * _blk(TMO1, dla)),
                (32, g2_b, g2_a),
                (64, g2_b * _blk(TMO2, dlb), g2_a * _blk(TMO2, dla)),
            )
            for off, new0, new1s in ins:
                new1aged = new1s * MBU1
                for g in range(G):
                    WM[pl.ds(off + 1, 1), pl.ds(g * SW + 32, N)] = new1aged[
                        g : g + 1, :
                    ]
                    WM[pl.ds(off, 1), pl.ds(g * SW + 32, N)] = new0[
                        g : g + 1, :
                    ]

        prev = 0
        for ht in PF._live_heights(N):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = (hi - lo) * G
                    wrapb = SONEF[pl.ds(lo * G, rows), pl.ds(C2 - lo, lo)]
                    bodyb = SONEF[pl.ds(lo * G, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo * G, rows), pl.ds(lo, C2 - lo)] = bodyb
                    SONEF[pl.ds(lo * G, rows), pl.ds(0, lo)] = wrapb

                pl.when(ka == prev)(bulk)
            cond = kb < ht if prev == 0 else (kb >= prev) & (kb < ht)
            pl.when(cond)(functools.partial(pair_body, ht))
            prev = ht
        return carry

    p0 = jnp.maximum(0, (N - n_even) - c * R) // 2
    lax.fori_loop(p0, R // 2, pair_step, 0)


def _turner_merge_inside(pmats):
    """Fold CANON and the outer-terminal-mismatch * aug products into the
    [d, i] tables (see the per-seq Turner kernel's span body)."""
    canon = pmats["CANON"]
    augc = pmats["AUGT"] * canon
    return {
        "H": pmats["H"] * canon,
        "MBC": pmats["MBC"] * canon,
        "ACC": pmats["ACC"],
        "AUGC": augc,
        "TMO1C": pmats["TMo1"] * augc,
        "TMO2C": pmats["TMo2"] * augc,
        "TMO3C": pmats["TMo3"] * augc,
        "SP00": pmats["STKT"] * canon,
        "SP01": pmats["B01"] * canon,
        "SP10": pmats["B10"] * canon,
        "SP11": pmats["I11T"] * canon,
        "SP12": pmats["I12T"] * canon,
        "SP21": pmats["I21T"] * canon,
        "SP22": pmats["I22T"] * canon,
        "AUGT": pmats["AUGT"],
        "TMI1": pmats["TMi1"],
        "TMI2": pmats["TMi2"],
        "TMI3": pmats["TMi3"],
    }


_TI_NAMES = (
    "H", "MBC", "ACC", "AUGC", "TMO1C", "TMO2C", "TMO3C",
    "SP00", "SP01", "SP10", "SP11", "SP12", "SP21", "SP22",
    "AUGT", "TMI1", "TMI2", "TMI3",
)


def _turner_merge_outside(close, pmats, extL, glob, mbbp):
    aug = pmats["AUGT"]
    inv_glob = (1.0 / glob)[:, None, None]
    return {
        "CLOSE": close,
        "MBC": pmats["MBC"],
        "ACCB": pmats["ACC"] * extL[:, None, :] * inv_glob,
        "ACCMB": pmats["ACC"] * mbbp[:, None, None],
        "AUGT": aug,
        "TMI1C": pmats["TMi1"] * aug,
        "TMI2C": pmats["TMi2"] * aug,
        "TMI3C": pmats["TMi3"] * aug,
        "SP00": pmats["STKO"],
        "SP01": pmats["B01O"],
        "SP10": pmats["B10O"],
        "SP11": pmats["I11O"],
        "SP12": pmats["I12O"],
        "SP21": pmats["I21O"],
        "SP22": pmats["I22O"],
        "TMO1": pmats["TMo1"],
        "TMO2": pmats["TMo2"],
        "TMO3": pmats["TMo3"],
    }


_TO_NAMES = (
    "CLOSE", "MBC", "ACCB", "ACCMB", "AUGT", "TMI1C", "TMI2C", "TMI3C",
    "SP00", "SP01", "SP10", "SP11", "SP12", "SP21", "SP22",
    "TMO1", "TMO2", "TMO3",
)


def _turner_prob8_run_body(seqs, ns, tt, ln_sigma, N, interpret, upto=None):
    B = seqs.shape[0]
    K = B // G
    if (
        _WINDOW_MODE == "aged" and _SPANS == 2 and N > 128 and B > G
        and upto is None
    ):
        # the merged Turner N=256 programs compile (and run) only at a
        # K=1 grid — at K >= 2 the remote Mosaic compile helper crashes
        # (suspected: cross-group double-buffering of the 16.8 MB
        # ONEP/QONE inputs pushing past the VMEM budget with no graceful
        # error).  Sequentially map the single-group program instead;
        # same total work, one extra dispatch per group.
        def one(args):
            s, n, l = args
            return _turner_prob8_run_body(s, n, tt, l, N, interpret)

        bppo_g, glob_g = lax.map(
            one,
            (
                seqs.reshape(K, G, -1),
                ns.reshape(K, G),
                ln_sigma.reshape(K, G),
            ),
        )
        return (
            bppo_g.reshape((B,) + bppo_g.shape[2:]),
            glob_g.reshape(B),
        )
    NG = N * G
    aged = _WINDOW_MODE == "aged"
    pmats = PP.turner_prob_mats(seqs, ns, tt, ln_sigma, N)
    LENBp, LENIp = PP._turner_len_prob(tt, ln_sigma)
    KBb, K2b, KIb = PP._turner_banded_kernels(LENBp, LENIp)
    if aged:
        SW = _seg(N)
        LENB_log, LENI_log = PF._turner_len_di(tt)
        KBc, K2c, KI8 = PP._turner_banded_kernels(
            jnp.exp(LENB_log)[None], jnp.exp(LENI_log)[None]
        )
        SIGL = jnp.broadcast_to(
            jnp.exp(-ln_sigma).reshape(K, G, 1), (K, G, SW)
        ).reshape(K, 1, G * SW)
        if _SPANS == 2:
            # merged block-diagonal kernel (see _turner_inside8m_kernel);
            # the pair variant is gated to N <= 128 (the N = 256 pair
            # kernels crash the remote Mosaic compiler — see
            # _prob8_run_body), N = 256 runs the merged kernels single-span
            t_spans = 2 if N <= 128 else 1
            _ov = _os.environ.get("RNA_ALGOS_TSPANS")   # debug override
            if _ov:
                t_spans = int(_ov)
            KT = jnp.zeros((1, 96, 96), jnp.float32)
            KT = KT.at[:, 0:32, 0:32].set(KI8)
            KT = KT.at[:, 32:64, 32:64].set(KBc)
            KT = KT.at[:, 64:96, 64:96].set(K2c)
            if t_spans == 2:
                KTs = jnp.concatenate(
                    [KT[:, :, 1:], jnp.zeros_like(KT[:, :, :1])], axis=2
                )
                KT12 = jnp.concatenate([KT, KTs], axis=1)  # (1, 192, 96)
            else:
                KT12 = KT
            kt_rows = KT12.shape[1]
    else:
        KI8 = _kbig(KIb)
    WCOLS8 = _wcols8(KBb, K2b)
    scal, n_max = _group_scal(ns, B)

    u = jnp.exp(-ln_sigma)
    ones_b = jnp.ones((B,), jnp.float32)
    coeffp = jnp.broadcast_to(jnp.exp(tt["coeff_num_branches"]), (B,))
    logmbu = -ln_sigma
    leni32 = LENIp[:, 3, 2]
    leni23 = LENIp[:, 2, 3]
    vec_i = _bcast_rows(N, u, ones_b, u, coeffp, logmbu, leni32, leni23)

    mi = {k: ilv(v) for k, v in _turner_merge_inside(pmats).items()}

    out_shape = tuple(
        jax.ShapeDtypeStruct((K, NG, N), jnp.float32) for _ in range(3)
    )
    if aged:
        R = min(32, N) if N <= 128 else 16   # see _prob8_run_body
        C = N // R

        def _kc(*shape):
            return pl.BlockSpec(
                (1,) + shape, lambda k, c: (k, 0, 0),
                memory_space=pltpu.VMEM,
            )

        chunk = pl.BlockSpec(
            (1, R * G, N), lambda k, c: (k, c, 0), memory_space=pltpu.VMEM
        )
        smem2 = pl.BlockSpec(
            (1, 1, 8), lambda k, c: (k, 0, 0), memory_space=pltpu.SMEM
        )
        ki_spec = pl.BlockSpec(
            (1, 32, 32), lambda k, c: (0, 0, 0), memory_space=pltpu.VMEM
        )
        if _SPANS == 2:
            kernel = functools.partial(
                _turner_inside8m_kernel, N=N, R=R, spans=t_spans
            )
            kt_spec = pl.BlockSpec(
                (1, kt_rows, 96), lambda k, c: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            close8, ext8, one8 = pl.pallas_call(
                kernel,
                grid=(K, C),
                in_specs=[
                    smem2,
                    _kc(7 * G, N),
                    *(chunk for _ in range(18)),
                    kt_spec,
                    _kc(1, G * SW),
                ],
                out_specs=(chunk, chunk, chunk),
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM((13 * G, N + LPAD), jnp.float32),    # MINI
                    pltpu.VMEM((96, G * SW), jnp.float32),          # WM
                    pltpu.VMEM((G, N), jnp.float32),                # TWO8
                    pltpu.VMEM((2 * NG, N + 8), jnp.float32),       # FQ2
                    pltpu.VMEM((2 * NG + 2 * G, N), jnp.float32),   # EO
                    pltpu.VMEM((2 * G, N + 8), jnp.float32),        # mbS
                    pltpu.VMEM((G, N + 8), jnp.float32),            # S1SC
                    pltpu.VMEM((3 * G, N), jnp.float32),            # CARRY
                ],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024,
                ),
            )(
                scal, vec_i,
                *(mi[k] for k in _TI_NAMES),
                KT12, SIGL,
            )
        else:
            kernel = functools.partial(
                _turner_inside8_kernel, N=N, R=R, aged=True
            )
            close8, ext8, one8 = pl.pallas_call(
                kernel,
                grid=(K, C),
                in_specs=[
                    smem2,
                    _kc(7 * G, N),
                    *(chunk for _ in range(18)),
                    ki_spec,
                    _kc(4 * 32 * G, 8),
                    _kc(1, G * SW),
                ],
                out_specs=(chunk, chunk, chunk),
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # CAW
                    pltpu.VMEM((40, G * SW), jnp.float32),          # GW1 (aged)
                    pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW2
                    pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW3
                    pltpu.VMEM((2 * NG, N), jnp.float32),           # FQ2
                    pltpu.VMEM((2 * NG + 2 * G, N), jnp.float32),   # EO
                    pltpu.VMEM((2 * G, N + 8), jnp.float32),        # mbS
                    pltpu.VMEM((G, N + 8), jnp.float32),            # S1SC
                    pltpu.VMEM((G, N), jnp.float32),                # TWO8
                    pltpu.VMEM((3 * G, N), jnp.float32),            # CARRY
                ],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024,
                ),
            )(
                scal, vec_i,
                *(mi[k] for k in _TI_NAMES),
                KI8, WCOLS8, SIGL,
            )
    else:
        kernel = functools.partial(_turner_inside8_kernel, N=N, aged=False)
        close8, ext8, one8 = pl.pallas_call(
            kernel,
            grid=(K,),
            in_specs=[
                _SMEM_SPEC,
                _nn(7 * G, N),
                *(_nn(NG, N) for _ in range(18)),
                _nn(32 * G, 32 * G),
                _nn(4 * 32 * G, 8),
            ],
            out_specs=(_nn(NG, N), _nn(NG, N), _nn(NG, N)),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # CAW
                pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW1
                pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW2
                pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW3
                pltpu.VMEM((2 * NG, N + 8), jnp.float32),       # FQ2 (rm|rmmb)
                pltpu.VMEM((2 * NG + 2 * G, N), jnp.float32),   # EO (ext|one)
                pltpu.VMEM((2 * G, N + 8), jnp.float32),        # mbS
                pltpu.VMEM((G, N + 8), jnp.float32),            # S1SC
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
        )(
            scal, vec_i,
            *(mi[k] for k in _TI_NAMES),
            KI8, WCOLS8,
        )

    if upto == "inside":
        return close8, ext8, one8
    close, ext, one = dilv(close8), dilv(ext8), dilv(one8)
    live = jnp.arange(N)[None, :, None] < ns[:, None, None]
    ext = jnp.where(live, ext, 0.0)
    one = jnp.where(live, one, 0.0)

    n_rot_g = n_max.astype(jnp.int32)
    if aged and _SPANS == 2 and t_spans == 2:
        n_rot_g = n_rot_g + (n_rot_g % 2)   # even-aligned pair start
    ONEP, QONE, extL, extR, glob = PF.contra_outside_aux(
        ns, ext, one, N, neg=0.0, one_val=1.0,
        n_rot=jnp.repeat(n_rot_g, G),
    )

    mo = _turner_merge_outside(close, pmats, extL, glob, coeffp)
    mo8 = {k: ilv(v) for k, v in mo.items()}
    vec_o = _bcast_rows(N, logmbu, leni32, leni23)
    ONEP8 = ilv(ONEP)
    QONE8 = dup2(ilv(QONE))
    EXTR8 = ilv(extR[:, None, :])

    if aged:
        chunk_desc = pl.BlockSpec(
            (1, R * G, N), lambda k, c: (k, C - 1 - c, 0),
            memory_space=pltpu.VMEM,
        )
        if _SPANS == 2:
            kernel_o = functools.partial(
                _turner_outside8m_kernel, N=N, R=R,
                min_span=MIN_SPAN_HAIRPIN_CLOSE, spans=t_spans,
            )
            if t_spans == 2:
                # pair-offset bulk reads index QONE rows up to h2 + 2*G2
                QONE8 = jnp.concatenate(
                    [QONE8, jnp.zeros((K, 4 * G, N), jnp.float32)], axis=1
                )
            qone_rows_t = QONE8.shape[1]
            bppo8 = pl.pallas_call(
                kernel_o,
                grid=(K, C),
                in_specs=[
                    smem2,
                    _kc(3 * G, N),
                    *(chunk_desc for _ in range(18)),
                    _kc(NG, 2 * N),                    # ONEP
                    _kc(qone_rows_t, N),               # QONE
                    _kc(G, 2 * N),                     # EXTR
                    kt_spec,
                    _kc(1, G * SW),
                ],
                out_specs=chunk_desc,
                out_shape=jax.ShapeDtypeStruct((K, NG, N), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((13 * G, N + LPAD), jnp.float32),    # MINI
                    pltpu.VMEM((96, G * SW), jnp.float32),          # WM
                    pltpu.VMEM((G, N), jnp.float32),                # TWO8
                    pltpu.VMEM((2 * G, N), jnp.float32),            # RED2
                    pltpu.VMEM((G, N), jnp.float32),                # PMB
                    pltpu.VMEM((NG, N), jnp.float32),               # XS
                    pltpu.VMEM((2 * NG, N), jnp.float32),           # RP2
                    pltpu.VMEM(
                        (NG + (G if t_spans == 2 else 0), 2 * N),
                        jnp.float32,
                    ),                                              # SONEF
                    pltpu.VMEM((G, 2 * N), jnp.float32),            # REXT
                    pltpu.VMEM((G, N), jnp.float32),                # P2SC
                    pltpu.VMEM((G, N + 8), jnp.float32),            # QASC
                ],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024,
                ),
            )(
                scal, vec_o,
                *(mo8[k] for k in _TO_NAMES),
                ONEP8, QONE8, EXTR8,
                KT12, SIGL,
            )
            return dilv(bppo8), glob
        kernel_o = functools.partial(
            _turner_outside8_kernel, N=N, R=R,
            min_span=MIN_SPAN_HAIRPIN_CLOSE, aged=True,
        )
        bppo8 = pl.pallas_call(
            kernel_o,
            grid=(K, C),
            in_specs=[
                smem2,
                _kc(3 * G, N),
                *(chunk_desc for _ in range(18)),
                _kc(NG, 2 * N),                    # ONEP
                _kc(2 * NG, N),                    # QONE (fam-duplicated)
                _kc(G, 2 * N),                     # EXTR
                ki_spec,
                _kc(4 * 32 * G, 8),
                _kc(1, G * SW),
            ],
            out_specs=chunk_desc,
            out_shape=jax.ShapeDtypeStruct((K, NG, N), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # OG
                pltpu.VMEM((40, G * SW), jnp.float32),          # GW1 (aged)
                pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW2
                pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW3
                pltpu.VMEM((NG, N), jnp.float32),               # XS
                pltpu.VMEM((2 * NG, N), jnp.float32),           # RP2
                pltpu.VMEM((NG, 2 * N), jnp.float32),           # SONEF
                pltpu.VMEM((G, 2 * N), jnp.float32),            # REXT
                pltpu.VMEM((G, N), jnp.float32),                # P2SC
                pltpu.VMEM((G, N + 8), jnp.float32),            # QASC
                pltpu.VMEM((G, N), jnp.float32),                # TWO8
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
        )(
            scal, vec_o,
            *(mo8[k] for k in _TO_NAMES),
            ONEP8, QONE8, EXTR8,
            KI8, WCOLS8, SIGL,
        )
        return dilv(bppo8), glob
    kernel_o = functools.partial(
        _turner_outside8_kernel, N=N, min_span=MIN_SPAN_HAIRPIN_CLOSE,
        aged=False,
    )
    bppo8 = pl.pallas_call(
        kernel_o,
        grid=(K,),
        in_specs=[
            _SMEM_SPEC,
            _nn(3 * G, N),
            *(_nn(NG, N) for _ in range(18)),
            _nn(NG, 2 * N),                    # ONEP
            _nn(2 * NG, N),                    # QONE (fam-duplicated)
            _nn(G, 2 * N),                     # EXTR
            _nn(32 * G, 32 * G),
            _nn(4 * 32 * G, 8),
        ],
        out_specs=_nn(NG, N),
        out_shape=jax.ShapeDtypeStruct((K, NG, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # OG
            pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW1
            pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW2
            pltpu.VMEM((WBT, N + LPAD), jnp.float32),       # GW3
            pltpu.VMEM((NG, N), jnp.float32),               # XS
            pltpu.VMEM((2 * NG, N), jnp.float32),           # RP2 (pm|pm2)
            pltpu.VMEM((NG, 2 * N), jnp.float32),           # SONEF
            pltpu.VMEM((G, 2 * N), jnp.float32),            # REXT
            pltpu.VMEM((G, N), jnp.float32),                # P2SC
            pltpu.VMEM((G, N + 8), jnp.float32),            # QASC
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
    )(
        scal, vec_o,
        *(mo8[k] for k in _TO_NAMES),
        ONEP8, QONE8, EXTR8,
        KI8, WCOLS8,
    )
    return dilv(bppo8), glob


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def mccaskill_turner_pallas_prob8(seqs, ns, tt, N, interpret=False):
    """Stacked (G=8) scaled-probability Turner McCaskill with retries."""

    def run(ls):
        return _turner_prob8_run_body(seqs, ns, tt, ls, N, interpret)

    return PP._retrying(
        run, seqs.shape[0],
        ls0=jnp.asarray(PP.LN_SIGMA0_TURNER, jnp.float32), ns=ns,
    )
