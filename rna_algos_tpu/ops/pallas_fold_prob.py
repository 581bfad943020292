"""Scaled probability-space McCaskill kernels (CONTRAfold model, fast mode).

The exact kernels (ops/pallas_fold.py) evaluate the reference's piecewise-
cubic log-sum-exp (~45 VPU ops per combine) because bit-level parity with
`/root/reference/src/mccaskill_algo.rs` demands log space.  Fast mode has no
such contract — so this module runs the SAME wavefronts in **scaled
probability space**, the formulation production folding engines use: every
log-add becomes a multiply, every lse tree a plain sum, and the 2-loop
window collapses to multiply-accumulate.

Scaling (the classic partition-function trick): a state covering span ``s``
stores ``Z * sigma^-s`` for a per-sequence constant ``sigma``.  Every
recurrence transfers a fixed span delta, so the powers fold into the score
tables on the host:

* hairpin H' = exp(H - s*ln_sigma), 2-loop LEN' = exp(LEN - (a+b+2)*ln_sigma),
  multibranch-close MBC' = exp(MBC - 2*ln_sigma),
* per-base transfers eu1 = exp(external_unpair - ln_sigma), mbu1 likewise,
* the outside pass works in normalized probability (bppo IS the bpp), with
  the same LEN'/MBC' constants — the span algebra cancels exactly.

float32 covers ~e+-87, so per-base log-Z must lie within ~87/n of
``ln_sigma``.  Measured per-base log-Z: ~0.7-1.0 for real RNA, -0.02 for
unfoldable strings, 2.9 for a perfect CG helix — hence a per-sequence
``ln_sigma`` (default LN_SIGMA0) plus overflow/underflow detection on the
partition function with a bisection retry (``mccaskill_contra_pallas_prob``).
Accuracy: hardware exp/mul instead of the reference's cubic approximations;
BPPs match exact mode well inside its own ~5e-4 budget (probabilities the
reference's expf flushes to zero may differ in presence only).

Reference recurrences: mccaskill_algo.rs:380-516 (inside), :612-723
(outside); layout/machinery notes in ops/pallas_fold.py's docstring.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    MAX_LOOP_LEN,
    MIN_SPAN_HAIRPIN_CLOSE,
    NEG_INF,
)
from . import diag
from . import scores as S
from . import pallas_fold as PF
from .pallas_fold import (
    W,
    _live_heights,
    W2,
    WROWS,
    LPAD,
    _row3,
    _shift_insert,
    _init_swapped,
    _rotate_right,
)

LN_SIGMA0 = 0.9          # initial per-base scale (CONTRA; typical folded RNA)
LN_SIGMA0_TURNER = 0.5   # Turner per-base log-Z is much lower (~0.35 random,
                         # ~0.5-0.7 structured); starting there keeps long
                         # sequences inside the guard band without retries
RETRY_STEP = 0.9         # ln_sigma bisection step on over/underflow
MAX_RETRIES = 10
# Scaled-Z guard band: exact 0.0/inf detection is not enough — a partition
# function near the f32 denormal cliff (~1e-38) silently flushes the small
# bppo intermediates to zero (measured ~6e-2 BPP error at glob ~ 2e-37 on
# n=465), so anything outside [GLOB_LO, GLOB_HI] triggers a rescale retry.
# The band is deliberately wide (no retries for the common n <= 256 range,
# where glob ~ e^{n * (logZ/n - ln_sigma)} lands within ~1e-18..1e9).
GLOB_LO = 1e-24
GLOB_HI = 1e24


# ---------------------------------------------------------------------------
# Host-side transform: log-space [d, i] mats -> scaled probability space
# ---------------------------------------------------------------------------

_shift_di = diag.shift_di


def contra_prob_mats(seqs, ns, ct, ln_sigma, N):
    """Per-sequence probability-space score tensors (vmapped over the batch).

    Starts from the shared log-space precompute (PF.contra_precompute_di)
    and exponentiates with the span powers folded in."""
    mats = PF.contra_precompute_di(seqs, ns, ct, N)

    def one(m, ls):
        spanv = (jnp.arange(N, dtype=jnp.float32) + 1.0)[:, None]
        out = {
            "H": jnp.exp(m["H"] - spanv * ls),
            "MBC": jnp.exp(m["MBC"] - 2.0 * ls),
            "ACC": jnp.exp(m["ACC"]),
            "JS": jnp.exp(m["JS"]),
            "JB": jnp.exp(m["JB"]),
            "CANON": jnp.where(m["CANON"] > -1.0, 1.0, 0.0),
            # (0,0) stack replaces the whole 2-loop body: ratio out the jb
            # (inner) / jsn (outer) baked into the merged window buffer and
            # carry the span-delta power the LEN' path would have supplied
            "STK": jnp.exp(
                m["STK"] - _shift_di(m["JB"], -2, 1) - 2.0 * ls
            ),
            "I11": jnp.exp(m["I11"]),
            "B0R": jnp.exp(m["B0R"]),
            "B0L": jnp.exp(m["B0L"]),
            "STKO": jnp.exp(
                m["STKO"] - _shift_di(m["JS"], 2, -1) - 2.0 * ls
            ),
            "I11O": jnp.exp(m["I11O"]),
            "B0RO": jnp.exp(m["B0RO"]),
            "B0LO": jnp.exp(m["B0LO"]),
        }
        return out

    return jax.vmap(one)(mats, ln_sigma)


def _contra_len_prob(ct, ln_sigma):
    """(B, W2, W) [b, a] 2-loop length constants: exp(LEN - (a+b+2)*ln_s)."""
    base = PF._contra_len_di(ct)  # (W2, W) log
    ab = (
        jnp.arange(W2, dtype=jnp.float32)[:, None]
        + jnp.arange(W, dtype=jnp.float32)[None, :]
        + 2.0
    )
    return jnp.exp(base[None] - ab[None] * ln_sigma[:, None, None])


def _banded_kernel(LENp, keep):
    """(B, 32, 32) banded MXU kernel K[a, r] = LEN[r-a-1, a] on keep(a, b).

    In probability space the 2-loop window sum over (a, b) is, for fixed
    lane shift ``a``, a weighted sum over window-buffer rows r = a+b+1 —
    so a whole window region collapses to ONE (32, 32) @ (32, N+LPAD)
    matmul per span (rows r in [1, 31] carry the live band;
    a + b <= MAX_LOOP_LEN bounds b <= 30 - a).  ``keep(a, b)`` selects the
    region whose body factors as LEN[b, a] * row; cells that don't factor
    (stack / small bulges / small interiors, and for Turner the
    per-region terminal-mismatch splits) are zeroed here and handled
    explicitly in the kernel."""
    a_i = jnp.arange(32)[:, None]
    r_i = jnp.arange(32)[None, :]
    b_v = r_i - a_i - 1
    valid = (b_v >= 0) & (b_v <= 30 - a_i) & (a_i <= 30) & keep(a_i, b_v)
    bs = jnp.clip(b_v, 0, W2 - 1)
    as_ = jnp.clip(a_i, 0, W - 1)
    gathered = LENp[:, bs, jnp.broadcast_to(as_, bs.shape)]
    return jnp.where(valid[None], gathered, 0.0)


def _banded_window_kernel(LENp, specials=((0, 0), (0, 1), (1, 0), (1, 1))):
    """CONTRA variant: the full band minus the 4 special cells."""

    def keep(a_i, b_v):
        v = jnp.ones(jnp.broadcast_shapes(a_i.shape, b_v.shape), bool)
        for (sa, sb) in specials:
            v = v & ~((a_i == sa) & (b_v == sb))
        return v

    return _banded_kernel(LENp, keep)


# Turner window regions (from the per-cell dispatch the loop formulation
# used — see _turner_tl_prob in git history / pallas_fold._turner_tl):
# bulges read CAW alone; TM1/TM2 interiors read CAW merged with the
# matching inner-terminal-mismatch window; the two TM3 cells (2,3)/(3,2)
# and the 7 small-loop specials are added explicitly.
def _turner_wcols(KBb, K2b):
    """(B, 32, 32) -> (B, 32, 8) weight columns for the decomposed Turner
    windows: lanes [kb_col (a=0, by r), kb_diag (r=a+1, by a),
    k2_col (a=1, by r), k2_diag (r=a+2, by a), 0, 0, 0, 0].  See
    pallas_fold_prob8._wcols8 for the stacked variant and the inside
    kernels for the arms' evaluation."""
    kb_col = KBb[:, 0, :]
    kb_diag = jnp.pad(
        jnp.diagonal(KBb, offset=1, axis1=1, axis2=2), ((0, 0), (0, 1))
    )
    k2_col = K2b[:, 1, :]
    k2_diag = jnp.pad(
        jnp.diagonal(K2b, offset=2, axis1=1, axis2=2), ((0, 0), (0, 2))
    )
    z = jnp.zeros_like(kb_col)
    return jnp.stack(
        [kb_col, kb_diag, k2_col, k2_diag, z, z, z, z], axis=2
    )


def _turner_banded_kernels(LENBp, LENIp):
    KB = _banded_kernel(
        LENBp,
        lambda a, b: ((a == 0) & (b >= 2)) | ((a >= 2) & (b == 0)),
    )
    K2 = _banded_kernel(
        LENIp,
        lambda a, b: ((a == 1) & (b >= 3)) | ((a >= 3) & (b == 1)),
    )
    KI = _banded_kernel(
        LENIp,
        lambda a, b: (
            ((a == 2) & (b >= 4)) | ((a == 3) & (b >= 3))
            | ((a >= 4) & (b >= 2))
        ),
    )
    return KB, K2, KI


import os as _os

# MXU passes for the banded window matmuls.  "high" (default since round
# 3) = manual 3-pass bf16 residual splitting (Mosaic has no Precision.HIGH
# lowering) — hi/lo split both operands, keep the three O(2^-8)-and-better
# products, drop lo@lo (~2^-16 relative); gated by the 5e-4 goldens AND
# the float64 long-n anchors (tests/test_longn_numerics.py), and measured
# +16% (CONTRA) / +30% (Turner) end-to-end over "highest" at the tRNA
# headline.  "highest" = 6-pass full-f32 emulation (the pre-round-3
# default); "default" = single bf16 pass (~4e-3 relative — FAILS the 5e-4
# golden budget, experiment only).  Read at import: baked into every
# compiled program.
_BAND_PRECISION = _os.environ.get(
    "RNA_ALGOS_BAND_PRECISION", "high"
).lower()
if _BAND_PRECISION not in ("highest", "high", "default"):
    raise ValueError(
        "RNA_ALGOS_BAND_PRECISION must be one of 'highest'/'high'/'default', "
        f"got {_BAND_PRECISION!r}"
    )


def _mm_3pass(kw, rows):
    """bf16_3x emulation of an f32 matmul: kh@rh + kh@rl + kl@rh."""
    kh = kw.astype(jnp.bfloat16)
    kl = (kw - kh.astype(jnp.float32)).astype(jnp.bfloat16)
    rh = rows.astype(jnp.bfloat16)
    rl = (rows - rh.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return dot(kh, rh) + (dot(kh, rl) + dot(kl, rh))


def _mm_prec(kw, rows):
    if _BAND_PRECISION == "high":
        return _mm_3pass(kw, rows)
    return jax.lax.dot_general(
        kw, rows, (((1,), (0,)), ((), ())),
        precision=(
            jax.lax.Precision.HIGHEST
            if _BAND_PRECISION == "highest"
            else jax.lax.Precision.DEFAULT
        ),
        preferred_element_type=jnp.float32,
    )


def _band_mm(KREF, ROWS):
    """One banded-window MXU pass: (32, 32) kernel @ 32 window rows."""
    kw = KREF[0, pl.ds(0, 32), pl.ds(0, 32)]
    rows = ROWS[pl.ds(0, 32), :]
    return _mm_prec(kw, rows)


def _skew_extract_sum(OUT, N, base_shift, descending=False):
    """sum_a OUT[a, i + shift(a)] via a fused log-depth shift+sum.

    ``shift(a) = base_shift + a`` (inside windows) or ``base_shift - a``
    (``descending=True``, outside windows).  Each halving level shifts one
    half-block by the level stride and adds it to the other — rows with
    shifts differing by h merge into one row with the common residual —
    so the whole extraction is 5 slice+adds on halving heights (no
    per-row selects, no separate reduce tree).  OUT is (32, >= N + 32 +
    base_shift); returns (1, N)."""
    x = OUT if descending else OUT[:, base_shift:]
    h = 16
    while h >= 1:
        L = x.shape[1]
        if descending:
            # row a needs shift base - a: the LOW half needs h more
            x = x[:h, h:] + x[h:, : L - h]
        else:
            x = x[:h, : L - h] + x[h:, h:]
        h //= 2
    if descending:
        # residual common shift after folding 31..16..1: base - 31
        x = x[:, base_shift - 31:]
    return x[:, :N]


# ---------------------------------------------------------------------------
# Inside kernel (probability space)
# ---------------------------------------------------------------------------

def _contra_inside_prob_kernel(
    SCAL,                                   # (1, 1, 8) SMEM scalars
    H, MBC, ACC, JS, STK, I11, B0R, B0L, CANON, JB,   # (1, N, N) [d, i]
    LEN,                                    # (1, W2, W) [b, a]
    KB,                                     # (1, 32, 32) banded MXU kernel
    close_out, ext_out, one_out,            # (1, N, N)
    CJW, FQ, FQM, extS, extrS, mbS, oneS, closeF, S1SC,
    *, N,
):
    eu1 = SCAL[0, 0, 0]      # exp(external_unpair - ln_sigma)
    ebp = SCAL[0, 0, 1]      # exp(external_basepair)
    mbu1 = SCAL[0, 0, 2]     # exp(multibranch_unpair - ln_sigma)
    mbbp = SCAL[0, 0, 3]     # exp(multibranch_basepair)
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    CJW[:] = jnp.zeros_like(CJW[:])
    FQ[:] = jnp.zeros_like(FQ[:])
    FQM[:] = jnp.zeros_like(FQM[:])
    S1SC[:] = jnp.zeros_like(S1SC[:])
    extS[:] = jnp.zeros_like(extS[:])
    extrS[:] = jnp.ones_like(extrS[:])      # ext(i, i-1) = empty = 1
    mbS[:] = jnp.zeros_like(mbS[:])
    oneS[:] = jnp.zeros_like(oneS[:])
    closeF[:] = jnp.zeros_like(closeF[:])

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    zero_row = jnp.zeros((1, N), jnp.float32)

    def span_step(d, carry):
        rm_prev, rmmb_prev, epow_prev = carry

        js_row = _row3(JS, d)
        # 2-loop window as ONE MXU matmul (see _banded_window_kernel): for
        # fixed lane shift a the b-sum is a weighted sum over window rows
        # r = a+b+1, so OUT = K @ CJW-rows, then shift row a left by a+1
        # and sum rows (log-depth value shifts).  The 4 special (a, b)
        # cells are zeroed in K and added explicitly below.
        OUT = _band_mm(KB, CJW)
        two = js_row * _skew_extract_sum(OUT, N, 1)
        two = two + _row3(STK, d) * CJW[pl.ds(1, 1), pl.ds(1, N)]
        two = two + (
            js_row * LEN[0, pl.ds(1, 1), pl.ds(0, 1)] * _row3(B0R, d)
            * CJW[pl.ds(2, 1), pl.ds(1, N)]
        )
        two = two + (
            js_row * LEN[0, pl.ds(0, 1), pl.ds(1, 1)] * _row3(B0L, d)
            * CJW[pl.ds(2, 1), pl.ds(2, N)]
        )
        two = two + (
            js_row * LEN[0, pl.ds(1, 1), pl.ds(1, 1)] * _row3(I11, d)
            * CJW[pl.ds(3, 1), pl.ds(2, N)]
        )
        mb_in = mbS[pl.ds(1, 1), pl.ds(1, N)]   # 2-row ring, +1 lane
        mb_term = jnp.where(d >= 2, mb_in * _row3(MBC, d), 0.0)
        close_new = (_row3(H, d) + two + mb_term) * _row3(CANON, d)
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, 0.0
        )
        closeF[pl.ds(d, 1), :] = close_new
        acc_new = close_new * _row3(ACC, d)

        rm_new = rm_prev * eu1 + acc_new * ebp
        rmmb_new = rmmb_prev * mbu1 + acc_new * mbbp
        epow = epow_prev * eu1                   # eu1^(d+1): empty ensemble

        # live-region truncation (_live_heights): rows past d are zero by
        # construction, so each span's shifts and bifurcation sums run at
        # the covering pow-2 height instead of the full bucket height
        def tail(ht):
            tb = t_idx[:ht]
            for buf, row in ((FQ, rm_new), (FQM, rmmb_new)):
                shifted = buf[pl.ds(0, ht - 1), pl.ds(1, N + 7)]
                buf[pl.ds(1, ht - 1), pl.ds(0, N + 7)] = shifted
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            qblk = FQ[pl.ds(0, ht), pl.ds(0, N)]
            eblk = extrS[pl.ds(0, ht), :]
            terms = jnp.where(tb <= d - 1, qblk * eblk, 0.0)
            ext_new = epow + jnp.sum(terms, axis=0, keepdims=True)
            extS[pl.ds(d, 1), :] = ext_new
            extrS[pl.ds(d + 1, 1), :] = ext_new

            qmblk = FQM[pl.ds(0, ht), pl.ds(0, N)]
            x = jnp.where((tb >= 1) & (tb <= d - 1), qmblk, 0.0)
            # sum_t rmmb_{d-t} * mbu1^t telescoped: S1_d = mbu1 *
            # (rmmb_{d-1} + S1_{d-1}) under the 1-lane aging shift (FQM
            # row 1 after this span's shift IS rmmb_{d-1} at the aged
            # alignment).  A standalone mbu1^t column flushes to zero at
            # t > 87/|ln mbu1| even when the x*mbu1^t term is perfectly
            # representable (Turner mbu = 0 keeps long-unpaired-run terms
            # significant — measured 2e-3 BPP error at n ~ 250); every
            # telescoped partial is a true suffix ensemble, so nothing
            # representable is lost.  Also removes the (ht, N) mul+reduce.
            s1v = mbu1 * (
                FQM[pl.ds(1, 1), pl.ds(0, N)]
                + S1SC[pl.ds(0, 1), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, 1), pl.ds(0, N)] = s1v
            s1 = rmmb_new + s1v
            oblk = oneS[pl.ds(0, ht), :]
            s2 = jnp.sum(oblk * x, axis=0, keepdims=True)
            mbS[pl.ds(1, 1), :] = mbS[pl.ds(0, 1), :]
            mbS[pl.ds(0, 1), pl.ds(0, N)] = s2
            oneS[pl.ds(d + 1, 1), :] = s1 + s2

        prev = 0
        for ht in _live_heights(N):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        _shift_insert(CJW, close_new * _row3(JB, d))
        return (rm_new, rmmb_new, epow)

    lax.fori_loop(
        0, n_i, span_step, (zero_row, zero_row, jnp.float32(1.0))
    )

    close_out[0] = closeF[:]
    ext_out[0] = extS[:]
    one_out[0] = oneS[pl.ds(1, N), :]


# ---------------------------------------------------------------------------
# Outside kernel (probability space; bppo IS the basepair probability)
# ---------------------------------------------------------------------------

def _contra_outside_prob_kernel(
    SCAL,
    CLOSE, MBC, ACC, STKO, I11O, B0RO, JRB, JSN,   # (1, N, N) [d, i]
    ONEP,                                    # (1, N, 2N)
    QONE,                                    # (1, N, N)
    B0LO, EXTL,                              # (1, 1, N)
    EXTR,                                    # (1, 1, 2N)
    LEN,                                     # (1, W2, W)
    KB,                                      # (1, 32, 32) banded MXU kernel
    bppo_out,                                # (1, N, N)
    OG, XS, RPM, RPM2, bppoF, SONEF, REXT, P2SC, QASC,
    *, N, min_span,
):
    ebp = SCAL[0, 0, 1]
    mbu1 = SCAL[0, 0, 2]
    mbbp = SCAL[0, 0, 3]
    glob = SCAL[0, 0, 4]                     # scaled partition function
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    OG[:] = jnp.zeros_like(OG[:])
    XS[:] = jnp.zeros_like(XS[:])
    RPM[:] = jnp.zeros_like(RPM[:])
    RPM2[:] = jnp.zeros_like(RPM2[:])
    P2SC[:] = jnp.zeros_like(P2SC[:])
    QASC[:] = jnp.zeros_like(QASC[:])
    bppoF[:] = jnp.zeros_like(bppoF[:])
    # ONEP/EXTR arrive pre-rotated by (2N - n) from the XLA side (the old
    # in-kernel half-swap + (N - n) catch-up rotations cost bucket-, not
    # length-, proportional work); straight copies into scratch
    SONEF[pl.ds(0, N), :] = ONEP[0, pl.ds(0, N), :]
    REXT[pl.ds(0, 1), :] = EXTR[0, pl.ds(0, 1), :]

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    s_qone = QONE[0, pl.ds(0, N), pl.ds(0, N)]
    inv_glob = 1.0 / glob
    C2 = SONEF.shape[1]

    def span_step(step, carry):
        d = N - 1 - step
        k = step - (N - n_i)      # completed spans: live scratch rows <= k
        span_ok = (d + 1) >= min_span

        close_row = _row3(CLOSE, d)
        pos = close_row > 0.0
        inv_close = jnp.where(pos, 1.0 / jnp.where(pos, close_row, 1.0), 0.0)
        acc_row = close_row * _row3(ACC, d)
        lt = EXTL[0, pl.ds(0, 1), :]
        rt = REXT[pl.ds(0, 1), pl.ds(0, N)]
        base = lt * acc_row * rt * inv_glob * ebp

        # 2-loop context window as ONE MXU matmul + fused skew extraction
        # (see the inside kernel); lane shifts here DESCEND with a (the
        # outer pair sits left of i), hence descending extraction
        jrb_row = _row3(JRB, d)
        OUT = _band_mm(KB, OG)
        two = jrb_row * _skew_extract_sum(OUT, N, 31, descending=True)
        two = two + _row3(STKO, d) * OG[pl.ds(1, 1), pl.ds(31, N)]
        two = two + (
            jrb_row * LEN[0, pl.ds(1, 1), pl.ds(0, 1)] * _row3(B0RO, d)
            * OG[pl.ds(2, 1), pl.ds(31, N)]
        )
        two = two + (
            jrb_row * LEN[0, pl.ds(0, 1), pl.ds(1, 1)]
            * B0LO[0, pl.ds(0, 1), :] * OG[pl.ds(2, 1), pl.ds(30, N)]
        )
        two = two + (
            jrb_row * LEN[0, pl.ds(1, 1), pl.ds(1, 1)] * _row3(I11O, d)
            * OG[pl.ds(3, 1), pl.ds(30, N)]
        )
        two = two * close_row
        acc_mb = acc_row * mbbp
        jsn_row = _row3(JSN, d)
        mbc_row = _row3(MBC, d)

        # live-region truncation (_live_heights): at step k only rows <= k
        # of XS/RPM/RPM2/SONEF matter, so each span's scans, shifts, and
        # the SONEF rotate run at the covering pow-2 height.  SONEF rows
        # that a height branch doesn't cover pick up their missed rotations
        # in one static bulk rotate when the branch activates
        def tail(ht):
            tb = t_idx[:ht]
            Xr = XS[pl.ds(0, ht), :]
            s_one = SONEF[pl.ds(0, ht), pl.ds(0, N)]
            pm_new = jnp.where(
                span_ok, jnp.sum(Xr * s_one, axis=0, keepdims=True), 0.0
            )
            # sum_t g_{s-1-t} * mbu1^t telescoped (see the inside S1SC
            # note): pm2_s = XS[0] + mbu1 * pm2_{s-1}, flush-safe
            pm2_raw = (
                XS[pl.ds(0, 1), pl.ds(0, N)]
                + mbu1 * P2SC[pl.ds(0, 1), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, 1), pl.ds(0, N)] = pm2_raw
            pm2_new = jnp.where(span_ok, pm2_raw, 0.0)
            for buf, row in ((RPM, pm_new), (RPM2, pm2_new)):
                shifted = buf[pl.ds(0, ht - 1), pl.ds(0, N - 1)]
                buf[pl.ds(1, ht - 1), pl.ds(1, N - 1)] = shifted
                buf[pl.ds(1, ht - 1), pl.ds(0, 1)] = jnp.zeros((ht - 1, 1))
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            r_pm = RPM[pl.ds(0, ht), pl.ds(0, N)]
            r_pm2 = RPM2[pl.ds(0, ht), pl.ds(0, N)]
            m1 = tb >= 1
            # QA_s[i] = sum_{t>=1} pm_{s-t}[i-t] * mbu1^(t-1) telescoped
            # diagonally: QA_s[i] = pm_{s-1}[i-1] + mbu1 * QA_{s-1}[i-1]
            # (RPM row 1 after this span's shift IS pm_{s-1} aged one lane)
            qa_raw = (
                RPM[pl.ds(1, 1), pl.ds(0, N)]
                + mbu1 * QASC[pl.ds(0, 1), pl.ds(0, N)]
            )
            QASC[pl.ds(0, 1), pl.ds(1, N)] = qa_raw
            terms_a = jnp.where(m1, r_pm2 * s_qone[:ht], 0.0)
            terms_bc = jnp.where(m1, r_pm * s_qone[:ht], 0.0)
            mb_ctx = acc_mb * (
                jnp.sum(terms_a, axis=0, keepdims=True)
                + jnp.sum(terms_bc, axis=0, keepdims=True)
                + qa_raw
            )

            bppo_new = base + two + mb_ctx
            bppo_new = jnp.where(pos & span_ok, bppo_new, 0.0)
            bppoF[pl.ds(d, 1), :] = bppo_new

            g2 = bppo_new * jsn_row * inv_close
            _shift_insert(OG, g2, lane_off=32)
            g_row = bppo_new * mbc_row * inv_close
            shifted = XS[pl.ds(0, ht - 1), :]
            XS[pl.ds(1, ht - 1), :] = shifted
            XS[pl.ds(0, 1), :] = g_row
            _rotate_right(SONEF, ht)
            _rotate_right(REXT, 1)

        prev = 0
        for ht in _live_heights(N):
            if prev:
                # rows [prev, ht) become live next step; apply the `prev`
                # per-step rotations they missed in one static bulk rotate
                def bulk(lo=prev, hi=ht):
                    rows = hi - lo
                    wrap = SONEF[pl.ds(lo, rows), pl.ds(C2 - lo, lo)]
                    body = SONEF[pl.ds(lo, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo, rows), pl.ds(lo, C2 - lo)] = body
                    SONEF[pl.ds(lo, rows), pl.ds(0, lo)] = wrap

                pl.when(k == prev)(bulk)
            cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht
        return carry

    lax.fori_loop(N - n_i, N, span_step, 0)
    bppo_out[0] = bppoF[:]


# ---------------------------------------------------------------------------
# pallas_call wrappers
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


def _scal_rows(ct, ln_sigma, ns, glob=None):
    """(B, 1, 8) SMEM scalar rows for both kernels."""
    B = ln_sigma.shape[0]
    eu1 = jnp.exp(ct["external_score_unpair"] - ln_sigma)
    ebp = jnp.broadcast_to(jnp.exp(ct["external_score_basepair"]), (B,))
    mbu1 = jnp.exp(ct["multibranch_score_unpair"] - ln_sigma)
    mbbp = jnp.broadcast_to(jnp.exp(ct["multibranch_score_basepair"]), (B,))
    g = glob if glob is not None else jnp.zeros((B,))
    scal = jnp.stack(
        [
            eu1, ebp, mbu1, mbbp, g,
            jnp.zeros((B,)), jnp.zeros((B,)),
            ns.astype(jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)
    return scal[:, None, :]


def _inside_call_prob(pmats, LENp, scal, B, N, interpret):
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(3)
    )
    kernel = functools.partial(_contra_inside_prob_kernel, N=N)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(10)),
            _nn(W2, W),
            _nn(32, 32),
        ],
        out_specs=(_nn(N, N), _nn(N, N), _nn(N, N)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # CJW (close * jb)
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQ
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQM
            pltpu.VMEM((N, N), jnp.float32),              # extS
            pltpu.VMEM((N + 1, N), jnp.float32),          # extrS
            pltpu.VMEM((2, N + 8), jnp.float32),          # mbS 2-row ring
            pltpu.VMEM((N + 1, N), jnp.float32),          # oneS
            pltpu.VMEM((N, N), jnp.float32),              # closeF
            pltpu.VMEM((1, N + 8), jnp.float32),          # S1SC
        ],
        interpret=interpret,
    )(
        scal,
        pmats["H"], pmats["MBC"], pmats["ACC"], pmats["JS"], pmats["STK"],
        pmats["I11"], pmats["B0R"], pmats["B0L"], pmats["CANON"],
        pmats["JB"], LENp, _banded_window_kernel(LENp),
    )


# ---------------------------------------------------------------------------
# Span-chunked kernels: long sequences past the all-VMEM budget (N >= 512)
#
# The all-resident kernels cap at N = 256 because inputs + outputs + the
# O(N^2) DP-state scratches must fit VMEM together.  But every streamed
# score table row d is consumed exactly once (at span d), and every output
# row is produced exactly once — so for large N the batch grid gains a
# second CHUNK dimension: grid = (B, N // R), the input/output BlockSpecs
# hand the kernel (R, N) row-chunks (Mosaic pipelines the HBM<->VMEM moves
# across grid steps), and only the DP state (FQ/FQM/ext/one and the
# rotating window scratches) stays VMEM-resident across the whole span
# loop, persisting across grid steps exactly like a matmul accumulator.
# Outputs stream per span as single-row stores into the chunk block.
#
# The live-height ladder here uses CHUNK-ALIGNED marks (pow-2 up to R,
# then every chunk boundary): in probability space trailing zero rows are
# exact identities of a plain sum, so any ladder is bit-exact (the pow-2
# argument of ops/pallas_fold._live_heights is only needed for log-space
# lse trees).  The outside kernel's SONEF scratch takes delivery of its
# pre-rotated ONEP rows [cR, (c+1)R) at chunk-c start — always before
# those rows go live at k == cR (k = step - (N - n) <= cR there) — and a
# ladder segment never straddles a chunk boundary, so the bulk catch-up
# rotate only ever touches rows already delivered.
# ---------------------------------------------------------------------------

# Per-op row-piece cap for the tall history-buffer operations.  Measured
# on v5e (scripts/longseq_probe.py, N=1024): the per-byte cost of the
# per-span shifts/reduces degrades ~6x once a single op spans >> 256 rows
# (160 -> 33 ms/seq when the ladder is capped at 256, floor 26 ms at 64),
# so ops over taller regions are issued as static sequences of <= 256-row
# pieces — same arithmetic, restored fast regime.
_PIECE = 256


def _row_pieces(ht, P=_PIECE):
    """Static [(start, rows)] cover of [0, ht) in <= P-row pieces."""
    return [(s, min(P, ht - s)) for s in range(0, ht, P)]


def _live_marks_chunked(N, R):
    """Chunk-aligned live-height ladder: 32, 64, .., R, 2R, .., N."""
    hs, h = [], 32
    while h < R:
        hs.append(h)
        h *= 2
    hs.extend(range(R, N + 1, R))
    return hs


def _contra_inside_prob_kernel_chunked(
    SCAL,                                   # (1, 1, 8) SMEM scalars
    H, MBC, ACC, JS, STK, I11, B0R, B0L, CANON, JB,   # (1, R, N) [d, i]
    LEN,                                    # (1, W2, W) [b, a]
    KB,                                     # (1, 32, 32) banded MXU kernel
    close_out, ext_out, one_out,            # (1, R, N) chunk blocks
    CJW, FQ, FQM, extrS, mbS, oneS, S1SC, CARRY,
    *, N, R,
):
    c = pl.program_id(1)
    base = c * R
    eu1 = SCAL[0, 0, 0]
    ebp = SCAL[0, 0, 1]
    mbu1 = SCAL[0, 0, 2]
    mbbp = SCAL[0, 0, 3]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    @pl.when(c == 0)
    def _init():
        CJW[:] = jnp.zeros_like(CJW[:])
        FQ[:] = jnp.zeros_like(FQ[:])
        FQM[:] = jnp.zeros_like(FQM[:])
        S1SC[:] = jnp.zeros_like(S1SC[:])
        extrS[:] = jnp.ones_like(extrS[:])   # ext(i, i-1) = empty = 1
        mbS[:] = jnp.zeros_like(mbS[:])
        oneS[:] = jnp.zeros_like(oneS[:])

    # dead spans must still produce deterministic (zero) output rows
    close_out[0] = jnp.zeros_like(close_out[0])
    ext_out[0] = jnp.zeros_like(ext_out[0])
    one_out[0] = jnp.zeros_like(one_out[0])

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    first = c == 0
    rm0 = jnp.where(first, 0.0, CARRY[pl.ds(0, 1), :])
    rmmb0 = jnp.where(first, 0.0, CARRY[pl.ds(1, 1), :])
    epow0 = jnp.where(first, 1.0, CARRY[pl.ds(2, 1), :])

    def span_step(d, carry):
        rm_prev, rmmb_prev, epow_prev = carry
        r = d - base

        js_row = _row3(JS, r)
        OUT = _band_mm(KB, CJW)
        two = js_row * _skew_extract_sum(OUT, N, 1)
        two = two + _row3(STK, r) * CJW[pl.ds(1, 1), pl.ds(1, N)]
        two = two + (
            js_row * LEN[0, pl.ds(1, 1), pl.ds(0, 1)] * _row3(B0R, r)
            * CJW[pl.ds(2, 1), pl.ds(1, N)]
        )
        two = two + (
            js_row * LEN[0, pl.ds(0, 1), pl.ds(1, 1)] * _row3(B0L, r)
            * CJW[pl.ds(2, 1), pl.ds(2, N)]
        )
        two = two + (
            js_row * LEN[0, pl.ds(1, 1), pl.ds(1, 1)] * _row3(I11, r)
            * CJW[pl.ds(3, 1), pl.ds(2, N)]
        )
        mb_in = mbS[pl.ds(1, 1), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in * _row3(MBC, r), 0.0)
        close_new = (_row3(H, r) + two + mb_term) * _row3(CANON, r)
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, 0.0
        )
        close_out[0, pl.ds(r, 1), :] = close_new
        acc_new = close_new * _row3(ACC, r)

        rm_new = rm_prev * eu1 + acc_new * ebp
        rmmb_new = rmmb_prev * mbu1 + acc_new * mbbp
        epow = epow_prev * eu1

        def tail(ht):
            # piece-split tall ops (see _row_pieces): shifts run top piece
            # first so a piece's source rows are read before being
            # overwritten by the piece below it
            for buf, row in ((FQ, rm_new), (FQM, rmmb_new)):
                for (s, rows) in reversed(_row_pieces(ht - 1)):
                    shifted = buf[pl.ds(s, rows), pl.ds(1, N + 7)]
                    buf[pl.ds(s + 1, rows), pl.ds(0, N + 7)] = shifted
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            ext_sum = jnp.zeros((1, N), jnp.float32)
            s2 = jnp.zeros((1, N), jnp.float32)
            for (s, rows) in _row_pieces(ht):
                tb = t_idx[s:s + rows]
                qblk = FQ[pl.ds(s, rows), pl.ds(0, N)]
                eblk = extrS[pl.ds(s, rows), :]
                terms = jnp.where(tb <= d - 1, qblk * eblk, 0.0)
                ext_sum = ext_sum + jnp.sum(terms, axis=0, keepdims=True)
                qmblk = FQM[pl.ds(s, rows), pl.ds(0, N)]
                x = jnp.where((tb >= 1) & (tb <= d - 1), qmblk, 0.0)
                oblk = oneS[pl.ds(s, rows), :]
                s2 = s2 + jnp.sum(oblk * x, axis=0, keepdims=True)
            ext_new = epow + ext_sum
            extrS[pl.ds(d + 1, 1), :] = ext_new
            ext_out[0, pl.ds(r, 1), :] = ext_new

            # sum_t rmmb_{d-t} * mbu1^t telescoped: S1_d = mbu1 *
            # (rmmb_{d-1} + S1_{d-1}) under the 1-lane aging shift (FQM
            # row 1 after this span's shift IS rmmb_{d-1} at the aged
            # alignment).  A standalone mbu1^t column flushes to zero at
            # t > 87/|ln mbu1| even when the x*mbu1^t term is perfectly
            # representable (Turner mbu = 0 keeps long-unpaired-run terms
            # significant — measured 2e-3 BPP error at n ~ 250); every
            # telescoped partial is a true suffix ensemble, so nothing
            # representable is lost.  Also removes the (ht, N) mul+reduce.
            s1v = mbu1 * (
                FQM[pl.ds(1, 1), pl.ds(0, N)]
                + S1SC[pl.ds(0, 1), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, 1), pl.ds(0, N)] = s1v
            s1 = rmmb_new + s1v
            mbS[pl.ds(1, 1), :] = mbS[pl.ds(0, 1), :]
            mbS[pl.ds(0, 1), pl.ds(0, N)] = s2
            one_new = s1 + s2
            oneS[pl.ds(d + 1, 1), :] = one_new
            one_out[0, pl.ds(r, 1), :] = one_new

        prev = 0
        for ht in _live_marks_chunked(N, R):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        _shift_insert(CJW, close_new * _row3(JB, r))
        return (rm_new, rmmb_new, epow)

    rm_f, rmmb_f, epow_f = lax.fori_loop(
        base, jnp.minimum(n_i, base + R), span_step, (rm0, rmmb0, epow0)
    )
    CARRY[pl.ds(0, 1), :] = rm_f
    CARRY[pl.ds(1, 1), :] = rmmb_f
    CARRY[pl.ds(2, 1), :] = epow_f


def _contra_outside_prob_kernel_chunked(
    SCAL,
    CLOSE, MBC, ACC, STKO, I11O, B0RO, JRB, JSN,   # (1, R, N) desc chunks
    ONEP,                                    # (1, R, 2N) asc chunk
    QONE,                                    # (1, N, N) resident
    B0LO, EXTL,                              # (1, 1, N)
    EXTR,                                    # (1, 1, 2N)
    LEN,                                     # (1, W2, W)
    KB,                                      # (1, 32, 32)
    bppo_out,                                # (1, R, N) desc chunk
    OG, XS, RPM, RPM2, SONEF, REXT, P2SC, QASC,
    *, N, R, min_span,
):
    c = pl.program_id(1)
    C = N // R
    dbase = (C - 1 - c) * R          # spans in this chunk: [dbase, dbase+R)
    ebp = SCAL[0, 0, 1]
    mbu1 = SCAL[0, 0, 2]
    mbbp = SCAL[0, 0, 3]
    glob = SCAL[0, 0, 4]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    @pl.when(c == 0)
    def _init():
        OG[:] = jnp.zeros_like(OG[:])
        XS[:] = jnp.zeros_like(XS[:])
        RPM[:] = jnp.zeros_like(RPM[:])
        RPM2[:] = jnp.zeros_like(RPM2[:])
        P2SC[:] = jnp.zeros_like(P2SC[:])
        QASC[:] = jnp.zeros_like(QASC[:])
        REXT[pl.ds(0, 1), :] = EXTR[0, pl.ds(0, 1), :]

    # deliver the pre-rotated ONEP rows of this chunk (they cannot be live
    # yet: k = step - (N - n) <= cR at chunk start)
    SONEF[pl.ds(c * R, R), :] = ONEP[0, pl.ds(0, R), :]
    bppo_out[0] = jnp.zeros_like(bppo_out[0])

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    inv_glob = 1.0 / glob
    C2 = SONEF.shape[1]

    def span_step(step, carry):
        d = N - 1 - step
        r = d - dbase
        k = step - (N - n_i)
        span_ok = (d + 1) >= min_span

        close_row = _row3(CLOSE, r)
        pos = close_row > 0.0
        inv_close = jnp.where(pos, 1.0 / jnp.where(pos, close_row, 1.0), 0.0)
        acc_row = close_row * _row3(ACC, r)
        lt = EXTL[0, pl.ds(0, 1), :]
        rt = REXT[pl.ds(0, 1), pl.ds(0, N)]
        base = lt * acc_row * rt * inv_glob * ebp

        jrb_row = _row3(JRB, r)
        OUT = _band_mm(KB, OG)
        two = jrb_row * _skew_extract_sum(OUT, N, 31, descending=True)
        two = two + _row3(STKO, r) * OG[pl.ds(1, 1), pl.ds(31, N)]
        two = two + (
            jrb_row * LEN[0, pl.ds(1, 1), pl.ds(0, 1)] * _row3(B0RO, r)
            * OG[pl.ds(2, 1), pl.ds(31, N)]
        )
        two = two + (
            jrb_row * LEN[0, pl.ds(0, 1), pl.ds(1, 1)]
            * B0LO[0, pl.ds(0, 1), :] * OG[pl.ds(2, 1), pl.ds(30, N)]
        )
        two = two + (
            jrb_row * LEN[0, pl.ds(1, 1), pl.ds(1, 1)] * _row3(I11O, r)
            * OG[pl.ds(3, 1), pl.ds(30, N)]
        )
        two = two * close_row
        acc_mb = acc_row * mbbp
        jsn_row = _row3(JSN, r)
        mbc_row = _row3(MBC, r)

        def tail(ht):
            # piece-split tall ops (see _row_pieces + the probe note)
            pm_sum = jnp.zeros((1, N), jnp.float32)
            for (s, rows) in _row_pieces(ht):
                Xr = XS[pl.ds(s, rows), :]
                s_one = SONEF[pl.ds(s, rows), pl.ds(0, N)]
                pm_sum = pm_sum + jnp.sum(Xr * s_one, axis=0, keepdims=True)
            pm_new = jnp.where(span_ok, pm_sum, 0.0)
            # sum_t g_{s-1-t} * mbu1^t telescoped (see the inside S1SC
            # note): pm2_s = XS[0] + mbu1 * pm2_{s-1}, flush-safe
            pm2_raw = (
                XS[pl.ds(0, 1), pl.ds(0, N)]
                + mbu1 * P2SC[pl.ds(0, 1), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, 1), pl.ds(0, N)] = pm2_raw
            pm2_new = jnp.where(span_ok, pm2_raw, 0.0)
            for buf, row in ((RPM, pm_new), (RPM2, pm2_new)):
                for (s, rows) in reversed(_row_pieces(ht - 1)):
                    shifted = buf[pl.ds(s, rows), pl.ds(0, N - 1)]
                    buf[pl.ds(s + 1, rows), pl.ds(1, N - 1)] = shifted
                    buf[pl.ds(s + 1, rows), pl.ds(0, 1)] = jnp.zeros(
                        (rows, 1)
                    )
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            qa_raw = (
                RPM[pl.ds(1, 1), pl.ds(0, N)]
                + mbu1 * QASC[pl.ds(0, 1), pl.ds(0, N)]
            )
            QASC[pl.ds(0, 1), pl.ds(1, N)] = qa_raw
            ab_sum = jnp.zeros((1, N), jnp.float32)
            for (s, rows) in _row_pieces(ht):
                m1 = t_idx[s:s + rows] >= 1
                r_pm = RPM[pl.ds(s, rows), pl.ds(0, N)]
                r_pm2 = RPM2[pl.ds(s, rows), pl.ds(0, N)]
                qone_blk = QONE[0, pl.ds(s, rows), pl.ds(0, N)]
                ab_sum = ab_sum + (
                    jnp.sum(
                        jnp.where(m1, r_pm2 * qone_blk, 0.0),
                        axis=0, keepdims=True,
                    )
                    + jnp.sum(
                        jnp.where(m1, r_pm * qone_blk, 0.0),
                        axis=0, keepdims=True,
                    )
                )
            mb_ctx = acc_mb * (ab_sum + qa_raw)

            bppo_new = base + two + mb_ctx
            bppo_new = jnp.where(pos & span_ok, bppo_new, 0.0)
            bppo_out[0, pl.ds(r, 1), :] = bppo_new

            g2 = bppo_new * jsn_row * inv_close
            _shift_insert(OG, g2, lane_off=32)
            g_row = bppo_new * mbc_row * inv_close
            for (s, rows) in reversed(_row_pieces(ht - 1)):
                shifted = XS[pl.ds(s, rows), :]
                XS[pl.ds(s + 1, rows), :] = shifted
            XS[pl.ds(0, 1), :] = g_row
            for (s, rows) in _row_pieces(ht):
                _rotate_right(SONEF, rows, row_off=s)
            _rotate_right(REXT, 1)

        prev = 0
        for ht in _live_marks_chunked(N, R):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = hi - lo
                    wrap = SONEF[pl.ds(lo, rows), pl.ds(C2 - lo, lo)]
                    body = SONEF[pl.ds(lo, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo, rows), pl.ds(lo, C2 - lo)] = body
                    SONEF[pl.ds(lo, rows), pl.ds(0, lo)] = wrap

                pl.when(k == prev)(bulk)
            cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht
        return carry

    lo = jnp.maximum(c * R, N - n_i)
    lax.fori_loop(lo, (c + 1) * R, span_step, 0)


def _smem_spec2():
    return pl.BlockSpec(
        (1, 1, 8), lambda b, c: (b, 0, 0), memory_space=pltpu.SMEM
    )


def _chunk_spec(R, N, desc=False, C=None):
    if desc:
        return pl.BlockSpec(
            (1, R, N), lambda b, c: (b, C - 1 - c, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, R, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM
    )


def _const_spec2(*shape):
    return pl.BlockSpec(
        (1,) + shape, lambda b, c: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )


def _inside_call_prob_chunked(pmats, LENp, scal, B, N, R, interpret):
    C = N // R
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(3)
    )
    kernel = functools.partial(
        _contra_inside_prob_kernel_chunked, N=N, R=R
    )
    return pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[
            _smem_spec2(),
            *(_chunk_spec(R, N) for _ in range(10)),
            _const_spec2(W2, W),
            _const_spec2(32, 32),
        ],
        out_specs=tuple(_chunk_spec(R, N) for _ in range(3)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # CJW
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQ
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQM
            pltpu.VMEM((N + 1, N), jnp.float32),          # extrS
            pltpu.VMEM((2, N + 8), jnp.float32),          # mbS
            pltpu.VMEM((N + 1, N), jnp.float32),          # oneS
            pltpu.VMEM((1, N + 8), jnp.float32),          # S1SC
            pltpu.VMEM((8, N), jnp.float32),              # CARRY
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
    )(
        scal,
        pmats["H"], pmats["MBC"], pmats["ACC"], pmats["JS"], pmats["STK"],
        pmats["I11"], pmats["B0R"], pmats["B0L"], pmats["CANON"],
        pmats["JB"], LENp, _banded_window_kernel(LENp),
    )


def _outside_call_prob_chunked(
    pmats, close, ONEP, QONE, extL, extR, LENp, scal_o, B, N, R,
    min_span, interpret,
):
    C = N // R
    kernel = functools.partial(
        _contra_outside_prob_kernel_chunked, N=N, R=R, min_span=min_span
    )
    return pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[
            _smem_spec2(),
            *(_chunk_spec(R, N, desc=True, C=C) for _ in range(8)),
            _chunk_spec(R, 2 * N),               # ONEP (ascending chunks)
            _const_spec2(N, N),                  # QONE
            _const_spec2(1, N),                  # B0LO
            _const_spec2(1, N),                  # EXTL
            _const_spec2(1, 2 * N),              # EXTR
            _const_spec2(W2, W),                 # LEN
            _const_spec2(32, 32),                # KB
        ],
        out_specs=_chunk_spec(R, N, desc=True, C=C),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # OG
            pltpu.VMEM((N, N), jnp.float32),              # XS
            pltpu.VMEM((N, N), jnp.float32),              # RPM
            pltpu.VMEM((N, N), jnp.float32),              # RPM2
            pltpu.VMEM((N, 2 * N), jnp.float32),          # SONEF
            pltpu.VMEM((1, 2 * N), jnp.float32),          # REXT
            pltpu.VMEM((1, N), jnp.float32),              # P2SC
            pltpu.VMEM((1, N + 8), jnp.float32),          # QASC
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
    )(
        scal_o,
        close, pmats["MBC"], pmats["ACC"], pmats["STKO"], pmats["I11O"],
        pmats["B0RO"], pmats["JB"], pmats["JS"],
        ONEP, QONE,
        pmats["B0LO"][:, None, :], extL[:, None, :],
        extR[:, None, :], LENp, _banded_window_kernel(LENp),
    )


@functools.partial(
    jax.jit, static_argnames=("N", "allows_short_hairpins", "interpret")
)
def _mccaskill_contra_prob_run(
    seqs, ns, ct, ln_sigma, N, allows_short_hairpins=False, interpret=False
):
    """One scaled-probability inside+outside run.  Returns (bppo [d, i]
    probabilities, scaled partition function per sequence)."""
    return _prob_run_body(
        seqs, ns, ct, ln_sigma, N, allows_short_hairpins, interpret
    )


def _prob_run_body(
    seqs, ns, ct, ln_sigma, N, allows_short_hairpins, interpret
):
    B = seqs.shape[0]
    pmats = contra_prob_mats(seqs, ns, ct, ln_sigma, N)
    LENp = _contra_len_prob(ct, ln_sigma)
    scal = _scal_rows(ct, ln_sigma, ns)
    if N > 256:
        # span-chunked kernels: DP state resident, tables streamed per
        # chunk.  At N = 2048 the O(N^2) state scratches alone are ~85 MB
        # of the 128 MB physical VMEM, so the chunks narrow to fit: the
        # inside kernel fits R = 128 (its dead extS scratch removed); the
        # outside (SONEF is (N, 2N), QONE resident) measures 131.2M even
        # at R = 64, so it takes R = 32.  Narrower chunks mean more
        # live-height ladder marks per span (the SONEF-delivery invariant
        # ties ladder marks to chunk boundaries) — halving SONEF's width
        # is the named round-5 lever to widen R_out.
        R_in = 128
        R_out = 128 if N <= 1024 else 32
        close, ext, one = _inside_call_prob_chunked(
            pmats, LENp, scal, B, N, R_in, interpret
        )
        ONEP, QONE, extL, extR, glob = PF.contra_outside_aux(
            ns, ext, one, N, neg=0.0, one_val=1.0
        )
        scal_o = _scal_rows(ct, ln_sigma, ns, glob=glob)
        min_span = 2 if allows_short_hairpins else MIN_SPAN_HAIRPIN_CLOSE
        bppo = _outside_call_prob_chunked(
            pmats, close, ONEP, QONE, extL, extR, LENp, scal_o, B, N,
            R_out, min_span, interpret,
        )
        return bppo, glob
    close, ext, one = _inside_call_prob(pmats, LENp, scal, B, N, interpret)
    ONEP, QONE, extL, extR, glob = PF.contra_outside_aux(
        ns, ext, one, N, neg=0.0, one_val=1.0
    )
    scal_o = _scal_rows(ct, ln_sigma, ns, glob=glob)
    min_span = 2 if allows_short_hairpins else MIN_SPAN_HAIRPIN_CLOSE
    kernel = functools.partial(
        _contra_outside_prob_kernel, N=N, min_span=min_span
    )
    bppo = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(8)),
            _nn(N, 2 * N),                   # ONEP
            _nn(N, N),                       # QONE
            _nn(1, N),                       # B0LO
            _nn(1, N),                       # EXTL
            _nn(1, 2 * N),                   # EXTR
            _nn(W2, W),                      # LEN
            _nn(32, 32),                     # KB
        ],
        out_specs=_nn(N, N),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # OG
            pltpu.VMEM((N, N), jnp.float32),              # XS
            pltpu.VMEM((N, N), jnp.float32),              # RPM
            pltpu.VMEM((N, N), jnp.float32),              # RPM2
            pltpu.VMEM((N, N), jnp.float32),              # bppoF
            pltpu.VMEM((N, 2 * N), jnp.float32),          # SONEF
            pltpu.VMEM((1, 2 * N), jnp.float32),          # REXT
            pltpu.VMEM((1, N), jnp.float32),              # P2SC
            pltpu.VMEM((1, N + 8), jnp.float32),          # QASC
        ],
        interpret=interpret,
    )(
        scal_o,
        close, pmats["MBC"], pmats["ACC"], pmats["STKO"], pmats["I11O"],
        pmats["B0RO"], pmats["JB"], pmats["JS"],
        ONEP, QONE,
        pmats["B0LO"][:, None, :], extL[:, None, :],
        extR[:, None, :], LENp, _banded_window_kernel(LENp),
    )
    return bppo, glob


# Per-base log-Z grows slightly with sequence length (longer-range pairs
# engage); the f64 oracle measures z(512) -> z(1000) drift of ~+0.013
# (CONTRA) / +0.035 (Turner) on random sequences.  Centering the prefix
# seed on the expected full-length value keeps more lanes inside the
# +-55/n guard band on the first full run.
LS_PREFIX_DRIFT = 0.013
LS_PREFIX_DRIFT_TURNER = 0.035


def _estimate_ls0(run_small, B, ns_small, base, drift=0.0):
    """Per-sequence ln_sigma seed from a cheap truncated-prefix pass.

    At N > 256 the representable scaled-Z band is only ~87/n wide in
    ln_sigma, so a global seed forces the retry loop to bisect-walk — and
    EVERY retry re-runs the full inside+outside for the whole batch
    (measured at N=1024: 164 ms/seq with retries vs 27.9 fixed —
    scripts/longseq_probe.py round 3).  One chunked pass over the first
    512 nt measures each sequence's per-base log-Z (the quantity the seed
    must match; LS_PREFIX_DRIFT centers it on the full-length value),
    putting the full run inside the guard band with 0-1 retries."""
    ls0 = jnp.full((B,), base, jnp.float32)
    _bppo, glob = run_small(ls0)
    ok = jnp.isfinite(glob) & (glob > 0.0)
    z = drift + ls0 + jnp.log(jnp.where(ok, glob, 1.0)) / jnp.maximum(
        ns_small.astype(jnp.float32), 1.0
    )
    return jnp.where(ok, z, ls0)


def _retrying(run, B, ls0=None, ns=None):
    """Device-side rescale-retry loop around a (ln_sigma,) -> (bppo, Z) run.

    Lanes whose scaled partition function left the guard band re-run inside
    a ``lax.while_loop``.  When the bad lane's scaled Z is still finite and
    positive, ``ln(glob)/n`` IS the distance to the centered scale (glob =
    e^{n(z - ln_sigma)}), so the retry jumps straight to glob ~ 1 in one
    step; only true 0/inf lanes fall back to the bisection walk (the
    representable band is ~87/n wide).  No host syncs, so back-to-back
    batches pipeline."""

    def flags(bppo, glob):
        # Underflow evidence must win: glob == 0 makes inv_glob (and hence
        # the bppo sum) non-finite, and reading that NaN as "overflow"
        # walks ln_sigma the wrong way forever.
        s = jnp.sum(bppo, axis=(1, 2))
        bad_lo = jnp.isfinite(glob) & (glob < GLOB_LO)
        bad_hi = (
            ~jnp.isfinite(glob) | (glob > GLOB_HI)
            | (~jnp.isfinite(s) & ~bad_lo)
        )
        return bad_hi, bad_lo

    if ls0 is None:
        ls0 = jnp.full((B,), LN_SIGMA0, jnp.float32)
    else:
        ls0 = jnp.broadcast_to(ls0.astype(jnp.float32), (B,))
    bppo0, glob0 = run(ls0)
    bh0, bl0 = flags(bppo0, glob0)
    # 0/inf lanes bisect blind; the representable band is ~+-55/n wide in
    # ln_sigma, so a fixed 0.9 first step overshoots by ~30x at n ~ 2000
    # and burns MAX_RETRIES halving back down (measured 10.4 s/seq at
    # N=2048).  The distance to the band is bounded by the seed error
    # (prefix-seeded lanes are within a few hundredths), so prefix-seeded
    # lanes (past 512 nt) start the walk at the band half-width — measured
    # A/B at N=1024 B=16: 11.8 seqs/s with the scaled step vs 6.0 with the
    # round-3 fixed 0.9 on the same batch.  Short lanes keep the fixed
    # step (their wide bands bracket in 1-2 flips).
    step0 = jnp.full((B,), RETRY_STEP, jnp.float32)
    grow = jnp.ones((B,), jnp.float32)
    if ns is not None:
        nf = jnp.maximum(ns.astype(jnp.float32), 1.0)
        longn = nf > 512.0
        step0 = jnp.where(longn, jnp.minimum(RETRY_STEP, 55.0 / nf), step0)
        grow = jnp.where(longn, 1.5, 1.0)
    state = (
        bppo0, glob0, ls0,
        step0,
        jnp.zeros((B,), jnp.float32),
        bh0, bl0, jnp.int32(0),
    )

    def cond(st):
        _bppo, _glob, _ls, _step, _last, bh, bl, k = st
        return jnp.any(bh | bl) & (k < MAX_RETRIES)

    def body(st):
        _bppo, glob, ls, step, last_dir, bh, bl, k = st
        bad = bh | bl
        direction = bh.astype(jnp.float32) - bl.astype(jnp.float32)
        # halve on a direction flip (bracketed); long-n lanes grow while
        # walking the same direction so distant lanes still converge in
        # log time from the small n-scaled first step
        step = jnp.where(
            direction * last_dir < 0,
            step * 0.5,
            jnp.where(last_dir != 0, step * grow, step),
        )
        delta = step * direction
        if ns is not None:
            can_jump = bad & jnp.isfinite(glob) & (glob > 0.0)
            jump = jnp.log(jnp.where(can_jump, glob, 1.0)) / jnp.maximum(
                ns.astype(jnp.float32), 1.0
            )
            delta = jnp.where(can_jump, jump, delta)
        ls = ls + delta
        bppo, glob = run(ls)
        bh, bl = flags(bppo, glob)
        return (bppo, glob, ls, step, direction, bh, bl, k + 1)

    state = lax.while_loop(cond, body, state)
    return state[0], state[2]


@functools.partial(
    jax.jit, static_argnames=("N", "allows_short_hairpins", "interpret")
)
def mccaskill_contra_pallas_prob(
    seqs, ns, ct, N, allows_short_hairpins=False, interpret=False
):
    """Scaled-probability CONTRA McCaskill with automatic rescale retries.

    Returns (bppo [d, i] basepair probabilities, ln_sigma used per seq)."""

    def run(ls):
        return _prob_run_body(
            seqs, ns, ct, ls, N, allows_short_hairpins, interpret
        )

    B = seqs.shape[0]
    ls0 = None
    if N > 512:
        # Seed from a prefix chunked pass: per-base log-Z measured with
        # the f64 oracle drifts only ~0.013 from n=512 to n=1000 (inside
        # the +-55/n guard band), while a 256 prefix drifts ~0.14
        # (long-range pairs engage between 256 and 512) — so 512 is the
        # shortest prefix that seeds the n <= 1024 tier retry-free.  The
        # N = 2048 tier halves the band again (+-55/n), so it seeds from
        # a 1024 prefix (1/8 the full-run cost; smaller residual drift).
        NP = 512 if N <= 1024 else 1024
        ns_small = jnp.minimum(ns, NP)

        def run_small(ls):
            return _prob_run_body(
                seqs[:, :NP], ns_small, ct, ls, NP,
                allows_short_hairpins, interpret,
            )

        ls0 = _estimate_ls0(
            run_small, B, ns_small, LN_SIGMA0, drift=LS_PREFIX_DRIFT
        )
    return _retrying(run, B, ls0=ls0, ns=ns)


# ---------------------------------------------------------------------------
# Turner model (same scaled-probability wavefronts; the Turner recurrences
# are the CONTRA ones with eu = ebp = mbu = 0 and mbbp = COEFF_NUM_BRANCHES
# — rm+coeff IS the rmmb table — so only the 2-loop window and the score
# transform differ)
# ---------------------------------------------------------------------------

# (a + b + 2) span powers of the small-loop replacement tables (they bypass
# the LEN' path that carries the power for generic window cells)
_TURNER_SP_POW = {
    "STKT": 2, "B01": 3, "B10": 3, "I11T": 4, "I12T": 5, "I21T": 5,
    "I22T": 6,
    "STKO": 2, "B01O": 3, "B10O": 3, "I11O": 4, "I12O": 5, "I21O": 5,
    "I22O": 6,
}
def turner_prob_mats(seqs, ns, tt, ln_sigma, N):
    """Per-sequence probability-space Turner tensors (vmapped)."""
    mats = PF.turner_precompute_di(seqs, ns, tt, N)

    def one(m, ls):
        spanv = (jnp.arange(N, dtype=jnp.float32) + 1.0)[:, None]
        out = {
            "H": jnp.exp(m["H"] - spanv * ls),
            "MBC": jnp.exp(m["MBC"] - 2.0 * ls),
            "CANON": jnp.where(m["CANON"] > -1.0, 1.0, 0.0),
        }
        for k in ("ACC", "AUGT", "TMo1", "TMo2", "TMo3",
                  "TMi1", "TMi2", "TMi3"):
            out[k] = jnp.exp(m[k])
        for k, p in _TURNER_SP_POW.items():
            out[k] = jnp.exp(m[k] - float(p) * ls)
        return out

    return jax.vmap(one)(mats, ln_sigma)


def _turner_len_prob(tt, ln_sigma):
    """(B, W2, W) exp(LENB/LENI - (a+b+2)*ln_sigma)."""
    LENB, LENI = PF._turner_len_di(tt)
    ab = (
        jnp.arange(W2, dtype=jnp.float32)[:, None]
        + jnp.arange(W, dtype=jnp.float32)[None, :]
        + 2.0
    )
    f = ab[None] * ln_sigma[:, None, None]
    return jnp.exp(LENB[None] - f), jnp.exp(LENI[None] - f)


def _turner_inside_prob_kernel(
    SCAL,
    H, MBC, ACC, CANON,
    STKT, B01, B10, I11T, I12T, I21T, I22T,
    TMo1, TMo2, TMo3, AUGT, TMi1N, TMi2N, TMi3N,
    LENB, LENI, KI, WCOL,
    close_out, ext_out, one_out,
    CAW, GW1, GW2, GW3, FQ, FQM, extS, extrS, mbS, oneS, closeF, S1SC,
    *, N,
):
    eu1 = SCAL[0, 0, 0]      # = u = exp(-ln_sigma)
    ebp = SCAL[0, 0, 1]      # = 1
    mbu1 = SCAL[0, 0, 2]     # = u
    mbbp = SCAL[0, 0, 3]     # = exp(COEFF_NUM_BRANCHES)
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    for buf in (CAW, FQ, FQM, mbS, oneS, closeF, GW1, GW2, GW3, S1SC):
        buf[:] = jnp.zeros_like(buf[:])
    extS[:] = jnp.zeros_like(extS[:])
    extrS[:] = jnp.ones_like(extrS[:])

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    zero_row = jnp.zeros((1, N), jnp.float32)

    def span_step(d, carry):
        rm_prev, rmmb_prev, epow_prev = carry

        aug_row = _row3(AUGT, d)
        # 2-loop window as 3 banded MXU matmuls + fused skew extractions
        # (see _banded_kernel / the CONTRA kernel): bulges over the raw
        # close*aug window, TM1/TM2 interiors over merged close*aug*TMi
        # windows (blk and w_tmi were read at identical [row, lane]
        # offsets, so the products fold into the inserted rows), the 2
        # TM3 cells and the 7 small-loop specials added explicitly.
        # KB (bulge) and K2 (2x3-edge) are 1-D families: column +
        # diagonal arms on the VPU (see prob8._turner_inside8_kernel);
        # only the 2-D generic interior keeps its matmul
        two = jnp.sum(
            CAW[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(0, 1)],
            axis=0, keepdims=True,
        )[:, 1:1 + N]
        two = two + _skew_extract_sum(
            CAW[pl.ds(1, 32), :] * WCOL[0, :, pl.ds(1, 1)], N, 1
        )
        two = two + _row3(TMo1, d) * _skew_extract_sum(
            _band_mm(KI, GW1), N, 1
        )
        k2s = jnp.sum(
            GW2[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(2, 1)],
            axis=0, keepdims=True,
        )[:, 2:2 + N]
        k2s = k2s + _skew_extract_sum(
            GW2[pl.ds(2, 32), :] * WCOL[0, :, pl.ds(3, 1)], N, 1
        )
        two = two + _row3(TMo2, d) * k2s
        two = two + _row3(TMo3, d) * (
            LENI[0, pl.ds(3, 1), pl.ds(2, 1)]
            * GW3[pl.ds(6, 1), pl.ds(3, N)]
            + LENI[0, pl.ds(2, 1), pl.ds(3, 1)]
            * GW3[pl.ds(6, 1), pl.ds(4, N)]
        )
        two = two * aug_row
        two = two + _row3(STKT, d) * CAW[pl.ds(1, 1), pl.ds(1, N)]
        two = two + _row3(B01, d) * CAW[pl.ds(2, 1), pl.ds(1, N)]
        two = two + _row3(B10, d) * CAW[pl.ds(2, 1), pl.ds(2, N)]
        two = two + _row3(I11T, d) * CAW[pl.ds(3, 1), pl.ds(2, N)]
        two = two + _row3(I12T, d) * CAW[pl.ds(4, 1), pl.ds(2, N)]
        two = two + _row3(I21T, d) * CAW[pl.ds(4, 1), pl.ds(3, N)]
        two = two + _row3(I22T, d) * CAW[pl.ds(5, 1), pl.ds(3, N)]
        mb_in = mbS[pl.ds(1, 1), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in * _row3(MBC, d), 0.0)
        close_new = (_row3(H, d) + two + mb_term) * _row3(CANON, d)
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, 0.0
        )
        closeF[pl.ds(d, 1), :] = close_new
        acc_new = close_new * _row3(ACC, d)

        rm_new = rm_prev * eu1 + acc_new * ebp
        rmmb_new = rmmb_prev * mbu1 + acc_new * mbbp
        epow = epow_prev * eu1

        # live-region truncation: see the CONTRA inside kernel
        def tail(ht):
            tb = t_idx[:ht]
            for buf, row in ((FQ, rm_new), (FQM, rmmb_new)):
                shifted = buf[pl.ds(0, ht - 1), pl.ds(1, N + 7)]
                buf[pl.ds(1, ht - 1), pl.ds(0, N + 7)] = shifted
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            qblk = FQ[pl.ds(0, ht), pl.ds(0, N)]
            eblk = extrS[pl.ds(0, ht), :]
            terms = jnp.where(tb <= d - 1, qblk * eblk, 0.0)
            ext_new = epow + jnp.sum(terms, axis=0, keepdims=True)
            extS[pl.ds(d, 1), :] = ext_new
            extrS[pl.ds(d + 1, 1), :] = ext_new

            qmblk = FQM[pl.ds(0, ht), pl.ds(0, N)]
            x = jnp.where((tb >= 1) & (tb <= d - 1), qmblk, 0.0)
            # sum_t rmmb_{d-t} * mbu1^t telescoped: S1_d = mbu1 *
            # (rmmb_{d-1} + S1_{d-1}) under the 1-lane aging shift (FQM
            # row 1 after this span's shift IS rmmb_{d-1} at the aged
            # alignment).  A standalone mbu1^t column flushes to zero at
            # t > 87/|ln mbu1| even when the x*mbu1^t term is perfectly
            # representable (Turner mbu = 0 keeps long-unpaired-run terms
            # significant — measured 2e-3 BPP error at n ~ 250); every
            # telescoped partial is a true suffix ensemble, so nothing
            # representable is lost.  Also removes the (ht, N) mul+reduce.
            s1v = mbu1 * (
                FQM[pl.ds(1, 1), pl.ds(0, N)]
                + S1SC[pl.ds(0, 1), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, 1), pl.ds(0, N)] = s1v
            s1 = rmmb_new + s1v
            oblk = oneS[pl.ds(0, ht), :]
            s2 = jnp.sum(oblk * x, axis=0, keepdims=True)
            mbS[pl.ds(1, 1), :] = mbS[pl.ds(0, 1), :]
            mbS[pl.ds(0, 1), pl.ds(0, N)] = s2
            oneS[pl.ds(d + 1, 1), :] = s1 + s2

        prev = 0
        for ht in _live_heights(N):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        g = close_new * aug_row
        _shift_insert(CAW, g)
        _shift_insert(GW1, g * _row3(TMi1N, d))
        _shift_insert(GW2, g * _row3(TMi2N, d))
        _shift_insert(GW3, g * _row3(TMi3N, d))
        return (rm_new, rmmb_new, epow)

    lax.fori_loop(
        0, n_i, span_step, (zero_row, zero_row, jnp.float32(1.0))
    )

    close_out[0] = closeF[:]
    ext_out[0] = extS[:]
    one_out[0] = oneS[pl.ds(1, N), :]


def _turner_outside_prob_kernel(
    SCAL,
    CLOSE, MBC, ACC,
    STKO, B01O, B10O, I11O, I12O, I21O, I22O,
    TMo1N, TMo2N, TMo3N, AUGT, TMi1R, TMi2R, TMi3R,
    ONEP, QONE,
    EXTL, EXTR,
    LENB, LENI, KI, WCOL,
    bppo_out,
    OG, GW1, GW2, GW3, XS, RPM, RPM2, bppoF, SONEF, REXT, P2SC, QASC,
    *, N, min_span,
):
    mbu1 = SCAL[0, 0, 2]
    mbbp = SCAL[0, 0, 3]
    glob = SCAL[0, 0, 4]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    for buf in (OG, GW1, GW2, GW3, XS, RPM, RPM2, bppoF, P2SC, QASC):
        buf[:] = jnp.zeros_like(buf[:])
    # ONEP/EXTR arrive pre-rotated by (2N - n) from the XLA side (see the
    # CONTRA outside kernel)
    SONEF[pl.ds(0, N), :] = ONEP[0, pl.ds(0, N), :]
    REXT[pl.ds(0, 1), :] = EXTR[0, pl.ds(0, 1), :]

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    s_qone = QONE[0, pl.ds(0, N), pl.ds(0, N)]
    inv_glob = 1.0 / glob
    C2 = SONEF.shape[1]

    def span_step(step, carry):
        d = N - 1 - step
        k = step - (N - n_i)      # completed spans: live scratch rows <= k
        span_ok = (d + 1) >= min_span

        close_row = _row3(CLOSE, d)
        pos = close_row > 0.0
        inv_close = jnp.where(pos, 1.0 / jnp.where(pos, close_row, 1.0), 0.0)
        acc_row = close_row * _row3(ACC, d)
        lt = EXTL[0, pl.ds(0, 1), :]
        rt = REXT[pl.ds(0, 1), pl.ds(0, N)]
        base = lt * acc_row * rt * inv_glob
        augt_row = _row3(AUGT, d)

        # 2-loop context window: same 3 banded matmuls as the inside
        # kernel; lane shifts DESCEND with a (outer pair left of i)
        two = jnp.sum(
            OG[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(0, 1)],
            axis=0, keepdims=True,
        )[:, 31:31 + N]
        two = two + _skew_extract_sum(
            OG[pl.ds(1, 32), :] * WCOL[0, :, pl.ds(1, 1)], N, 31,
            descending=True,
        )
        two = two + _row3(TMi1R, d) * _skew_extract_sum(
            _band_mm(KI, GW1), N, 31, descending=True
        )
        k2s = jnp.sum(
            GW2[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(2, 1)],
            axis=0, keepdims=True,
        )[:, 30:30 + N]
        k2s = k2s + _skew_extract_sum(
            GW2[pl.ds(2, 32), :] * WCOL[0, :, pl.ds(3, 1)], N, 31,
            descending=True,
        )
        two = two + _row3(TMi2R, d) * k2s
        two = two + _row3(TMi3R, d) * (
            LENI[0, pl.ds(3, 1), pl.ds(2, 1)]
            * GW3[pl.ds(6, 1), pl.ds(29, N)]
            + LENI[0, pl.ds(2, 1), pl.ds(3, 1)]
            * GW3[pl.ds(6, 1), pl.ds(28, N)]
        )
        two = two * augt_row
        two = two + _row3(STKO, d) * OG[pl.ds(1, 1), pl.ds(31, N)]
        two = two + _row3(B01O, d) * OG[pl.ds(2, 1), pl.ds(31, N)]
        two = two + _row3(B10O, d) * OG[pl.ds(2, 1), pl.ds(30, N)]
        two = two + _row3(I11O, d) * OG[pl.ds(3, 1), pl.ds(30, N)]
        two = two + _row3(I12O, d) * OG[pl.ds(4, 1), pl.ds(30, N)]
        two = two + _row3(I21O, d) * OG[pl.ds(4, 1), pl.ds(29, N)]
        two = two + _row3(I22O, d) * OG[pl.ds(5, 1), pl.ds(29, N)]
        two = two * close_row
        acc_mb = acc_row * mbbp
        mbc_row = _row3(MBC, d)

        # live-region truncation + lazy pow-2 block rotation: see the
        # CONTRA outside kernel
        def tail(ht):
            tb = t_idx[:ht]
            Xr = XS[pl.ds(0, ht), :]
            s_one = SONEF[pl.ds(0, ht), pl.ds(0, N)]
            pm_new = jnp.where(
                span_ok, jnp.sum(Xr * s_one, axis=0, keepdims=True), 0.0
            )
            # sum_t g_{s-1-t} * mbu1^t telescoped (see the inside S1SC
            # note): pm2_s = XS[0] + mbu1 * pm2_{s-1}, flush-safe
            pm2_raw = (
                XS[pl.ds(0, 1), pl.ds(0, N)]
                + mbu1 * P2SC[pl.ds(0, 1), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, 1), pl.ds(0, N)] = pm2_raw
            pm2_new = jnp.where(span_ok, pm2_raw, 0.0)
            for buf, row in ((RPM, pm_new), (RPM2, pm2_new)):
                shifted = buf[pl.ds(0, ht - 1), pl.ds(0, N - 1)]
                buf[pl.ds(1, ht - 1), pl.ds(1, N - 1)] = shifted
                buf[pl.ds(1, ht - 1), pl.ds(0, 1)] = jnp.zeros((ht - 1, 1))
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            r_pm = RPM[pl.ds(0, ht), pl.ds(0, N)]
            r_pm2 = RPM2[pl.ds(0, ht), pl.ds(0, N)]
            m1 = tb >= 1
            # QA_s[i] = sum_{t>=1} pm_{s-t}[i-t] * mbu1^(t-1) telescoped
            # diagonally: QA_s[i] = pm_{s-1}[i-1] + mbu1 * QA_{s-1}[i-1]
            # (RPM row 1 after this span's shift IS pm_{s-1} aged one lane)
            qa_raw = (
                RPM[pl.ds(1, 1), pl.ds(0, N)]
                + mbu1 * QASC[pl.ds(0, 1), pl.ds(0, N)]
            )
            QASC[pl.ds(0, 1), pl.ds(1, N)] = qa_raw
            terms_a = jnp.where(m1, r_pm2 * s_qone[:ht], 0.0)
            terms_bc = jnp.where(m1, r_pm * s_qone[:ht], 0.0)
            mb_ctx = acc_mb * (
                jnp.sum(terms_a, axis=0, keepdims=True)
                + jnp.sum(terms_bc, axis=0, keepdims=True)
                + qa_raw
            )

            bppo_new = base + two + mb_ctx
            bppo_new = jnp.where(pos & span_ok, bppo_new, 0.0)
            bppoF[pl.ds(d, 1), :] = bppo_new

            g2 = bppo_new * augt_row * inv_close
            _shift_insert(OG, g2, lane_off=32)
            _shift_insert(GW1, g2 * _row3(TMo1N, d), lane_off=32)
            _shift_insert(GW2, g2 * _row3(TMo2N, d), lane_off=32)
            _shift_insert(GW3, g2 * _row3(TMo3N, d), lane_off=32)
            g_row = bppo_new * mbc_row * inv_close
            shifted = XS[pl.ds(0, ht - 1), :]
            XS[pl.ds(1, ht - 1), :] = shifted
            XS[pl.ds(0, 1), :] = g_row
            _rotate_right(SONEF, ht)
            _rotate_right(REXT, 1)

        prev = 0
        for ht in _live_heights(N):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = hi - lo
                    wrap = SONEF[pl.ds(lo, rows), pl.ds(C2 - lo, lo)]
                    body = SONEF[pl.ds(lo, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo, rows), pl.ds(lo, C2 - lo)] = body
                    SONEF[pl.ds(lo, rows), pl.ds(0, lo)] = wrap

                pl.when(k == prev)(bulk)
            cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht
        return carry

    lax.fori_loop(N - n_i, N, span_step, 0)
    bppo_out[0] = bppoF[:]


def _turner_scal_rows(tt, ln_sigma, ns, glob=None):
    """(B, 1, 8) scalars: eu1 = mbu1 = exp(-ln_sigma), ebp = 1,
    mbbp = exp(COEFF_NUM_BRANCHES)."""
    B = ln_sigma.shape[0]
    u = jnp.exp(-ln_sigma)
    coeffp = jnp.broadcast_to(jnp.exp(tt["coeff_num_branches"]), (B,))
    g = glob if glob is not None else jnp.zeros((B,))
    scal = jnp.stack(
        [
            u, jnp.ones((B,)), u, coeffp, g,
            jnp.zeros((B,)), jnp.zeros((B,)),
            ns.astype(jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)
    return scal[:, None, :]


def _turner_prob_run_body(seqs, ns, tt, ln_sigma, N, interpret):
    B = seqs.shape[0]
    pmats = turner_prob_mats(seqs, ns, tt, ln_sigma, N)
    LENBp, LENIp = _turner_len_prob(tt, ln_sigma)
    KB, K2, KI = _turner_banded_kernels(LENBp, LENIp)
    WCOLt = _turner_wcols(KB, K2)
    scal = _turner_scal_rows(tt, ln_sigma, ns)
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(3)
    )
    kernel = functools.partial(_turner_inside_prob_kernel, N=N)
    close, ext, one = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(18)),
            _nn(W2, W), _nn(W2, W),
            _nn(32, 32), _nn(32, 8),
        ],
        out_specs=(_nn(N, N), _nn(N, N), _nn(N, N)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # CAW (close * aug)
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T1W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T2W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T3W
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQ
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQM
            pltpu.VMEM((N, N), jnp.float32),              # extS
            pltpu.VMEM((N + 1, N), jnp.float32),          # extrS
            pltpu.VMEM((2, N + 8), jnp.float32),          # mbS 2-row ring
            pltpu.VMEM((N + 1, N), jnp.float32),          # oneS
            pltpu.VMEM((N, N), jnp.float32),              # closeF
            pltpu.VMEM((1, N + 8), jnp.float32),          # S1SC
        ],
        interpret=interpret,
    )(
        scal,
        pmats["H"], pmats["MBC"], pmats["ACC"], pmats["CANON"],
        pmats["STKT"], pmats["B01"], pmats["B10"], pmats["I11T"],
        pmats["I12T"], pmats["I21T"], pmats["I22T"],
        pmats["TMo1"], pmats["TMo2"], pmats["TMo3"], pmats["AUGT"],
        pmats["TMi1"], pmats["TMi2"], pmats["TMi3"],
        LENBp, LENIp, KI, WCOLt,
    )
    ONEP, QONE, extL, extR, glob = PF.contra_outside_aux(
        ns, ext, one, N, neg=0.0, one_val=1.0
    )
    scal_o = _turner_scal_rows(tt, ln_sigma, ns, glob=glob)
    kernel = functools.partial(
        _turner_outside_prob_kernel, N=N, min_span=MIN_SPAN_HAIRPIN_CLOSE
    )
    bppo = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(17)),
            _nn(N, 2 * N),                    # ONEP
            _nn(N, N),                        # QONE
            _nn(1, N),                        # EXTL
            _nn(1, 2 * N),                    # EXTR
            _nn(W2, W), _nn(W2, W),           # LENB LENI
            _nn(32, 32), _nn(32, 8),          # KI, weight columns
        ],
        out_specs=_nn(N, N),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # OG
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T1W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T2W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T3W
            pltpu.VMEM((N, N), jnp.float32),              # XS
            pltpu.VMEM((N, N), jnp.float32),              # RPM
            pltpu.VMEM((N, N), jnp.float32),              # RPM2
            pltpu.VMEM((N, N), jnp.float32),              # bppoF
            pltpu.VMEM((N, 2 * N), jnp.float32),          # SONEF
            pltpu.VMEM((1, 2 * N), jnp.float32),          # REXT
            pltpu.VMEM((1, N), jnp.float32),              # P2SC
            pltpu.VMEM((1, N + 8), jnp.float32),          # QASC
        ],
        interpret=interpret,
    )(
        scal_o,
        close, pmats["MBC"], pmats["ACC"],
        pmats["STKO"], pmats["B01O"], pmats["B10O"], pmats["I11O"],
        pmats["I12O"], pmats["I21O"], pmats["I22O"],
        pmats["TMo1"], pmats["TMo2"], pmats["TMo3"], pmats["AUGT"],
        pmats["TMi1"], pmats["TMi2"], pmats["TMi3"],
        ONEP, QONE,
        extL[:, None, :], extR[:, None, :],
        LENBp, LENIp, KI, WCOLt,
    )
    return bppo, glob


# ---------------------------------------------------------------------------
# Turner span-chunked kernels (N >= 512) — same design as the CONTRA
# chunked kernels above: grid (B, N/R), tables streamed per row-chunk,
# DP state resident, outputs streamed per span.  R = 64 (Turner streams
# 18 tables, so chunks are half the CONTRA size to stay in VMEM).
# ---------------------------------------------------------------------------

def _turner_inside_prob_kernel_chunked(
    SCAL,
    H, MBC, ACC, CANON,
    STKT, B01, B10, I11T, I12T, I21T, I22T,
    TMo1, TMo2, TMo3, AUGT, TMi1N, TMi2N, TMi3N,
    LENB, LENI, KI, WCOL,
    close_out, ext_out, one_out,
    CAW, GW1, GW2, GW3, FQ, FQM, extrS, mbS, oneS, S1SC, CARRY,
    *, N, R,
):
    c = pl.program_id(1)
    base = c * R
    eu1 = SCAL[0, 0, 0]
    ebp = SCAL[0, 0, 1]
    mbu1 = SCAL[0, 0, 2]
    mbbp = SCAL[0, 0, 3]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    @pl.when(c == 0)
    def _init():
        for buf in (CAW, FQ, FQM, mbS, oneS, GW1, GW2, GW3, S1SC):
            buf[:] = jnp.zeros_like(buf[:])
        extrS[:] = jnp.ones_like(extrS[:])

    close_out[0] = jnp.zeros_like(close_out[0])
    ext_out[0] = jnp.zeros_like(ext_out[0])
    one_out[0] = jnp.zeros_like(one_out[0])

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    first = c == 0
    rm0 = jnp.where(first, 0.0, CARRY[pl.ds(0, 1), :])
    rmmb0 = jnp.where(first, 0.0, CARRY[pl.ds(1, 1), :])
    epow0 = jnp.where(first, 1.0, CARRY[pl.ds(2, 1), :])

    def span_step(d, carry):
        rm_prev, rmmb_prev, epow_prev = carry
        r = d - base

        aug_row = _row3(AUGT, r)
        # KB (bulge) and K2 (2x3-edge) are 1-D families: column +
        # diagonal arms on the VPU (see prob8._turner_inside8_kernel);
        # only the 2-D generic interior keeps its matmul
        two = jnp.sum(
            CAW[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(0, 1)],
            axis=0, keepdims=True,
        )[:, 1:1 + N]
        two = two + _skew_extract_sum(
            CAW[pl.ds(1, 32), :] * WCOL[0, :, pl.ds(1, 1)], N, 1
        )
        two = two + _row3(TMo1, r) * _skew_extract_sum(
            _band_mm(KI, GW1), N, 1
        )
        k2s = jnp.sum(
            GW2[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(2, 1)],
            axis=0, keepdims=True,
        )[:, 2:2 + N]
        k2s = k2s + _skew_extract_sum(
            GW2[pl.ds(2, 32), :] * WCOL[0, :, pl.ds(3, 1)], N, 1
        )
        two = two + _row3(TMo2, r) * k2s
        two = two + _row3(TMo3, r) * (
            LENI[0, pl.ds(3, 1), pl.ds(2, 1)]
            * GW3[pl.ds(6, 1), pl.ds(3, N)]
            + LENI[0, pl.ds(2, 1), pl.ds(3, 1)]
            * GW3[pl.ds(6, 1), pl.ds(4, N)]
        )
        two = two * aug_row
        two = two + _row3(STKT, r) * CAW[pl.ds(1, 1), pl.ds(1, N)]
        two = two + _row3(B01, r) * CAW[pl.ds(2, 1), pl.ds(1, N)]
        two = two + _row3(B10, r) * CAW[pl.ds(2, 1), pl.ds(2, N)]
        two = two + _row3(I11T, r) * CAW[pl.ds(3, 1), pl.ds(2, N)]
        two = two + _row3(I12T, r) * CAW[pl.ds(4, 1), pl.ds(2, N)]
        two = two + _row3(I21T, r) * CAW[pl.ds(4, 1), pl.ds(3, N)]
        two = two + _row3(I22T, r) * CAW[pl.ds(5, 1), pl.ds(3, N)]
        mb_in = mbS[pl.ds(1, 1), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in * _row3(MBC, r), 0.0)
        close_new = (_row3(H, r) + two + mb_term) * _row3(CANON, r)
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, 0.0
        )
        close_out[0, pl.ds(r, 1), :] = close_new
        acc_new = close_new * _row3(ACC, r)

        rm_new = rm_prev * eu1 + acc_new * ebp
        rmmb_new = rmmb_prev * mbu1 + acc_new * mbbp
        epow = epow_prev * eu1

        def tail(ht):
            # piece-split tall ops (see _row_pieces + the probe note)
            for buf, row in ((FQ, rm_new), (FQM, rmmb_new)):
                for (s, rows) in reversed(_row_pieces(ht - 1)):
                    shifted = buf[pl.ds(s, rows), pl.ds(1, N + 7)]
                    buf[pl.ds(s + 1, rows), pl.ds(0, N + 7)] = shifted
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            ext_sum = jnp.zeros((1, N), jnp.float32)
            s2 = jnp.zeros((1, N), jnp.float32)
            for (s, rows) in _row_pieces(ht):
                tb = t_idx[s:s + rows]
                qblk = FQ[pl.ds(s, rows), pl.ds(0, N)]
                eblk = extrS[pl.ds(s, rows), :]
                terms = jnp.where(tb <= d - 1, qblk * eblk, 0.0)
                ext_sum = ext_sum + jnp.sum(terms, axis=0, keepdims=True)
                qmblk = FQM[pl.ds(s, rows), pl.ds(0, N)]
                x = jnp.where((tb >= 1) & (tb <= d - 1), qmblk, 0.0)
                oblk = oneS[pl.ds(s, rows), :]
                s2 = s2 + jnp.sum(oblk * x, axis=0, keepdims=True)
            ext_new = epow + ext_sum
            extrS[pl.ds(d + 1, 1), :] = ext_new
            ext_out[0, pl.ds(r, 1), :] = ext_new

            # sum_t rmmb_{d-t} * mbu1^t telescoped: S1_d = mbu1 *
            # (rmmb_{d-1} + S1_{d-1}) under the 1-lane aging shift (FQM
            # row 1 after this span's shift IS rmmb_{d-1} at the aged
            # alignment).  A standalone mbu1^t column flushes to zero at
            # t > 87/|ln mbu1| even when the x*mbu1^t term is perfectly
            # representable (Turner mbu = 0 keeps long-unpaired-run terms
            # significant — measured 2e-3 BPP error at n ~ 250); every
            # telescoped partial is a true suffix ensemble, so nothing
            # representable is lost.  Also removes the (ht, N) mul+reduce.
            s1v = mbu1 * (
                FQM[pl.ds(1, 1), pl.ds(0, N)]
                + S1SC[pl.ds(0, 1), pl.ds(1, N)]
            )
            S1SC[pl.ds(0, 1), pl.ds(0, N)] = s1v
            s1 = rmmb_new + s1v
            mbS[pl.ds(1, 1), :] = mbS[pl.ds(0, 1), :]
            mbS[pl.ds(0, 1), pl.ds(0, N)] = s2
            one_new = s1 + s2
            oneS[pl.ds(d + 1, 1), :] = one_new
            one_out[0, pl.ds(r, 1), :] = one_new

        prev = 0
        for ht in _live_marks_chunked(N, R):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        g = close_new * aug_row
        _shift_insert(CAW, g)
        _shift_insert(GW1, g * _row3(TMi1N, r))
        _shift_insert(GW2, g * _row3(TMi2N, r))
        _shift_insert(GW3, g * _row3(TMi3N, r))
        return (rm_new, rmmb_new, epow)

    rm_f, rmmb_f, epow_f = lax.fori_loop(
        base, jnp.minimum(n_i, base + R), span_step, (rm0, rmmb0, epow0)
    )
    CARRY[pl.ds(0, 1), :] = rm_f
    CARRY[pl.ds(1, 1), :] = rmmb_f
    CARRY[pl.ds(2, 1), :] = epow_f


def _turner_outside_prob_kernel_chunked(
    SCAL,
    CLOSE, MBC, ACC,
    STKO, B01O, B10O, I11O, I12O, I21O, I22O,
    TMo1N, TMo2N, TMo3N, AUGT, TMi1R, TMi2R, TMi3R,
    ONEP, QONE,
    EXTL, EXTR,
    LENB, LENI, KI, WCOL,
    bppo_out,
    OG, GW1, GW2, GW3, XS, RPM, RPM2, SONEF, REXT, P2SC, QASC,
    *, N, R, min_span,
):
    c = pl.program_id(1)
    C = N // R
    dbase = (C - 1 - c) * R
    mbu1 = SCAL[0, 0, 2]
    mbbp = SCAL[0, 0, 3]
    glob = SCAL[0, 0, 4]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    @pl.when(c == 0)
    def _init():
        for buf in (OG, GW1, GW2, GW3, XS, RPM, RPM2, P2SC, QASC):
            buf[:] = jnp.zeros_like(buf[:])
        REXT[pl.ds(0, 1), :] = EXTR[0, pl.ds(0, 1), :]

    SONEF[pl.ds(c * R, R), :] = ONEP[0, pl.ds(0, R), :]
    bppo_out[0] = jnp.zeros_like(bppo_out[0])

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    inv_glob = 1.0 / glob
    C2 = SONEF.shape[1]

    def span_step(step, carry):
        d = N - 1 - step
        r = d - dbase
        k = step - (N - n_i)
        span_ok = (d + 1) >= min_span

        close_row = _row3(CLOSE, r)
        pos = close_row > 0.0
        inv_close = jnp.where(pos, 1.0 / jnp.where(pos, close_row, 1.0), 0.0)
        acc_row = close_row * _row3(ACC, r)
        lt = EXTL[0, pl.ds(0, 1), :]
        rt = REXT[pl.ds(0, 1), pl.ds(0, N)]
        base = lt * acc_row * rt * inv_glob
        augt_row = _row3(AUGT, r)

        two = jnp.sum(
            OG[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(0, 1)],
            axis=0, keepdims=True,
        )[:, 31:31 + N]
        two = two + _skew_extract_sum(
            OG[pl.ds(1, 32), :] * WCOL[0, :, pl.ds(1, 1)], N, 31,
            descending=True,
        )
        two = two + _row3(TMi1R, r) * _skew_extract_sum(
            _band_mm(KI, GW1), N, 31, descending=True
        )
        k2s = jnp.sum(
            GW2[pl.ds(0, 32), :] * WCOL[0, :, pl.ds(2, 1)],
            axis=0, keepdims=True,
        )[:, 30:30 + N]
        k2s = k2s + _skew_extract_sum(
            GW2[pl.ds(2, 32), :] * WCOL[0, :, pl.ds(3, 1)], N, 31,
            descending=True,
        )
        two = two + _row3(TMi2R, r) * k2s
        two = two + _row3(TMi3R, r) * (
            LENI[0, pl.ds(3, 1), pl.ds(2, 1)]
            * GW3[pl.ds(6, 1), pl.ds(29, N)]
            + LENI[0, pl.ds(2, 1), pl.ds(3, 1)]
            * GW3[pl.ds(6, 1), pl.ds(28, N)]
        )
        two = two * augt_row
        two = two + _row3(STKO, r) * OG[pl.ds(1, 1), pl.ds(31, N)]
        two = two + _row3(B01O, r) * OG[pl.ds(2, 1), pl.ds(31, N)]
        two = two + _row3(B10O, r) * OG[pl.ds(2, 1), pl.ds(30, N)]
        two = two + _row3(I11O, r) * OG[pl.ds(3, 1), pl.ds(30, N)]
        two = two + _row3(I12O, r) * OG[pl.ds(4, 1), pl.ds(30, N)]
        two = two + _row3(I21O, r) * OG[pl.ds(4, 1), pl.ds(29, N)]
        two = two + _row3(I22O, r) * OG[pl.ds(5, 1), pl.ds(29, N)]
        two = two * close_row
        acc_mb = acc_row * mbbp
        mbc_row = _row3(MBC, r)

        def tail(ht):
            tb = t_idx[:ht]
            # piece-split tall ops (see _row_pieces + the probe note)
            pm_sum = jnp.zeros((1, N), jnp.float32)
            for (s, rows) in _row_pieces(ht):
                Xr = XS[pl.ds(s, rows), :]
                s_one = SONEF[pl.ds(s, rows), pl.ds(0, N)]
                pm_sum = pm_sum + jnp.sum(Xr * s_one, axis=0, keepdims=True)
            pm_new = jnp.where(span_ok, pm_sum, 0.0)
            # sum_t g_{s-1-t} * mbu1^t telescoped (see the inside S1SC
            # note): pm2_s = XS[0] + mbu1 * pm2_{s-1}, flush-safe
            pm2_raw = (
                XS[pl.ds(0, 1), pl.ds(0, N)]
                + mbu1 * P2SC[pl.ds(0, 1), pl.ds(0, N)]
            )
            P2SC[pl.ds(0, 1), pl.ds(0, N)] = pm2_raw
            pm2_new = jnp.where(span_ok, pm2_raw, 0.0)
            for buf, row in ((RPM, pm_new), (RPM2, pm2_new)):
                for (s, rows) in reversed(_row_pieces(ht - 1)):
                    shifted = buf[pl.ds(s, rows), pl.ds(0, N - 1)]
                    buf[pl.ds(s + 1, rows), pl.ds(1, N - 1)] = shifted
                    buf[pl.ds(s + 1, rows), pl.ds(0, 1)] = jnp.zeros(
                        (rows, 1)
                    )
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            qa_raw = (
                RPM[pl.ds(1, 1), pl.ds(0, N)]
                + mbu1 * QASC[pl.ds(0, 1), pl.ds(0, N)]
            )
            QASC[pl.ds(0, 1), pl.ds(1, N)] = qa_raw
            ab_sum = jnp.zeros((1, N), jnp.float32)
            for (s, rows) in _row_pieces(ht):
                m1 = t_idx[s:s + rows] >= 1
                r_pm = RPM[pl.ds(s, rows), pl.ds(0, N)]
                r_pm2 = RPM2[pl.ds(s, rows), pl.ds(0, N)]
                qone_blk = QONE[0, pl.ds(s, rows), pl.ds(0, N)]
                ab_sum = ab_sum + (
                    jnp.sum(
                        jnp.where(m1, r_pm2 * qone_blk, 0.0),
                        axis=0, keepdims=True,
                    )
                    + jnp.sum(
                        jnp.where(m1, r_pm * qone_blk, 0.0),
                        axis=0, keepdims=True,
                    )
                )
            mb_ctx = acc_mb * (ab_sum + qa_raw)

            bppo_new = base + two + mb_ctx
            bppo_new = jnp.where(pos & span_ok, bppo_new, 0.0)
            bppo_out[0, pl.ds(r, 1), :] = bppo_new

            g2 = bppo_new * augt_row * inv_close
            _shift_insert(OG, g2, lane_off=32)
            _shift_insert(GW1, g2 * _row3(TMo1N, r), lane_off=32)
            _shift_insert(GW2, g2 * _row3(TMo2N, r), lane_off=32)
            _shift_insert(GW3, g2 * _row3(TMo3N, r), lane_off=32)
            g_row = bppo_new * mbc_row * inv_close
            for (s, rows) in reversed(_row_pieces(ht - 1)):
                shifted = XS[pl.ds(s, rows), :]
                XS[pl.ds(s + 1, rows), :] = shifted
            XS[pl.ds(0, 1), :] = g_row
            for (s, rows) in _row_pieces(ht):
                _rotate_right(SONEF, rows, row_off=s)
            _rotate_right(REXT, 1)

        prev = 0
        for ht in _live_marks_chunked(N, R):
            if prev:
                def bulk(lo=prev, hi=ht):
                    rows = hi - lo
                    wrap = SONEF[pl.ds(lo, rows), pl.ds(C2 - lo, lo)]
                    body = SONEF[pl.ds(lo, rows), pl.ds(0, C2 - lo)]
                    SONEF[pl.ds(lo, rows), pl.ds(lo, C2 - lo)] = body
                    SONEF[pl.ds(lo, rows), pl.ds(0, lo)] = wrap

                pl.when(k == prev)(bulk)
            cond = k < ht if prev == 0 else (k >= prev) & (k < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht
        return carry

    lo = jnp.maximum(c * R, N - n_i)
    lax.fori_loop(lo, (c + 1) * R, span_step, 0)


def _turner_prob_run_body_chunked(seqs, ns, tt, ln_sigma, N, R,
                                  interpret, R_out=None):
    if R_out is None:
        R_out = R
    B = seqs.shape[0]
    C = N // R
    C_out = N // R_out
    pmats = turner_prob_mats(seqs, ns, tt, ln_sigma, N)
    LENBp, LENIp = _turner_len_prob(tt, ln_sigma)
    KB, K2, KI = _turner_banded_kernels(LENBp, LENIp)
    WCOLt = _turner_wcols(KB, K2)
    scal = _turner_scal_rows(tt, ln_sigma, ns)
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(3)
    )
    kernel = functools.partial(
        _turner_inside_prob_kernel_chunked, N=N, R=R
    )
    close, ext, one = pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[
            _smem_spec2(),
            *(_chunk_spec(R, N) for _ in range(18)),
            _const_spec2(W2, W), _const_spec2(W2, W),
            _const_spec2(32, 32), _const_spec2(32, 8),
        ],
        out_specs=tuple(_chunk_spec(R, N) for _ in range(3)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # CAW
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # GW1
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # GW2
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # GW3
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQ
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQM
            pltpu.VMEM((N + 1, N), jnp.float32),          # extrS
            pltpu.VMEM((2, N + 8), jnp.float32),          # mbS
            pltpu.VMEM((N + 1, N), jnp.float32),          # oneS
            pltpu.VMEM((1, N + 8), jnp.float32),          # S1SC
            pltpu.VMEM((8, N), jnp.float32),              # CARRY
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
    )(
        scal,
        pmats["H"], pmats["MBC"], pmats["ACC"], pmats["CANON"],
        pmats["STKT"], pmats["B01"], pmats["B10"], pmats["I11T"],
        pmats["I12T"], pmats["I21T"], pmats["I22T"],
        pmats["TMo1"], pmats["TMo2"], pmats["TMo3"], pmats["AUGT"],
        pmats["TMi1"], pmats["TMi2"], pmats["TMi3"],
        LENBp, LENIp, KI, WCOLt,
    )
    ONEP, QONE, extL, extR, glob = PF.contra_outside_aux(
        ns, ext, one, N, neg=0.0, one_val=1.0
    )
    scal_o = _turner_scal_rows(tt, ln_sigma, ns, glob=glob)
    kernel = functools.partial(
        _turner_outside_prob_kernel_chunked,
        N=N, R=R_out, min_span=MIN_SPAN_HAIRPIN_CLOSE,
    )
    bppo = pl.pallas_call(
        kernel,
        grid=(B, C_out),
        in_specs=[
            _smem_spec2(),
            *(_chunk_spec(R_out, N, desc=True, C=C_out) for _ in range(17)),
            _chunk_spec(R_out, 2 * N),               # ONEP (ascending)
            _const_spec2(N, N),                  # QONE
            _const_spec2(1, N),                  # EXTL
            _const_spec2(1, 2 * N),              # EXTR
            _const_spec2(W2, W), _const_spec2(W2, W),
            _const_spec2(32, 32), _const_spec2(32, 8),
        ],
        out_specs=_chunk_spec(R_out, N, desc=True, C=C_out),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # OG
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # GW1
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # GW2
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # GW3
            pltpu.VMEM((N, N), jnp.float32),              # XS
            pltpu.VMEM((N, N), jnp.float32),              # RPM
            pltpu.VMEM((N, N), jnp.float32),              # RPM2
            pltpu.VMEM((N, 2 * N), jnp.float32),          # SONEF
            pltpu.VMEM((1, 2 * N), jnp.float32),          # REXT
            pltpu.VMEM((1, N), jnp.float32),              # P2SC
            pltpu.VMEM((1, N + 8), jnp.float32),          # QASC
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
    )(
        scal_o,
        close, pmats["MBC"], pmats["ACC"],
        pmats["STKO"], pmats["B01O"], pmats["B10O"], pmats["I11O"],
        pmats["I12O"], pmats["I21O"], pmats["I22O"],
        pmats["TMo1"], pmats["TMo2"], pmats["TMo3"], pmats["AUGT"],
        pmats["TMi1"], pmats["TMi2"], pmats["TMi3"],
        ONEP, QONE,
        extL[:, None, :], extR[:, None, :],
        LENBp, LENIp, KI, WCOLt,
    )
    return bppo, glob


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def mccaskill_turner_pallas_prob(seqs, ns, tt, N, interpret=False):
    """Scaled-probability Turner McCaskill with automatic rescale retries."""

    def run(ls):
        if N > 256:
            # R = 64 keeps the validated N = 512 program; the larger
            # buckets take bigger chunks (fewer ladder marks / boundaries).
            # At N = 2048 only the OUTSIDE chunk narrows (SONEF is (N, 2N);
            # see _prob_run_body's VMEM note).
            Rt = 64 if N <= 512 else 128
            return _turner_prob_run_body_chunked(
                seqs, ns, tt, ls, N, Rt, interpret,
                R_out=Rt if N <= 1024 else 32,
            )
        return _turner_prob_run_body(seqs, ns, tt, ls, N, interpret)

    B = seqs.shape[0]
    if N > 512:
        # prefix seed; see the CONTRA entry for the drift/band rationale
        NP = 512 if N <= 1024 else 1024
        ns_small = jnp.minimum(ns, NP)

        def run_small(ls):
            return _turner_prob_run_body_chunked(
                seqs[:, :NP], ns_small, tt, ls, NP,
                64 if NP == 512 else 128, interpret,
            )

        ls_seed = _estimate_ls0(
            run_small, B, ns_small, LN_SIGMA0_TURNER,
            drift=LS_PREFIX_DRIFT_TURNER,
        )
        return _retrying(run, B, ls0=ls_seed, ns=ns)
    return _retrying(
        run, seqs.shape[0],
        ls0=jnp.asarray(LN_SIGMA0_TURNER, jnp.float32), ns=ns,
    )
