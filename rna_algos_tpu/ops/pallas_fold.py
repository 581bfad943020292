"""Fused Pallas TPU kernels for the McCaskill wavefronts (CONTRAfold model).

The XLA scan in models/mccaskill.py re-materializes padded state buffers and
window tensors in HBM every span.  At RNA scale the *entire* DP state is a few
hundred KB, so these kernels keep every state table resident in VMEM for the
whole wavefront - zero HBM traffic inside the span loop, no gathers.

Mosaic constraints shape the design:

* no `rev`, no dynamic-lane slicing, and dynamic multi-row loads must be
  8-aligned - so every recurrence that walks *relative* to the current span
  uses a **sliding scratch**: per span the buffer shifts by one row (a static
  overlapping copy) and the freshly computed diagonal is inserted at slot 0,
  making all block reads fully static:
    - the 31x31 2-loop window over `close`/junction scores: a 64-row slide
      whose row r holds span d-1-r, read as static (32, N) blocks per lane
      shift a (mccaskill_algo.rs:412-420);
    - the O(span) bifurcation terms `rm(i+t, i+d)`: an (N, N) slide in
      [t, i] layout whose transition is rows+1/lanes+1 (all static);
* dynamic-lane access (outside-pass context rows anchored at j = i+d) is
  eliminated: the rows land in a rotating scratch (static half-swap init +
  catch-up rotates to the first span, then one lane-rotate per span, each
  rotate two static shifted copies — `_rotate_right`).  `pltpu.roll` costs
  ~1us fixed per call on v5e and a stored dynamic roll does not lower at
  all, so the kernels emit no rolls;
* single-row reads/writes at a traced span index address the full tables;
* window blocks truncate to the power-of-two covering the live rows
  (`_win_rows`): trailing -inf rows of a pow-2 LSE tree are exact
  identities, so the truncation is bit-exact and drops ~1/3 of the
  2-loop window work.

Scoring is fully precomputed per sequence as span-major [d, i] matrices so
the kernels are pure log-space arithmetic.  Reference recurrences:
/root/reference/src/mccaskill_algo.rs:380-516 (inside), :612-723 (outside).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    MAX_HAIRPIN_LEN_EXTRAPOLATION,
    MAX_LOOP_LEN,
    MIN_HAIRPIN_LEN,
    MIN_HAIRPIN_LEN_EXTRAPOLATION,
    MIN_SPAN_HAIRPIN_CLOSE,
    NEG_INF,
)
from .. import numerics
from ..numerics import lse_pair
from . import diag
from . import scores as S
from .lut import sep_lookup as SEP

W = 31    # 2-loop window extent (MAX_LOOP_LEN + 1)
W2 = 32   # loaded window rows (the extra row is masked by the length cap)
WROWS = 64            # sliding window depth (>= 2*W)
LPAD = 33             # lane padding of window slides


def _win_rows(a):
    """Loaded window rows at lane shift ``a``: the loop-length cap kills rows
    past 31 - a, so tail shifts load 16/8-row blocks instead of always 32.

    Heights are the next power of two >= the live rows (not the 8-granule):
    trailing -inf rows in a pow-2 LSE tree are exact identities, so a pow-2
    truncation reproduces the 32-row tree's pairings bit-exactly — numerics
    (exact mode!) are unchanged while ~1/3 of the window work drops."""
    live = W - a
    if live <= 8:
        return 8
    if live <= 16:
        return 16
    return W2


def _live_heights(N):
    """Static pow-2 height ladder for live-region truncation.

    At span d only rows t <= d of the span-indexed scratches (shift
    registers, ext/one tables) hold data — rows past d are the zero (or
    log -inf) identity by construction.  Processing the covering power of
    two instead of the full bucket height N preserves results exactly
    (zero rows add nothing; identity rows of a pow-2 reduce tree pair off
    exactly — same argument as _win_rows) while the per-span cost follows
    the live wavefront instead of the bucket: ~1.9x less sublane traffic
    at n=85/N=128, ~2.3x at Rfam-scale n<=200/N=256."""
    hs, h = [], 32
    while h < N:
        hs.append(h)
        h *= 2
    hs.append(N)
    return hs


def _lse_rows(x):
    """Tree-LSE over axis 0 (sublanes), returns (1, lanes).

    Power-of-two heights use the strided halving tree; other heights split
    statically at the largest power of two (no pad/concat, which Mosaic
    lacks) so any multiple-of-8 bucket works.  In fast numerics mode the
    whole reduction collapses to max + sum(exp) + one log."""
    n = x.shape[0]
    if n == 1:
        return x
    if numerics.get_mode() == "fast":
        m = jnp.max(x, axis=0, keepdims=True)
        safe = jnp.where(jnp.isfinite(m), m, 0.0)
        s = jnp.sum(jnp.exp(x - safe), axis=0, keepdims=True)
        return jnp.where(jnp.isfinite(m), safe + jnp.log(s), NEG_INF)
    if n & (n - 1) == 0:
        while x.shape[0] > 1:
            h = x.shape[0] // 2
            x = lse_pair(x[:h], x[h:])
        return x
    p = 1
    while p * 2 < n:
        p *= 2
    return lse_pair(_lse_rows(x[:p]), _lse_rows(x[p:]))


def _row3(ref, r):
    """(1, lanes) dynamic single-row read of a (1, R, C) input ref."""
    return ref[0, pl.ds(r, 1), :]


def _shift_insert(buf, row, lane_off=0):
    """Slide a window scratch one row down and insert ``row`` at slot 0."""
    R = buf.shape[0]
    shifted = buf[pl.ds(0, R - 1), :]
    buf[pl.ds(1, R - 1), :] = shifted
    buf[pl.ds(0, 1), pl.ds(lane_off, row.shape[1])] = row


def _init_swapped(buf, src, R, N):
    """buf[:, l] = src[:, (l + N) mod 2N] — a static half-swap, the rotation
    alignment of span d = N - 1.  ``src`` is a (1, R, 2N) input ref.
    Storing a dynamic pltpu.roll fails to lower in Mosaic ("dynamic load
    with unaligned indices"), so the per-sequence alignment is reached by
    static catch-up rotates instead (see the kernel bodies)."""
    buf[pl.ds(0, R), pl.ds(0, N)] = src[0, pl.ds(0, R), pl.ds(N, N)]
    buf[pl.ds(0, R), pl.ds(N, N)] = src[0, pl.ds(0, R), pl.ds(0, N)]


def _rotate_right(buf, rows, row_off=0):
    """Rotate rows [row_off, row_off+rows) of a (R, 2N) scratch one lane
    right (wrap) via two static shifted copies.  ``pltpu.roll`` costs ~1us
    fixed per call on v5e (even static single-lane amounts), so per-span
    rolls are replaced by one init roll into scratch + this rotate."""
    C = buf.shape[1]
    wrap = buf[pl.ds(row_off, rows), pl.ds(C - 1, 1)]
    body = buf[pl.ds(row_off, rows), pl.ds(0, C - 1)]
    buf[pl.ds(row_off, rows), pl.ds(1, C - 1)] = body
    buf[pl.ds(row_off, rows), pl.ds(0, 1)] = wrap


# ---------------------------------------------------------------------------
# Inside kernel
# ---------------------------------------------------------------------------

def _contra_inside_kernel(
    SCAL,                                   # (1, 1, 8) SMEM scalars
    H, MBC, ACC, JS, STK, I11, B0R, B0L, CANON, JB,   # (1, N, N) [d, i]
    LEN,                                    # (1, W2, W) [b, a]
    close_out, ext_out, one_out,            # (1, N, N)
    CJW, JBR, FQ, FQM, extS, extrS, mbS, oneS, closeF,
    *, N,
):
    ext_unpair = SCAL[0, 0, 0]
    ext_bp = SCAL[0, 0, 1]
    mb_unpair = SCAL[0, 0, 2]
    mb_bp = SCAL[0, 0, 3]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    # CJW holds close + jb PRECOMBINED (window loads are the kernel's cost
    # driver: one (h, N) block read ~= a whole lse tree): the window loop
    # reads ONE buffer instead of close + junction separately.  JBR is a
    # 2-row ring of recent jb rows (finite 0 pad) so the (a=0, b=0) stack
    # special can subtract the jb term back out.
    CJW[:] = jnp.full_like(CJW[:], NEG_INF)
    JBR[:] = jnp.zeros_like(JBR[:])
    FQ[:] = jnp.full_like(FQ[:], NEG_INF)
    FQM[:] = jnp.full_like(FQM[:], NEG_INF)
    extS[:] = jnp.zeros_like(extS[:])
    extrS[:] = jnp.zeros_like(extrS[:])
    mbS[:] = jnp.full_like(mbS[:], NEG_INF)
    oneS[:] = jnp.full_like(oneS[:], NEG_INF)
    closeF[:] = jnp.full_like(closeF[:], NEG_INF)

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (W2, 1), 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    neg_row = jnp.full((1, N), NEG_INF)

    def span_step(d, carry):
        rm_prev, rmmb_prev = carry

        # ---- close: hairpin + 2-loop window + multibranch closure ----
        # CB invariant: CB[r, k] = close(k, k + d - 1 - r); the (k, l) window
        # term close(i+1+a, i+d-1-b) sits at rows a+b+1, lanes i+1+a.
        js_row = _row3(JS, d)
        two = neg_row
        for a in range(W):
            h = _win_rows(a)
            bi = b_idx[:h]
            blk = CJW[pl.ds(a + 1, h), pl.ds(1 + a, N)]   # close + jb
            body = js_row + LEN[0, pl.ds(0, h), pl.ds(a, 1)]
            if a == 0:
                # stack replaces js/jb/len: subtract the jb(d-2) baked into
                # the blk row (ring row 1, same +1 lane shift as the blk)
                body = jnp.where(
                    bi == 0,
                    _row3(STK, d) - JBR[pl.ds(1, 1), pl.ds(1, N)],
                    body,
                )
                body = jnp.where(bi == 1, body + _row3(B0R, d), body)
            elif a == 1:
                body = jnp.where(bi == 0, body + _row3(B0L, d), body)
                body = jnp.where(bi == 1, body + _row3(I11, d), body)
            tl = jnp.where(a + bi <= MAX_LOOP_LEN, body, NEG_INF) + blk
            two = lse_pair(two, _lse_rows(tl))
        # mb(i+1, j-1): mbS is a 2-row shift register (row 1 = s2 from span
        # d-2); static row + the +1 lane offset does the i+1 re-anchoring
        # (lane N-1 reads the -inf pad — j-1 < i+1).  Dynamic-row reads at
        # unaligned lane offsets do not lower in Mosaic; static do.
        mb_in = mbS[pl.ds(1, 1), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in + _row3(MBC, d), NEG_INF)
        close_new = lse_pair(lse_pair(_row3(H, d), two), mb_term)
        close_new = close_new + _row3(CANON, d)     # 0 / -inf mask
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, NEG_INF
        )
        closeF[pl.ds(d, 1), :] = close_new
        acc_new = close_new + _row3(ACC, d)

        # ---- rightmost-basepair sums (incremental; carried rows) ----
        rm_new = lse_pair(rm_prev + ext_unpair, acc_new + ext_bp)
        rmmb_new = lse_pair(rmmb_prev + mb_unpair, acc_new + mb_bp)

        # ---- bifurcation slides + O(span) reductions, truncated to the
        # live region (_live_heights): rows past d hold the -inf init, which
        # is an exact identity of every pow-2 lse tree, so each branch is
        # bit-identical to the full-height computation ----
        def tail(ht):
            tb = t_idx[:ht]
            # FQ[t, i] = rm(i+t, i+d); transition d-1 -> d is rows+1 /
            # lanes+1; lane N-1 shifts in the -inf lane pad
            for buf, row in ((FQ, rm_new), (FQM, rmmb_new)):
                shifted = buf[pl.ds(0, ht - 1), pl.ds(1, N + 7)]
                buf[pl.ds(1, ht - 1), pl.ds(0, N + 7)] = shifted
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            # external: terms[t, i] = rm(i+t, i+d) + ext(i, i+t-1)
            qblk = FQ[pl.ds(0, ht), pl.ds(0, N)]
            eblk = extrS[pl.ds(0, ht), :]
            terms = jnp.where(tb <= d - 1, qblk + eblk, NEG_INF)
            base = ext_unpair * (d + 1).astype(jnp.float32)
            ext_new = lse_pair(
                jnp.full((1, N), 0.0) + base, _lse_rows(terms)
            )
            extS[pl.ds(d, 1), :] = ext_new
            extrS[pl.ds(d + 1, 1), :] = ext_new

            # multibranch / one-or-more: t in [1, d-1]
            qmblk = FQM[pl.ds(0, ht), pl.ds(0, N)]
            x = jnp.where((tb >= 1) & (tb <= d - 1), qmblk, NEG_INF)
            s1 = lse_pair(
                rmmb_new,
                _lse_rows(x + mb_unpair * tb.astype(jnp.float32)),
            )
            oblk = oneS[pl.ds(0, ht), :]            # one(i, i+t-1): row t
            s2 = _lse_rows(oblk + x)
            mbS[pl.ds(1, 1), :] = mbS[pl.ds(0, 1), :]
            mbS[pl.ds(0, 1), pl.ds(0, N)] = s2
            oneS[pl.ds(d + 1, 1), :] = lse_pair(s1, s2)

        prev = 0
        for ht in _live_heights(N):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        # ---- window slide picks up span d for the next steps ----
        jb_row = _row3(JB, d)
        _shift_insert(CJW, close_new + jb_row)
        JBR[pl.ds(1, 1), :] = JBR[pl.ds(0, 1), :]
        JBR[pl.ds(0, 1), pl.ds(0, N)] = jb_row
        return (rm_new, rmmb_new)

    # Spans >= n are dead (CANON kills every cell with j >= n, and the
    # inter-kernel aux only reads ext/one rows < n): loop only to the
    # per-sequence length, leaving the scratch inits in the dead rows.
    lax.fori_loop(0, n_i, span_step, (neg_row, neg_row))

    close_out[0] = closeF[:]
    ext_out[0] = extS[:]
    one_out[0] = oneS[pl.ds(1, N), :]


# ---------------------------------------------------------------------------
# Outside kernel
# ---------------------------------------------------------------------------

def _contra_outside_kernel(
    SCAL,                                    # (1, 1, 8) SMEM
    CLOSE, MBC, ACC, STKO, I11O, B0RO, JRB, JSN,  # (1, N, N) [d, i]
    ONEP,                                    # (1, N, 2N) one(j+1, k-1) rows
    QONE,                                    # (1, N, N)  one(k+1, i-1) block
    B0LO, EXTL,                              # (1, 1, N)
    EXTR,                                    # (1, 1, 2N)
    LEN,                                     # (1, W2, W) [b, a]
    bppo_out,                                # (1, N, N)
    OBG, JSR, XS, RPM, RPM2, bppoF, SONEF, REXT,
    *, N, min_span,
):
    ext_bp = SCAL[0, 0, 1]
    mb_unpair = SCAL[0, 0, 2]
    mb_bp = SCAL[0, 0, 3]
    glob = SCAL[0, 0, 4]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    # OBG holds bppo - close + jsn PRECOMBINED (one window read per lane
    # shift instead of three; block loads dominate the kernel); JSR is a
    # 2-row ring of recent jsn rows (finite 0 pad) for the (a=0, b=0)
    # stack special, which must subtract the jsn term back out.
    OBG[:] = jnp.full_like(OBG[:], NEG_INF)
    JSR[:] = jnp.zeros_like(JSR[:])
    XS[:] = jnp.full_like(XS[:], NEG_INF)
    RPM[:] = jnp.full_like(RPM[:], NEG_INF)
    RPM2[:] = jnp.full_like(RPM2[:], NEG_INF)
    bppoF[:] = jnp.full_like(bppoF[:], NEG_INF)
    # j-anchored context rows land in rotating scratches; ONEP/EXTR arrive
    # pre-rotated by (2N - n) from contra_outside_aux, so the init is a
    # straight copy (the old half-swap + (N - n) catch-up rotations cost
    # bucket-, not length-, proportional work) and the rotation count is a
    # static function of the step index
    SONEF[pl.ds(0, N), :] = ONEP[0, pl.ds(0, N), :]
    REXT[pl.ds(0, 1), :] = EXTR[0, pl.ds(0, 1), :]

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (W2, 1), 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    s_qone = QONE[0, pl.ds(0, N), pl.ds(0, N)]   # [t', i] = one(i-t'+1, i-1)
    # span-invariant merge of the two r_pm multibranch contexts (the
    # unpaired-run weight and the one(k+1, i-1) factor): one tree reduce
    # per span instead of two.
    s_qone_mb = lse_pair(
        s_qone,
        jnp.broadcast_to(
            mb_unpair * (t_idx - 1).astype(jnp.float32), (N, N)
        ),
    )
    C2 = SONEF.shape[1]

    def span_step(step, carry):
        d = N - 1 - step
        k = step - (N - n_i)      # completed spans: live scratch rows <= k
        span_ok = (d + 1) >= min_span

        # ---- bpp outside ----
        close_row = _row3(CLOSE, d)
        acc_row = close_row + _row3(ACC, d)
        lt = EXTL[0, pl.ds(0, 1), :]
        rt = REXT[pl.ds(0, 1), pl.ds(0, N)]
        base = lt + acc_row + rt - glob + ext_bp

        # 2-loop context: OBG[r, 32+k] = (bppo - close + jsn)(k, k+d+1+r);
        # the outer pair (i-1-a, i+d+1+b) sits at rows a+b+1, lanes 31-a+i.
        jrb_row = _row3(JRB, d)
        two = jnp.full((1, N), NEG_INF)
        for a in range(W):
            h = _win_rows(a)
            bi = b_idx[:h]
            blk = OBG[pl.ds(a + 1, h), pl.ds(31 - a, N)]
            body = jrb_row + LEN[0, pl.ds(0, h), pl.ds(a, 1)]
            if a == 0:
                # stack replaces jrb/jsn/len: subtract the jsn(d+2) baked
                # into the blk row (ring row 1, same 31-lane shift)
                body = jnp.where(
                    bi == 0,
                    _row3(STKO, d) - JSR[pl.ds(1, 1), pl.ds(31, N)],
                    body,
                )
                body = jnp.where(bi == 1, body + _row3(B0RO, d), body)
            elif a == 1:
                body = jnp.where(
                    bi == 0, body + B0LO[0, pl.ds(0, 1), :], body
                )
                body = jnp.where(bi == 1, body + _row3(I11O, d), body)
            tl = jnp.where(a + bi <= MAX_LOOP_LEN, body, NEG_INF)
            term = tl + blk + close_row
            two = lse_pair(two, _lse_rows(term))
        acc_mb = acc_row + mb_bp
        jsn_row = _row3(JSN, d)
        mbc_row = _row3(MBC, d)

        # live-region truncation + lazy pow-2 block rotation: at step k only
        # rows <= k of XS/RPM/RPM2/SONEF matter; rows past the live region
        # hold the -inf init (exact identities of the pow-2 lse trees), so
        # every branch is bit-identical to the full-height computation.
        # SONEF rows a height branch doesn't cover pick up their missed
        # rotations in one static bulk rotate when the branch activates.
        def tail(ht):
            tb = t_idx[:ht]
            # pm / pm2 (k > j context): XS[s, i] = G(i, i+d+s+1)
            Xr = XS[pl.ds(0, ht), :]
            s_one = SONEF[pl.ds(0, ht), pl.ds(0, N)]  # [s,i] = one(j+1,j+s)
            pm_new = jnp.where(
                span_ok, _lse_rows(Xr + s_one)[0:1], NEG_INF
            )
            pm2_new = jnp.where(
                span_ok,
                _lse_rows(Xr + mb_unpair * tb.astype(jnp.float32))[0:1],
                NEG_INF,
            )

            # RPM slides: RPM[t', i] = pm(i-t', i+d), rows+1 / lanes+1
            for buf, row in ((RPM, pm_new), (RPM2, pm2_new)):
                shifted = buf[pl.ds(0, ht - 1), pl.ds(0, N - 1)]
                buf[pl.ds(1, ht - 1), pl.ds(1, N - 1)] = shifted
                buf[pl.ds(1, ht - 1), pl.ds(0, 1)] = jnp.full(
                    (ht - 1, 1), NEG_INF
                )
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            # multibranch context: k < i, t' = i - k in [1, i]
            r_pm = RPM[pl.ds(0, ht), pl.ds(0, N)]
            r_pm2 = RPM2[pl.ds(0, ht), pl.ds(0, N)]
            m1 = tb >= 1
            terms_a = jnp.where(m1, acc_mb + r_pm2 + s_qone[:ht], NEG_INF)
            terms_bc = jnp.where(
                m1, acc_mb + r_pm + s_qone_mb[:ht], NEG_INF
            )
            mb_ctx = lse_pair(_lse_rows(terms_a), _lse_rows(terms_bc))

            bppo_new = lse_pair(lse_pair(base, two), mb_ctx)
            bppo_new = jnp.where(
                (close_row > NEG_INF) & span_ok, bppo_new, NEG_INF
            )
            bppoF[pl.ds(d, 1), :] = bppo_new

            # slides pick up span d for smaller spans
            g2 = jnp.where(
                close_row > NEG_INF,
                bppo_new - close_row + jsn_row,
                NEG_INF,
            )
            _shift_insert(OBG, g2, lane_off=32)
            JSR[pl.ds(1, 1), :] = JSR[pl.ds(0, 1), :]
            JSR[pl.ds(0, 1), pl.ds(32, N)] = jsn_row
            g_row = jnp.where(
                close_row > NEG_INF,
                bppo_new + mbc_row - close_row,
                NEG_INF,
            )
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

    # Spans >= n are dead: start the decreasing-span loop at d = n - 1
    # (skipped steps would only shift init fill through the scratches).
    lax.fori_loop(N - n_i, N, span_step, 0)
    bppo_out[0] = bppoF[:]


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------

def contra_pq_tables(seqs, ns, ct, N):
    """Vmapped [p, q]-layout log score tables (phase 1 of
    contra_precompute_di): (pq dict, vb0_m1, vb0_x1).  Exposed so the
    merged probability-space precompute (pallas_fold_prob8) can fold its
    merges into pq space BEFORE the skew."""
    hc = ct["helix_close_scores"]
    tm = ct["terminal_mismatch_scores"]
    dl = ct["dangling_scores_left"]
    dr = ct["dangling_scores_right"]
    bp = ct["basepair_scores"]
    stk = ct["stack_scores"]
    b0x1 = ct["bulge_scores_0x1"]
    i1x1 = ct["interior_scores_1x1"]
    B = seqs.shape[0]

    def one_pq(seq, n):
        pvec = jnp.arange(N)
        x0 = seq
        x1 = S.sget(seq, pvec + 1)
        m1 = S.sget(seq, pvec - 1)
        qv = pvec[None, :]
        pv = pvec[:, None]

        # junction_score_single(i, j) / (j, i) (utils.rs:522-556)
        JSpq = SEP(hc, (x0,), (x0,)) + SEP(
            tm, (x0, x1), (x0, m1), perm=(0, 2, 1, 3)
        )
        JSrevpq = SEP(hc, (x0,), (x0,), perm=(1, 0)) + SEP(
            tm, (x0, m1), (x0, x1), perm=(1, 3, 0, 2)
        )
        BPpq = SEP(bp, (x0,), (x0,))

        # junction(i, j) + mb weights / junction(j, i) + bp, boundary-cased
        # (utils.rs:522-543)
        MBCpq = (
            ct["multibranch_score_base"]
            + ct["multibranch_score_basepair"]
            + SEP(hc, (x0,), (x0,))
            + SEP(dl, (x0, x1), (x0,), perm=(0, 2, 1))
            + SEP(dr, (x0,), (x0, m1))
        )
        ACCpq = (
            SEP(hc, (x0,), (x0,), perm=(1, 0))
            + jnp.where(
                qv < n - 1, SEP(dl, (x0,), (x0, x1), perm=(1, 0, 2)), 0.0
            )
            + jnp.where(
                pv > 0, SEP(dr, (x0, m1), (x0,), perm=(1, 2, 0)), 0.0
            )
            + BPpq
        )

        canon_pq = SEP(S.CANON_MAT.astype(jnp.float32), (x0,), (x0,)) * (
            qv < n
        )

        vb0_m1 = jnp.take(b0x1, m1)  # b0x1[x_{p-1}]
        vb0_x1 = jnp.take(b0x1, x1)  # b0x1[x_{p+1}]
        pq = {
            "JS": JSpq,
            "MBC": MBCpq,
            "ACC": ACCpq,
            "CANON": canon_pq,
            "JB": JSrevpq + BPpq,
            "STK": SEP(stk, (x0, x1), (x0, m1), perm=(0, 2, 1, 3))
            + SEP(bp, (x1,), (m1,)),
            "I11": SEP(i1x1, (x1,), (m1,)),
            "B0R": jnp.broadcast_to(vb0_m1[None, :], (N, N)),
        }
        return pq, vb0_m1, vb0_x1

    return jax.vmap(one_pq)(seqs, ns)


def contra_precompute_di(seqs, ns, ct, N):
    """Per-sequence [d, i]-layout score matrices for BOTH kernels (one pass:
    the outside pass reuses MBC/ACC/JS/JB and only adds the mirrored
    stack/0x1/1x1 grids).

    Three phases (see turner_precompute_di): vmapped position-separable
    one-hot MXU contractions in [p, q] (ops.lut.sep_lookup,
    contra_pq_tables), ONE fused Pallas diagonal re-layout
    (ops.pallas_skew.skew_pq_batch), then batched [d, i] assembly.  Cells
    past the matrix edge (i + d >= N) take the skew fill (0.0, finite)
    instead of the PSEUDO-row table value; every such cell is killed by
    the CANON / close = -inf masks in the kernels, and the fill keeps the
    finite-or-(-inf) lse_pair operand contract."""
    from .pallas_skew import skew_pq_batch

    B = seqs.shape[0]
    pq, vb0_m1, vb0_x1 = contra_pq_tables(seqs, ns, ct, N)
    names = sorted(pq)
    skewed = skew_pq_batch([pq[k] for k in names])       # [p, d] each
    sk = {
        k: jnp.transpose(v, (0, 2, 1))                   # -> [d, i]
        for k, v in zip(names, skewed)
    }

    di = jnp.arange(N)[:, None]
    ii = jnp.arange(N)[None, :]

    def shift_b(M, dd, ll):
        """Batched diag.shift_di: OUT[d, i] = M[d + dd, i + ll], 0 fill."""
        r = jnp.roll(M, (-dd, -ll), axis=(1, 2))
        ok = (di + dd >= 0) & (di + dd < N) & (ii + ll >= 0) & (ii + ll < N)
        return jnp.where(ok[None], r, 0.0)

    hlen = di - 1  # d - 1 along the span axis
    H = jnp.where(
        (hlen >= 0) & (hlen <= MAX_LOOP_LEN),
        ct["hairpin_scores_len_cumulative"][jnp.clip(hlen, 0, MAX_LOOP_LEN)]
        + sk["JS"],
        NEG_INF,
    )
    STK_di = sk["STK"]
    I11_di = sk["I11"]
    B0R_di = sk["B0R"]
    return {
        "H": H,
        "MBC": sk["MBC"],
        "ACC": sk["ACC"],
        "JS": sk["JS"],
        "CANON": jnp.where(sk["CANON"] > 0.5, 0.0, NEG_INF),
        "JB": sk["JB"],
        # inside 2-loop corrections
        "STK": STK_di,
        "I11": I11_di,
        "B0R": B0R_di,
        "B0L": jnp.broadcast_to(vb0_x1[:, None, :], (B, N, N)),
        # outside 2-loop corrections (outer (i-1-a, j+1+b), inner (i, j)):
        # plain [d, i] translations of the inside grids — e.g.
        # STK(p-1, q+1) = stk[x_{p-1}, x_p, x_{q+1}, x_q] + bp[x_p, x_q]
        # IS the outside stack cell at (p, q) — so one-pass shifts
        # replace three more log-depth skews (edge cells differ only
        # where the kernels' masks kill the term anyway)
        "STKO": shift_b(STK_di, 2, -1),
        "I11O": shift_b(I11_di, 4, -2),
        "B0RO": shift_b(B0R_di, 2, 0),
        "B0LO": vb0_m1,
    }


def _contra_len_di(ct):
    """(W2, W) [b, a] length/feature constants of the 2-loop body.

    Row b = W is a zero pad so 32-row window blocks add it directly (that
    row is always masked by the loop-length cap)."""
    bulge, interior = S._contra_len_consts(ct)  # [a, b]
    a, b = S._AGRID, S._BGRID
    body = jnp.where((a == 0) | (b == 0), bulge, interior)
    return jnp.concatenate([body.T, jnp.zeros((1, W))], axis=0)


def _skew_qone(one_di, N, neg=NEG_INF):
    """QONE[t, l] = one(l-t+1, l-1) with ``neg`` out of range (host prep).

    Row t reads one_di row q = t-2 positioned so column l holds p = l-t+1:
    a 2-row downshift + one-column widening turns the (N, N) gather into a
    gather-free :func:`diag.unskew_pq` (log-depth row-indexed right shifts).
    """
    M2 = jnp.concatenate(
        [jnp.full((2, N), neg), one_di[: N - 2]], axis=0
    )
    M5 = jnp.concatenate([M2, jnp.full((N, 1), neg)], axis=1)
    return diag.unskew_pq(M5, neg)[:, 1:]


def contra_outside_aux(ns, ext_di, one_di, N, neg=NEG_INF, one_val=0.0,
                       n_rot=None):
    """Outside-kernel inputs derived from the inside outputs.

    ``neg`` is the empty-ensemble fill and ``one_val`` the unit-ensemble fill
    — (-inf, 0) in log space, (0, 1) in the scaled probability space of
    ops/pallas_fold_prob.py.  ``n_rot`` overrides the per-sequence
    pre-rotation length (the stacked kernels loop each 8-sequence group to
    the group max, so every member must be pre-rotated by 2N - max_n; the
    in-kernel alignment N + step is then identical for all members)."""

    def one_seq(n, nr, ext_d, one_d):
        ONEP = jnp.concatenate(
            [
                jnp.full((1, 2 * N), neg),
                jnp.concatenate(
                    [one_d[: N - 1], jnp.full((N - 1, N), neg)], axis=1
                ),
            ],
            axis=0,
        )
        pvec = jnp.arange(N)
        extL = ext_d[:, 0]                              # ext(0, p)
        extL_sh = jnp.concatenate(
            [jnp.full((1,), one_val), extL[:-1]]
        )                                               # ext(0, i-1)
        extR = jnp.where(
            pvec <= n - 1,
            ext_d[jnp.clip(n - 1 - pvec, 0, N - 1), jnp.clip(pvec, 0, N - 1)],
            one_val,
        )                                               # ext(p, n-1)
        extR_pad = jnp.concatenate([extR, jnp.full((N,), one_val)])
        # pre-rotate the j-anchored tables by (2N - n): the outside kernels
        # then init their rotating scratches with a straight copy instead of
        # a half-swap plus (N - n) catch-up rotations (bucket-, not length-,
        # proportional work), and their per-span rotation count becomes a
        # static function of the step index (enabling the pow-2 lazy block
        # rotation of the live region)
        # roll right by (2N - nr) == dynamic_slice of the doubled buffer at
        # start nr: a traced-shift jnp.roll lowers to a full gather on TPU
        # (measured as the bulk of the 1 ms aux stage at B=192); the
        # concat + DynamicSlice pair streams instead
        nr32 = nr.astype(jnp.int32)
        ONEP = jax.lax.dynamic_slice(
            jnp.concatenate([ONEP, ONEP], axis=-1),
            (jnp.int32(0), nr32),
            (N, 2 * N),
        )
        extR_pad = jax.lax.dynamic_slice(
            jnp.concatenate([extR_pad, extR_pad]), (nr32,), (2 * N,)
        )
        return ONEP, _skew_qone(one_d, N, neg), extL_sh, extR_pad, extR[0]

    if n_rot is None:
        n_rot = ns
    return jax.vmap(one_seq)(ns, n_rot, ext_di, one_di)


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


def _contra_inside_call(mats, ns, ct, B, N, interpret):
    LEN = jnp.broadcast_to(_contra_len_di(ct)[None], (B, W2, W))
    scal_base = jnp.stack(
        [
            ct["external_score_unpair"],
            ct["external_score_basepair"],
            ct["multibranch_score_unpair"],
            ct["multibranch_score_basepair"],
        ]
    )
    scal = jnp.concatenate(
        [
            jnp.broadcast_to(scal_base[None], (B, 4)),
            jnp.zeros((B, 3)),
            ns[:, None].astype(jnp.float32),  # per-seq span-loop bound
        ],
        axis=1,
    ).astype(jnp.float32)[:, None, :]
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(3)
    )
    kernel = functools.partial(_contra_inside_kernel, N=N)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(10)),
            _nn(W2, W),
        ],
        out_specs=(_nn(N, N), _nn(N, N), _nn(N, N)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # CJW (close + jb)
            pltpu.VMEM((2, N + 8), jnp.float32),          # JBR jb ring
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQ
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQM
            pltpu.VMEM((N, N), jnp.float32),              # extS
            pltpu.VMEM((N + 1, N), jnp.float32),          # extrS
            pltpu.VMEM((2, N + 8), jnp.float32),          # mbS 2-row ring
            pltpu.VMEM((N + 1, N), jnp.float32),          # oneS
            pltpu.VMEM((N, N), jnp.float32),              # closeF
        ],
        interpret=interpret,
    )(
        scal,
        mats["H"], mats["MBC"], mats["ACC"], mats["JS"], mats["STK"],
        mats["I11"], mats["B0R"], mats["B0L"], mats["CANON"], mats["JB"],
        LEN,
    )


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def contra_inside_pallas(seqs, ns, ct, N, interpret=False):
    """Batched CONTRA inside pass; returns (close, ext, one) in [d, i]."""
    B = seqs.shape[0]
    mats = contra_precompute_di(seqs, ns, ct, N)
    return _contra_inside_call(mats, ns, ct, B, N, interpret)


@functools.partial(
    jax.jit, static_argnames=("N", "allows_short_hairpins", "interpret")
)
def mccaskill_contra_pallas(
    seqs, ns, ct, N, allows_short_hairpins=False, interpret=False
):
    """Full CONTRA McCaskill (inside + outside) through the fused kernels.

    Returns (bppo, close, ext, one) in [d, i] layout, each (B, N, N).
    Score matrices are precomputed once and shared by both kernels.
    """
    B = seqs.shape[0]
    mats = contra_precompute_di(seqs, ns, ct, N)
    close, ext, one = _contra_inside_call(mats, ns, ct, B, N, interpret)
    ONEP, QONE, extL, extR, glob = contra_outside_aux(ns, ext, one, N)
    LEN = jnp.broadcast_to(_contra_len_di(ct)[None], (B, W2, W))
    scal_base = jnp.stack(
        [
            ct["external_score_unpair"],
            ct["external_score_basepair"],
            ct["multibranch_score_unpair"],
            ct["multibranch_score_basepair"],
        ]
    )
    scal = jnp.concatenate(
        [
            jnp.broadcast_to(scal_base[None], (B, 4)),
            glob[:, None],
            jnp.zeros((B, 2)),
            ns[:, None].astype(jnp.float32),  # per-seq span-loop bound
        ],
        axis=1,
    ).astype(jnp.float32)[:, None, :]

    min_span = 2 if allows_short_hairpins else MIN_SPAN_HAIRPIN_CLOSE
    kernel = functools.partial(_contra_outside_kernel, N=N, min_span=min_span)
    bppo = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(8)),  # CLOSE..JSN
            _nn(N, 2 * N),                   # ONEP
            _nn(N, N),                       # QONE
            _nn(1, N),                       # B0LO
            _nn(1, N),                       # EXTL
            _nn(1, 2 * N),                   # EXTR
            _nn(W2, W),                      # LEN
        ],
        out_specs=_nn(N, N),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # OBG (bppo-close+jsn)
            pltpu.VMEM((2, N + LPAD), jnp.float32),       # JSR jsn ring
            pltpu.VMEM((N, N), jnp.float32),              # XS
            pltpu.VMEM((N, N), jnp.float32),              # RPM
            pltpu.VMEM((N, N), jnp.float32),              # RPM2
            pltpu.VMEM((N, N), jnp.float32),              # bppoF
            pltpu.VMEM((N, 2 * N), jnp.float32),          # SONEF
            pltpu.VMEM((1, 2 * N), jnp.float32),          # REXT
        ],
        interpret=interpret,
    )(
        scal,
        close, mats["MBC"], mats["ACC"], mats["STKO"], mats["I11O"],
        mats["B0RO"], mats["JB"], mats["JS"],
        ONEP, QONE,
        mats["B0LO"][:, None, :], extL[:, None, :],
        extR[:, None, :], LEN,
    )
    return bppo, close, ext, one


# ---------------------------------------------------------------------------
# Turner kernels (utils.rs:162-411 scoring; same wavefront/slide machinery)
# ---------------------------------------------------------------------------

def _turner_tl(
    a, bi, d, blk, T1W, T2W, T3W, lane_off,
    SP00, SP01, SP10, SP11, SP12, SP21, SP22,
    TM1, TM2, TM3, AUGT, LENB, LENI,
):
    """(h, N) Turner 2-loop ``tl`` for static lane shift ``a``.

    Window loads are the kernels' cost driver, so ``blk`` comes in as ONE
    merged buffer (state + helix-end aug of the window pair precombined at
    insertion) and the tm-family select (utils.rs:331-366) reads at most one
    tm window block per shift: family-1 rows (b == 1, or all of a == 1) and
    the two 2x3 cells are single static scratch rows, everything else is the
    generic-interior block.  The small-loop replacement tables (SP*) are
    pre-corrected on the host for the aug baked into ``blk``
    (turner_precompute_di).  Returns body + blk with the loop-length cap.
    """
    h = bi.shape[0]
    N = blk.shape[1]
    aug_row = _row3(AUGT, d)
    lenb = LENB[0, pl.ds(0, h), pl.ds(a, 1)]
    if a == 0:
        body = lenb + aug_row            # whole column is bulge
    else:
        is_1 = (a == 1) | (bi == 1)
        is_23 = ((a == 2) & (bi == 3)) | ((a == 3) & (bi == 2))
        tmo = jnp.where(
            is_1, _row3(TM2, d), jnp.where(is_23, _row3(TM3, d), _row3(TM1, d))
        )
        if a == 1:
            w_tmi = T2W[pl.ds(a + 1, h), pl.ds(lane_off, N)]
        else:
            w_tmi = T1W[pl.ds(a + 1, h), pl.ds(lane_off, N)]
            w_tmi = jnp.where(
                bi == 1, T2W[pl.ds(a + 2, 1), pl.ds(lane_off, N)], w_tmi
            )
            if a == 2:
                w_tmi = jnp.where(
                    bi == 3, T3W[pl.ds(a + 4, 1), pl.ds(lane_off, N)], w_tmi
                )
            elif a == 3:
                w_tmi = jnp.where(
                    bi == 2, T3W[pl.ds(a + 3, 1), pl.ds(lane_off, N)], w_tmi
                )
        leni = LENI[0, pl.ds(0, h), pl.ds(a, 1)]
        body = jnp.where(
            bi == 0, lenb + aug_row, leni + tmo + w_tmi + aug_row
        )
    if a == 0:
        body = jnp.where(bi == 0, _row3(SP00, d), body)
        body = jnp.where(bi == 1, _row3(SP01, d), body)
    elif a == 1:
        body = jnp.where(bi == 0, _row3(SP10, d), body)
        body = jnp.where(bi == 1, _row3(SP11, d), body)
        body = jnp.where(bi == 2, _row3(SP12, d), body)
    elif a == 2:
        body = jnp.where(bi == 1, _row3(SP21, d), body)
        body = jnp.where(bi == 2, _row3(SP22, d), body)
    return jnp.where(a + bi <= MAX_LOOP_LEN, body, NEG_INF) + blk


def _turner_inside_kernel(
    SCAL,
    H, MBC, ACC, CANON,
    STKT, B01, B10, I11T, I12T, I21T, I22T,
    TMo1, TMo2, TMo3, AUGT, TMi1N, TMi2N, TMi3N,
    LENB, LENI,
    close_out, ext_out, one_out,
    CAW, T1W, T2W, T3W, FQ, extS, extrS, mbS, oneS, closeF,
    *, N,
):
    coeff = SCAL[0, 0, 0]  # COEFF_NUM_BRANCHES
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    # CAW = close + helix-end aug precombined (the specials come in
    # host-pre-corrected, turner_precompute_di)
    for buf in (CAW, FQ, mbS, oneS, closeF, T1W, T2W, T3W):
        buf[:] = jnp.full_like(buf[:], NEG_INF)
    extS[:] = jnp.zeros_like(extS[:])
    extrS[:] = jnp.zeros_like(extrS[:])

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (W2, 1), 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    neg_row = jnp.full((1, N), NEG_INF)

    def span_step(d, carry):
        (rm_prev,) = carry
        two = neg_row
        for a in range(W):
            h = _win_rows(a)
            bi = b_idx[:h]
            blk = CAW[pl.ds(a + 1, h), pl.ds(1 + a, N)]
            tl = _turner_tl(
                a, bi, d, blk, T1W, T2W, T3W, 1 + a,
                STKT, B01, B10, I11T, I12T, I21T, I22T,
                TMo1, TMo2, TMo3, AUGT, LENB, LENI,
            )
            two = lse_pair(two, _lse_rows(tl))
        # mb(i+1, j-1): 2-row shift register; static row + 1-lane offset
        mb_in = mbS[pl.ds(1, 1), pl.ds(1, N)]
        mb_term = jnp.where(d >= 2, mb_in + _row3(MBC, d), NEG_INF)
        close_new = lse_pair(lse_pair(_row3(H, d), two), mb_term)
        close_new = close_new + _row3(CANON, d)
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, NEG_INF
        )
        closeF[pl.ds(d, 1), :] = close_new
        acc_new = close_new + _row3(ACC, d)

        rm_new = lse_pair(rm_prev, acc_new)

        # live-region truncation: see the CONTRA inside kernel (rows past d
        # hold -inf — exact identities of the pow-2 lse trees)
        def tail(ht):
            tb = t_idx[:ht]
            shifted = FQ[pl.ds(0, ht - 1), pl.ds(1, N + 7)]
            FQ[pl.ds(1, ht - 1), pl.ds(0, N + 7)] = shifted
            FQ[pl.ds(0, 1), pl.ds(0, N)] = rm_new

            qblk = FQ[pl.ds(0, ht), pl.ds(0, N)]
            eblk = extrS[pl.ds(0, ht), :]
            terms = jnp.where(tb <= d - 1, qblk + eblk, NEG_INF)
            ext_new = lse_pair(jnp.full((1, N), 0.0), _lse_rows(terms))
            extS[pl.ds(d, 1), :] = ext_new
            extrS[pl.ds(d + 1, 1), :] = ext_new

            # multibranch: x = rm(k, j) + coeff, t in [1, d-1]
            # (mccaskill:364-374)
            x = jnp.where(
                (tb >= 1) & (tb <= d - 1), qblk + coeff, NEG_INF
            )
            s1 = lse_pair(rm_new + coeff, _lse_rows(x))
            oblk = oneS[pl.ds(0, ht), :]
            s2 = _lse_rows(oblk + x)
            mbS[pl.ds(1, 1), :] = mbS[pl.ds(0, 1), :]
            mbS[pl.ds(0, 1), pl.ds(0, N)] = s2
            oneS[pl.ds(d + 1, 1), :] = lse_pair(s1, s2)

        prev = 0
        for ht in _live_heights(N):
            cond = d < ht if prev == 0 else (d >= prev) & (d < ht)
            pl.when(cond)(functools.partial(tail, ht))
            prev = ht

        _shift_insert(CAW, close_new + _row3(AUGT, d))
        _shift_insert(T1W, _row3(TMi1N, d))
        _shift_insert(T2W, _row3(TMi2N, d))
        _shift_insert(T3W, _row3(TMi3N, d))
        return (rm_new,)

    # Spans >= n are dead (same argument as the CONTRA kernels).
    lax.fori_loop(0, n_i, span_step, (neg_row,))

    close_out[0] = closeF[:]
    ext_out[0] = extS[:]
    one_out[0] = oneS[pl.ds(1, N), :]


def _turner_outside_kernel(
    SCAL,
    CLOSE, MBC, ACC,
    STKT, B01, B10, I11T, I12T, I21T, I22T,
    TMo1N, TMo2N, TMo3N, AUGT, TMi1R, TMi2R, TMi3R,
    ONEP, QONE,
    EXTL, EXTR,
    LENB, LENI,
    bppo_out,
    OG, T1W, T2W, T3W, XS, RPM, RPM2, bppoF, SONEF, REXT,
    *, N, min_span,
):
    coeff = SCAL[0, 0, 0]
    glob = SCAL[0, 0, 4]
    n_i = SCAL[0, 0, 7].astype(jnp.int32)

    # OG = bppo - close + aug(window pair) precombined; specials come in
    # host-pre-corrected (turner_precompute_di)
    for buf in (OG, T1W, T2W, T3W, XS, RPM, RPM2, bppoF):
        buf[:] = jnp.full_like(buf[:], NEG_INF)
    # ONEP/EXTR arrive pre-rotated by (2N - n) from contra_outside_aux:
    # straight-copy init, static per-step rotation count (see the CONTRA
    # outside kernel)
    SONEF[pl.ds(0, N), :] = ONEP[0, pl.ds(0, N), :]
    REXT[pl.ds(0, 1), :] = EXTR[0, pl.ds(0, 1), :]

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (W2, 1), 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    s_qone = QONE[0, pl.ds(0, N), pl.ds(0, N)]
    # span-invariant merge of the two r_pm multibranch contexts (bare run
    # and the one(k+1, i-1) factor): one tree reduce per span, not two.
    s_qone_mb = lse_pair(s_qone, jnp.zeros((N, N), jnp.float32))
    C2 = SONEF.shape[1]

    def span_step(step, carry):
        d = N - 1 - step
        k = step - (N - n_i)      # completed spans: live scratch rows <= k
        span_ok = (d + 1) >= min_span

        close_row = _row3(CLOSE, d)
        acc_row = close_row + _row3(ACC, d)
        lt = EXTL[0, pl.ds(0, 1), :]
        rt = REXT[pl.ds(0, 1), pl.ds(0, N)]
        base = lt + acc_row + rt - glob

        two = jnp.full((1, N), NEG_INF)
        for a in range(W):
            h = _win_rows(a)
            bi = b_idx[:h]
            blk = OG[pl.ds(a + 1, h), pl.ds(31 - a, N)]
            tl = _turner_tl(
                a, bi, d, blk, T1W, T2W, T3W, 31 - a,
                STKT, B01, B10, I11T, I12T, I21T, I22T,
                TMi1R, TMi2R, TMi3R, AUGT, LENB, LENI,
            )
            term = tl + close_row
            two = lse_pair(two, _lse_rows(term))
        acc_mb = acc_row + coeff
        augt_row = _row3(AUGT, d)
        mbc_row = _row3(MBC, d)

        # live-region truncation + lazy pow-2 block rotation: see the
        # CONTRA outside kernel (same bit-exactness argument)
        def tail(ht):
            tb = t_idx[:ht]
            Xr = XS[pl.ds(0, ht), :]
            s_one = SONEF[pl.ds(0, ht), pl.ds(0, N)]
            pm_new = jnp.where(span_ok, _lse_rows(Xr + s_one), NEG_INF)
            pm2_new = jnp.where(span_ok, _lse_rows(Xr), NEG_INF)

            for buf, row in ((RPM, pm_new), (RPM2, pm2_new)):
                shifted = buf[pl.ds(0, ht - 1), pl.ds(0, N - 1)]
                buf[pl.ds(1, ht - 1), pl.ds(1, N - 1)] = shifted
                buf[pl.ds(1, ht - 1), pl.ds(0, 1)] = jnp.full(
                    (ht - 1, 1), NEG_INF
                )
                buf[pl.ds(0, 1), pl.ds(0, N)] = row

            r_pm = RPM[pl.ds(0, ht), pl.ds(0, N)]
            r_pm2 = RPM2[pl.ds(0, ht), pl.ds(0, N)]
            m1 = tb >= 1
            terms_a = jnp.where(m1, acc_mb + r_pm2 + s_qone[:ht], NEG_INF)
            terms_bc = jnp.where(
                m1, acc_mb + r_pm + s_qone_mb[:ht], NEG_INF
            )
            mb_ctx = lse_pair(_lse_rows(terms_a), _lse_rows(terms_bc))

            bppo_new = lse_pair(lse_pair(base, two), mb_ctx)
            bppo_new = jnp.where(
                (close_row > NEG_INF) & span_ok, bppo_new, NEG_INF
            )
            bppoF[pl.ds(d, 1), :] = bppo_new

            g2 = jnp.where(
                close_row > NEG_INF,
                bppo_new - close_row + augt_row,
                NEG_INF,
            )
            _shift_insert(OG, g2, lane_off=32)
            _shift_insert(T1W, _row3(TMo1N, d), lane_off=32)
            _shift_insert(T2W, _row3(TMo2N, d), lane_off=32)
            _shift_insert(T3W, _row3(TMo3N, d), lane_off=32)
            g_row = jnp.where(
                close_row > NEG_INF,
                bppo_new + mbc_row - close_row,
                NEG_INF,
            )
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

    # Spans >= n are dead: start at d = n - 1 (same as the CONTRA outside).
    lax.fori_loop(N - n_i, N, span_step, 0)
    bppo_out[0] = bppoF[:]


def turner_precompute_di(seqs, ns, tt, N):
    """Per-sequence [d, i] Turner score matrices for both kernels.

    Three phases: (1) vmapped position-separable one-hot MXU contractions
    build every table in [p, q] layout (ops.lut.sep_lookup — no (N, N)
    scalar-unit gathers); (2) ONE fused Pallas pass re-lays all of them
    out diagonally (ops.pallas_skew.skew_pq_batch — bitwise-equal to
    diag.skew_pq but one VMEM round trip instead of ~7 HBM-materialized
    select levels per table); (3) batched assembly in [d, i] (hairpin
    cases, aug corrections, and the outside small-loop translations).
    Same edge-fill/masking argument as contra_precompute_di."""
    from .pallas_skew import skew_pq_batch

    stk = tt["stack"]
    i1 = tt["int_1x1"]
    i2 = tt["int_1x2"]
    i4 = tt["int_2x2"]
    b1 = tt["bulge_init"][1]

    def one_pq(seq, n):
        pvec = jnp.arange(N)
        x0 = seq
        x1, x2, x3 = (S.sget(seq, pvec + k) for k in (1, 2, 3))
        m1, m2, m3 = (S.sget(seq, pvec - k) for k in (1, 2, 3))
        qv = pvec[None, :]
        pv = pvec[:, None]

        augu_pq = SEP(S.AUGU_MAT, (x0,), (x0,)) * tt["augu_penalty"]

        # multibranch close (utils.rs:368-382): reversed pair indexing
        MBCpq = (
            tt["init_multibranch_base"]
            + SEP(tt["tm_multibranch"], (x0, x1), (x0, m1), perm=(1, 3, 0, 2))
            + augu_pq
        )

        # accessible (utils.rs:384-411), boundary-cased
        c_tm = SEP(tt["tm_multibranch"], (x0, m1), (x0, x1), perm=(0, 2, 1, 3))
        c_d5 = SEP(tt["dangle5"], (x0, m1), (x0,), perm=(0, 2, 1))
        c_d3 = SEP(tt["dangle3"], (x0,), (x0, x1))
        has_l = pv > 0
        has_r = qv < n - 1
        ACCpq = (
            jnp.where(
                has_l & has_r,
                c_tm,
                jnp.where(has_l, c_d5, jnp.where(has_r, c_d3, 0.0)),
            )
            + augu_pq
        )

        canon_pq = SEP(S.CANON_MAT.astype(jnp.float32), (x0,), (x0,)) * (
            qv < n
        )

        # terminal-mismatch families: outer TMo_f = TM_f at (i, j) and
        # inner TMi_f[r,c] = TM_f[x_{r+c}, x_r, s(r+c+1), s(r-1)]
        tm_o = lambda f: SEP(tt[f], (x0, x1), (x0, m1), perm=(0, 2, 1, 3))
        tm_i = lambda f: SEP(tt[f], (x0, m1), (x0, x1), perm=(1, 3, 0, 2))

        pq = {
            "AUG": augu_pq,
            "TMH": tm_o("tm_hairpin"),
            "MBC": MBCpq,
            "ACC": ACCpq,
            "CANON": canon_pq,
            "TMo1": tm_o("tm_interior"),
            "TMo2": tm_o("tm_1xmany"),
            "TMo3": tm_o("tm_2x3"),
            "TMi1": tm_i("tm_interior"),
            "TMi2": tm_i("tm_1xmany"),
            "TMi3": tm_i("tm_2x3"),
            # small-loop replacement raws (utils.rs:207-321)
            "STK": SEP(stk, (x0, x1), (x0, m1), perm=(0, 2, 1, 3)),
            "B01": b1 + SEP(stk, (x0, x1), (x0, m2), perm=(0, 2, 1, 3)),
            "B10": b1 + SEP(stk, (x0, x2), (x0, m1), perm=(0, 2, 1, 3)),
            "I11": SEP(i1, (x0, x1, x2), (x0, m1, m2),
                       perm=(0, 2, 4, 1, 3, 5)),
            "I12": SEP(i2, (x0, x1, x2), (x0, m1, m2, m3),
                       perm=(0, 2, 5, 1, 3, 4, 6)),
            "I21": SEP(i2, (x3, x2, x1, x0), (m2, m1, x0),
                       perm=(1, 3, 4, 6, 0, 2, 5)),
            "I22": SEP(i4, (x0, x1, x2, x3), (x0, m1, m2, m3),
                       perm=(0, 2, 4, 6, 1, 3, 5, 7)),
        }
        return pq, S.special_hairpin_id(seq, tt, N)

    pq, H_sp_id = jax.vmap(one_pq)(seqs, ns)
    names = sorted(pq)
    skewed = skew_pq_batch([pq[k] for k in names])       # [p, d] each
    sk = {
        k: jnp.transpose(v, (0, 2, 1))                   # -> [d, i]
        for k, v in zip(names, skewed)
    }

    aug_di = sk["AUG"]
    di = jnp.arange(N)[:, None]
    ii = jnp.arange(N)[None, :]

    def aug_at(dd, ll):
        """aug_di[d + dd, i + ll] (0 outside) — the helix-end aug of the
        window-pair cell a small-loop replacement table covers.  The
        kernels' merged window buffers carry close/bppo + aug precombined,
        so the replacement tables subtract it here (host, off the kernel
        hot path) instead of reading a second block."""
        r = jnp.roll(aug_di, (-dd, -ll), axis=(1, 2))
        ok = (di + dd >= 0) & (di + dd < N) & (ii + ll >= 0) & (ii + ll < N)
        return jnp.where(ok[None], r, 0.0)

    def shift_b(M, dd, ll):
        """Batched diag.shift_di: OUT[d, i] = M[d + dd, i + ll], 0 fill."""
        r = jnp.roll(M, (-dd, -ll), axis=(1, 2))
        ok = (di + dd >= 0) & (di + dd < N) & (ii + ll >= 0) & (ii + ll < N)
        return jnp.where(ok[None], r, 0.0)

    # hairpin (utils.rs:166-205); hlen = d - 1 along the span axis
    hlen = di - 1
    init_in = tt["hairpin_init"][
        jnp.clip(hlen, 0, MAX_HAIRPIN_LEN_EXTRAPOLATION)
    ]
    extrap = tt["hairpin_init"][MIN_HAIRPIN_LEN_EXTRAPOLATION - 1] + tt[
        "coeff_hairpin_extrap"
    ] * jnp.log(
        jnp.maximum(hlen, 1).astype(jnp.float32)
        / np.float32(MIN_HAIRPIN_LEN_EXTRAPOLATION - 1)
    )
    init = jnp.where(hlen <= MAX_HAIRPIN_LEN_EXTRAPOLATION, init_in, extrap)
    generic = jnp.where(
        hlen == MIN_HAIRPIN_LEN,
        tt["hairpin_init"][jnp.clip(hlen, 0, MAX_LOOP_LEN)],
        init + sk["TMH"],
    ) + aug_di
    H_sp_di = jnp.transpose(H_sp_id, (0, 2, 1))

    out = {
        "H": jnp.where(jnp.isfinite(H_sp_di), H_sp_di, generic),
        "MBC": sk["MBC"],
        "ACC": sk["ACC"],
        "CANON": jnp.where(sk["CANON"] > 0.5, 0.0, NEG_INF),
        "AUGT": aug_di,
        "TMo1": sk["TMo1"],
        "TMo2": sk["TMo2"],
        "TMo3": sk["TMo3"],
        "TMi1": sk["TMi1"],
        "TMi2": sk["TMi2"],
        "TMi3": sk["TMi3"],
    }

    # Small-loop replacement tables: each raw [d, i] grid is used TWICE —
    # the inside variant subtracts the inner-pair aug (the merged CAW
    # window buffer carries it), and the outside variant — whose raw score
    # for inner pair (i, j) / outer (i-1-a, j+1+b) is the SAME table entry
    # the inside grid selects at [d + (a+b+2), i - (a+1)] — is a pure
    # translation minus the outer-pair aug.  One fused roll+mask each
    # replaces 7 sep_lookup contractions + 7 skews; bitwise equal at every
    # cell whose outer pair is on-grid, and off-grid cells only ever
    # multiply zero/-inf outside weights in the kernels.
    _raw_off = {
        # name: (a+b+2 span offset, a+1 left offset)
        "STK": (2, 1), "B01": (3, 1), "B10": (3, 2), "I11": (4, 2),
        "I12": (5, 2), "I21": (5, 3), "I22": (6, 3),
    }
    _in_name = {"STK": "STKT", "I11": "I11T", "I12": "I12T",
                "I21": "I21T", "I22": "I22T"}
    for key, (p, l) in _raw_off.items():
        raw = sk[key]
        out[_in_name.get(key, key)] = raw - aug_at(-p, l)
        out[key + "O"] = shift_b(raw, p, -l) - aug_at(p, -l)
    return out


def _turner_len_di(tt):
    """(W2, W) bulge-init and interior-init+NINIO constants ([b, a])."""
    init_int, init_bulge, ninio = S._turner_len_consts(tt)  # [a, b]
    LENI = (init_int + ninio).T
    LENB = init_bulge.T
    pad = jnp.zeros((1, W))
    return (
        jnp.concatenate([LENB, pad], axis=0),
        jnp.concatenate([LENI, pad], axis=0),
    )


def _turner_inside_call(mats, ns, tt, B, N, interpret):
    LENB, LENI = _turner_len_di(tt)
    LENB = jnp.broadcast_to(LENB[None], (B, W2, W))
    LENI = jnp.broadcast_to(LENI[None], (B, W2, W))
    scal = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.stack([tt["coeff_num_branches"]])[None], (B, 1)
            ),
            jnp.zeros((B, 6)),
            ns[:, None].astype(jnp.float32),  # per-seq span-loop bound
        ],
        axis=1,
    ).astype(jnp.float32)[:, None, :]
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(3)
    )
    kernel = functools.partial(_turner_inside_kernel, N=N)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(18)),
            _nn(W2, W), _nn(W2, W),
        ],
        out_specs=(_nn(N, N), _nn(N, N), _nn(N, N)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # CAW (close + aug)
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T1W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T2W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T3W
            pltpu.VMEM((N, N + 8), jnp.float32),          # FQ
            pltpu.VMEM((N, N), jnp.float32),              # extS
            pltpu.VMEM((N + 1, N), jnp.float32),          # extrS
            pltpu.VMEM((2, N + 8), jnp.float32),          # mbS 2-row ring
            pltpu.VMEM((N + 1, N), jnp.float32),          # oneS
            pltpu.VMEM((N, N), jnp.float32),              # closeF
        ],
        interpret=interpret,
    )(
        scal,
        mats["H"], mats["MBC"], mats["ACC"], mats["CANON"],
        mats["STKT"], mats["B01"], mats["B10"], mats["I11T"],
        mats["I12T"], mats["I21T"], mats["I22T"],
        mats["TMo1"], mats["TMo2"], mats["TMo3"], mats["AUGT"],
        mats["TMi1"], mats["TMi2"], mats["TMi3"],
        LENB, LENI,
    )


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def turner_inside_pallas(seqs, ns, tt, N, interpret=False):
    """Batched Turner inside pass; returns (close, ext, one) in [d, i]."""
    B = seqs.shape[0]
    mats = turner_precompute_di(seqs, ns, tt, N)
    return _turner_inside_call(mats, ns, tt, B, N, interpret)


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def mccaskill_turner_pallas(seqs, ns, tt, N, interpret=False):
    """Full Turner McCaskill (inside + outside) through the fused kernels.

    Score matrices are precomputed once and shared by both kernels."""
    B = seqs.shape[0]
    mats = turner_precompute_di(seqs, ns, tt, N)
    close, ext, one = _turner_inside_call(mats, ns, tt, B, N, interpret)
    ONEP, QONE, extL, extR, glob = contra_outside_aux(ns, ext, one, N)

    LENB, LENI = _turner_len_di(tt)
    LENB = jnp.broadcast_to(LENB[None], (B, W2, W))
    LENI = jnp.broadcast_to(LENI[None], (B, W2, W))
    scal = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.stack([tt["coeff_num_branches"]] + [jnp.float32(0.0)] * 3)[None],
                (B, 4),
            ),
            glob[:, None],
            jnp.zeros((B, 2)),
            ns[:, None].astype(jnp.float32),  # per-seq span-loop bound
        ],
        axis=1,
    ).astype(jnp.float32)[:, None, :]

    kernel = functools.partial(
        _turner_outside_kernel, N=N, min_span=MIN_SPAN_HAIRPIN_CLOSE
    )
    bppo = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            _SMEM_SPEC,
            *(_nn(N, N) for _ in range(17)),  # CLOSE..TMi3R
            _nn(N, 2 * N),                    # ONEP
            _nn(N, N),                        # QONE
            _nn(1, N),                        # EXTL
            _nn(1, 2 * N),                    # EXTR
            _nn(W2, W), _nn(W2, W),           # LENB LENI
        ],
        out_specs=_nn(N, N),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # OG (bppo-close+aug)
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T1W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T2W
            pltpu.VMEM((WROWS, N + LPAD), jnp.float32),   # T3W
            pltpu.VMEM((N, N), jnp.float32),              # XS
            pltpu.VMEM((N, N), jnp.float32),              # RPM
            pltpu.VMEM((N, N), jnp.float32),              # RPM2
            pltpu.VMEM((N, N), jnp.float32),              # bppoF
            pltpu.VMEM((N, 2 * N), jnp.float32),          # SONEF
            pltpu.VMEM((1, 2 * N), jnp.float32),          # REXT
        ],
        interpret=interpret,
    )(
        scal,
        close, mats["MBC"], mats["ACC"],
        mats["STKO"], mats["B01O"], mats["B10O"], mats["I11O"],
        mats["I12O"], mats["I21O"], mats["I22O"],
        mats["TMo1"], mats["TMo2"], mats["TMo3"], mats["AUGT"],
        mats["TMi1"], mats["TMi2"], mats["TMi3"],
        ONEP, QONE,
        extL[:, None, :], extR[:, None, :],
        LENB, LENI,
    )
    return bppo, close, ext, one
