"""Fused Pallas TPU kernels for the McCaskill wavefronts (CONTRAfold model).

The XLA scan in models/mccaskill.py re-materializes padded state buffers and
window tensors in HBM every span.  At RNA scale the *entire* DP state is a few
hundred KB, so these kernels keep every state table resident in VMEM for the
whole wavefront and unroll the 31-wide 2-loop window as static sublane
blocks — zero HBM traffic inside the span loop, no gather ops.

Layout: span-major ``[d, i]`` — row d of a table is the whole anti-diagonal
(span d+1) with sequence position on the 128-lane axis.  The three access
patterns of the recurrences then map to hardware-friendly reads:

* 2-loop window  ``close(i+1+a, d-2-a-b)``  -> for each static a: one
  (31, N) sublane block at dynamic row offset, static lane shift, flipped;
* bifurcations   ``rm(i+t, i+d)``           -> one (N, N) block of the
  right-layout table at dynamic row offset, flipped sublanes;
* incremental    ``rm(i, d-1)``             -> single-row reads.

Scoring is fully precomputed per sequence as [d, i] matrices so the kernel is
pure log-space arithmetic.  Reference recurrences:
/root/reference/src/mccaskill_algo.rs:380-516 (inside).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    MAX_LOOP_LEN,
    MIN_SPAN_HAIRPIN_CLOSE,
    NEG_INF,
    PSEUDO_BASE,
)
from ..numerics import lse_pair
from . import scores as S

W = 31        # 2-loop window extent (MAX_LOOP_LEN + 1)
ROWPAD = 32   # top row padding of windowed scratch/input tables
LANEPAD = 33  # left lane padding for the static +1+a shifts


def _lse_rows(x):
    """Tree-LSE over axis 0 (sublanes), returns (1, lanes)."""
    n = x.shape[0]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        x = jnp.concatenate(
            [x, jnp.full((p - n,) + x.shape[1:], NEG_INF, x.dtype)], axis=0
        )
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = lse_pair(x[:h], x[h:])
    return x


def _row2(ref, r):
    """(1, lanes) dynamic row read of a 2-D scratch ref."""
    return ref[pl.ds(r, 1), :]


def _row3(ref, r):
    """(1, lanes) dynamic row read of a (1, R, C) input ref."""
    return ref[0, pl.ds(r, 1), :]


def _contra_inside_kernel(
    SCAL,                                   # (1, 1, 8) SMEM scalars
    H, MBC, ACC, JS, STK, I11, B0R, B0L, CANON,   # (1, N, N) [d, i]
    JBPAD,                                  # (1, ROWPAD+N, LANEPAD+N+W+2)
    LEN,                                    # (1, W, W) [b, a]
    close_out, ext_out, one_out,            # (1, N, N)
    closeS, qrmS, qrmmbS, rmS, rmmbS, extS, extrS, mbS, oneS,
    *, N,
):
    ext_unpair = SCAL[0, 0, 0]
    ext_bp = SCAL[0, 0, 1]
    mb_unpair = SCAL[0, 0, 2]
    mb_bp = SCAL[0, 0, 3]

    closeS[:] = jnp.full_like(closeS[:], NEG_INF)
    qrmS[:] = jnp.full_like(qrmS[:], NEG_INF)
    qrmmbS[:] = jnp.full_like(qrmmbS[:], NEG_INF)
    rmS[:] = jnp.full_like(rmS[:], NEG_INF)
    rmmbS[:] = jnp.full_like(rmmbS[:], NEG_INF)
    extS[:] = jnp.zeros_like(extS[:])
    extrS[:] = jnp.zeros_like(extrS[:])
    mbS[:] = jnp.full_like(mbS[:], NEG_INF)
    oneS[:] = jnp.full_like(oneS[:], NEG_INF)

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

    def span_step(d, carry):
        # ---- close: hairpin + 2-loop window + multibranch closure ----
        js_row = _row3(JS, d)
        two = jnp.full((1, N), NEG_INF)
        for a in range(W):
            r0 = ROWPAD + d - 2 - a - (W - 1)
            blk_c = closeS[pl.ds(r0, W), pl.ds(LANEPAD + 1 + a, N)]
            blk_j = JBPAD[0, pl.ds(r0, W), pl.ds(LANEPAD + 1 + a, N)]
            blk_c = jnp.flip(blk_c, axis=0)
            blk_j = jnp.flip(blk_j, axis=0)
            body = js_row + blk_j + LEN[0, :, a : a + 1]
            if a == 0:
                body = jnp.where(b_idx == 0, _row3(STK, d), body)
                body = jnp.where(b_idx == 1, body + _row3(B0R, d), body)
            elif a == 1:
                body = jnp.where(b_idx == 0, body + _row3(B0L, d), body)
                body = jnp.where(b_idx == 1, body + _row3(I11, d), body)
            tl = jnp.where(a + b_idx <= MAX_LOOP_LEN, body, NEG_INF) + blk_c
            two = lse_pair(two, _lse_rows(tl))
        mb_row = _row2(mbS, jnp.maximum(d - 2, 0))
        mb_in = jnp.concatenate(
            [mb_row[:, 1:], jnp.full((1, 1), NEG_INF)], axis=1
        )
        mb_term = jnp.where(d >= 2, mb_in + _row3(MBC, d), NEG_INF)
        close_new = lse_pair(lse_pair(_row3(H, d), two), mb_term)
        close_new = close_new + _row3(CANON, d)     # 0 / -inf mask
        close_new = jnp.where(
            d + 1 >= MIN_SPAN_HAIRPIN_CLOSE, close_new, NEG_INF
        )
        closeS[pl.ds(ROWPAD + d, 1), pl.ds(LANEPAD, N)] = close_new
        acc_new = close_new + _row3(ACC, d)

        # ---- rightmost-basepair sums (incremental across spans) ----
        prev_rm = jnp.where(
            d >= 1, _row2(rmS, jnp.maximum(d - 1, 0)), NEG_INF
        )
        rm_new = lse_pair(prev_rm + ext_unpair, acc_new + ext_bp)
        prev_rmmb = jnp.where(
            d >= 1, _row2(rmmbS, jnp.maximum(d - 1, 0)), NEG_INF
        )
        rmmb_new = lse_pair(prev_rmmb + mb_unpair, acc_new + mb_bp)
        rmS[pl.ds(d, 1), :] = rm_new
        rmmbS[pl.ds(d, 1), :] = rmmb_new
        # right layout: Q[N + dd, j] = rm(j - dd, j); row d at lane offset d
        qrmS[pl.ds(N + d, 1), pl.ds(d, N)] = rm_new
        qrmmbS[pl.ds(N + d, 1), pl.ds(d, N)] = rmmb_new

        # ---- external: terms[t, i] = rm(i+t, i+d) + ext(i, i+t-1) ----
        qblk = jnp.flip(qrmS[pl.ds(d + 1, N), pl.ds(d, N)], axis=0)
        eblk = extrS[pl.ds(0, N), :]
        terms = jnp.where(t_idx <= d - 1, qblk + eblk, NEG_INF)
        base = ext_unpair * (d + 1).astype(jnp.float32)
        ext_new = lse_pair(jnp.full((1, N), 0.0) + base, _lse_rows(terms))
        extS[pl.ds(d, 1), :] = ext_new
        extrS[pl.ds(d + 1, 1), :] = ext_new

        # ---- multibranch / one-or-more: t in [1, d-1] ----
        qmblk = jnp.flip(qrmmbS[pl.ds(d + 1, N), pl.ds(d, N)], axis=0)
        x = jnp.where((t_idx >= 1) & (t_idx <= d - 1), qmblk, NEG_INF)
        s1 = lse_pair(
            rmmb_new, _lse_rows(x + mb_unpair * t_idx.astype(jnp.float32))
        )
        oblk = jnp.concatenate(
            [jnp.full((1, N), NEG_INF), oneS[pl.ds(0, N - 1), :]], axis=0
        )
        s2 = _lse_rows(oblk + x)
        mbS[pl.ds(d, 1), :] = s2
        oneS[pl.ds(d, 1), :] = lse_pair(s1, s2)
        return carry

    lax.fori_loop(0, N, span_step, 0)

    close_out[0] = closeS[pl.ds(ROWPAD, N), pl.ds(LANEPAD, N)]
    ext_out[0] = extS[:]
    one_out[0] = oneS[:]


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

def contra_precompute_di(seqs, ns, ct, N):
    """Per-sequence [d, i]-layout score matrices for the kernel (batched).

    Same quantities as ops.scores.precompute_contra plus the per-cell 2-loop
    corrections (stack / 0x1 / 1x1), transposed to span-major.
    """

    def one(seq, n):
        pre = S.precompute_contra(seq, n, N, ct)
        i = jnp.arange(N)[:, None]
        dd = jnp.arange(N)[None, :]
        j = i + dd
        s_i1 = S.sget(seq, i + 1) * jnp.ones_like(dd)
        s_j1 = S.sget(seq, j - 1)
        xi = seq[:, None] * jnp.ones_like(dd)
        xj = S.sget(seq, j)
        STK = (
            ct["stack_scores"][xi, xj, s_i1, s_j1]
            + ct["basepair_scores"][s_i1, s_j1]
        )
        B0R = ct["bulge_scores_0x1"][s_j1]
        B0L = ct["bulge_scores_0x1"][s_i1]
        I11 = ct["interior_scores_1x1"][s_i1, s_j1]
        canon_f = jnp.where(pre["canon"], 0.0, NEG_INF).astype(jnp.float32)
        JB = pre["JSrev"] + pre["BP"]
        JBPAD = jnp.full(
            (ROWPAD + N, LANEPAD + N + W + 2), 0.0, dtype=jnp.float32
        )
        JBPAD = lax.dynamic_update_slice(JBPAD, JB.T, (ROWPAD, LANEPAD))
        mats = {
            "H": pre["H"].T,
            "MBC": pre["MBC"].T,
            "ACC": pre["ACC"].T,
            "JS": pre["JS"].T,
            "STK": STK.T,
            "I11": I11.T,
            "B0R": B0R.T,
            "B0L": B0L.T,
            "CANON": canon_f.T,
            "JBPAD": JBPAD,
        }
        return mats

    return jax.vmap(one)(seqs, ns)


def _contra_len_di(ct):
    """(W, W) [b, a] length/feature constants of the 2-loop body."""
    bulge, interior = S._contra_len_consts(ct)  # [a, b]
    a, b = S._AGRID, S._BGRID
    body = jnp.where((a == 0) | (b == 0), bulge, interior)
    return body.T  # [b, a]


@functools.partial(jax.jit, static_argnames=("N", "interpret"))
def contra_inside_pallas(seqs, ns, ct, N, interpret=False):
    """Batched CONTRA inside pass via the fused kernel.

    Returns (close, ext, one) in [d, i] layout, shape (B, N, N).
    """
    B = seqs.shape[0]
    mats = contra_precompute_di(seqs, ns, ct, N)
    LEN = jnp.broadcast_to(_contra_len_di(ct)[None], (B, W, W))
    scal = jnp.broadcast_to(
        jnp.stack(
            [
                ct["external_score_unpair"],
                ct["external_score_basepair"],
                ct["multibranch_score_unpair"],
                ct["multibranch_score_basepair"],
                jnp.float32(0.0),
                jnp.float32(0.0),
                jnp.float32(0.0),
                jnp.float32(0.0),
            ]
        )[None, None],
        (B, 1, 8),
    )

    nn = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, N, N), jnp.float32) for _ in range(3)
    )
    kernel = functools.partial(_contra_inside_kernel, N=N)
    close, ext, one = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            *(nn(N, N) for _ in range(9)),
            nn(ROWPAD + N, LANEPAD + N + W + 2),
            nn(W, W),
        ],
        out_specs=(nn(N, N), nn(N, N), nn(N, N)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ROWPAD + N, LANEPAD + N + W + 2), jnp.float32),  # closeS
            pltpu.VMEM((2 * N, 2 * N), jnp.float32),  # qrmS
            pltpu.VMEM((2 * N, 2 * N), jnp.float32),  # qrmmbS
            pltpu.VMEM((N, N), jnp.float32),          # rmS
            pltpu.VMEM((N, N), jnp.float32),          # rmmbS
            pltpu.VMEM((N, N), jnp.float32),          # extS
            pltpu.VMEM((N + 1, N), jnp.float32),      # extrS
            pltpu.VMEM((N, N), jnp.float32),          # mbS
            pltpu.VMEM((N, N), jnp.float32),          # oneS
        ],
        interpret=interpret,
    )(
        scal,
        mats["H"], mats["MBC"], mats["ACC"], mats["JS"], mats["STK"],
        mats["I11"], mats["B0R"], mats["B0L"], mats["CANON"],
        mats["JBPAD"], LEN,
    )
    return close, ext, one


# ---------------------------------------------------------------------------
# Outside pass (mccaskill_algo.rs:612-723)
# ---------------------------------------------------------------------------

BOTPAD = 64  # bottom row padding for the upward 2-loop window


def _contra_outside_kernel(
    SCAL,                                    # (1, 1, 8) SMEM
    CLOSEPAD, JSPAD,                         # (1, N+BOTPAD, LANEPAD+N+W+2)
    ONEPAD,                                  # (1, N+2, 2N+2) one(j+1, k-1) reads
    QONE,                                    # (1, N, N)  one(k+1, i-1) reads
    CLOSE, MBC, ACC, STKO, I11O, B0RO, JRB,  # (1, N, N) [d, i]
    B0LO, EXTL,                              # (1, N)
    EXTR,                                    # (1, 2N)
    LEN,                                     # (1, W, W) [b, a]
    bppo_out,                                # (1, N, N)
    bppoS, GS, qpmS, qpm2S,
    *, N, min_span,
):
    ext_bp = SCAL[0, 1]
    mb_unpair = SCAL[0, 2]
    mb_bp = SCAL[0, 3]
    glob = SCAL[0, 4]

    bppoS[:] = jnp.full_like(bppoS[:], NEG_INF)
    GS[:] = jnp.full_like(GS[:], NEG_INF)
    qpmS[:] = jnp.full_like(qpmS[:], NEG_INF)
    qpm2S[:] = jnp.full_like(qpm2S[:], NEG_INF)

    b_idx = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    s_qone = QONE[0, pl.ds(0, N), pl.ds(0, N)]   # [t', i] = one(i-t'+1, i-1)

    def span_step(step, carry):
        d = N - 1 - step
        span_ok = (d + 1) >= min_span

        # ---- pm / pm2: X[t, i] = G(i, i+d+t), t = k - j >= 1 ----
        Xr = GS[pl.ds(d, N), :]                      # rows d+t
        s_one = ONEPAD[0, pl.ds(0, N), pl.ds(d + 1, N)]  # one(j+1, k-1)
        pm_terms = jnp.where(t_idx >= 1, Xr + s_one, NEG_INF)
        pm_new = jnp.where(span_ok, _lse_rows(pm_terms), NEG_INF)
        pm2_terms = jnp.where(
            t_idx >= 1,
            Xr + mb_unpair * (t_idx - 1).astype(jnp.float32),
            NEG_INF,
        )
        pm2_new = jnp.where(span_ok, _lse_rows(pm2_terms), NEG_INF)
        qpmS[pl.ds(d, 1), pl.ds(d, N)] = pm_new
        qpm2S[pl.ds(d, 1), pl.ds(d, N)] = pm2_new

        # ---- bpp outside ----
        close_row = _row3(CLOSE, d)
        acc_row = close_row + _row3(ACC, d)
        lt = EXTL[pl.ds(0, 1), pl.ds(0, N)]
        rt = EXTR[pl.ds(0, 1), pl.ds(d + 1, N)]
        base = lt + acc_row + rt - glob + ext_bp

        # 2-loop context: outer (i-1-a, j+1+b)
        jrb_row = _row3(JRB, d)
        two = jnp.full((1, N), NEG_INF)
        for a in range(W):
            r0 = d + 2 + a
            lane0 = LANEPAD - 1 - a
            blk_b = bppoS[pl.ds(r0, W), pl.ds(lane0, N)]
            blk_c = CLOSEPAD[0, pl.ds(r0, W), pl.ds(lane0, N)]
            blk_j = JSPAD[0, pl.ds(r0, W), pl.ds(lane0, N)]
            body = jrb_row + blk_j + LEN[0, :, a : a + 1]
            if a == 0:
                body = jnp.where(b_idx == 0, _row3(STKO, d), body)
                body = jnp.where(b_idx == 1, body + _row3(B0RO, d), body)
            elif a == 1:
                body = jnp.where(b_idx == 0, body + B0LO[pl.ds(0, 1), pl.ds(0, N)], body)
                body = jnp.where(b_idx == 1, body + _row3(I11O, d), body)
            tl = jnp.where(a + b_idx <= MAX_LOOP_LEN, body, NEG_INF)
            term = jnp.where(
                blk_c > NEG_INF, blk_b - blk_c + tl, NEG_INF
            ) + close_row
            two = lse_pair(two, _lse_rows(term))

        # multibranch context: k < i, t' = i - k in [1, i]
        acc_mb = acc_row + mb_bp
        r_pm = qpmS[pl.ds(d, N), pl.ds(d, N)]        # [t', i] = pm(i-t', i+d)
        r_pm2 = qpm2S[pl.ds(d, N), pl.ds(d, N)]
        m1 = t_idx >= 1
        terms_a = jnp.where(m1, acc_mb + r_pm2 + s_qone, NEG_INF)
        terms_b = jnp.where(
            m1,
            acc_mb + r_pm + mb_unpair * (t_idx - 1).astype(jnp.float32),
            NEG_INF,
        )
        terms_c = jnp.where(m1, acc_mb + r_pm + s_qone, NEG_INF)
        mb_ctx = lse_pair(
            lse_pair(_lse_rows(terms_a), _lse_rows(terms_b)),
            _lse_rows(terms_c),
        )

        bppo_new = lse_pair(lse_pair(base, two), mb_ctx)
        bppo_new = jnp.where(
            (close_row > NEG_INF) & span_ok, bppo_new, NEG_INF
        )
        bppoS[pl.ds(d, 1), pl.ds(LANEPAD, N)] = bppo_new
        g_row = jnp.where(
            close_row > NEG_INF,
            bppo_new + _row3(MBC, d) - close_row,
            NEG_INF,
        )
        GS[pl.ds(d, 1), :] = g_row
        return carry

    lax.fori_loop(0, N, span_step, 0)
    bppo_out[0] = bppoS[pl.ds(0, N), pl.ds(LANEPAD, N)]


def _skew_di(one_di, N):
    """QONE_PAD[t, l] = one(l-t+1, l-1) with -inf out of range (host prep).

    one_di is the inside kernel's [d, i] output: one_di[q, p] = one(p, p+q).
    s_qone[t', i] = one(i-t'+1, i-1) = one_di[t'-2, i-t'+1].
    """
    t = jnp.arange(N)[:, None]
    l = jnp.arange(N)[None, :]
    q = t - 2
    p = l - q - 1
    ok = (q >= 0) & (p >= 0) & (p < N) & (q < N)
    vals = one_di[jnp.clip(q, 0, N - 1), jnp.clip(p, 0, N - 1)]
    return jnp.where(ok, vals, NEG_INF)


def contra_outside_precompute_di(seqs, ns, ct, N, close_di, ext_di, one_di):
    """Batched host prep of the outside kernel inputs."""

    def one_seq(seq, n, close_d, ext_d, one_d):
        pre = S.precompute_contra(seq, n, N, ct)
        i = jnp.arange(N)[:, None]
        dd = jnp.arange(N)[None, :]
        j = i + dd
        xi = seq[:, None] * jnp.ones_like(dd)
        xj = S.sget(seq, j)
        s_im1 = S.sget(seq, i - 1) * jnp.ones_like(dd)
        s_jp1 = S.sget(seq, j + 1)
        STKO = (
            ct["stack_scores"][s_im1, s_jp1, xi, xj]
            + ct["basepair_scores"][xi, xj]
        )
        B0RO = ct["bulge_scores_0x1"][s_jp1]
        B0LO = ct["bulge_scores_0x1"][S.sget(seq, jnp.arange(N) - 1)]
        I11O = ct["interior_scores_1x1"][s_im1, s_jp1]
        JRB = pre["JSrev"] + pre["BP"]

        def botpad(M_di, fill):
            buf = jnp.full(
                (N + BOTPAD, LANEPAD + N + W + 2), fill, dtype=jnp.float32
            )
            return lax.dynamic_update_slice(buf, M_di, (0, LANEPAD))

        pvec = jnp.arange(N)
        extL = ext_d[:, 0]                              # ext(0, p)
        extL_sh = jnp.concatenate([jnp.zeros((1,)), extL[:-1]])  # ext(0, i-1)
        extR = jnp.where(
            pvec <= n - 1,
            ext_d[jnp.clip(n - 1 - pvec, 0, N - 1), jnp.clip(pvec, 0, N - 1)],
            0.0,
        )                                               # ext(p, n-1)
        extR_pad = jnp.concatenate([extR, jnp.zeros((N,))])
        glob = extR[0]
        return {
            "CLOSEPAD": botpad(close_d, NEG_INF),
            "JSPAD": botpad(pre["JS"].T, 0.0),
            "ONEPAD": jnp.concatenate(
                [
                    jnp.full((2, 2 * N), NEG_INF),
                    jnp.concatenate(
                        [one_d[: N - 2], jnp.full((N - 2, N), NEG_INF)],
                        axis=1,
                    ),
                ],
                axis=0,
            ),
            "QONE": _skew_di(one_d, N),
            "CLOSE": close_d,
            "MBC": pre["MBC"].T,
            "ACC": pre["ACC"].T,
            "STKO": STKO.T,
            "I11O": I11O.T,
            "B0RO": B0RO.T,
            "JRB": JRB.T,
            "B0LO": B0LO,
            "EXTL": extL_sh,
            "EXTR": extR_pad,
            "GLOB": glob,
        }

    return jax.vmap(one_seq)(seqs, ns, close_di, ext_di, one_di)


@functools.partial(
    jax.jit, static_argnames=("N", "allows_short_hairpins", "interpret")
)
def mccaskill_contra_pallas(
    seqs, ns, ct, N, allows_short_hairpins=False, interpret=False
):
    """Full CONTRA McCaskill (inside + outside) through the fused kernels.

    Returns (bppo, close, ext, one) in [d, i] layout, each (B, N, N); callers
    convert to probability space / square layout (models/mccaskill.py).
    """
    B = seqs.shape[0]
    close, ext, one = contra_inside_pallas(
        seqs, ns, ct, N=N, interpret=interpret
    )
    pre = contra_outside_precompute_di(seqs, ns, ct, N, close, ext, one)
    LEN = jnp.broadcast_to(_contra_len_di(ct)[None], (B, W, W))
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
            pre["GLOB"][:, None],
            jnp.zeros((B, 3)),
        ],
        axis=1,
    ).astype(jnp.float32)[:, None, :]

    nn = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    min_span = 2 if allows_short_hairpins else MIN_SPAN_HAIRPIN_CLOSE
    kernel = functools.partial(_contra_outside_kernel, N=N, min_span=min_span)
    PADW = LANEPAD + N + W + 2
    bppo = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            nn(N + BOTPAD, PADW),       # CLOSEPAD
            nn(N + BOTPAD, PADW),       # JSPAD
            nn(N, 2 * N),               # ONEPAD
            nn(N, N),                   # QONE
            *(nn(N, N) for _ in range(7)),  # CLOSE MBC ACC STKO I11O B0RO JRB
            nn(N),                      # B0LO
            nn(N),                      # EXTL
            nn(2 * N),                  # EXTR
            nn(W, W),                   # LEN
        ],
        out_specs=nn(N, N),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N + BOTPAD, PADW), jnp.float32),  # bppoS
            pltpu.VMEM((2 * N, N), jnp.float32),          # GS
            pltpu.VMEM((2 * N, 2 * N), jnp.float32),      # qpmS
            pltpu.VMEM((2 * N, 2 * N), jnp.float32),      # qpm2S
        ],
        interpret=interpret,
    )(
        scal,
        pre["CLOSEPAD"], pre["JSPAD"], pre["ONEPAD"], pre["QONE"],
        pre["CLOSE"], pre["MBC"], pre["ACC"], pre["STKO"], pre["I11O"],
        pre["B0RO"], pre["JRB"],
        pre["B0LO"], pre["EXTL"], pre["EXTR"], LEN,
    )
    return bppo, close, ext, one
