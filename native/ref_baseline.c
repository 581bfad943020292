/* Reference-faithful single-threaded McCaskill baseline (CPU), both models.
 *
 * Purpose: anchor bench.py's `vs_baseline` with a MEASUREMENT instead of an
 * estimate (VERDICT round 2, item 2; Turner model added round 4, VERDICT
 * round 3 item 4 — the reference benches both models,
 * `/root/reference/benches/benches.rs:28-55`).  The Rust reference cannot be
 * built here (no cargo), so this is a C implementation of the same
 * recurrences the reference runs (`/root/reference/src/mccaskill_algo.rs:
 * 282-723`) with the same float32 piecewise-cubic log-space numerics
 * (`/root/reference/src/utils.rs:579-655`), scalar span-major loops, one
 * sequence at a time on one core — the per-task work profile of the
 * reference's thread pool (`/root/reference/src/bin/mccaskill_algo.rs:64-93`).
 * It is written against this repo's independent NumPy oracle
 * (tests/oracle/fold_oracle.py), not the Rust sources, and validated against
 * the oracle's BPPs by scripts/ref_baseline.py.  The tables file's magic
 * selects the model: "RBA1" = CONTRA, "RBT1" = Turner.
 *
 * Design choices are deliberately favorable to the reference so the measured
 * baseline is conservative (the ratio can only be understated): dense f32
 * arrays instead of the reference's hashmaps (no hashing cost), the 2-loop
 * score memo kept (as the reference does) in a dense windowed layout, and
 * multi-core throughput projected as single-core x num_cores (the
 * reference's batch parallelism is embarrassingly parallel, so linear
 * scaling is its best case).
 *
 * Usage: ref_baseline tables.bin seqs.bin reps [dump_bpp0.bin]
 * Prints one JSON line: {"batch_seqs": B, "reps": R, "secs": t,
 *                        "seqs_per_s": B*R/t, "checksum": sum_of_probs}
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#define NEG_INF (-INFINITY)
#define MIN_SPAN_CLOSE 5 /* MIN_SPAN_HAIRPIN_CLOSE */
#define MAX_LOOP 30      /* MAX_LOOP_LEN (CONTRA 2-loop + hairpin cap) */
#define LSE_THRESH 11.862479f

typedef struct {
  float stack[5][5][5][5];
  float tm[5][5][5][5];
  float helix_close[5][5];
  float dang_l[5][5][5];
  float dang_r[5][5][5];
  float bp[5][5];
  float hairpin_cum[31];
  float bulge_cum[30];
  float interior_cum[29];
  float int_sym_cum[15];
  float int_asym_cum[28];
  float int_explicit[4][4];
  float bulge_0x1[5];
  float int_1x1[5][5];
  float mb_base, mb_bp, mb_unpair, ext_bp, ext_unpair;
} Tables;

/* ---- CONTRAfold piecewise-cubic numerics (utils.rs:579-655 semantics) ---- */

static inline float ln_exp_1p(float x) {
  if (x < 3.37925f) {
    if (x < 1.6320158f) {
      if (x < 0.66153675f)
        return ((-0.0065591595f * x + 0.12764427f) * x + 0.49965546f) * x +
               0.6931542f;
      return ((-0.015515756f * x + 0.14467756f) * x + 0.48829398f) * x +
             0.6958093f;
    }
    if (x < 2.4912589f)
      return ((-0.012890925f * x + 0.13010283f) * x + 0.51503986f) * x +
             0.6795586f;
    return ((-0.0072142647f * x + 0.087754086f) * x + 0.6208708f) * x +
           0.5909676f;
  }
  if (x < 5.789071f) {
    if (x < 4.426169f)
      return ((-0.0031455354f * x + 0.046722945f) * x + 0.7592532f) * x +
             0.43487945f;
    return ((-0.0010110698f * x + 0.018594341f) * x + 0.88317305f) * x +
           0.25236955f;
  }
  if (x < 7.8162727f)
    return ((-0.000196278f * x + 0.0046084408f) * x + 0.9634432f) * x +
           0.09831489f;
  return ((-0.0000113994f * x + 0.0003734731f) * x + 0.9959107f) * x +
         0.0149855051f;
}

static inline float expf_cubic(float x) {
  if (x < -2.4915035f) {
    if (x < -5.8622823f) {
      if (x < -9.91152f) return 0.0f;
      return ((0.0000803850f * x + 0.002162743f) * x + 0.019470856f) * x +
             0.058808003f;
    }
    if (x < -3.839663f)
      return ((0.0013889414f * x + 0.024467647f) * x + 0.14712906f) * x +
             0.30427578f;
    return ((0.0072335607f * x + 0.09060027f) * x + 0.39831114f) * x +
           0.62459594f;
  }
  if (x < -0.6725053f) {
    if (x < -1.4805375f)
      return ((0.023241036f * x + 0.2085646f) * x + 0.6906368f) * x +
             0.86823225f;
    return ((0.057378277f * x + 0.35802585f) * x + 0.9121133f) * x +
           0.9793092f;
  }
  if (x < 0.0f)
    return ((0.119917594f * x + 0.48156682f) * x + 0.9975992f) * x +
           0.9999505f;
  return expf(x);
}

static inline float lse(float s, float x) {
  /* streaming accumulate; operands finite or -inf only */
  if (x == NEG_INF) return s;
  if (s == NEG_INF) return x;
  float y = s < x ? s : x;
  float z = (s > x ? s : x) - y;
  if (z >= LSE_THRESH) return y + z;
  return y + ln_exp_1p(z);
}

/* ---- CONTRA scoring (mirrors tests/oracle/fold_oracle.py) ---- */

static inline int is_canonical(int a, int b) {
  return (a == 0 && b == 3) || (a == 1 && b == 2) || (a == 2 && b == 1) ||
         (a == 2 && b == 3) || (a == 3 && b == 0) || (a == 3 && b == 2);
}

static inline float junction_single(const Tables *t, const uint8_t *q, int p0,
                                    int p1) {
  int a = q[p0], b = q[p1];
  return t->helix_close[a][b] + t->tm[a][b][q[p0 + 1]][q[p1 - 1]];
}

static inline float junction(const Tables *t, const uint8_t *q, int n, int p0,
                             int p1) {
  int a = q[p0], b = q[p1];
  float s = t->helix_close[a][b];
  if (p0 < n - 1) s += t->dang_l[a][b][q[p0 + 1]];
  if (p1 > 0) s += t->dang_r[a][b][q[p1 - 1]];
  return s;
}

static inline float hairpin_score(const Tables *t, const uint8_t *q, int i,
                                  int j) {
  /* caller guarantees j - i - 1 <= MAX_LOOP (longer loops score -inf) */
  return t->hairpin_cum[j - i - 1] + junction_single(t, q, i, j);
}

static inline float twoloop_score(const Tables *t, const uint8_t *q, int ci,
                                  int cj, int ai, int aj) {
  int d1 = ai - ci - 1, d2 = cj - aj - 1;
  int a = q[ai], b = q[aj];
  float s;
  if (d1 == 0 && d2 == 0) {
    s = t->stack[q[ci]][q[cj]][a][b];
  } else if (d1 == 0 || d2 == 0) { /* bulge */
    int blen = d1 + d2;
    s = 0.0f;
    if (blen == 1) s = t->bulge_0x1[d1 == 1 ? q[ci + 1] : q[cj - 1]];
    /* left-to-right accumulation order (reference f32 semantics) */
    s = s + t->bulge_cum[blen - 1];
    s = s + junction_single(t, q, ci, cj);
    s = s + junction_single(t, q, aj, ai);
  } else { /* interior */
    int ilen = d1 + d2;
    if (d1 == d2) {
      s = 0.0f;
      if (ilen == 2) s = t->int_1x1[q[ci + 1]][q[cj - 1]];
      s = s + t->int_sym_cum[d1 - 1];
    } else {
      int asym = d1 > d2 ? d1 - d2 : d2 - d1;
      s = t->int_asym_cum[asym - 1];
    }
    if (d1 <= 4 && d2 <= 4) s = s + t->int_explicit[d1 - 1][d2 - 1];
    s = s + t->interior_cum[ilen - 2];
    s = s + junction_single(t, q, ci, cj);
    s = s + junction_single(t, q, aj, ai);
  }
  return s + t->bp[a][b];
}

/* ---- Turner 2004 scoring (mirrors tests/oracle/fold_oracle.py
 * hairpin/twoloop/multibranch_close/accessible_score_turner; reference
 * analogs utils.rs:162-411) ---- */

#define N_SPECIAL 22
#define SPECIAL_LMAX 8

typedef struct {
  float stack[5][5][5][5];
  float tm_hairpin[5][5][5][5];
  float tm_interior[5][5][5][5];
  float tm_1xmany[5][5][5][5];
  float tm_2x3[5][5][5][5];
  float tm_mb[5][5][5][5];
  float dangle5[5][5][5];
  float dangle3[5][5][5];
  float hairpin_init[31];
  float bulge_init[31];
  float interior_init[31];
  float int_1x1[5][5][5][5][5][5];
  float int_1x2[5][5][5][5][5][5][5];
  float int_2x2[5][5][5][5][5][5][5][5];
  float sp_scores[N_SPECIAL];
  float ninio_coeff, ninio_max, augu, mb_base, coeff_branches, hp_extrap;
  uint8_t sp_seqs[N_SPECIAL][SPECIAL_LMAX];
  uint8_t sp_lens[N_SPECIAL];
} TTables;

static inline int is_augu(int a, int b) {
  return (a == 0 && b == 3) || (a == 3 && b == 0) || (a == 2 && b == 3) ||
         (a == 3 && b == 2);
}

static inline float special_hairpin(const TTables *t, const uint8_t *q, int i,
                                    int j) {
  int len = j - i + 1;
  for (int s = 0; s < N_SPECIAL; s++) {
    if (t->sp_lens[s] != len) continue;
    int ok = 1;
    for (int p = 0; p < len; p++)
      if (t->sp_seqs[s][p] != q[i + p]) { ok = 0; break; }
    if (ok) return t->sp_scores[s];
  }
  return NEG_INF;
}

static inline float hairpin_turner(const TTables *t, const uint8_t *q, int i,
                                   int j) {
  float sp = special_hairpin(t, q, i, j);
  if (sp != NEG_INF) return sp;
  int hlen = j - i - 1;
  int a = q[i], b = q[j];
  float score;
  if (hlen == 3) { /* MIN_HAIRPIN_LEN: init only, no mismatch */
    score = t->hairpin_init[hlen];
  } else {
    float init;
    if (hlen <= 30) /* MAX_HAIRPIN_LEN_EXTRAPOLATION */
      init = t->hairpin_init[hlen];
    else
      init = t->hairpin_init[30] +
             t->hp_extrap * logf((float)hlen / 30.0f);
    score = init + t->tm_hairpin[a][b][q[i + 1]][q[j - 1]];
  }
  if (is_augu(a, b)) score = score + t->augu;
  return score;
}

#define TM4(tm, a, b, c, d) (tm)[(((a)*5 + (b)) * 5 + (c)) * 5 + (d)]

static inline float twoloop_turner(const TTables *t, const uint8_t *q, int ci,
                                   int cj, int ai, int aj) {
  int d1 = ai - ci - 1, d2 = cj - aj - 1;
  int ca = q[ci], cb = q[cj], aa = q[ai], ab = q[aj];
  if (d1 == 0 && d2 == 0) return t->stack[ca][cb][aa][ab];
  if (d1 == 0 || d2 == 0) { /* bulge */
    int blen = d1 + d2;
    if (blen == 1) return t->bulge_init[1] + t->stack[ca][cb][aa][ab];
    float s = t->bulge_init[blen];
    if (is_augu(ca, cb)) s = s + t->augu;
    if (is_augu(aa, ab)) s = s + t->augu;
    return s;
  }
  int ilen = d1 + d2;
  if (d1 == 1 && d2 == 1)
    return t->int_1x1[ca][cb][q[ci + 1]][q[cj - 1]][aa][ab];
  if (d1 == 1 && d2 == 2)
    return t->int_1x2[ca][cb][q[ci + 1]][q[cj - 1]][q[cj - 2]][aa][ab];
  if (d1 == 2 && d2 == 1)
    return t->int_1x2[ab][aa][q[cj - 1]][q[ci + 2]][q[ci + 1]][cb][ca];
  if (d1 == 2 && d2 == 2)
    return t->int_2x2[ca][cb][q[ci + 1]][q[cj - 1]][q[ci + 2]][q[cj - 2]][aa][ab];
  /* generic interior: mismatch family chosen by the loop-length pair */
  const float *tm;
  if (d1 == 1 || d2 == 1)
    tm = &t->tm_1xmany[0][0][0][0];
  else if ((d1 == 2 && d2 == 3) || (d1 == 3 && d2 == 2))
    tm = &t->tm_2x3[0][0][0][0];
  else
    tm = &t->tm_interior[0][0][0][0];
  float mism = TM4(tm, ca, cb, q[ci + 1], q[cj - 1]) +
               TM4(tm, ab, aa, q[aj + 1], q[ai - 1]);
  float nin = t->ninio_coeff * (float)(d1 > d2 ? d1 - d2 : d2 - d1);
  if (nin < t->ninio_max) nin = t->ninio_max; /* max(coeff*asym, cap) */
  float s = t->interior_init[ilen] + nin;
  s = s + mism;
  if (is_augu(ca, cb)) s = s + t->augu;
  if (is_augu(aa, ab)) s = s + t->augu;
  return s;
}

static inline float mbc_turner(const TTables *t, const uint8_t *q, int i,
                               int j) {
  int a = q[i], b = q[j];
  float s = t->mb_base + t->tm_mb[b][a][q[j - 1]][q[i + 1]];
  if (is_augu(a, b)) s = s + t->augu;
  return s;
}

static inline float acc_turner(const TTables *t, const uint8_t *q, int n,
                               int i, int j) {
  int a = q[i], b = q[j];
  float s;
  if (i > 0 && j < n - 1)
    s = t->tm_mb[a][b][q[i - 1]][q[j + 1]];
  else if (i > 0)
    s = t->dangle5[a][b][q[i - 1]];
  else if (j < n - 1)
    s = t->dangle3[a][b][q[j + 1]];
  else
    s = 0.0f;
  if (is_augu(a, b)) s = s + t->augu;
  return s;
}

/* ---- per-sequence workspace (dense states, -inf = absent) ---- */

typedef struct {
  int cap;
  float *ext, *rm_ext, *rm_mb, *mb, *one, *close, *acc;
  float *mbc_memo, *acc_memo, *hp_memo;
  float *tl_memo; /* [i*n+j][d1][d2], outer pair (i,j) */
  float *bpp, *pm, *pm2;
} Work;

static void work_alloc(Work *w, int cap) {
  size_t nn = (size_t)cap * cap;
  w->cap = cap;
  w->ext = malloc(nn * 4);
  w->rm_ext = malloc(nn * 4);
  w->rm_mb = malloc(nn * 4);
  w->mb = malloc(nn * 4);
  w->one = malloc(nn * 4);
  w->close = malloc(nn * 4);
  w->acc = malloc(nn * 4);
  w->mbc_memo = malloc(nn * 4);
  w->acc_memo = malloc(nn * 4);
  w->hp_memo = malloc(nn * 4);
  w->tl_memo = malloc(nn * (MAX_LOOP + 1) * (MAX_LOOP + 1) * 4);
  w->bpp = malloc(nn * 4);
  w->pm = malloc(nn * 4);
  w->pm2 = malloc(nn * 4);
  if (!w->tl_memo || !w->pm2) {
    fprintf(stderr, "alloc failed\n");
    exit(2);
  }
}

#define IDX(i, j) ((size_t)(i) * n + (j))
#define TL(i, j, d1, d2)                                      \
  w->tl_memo[(IDX(i, j) * (MAX_LOOP + 1) + (d1)) * (MAX_LOOP + 1) + (d2)]

static void fill_neg_inf(float *a, size_t m) {
  for (size_t k = 0; k < m; k++) a[k] = NEG_INF;
}

/* CONTRA inside pass (mccaskill_algo.rs:380-516 semantics) */
static void inside(const Tables *t, const uint8_t *q, int n, Work *w) {
  size_t nn = (size_t)n * n;
  memset(w->ext, 0, nn * 4);
  fill_neg_inf(w->rm_ext, nn);
  fill_neg_inf(w->rm_mb, nn);
  fill_neg_inf(w->mb, nn);
  fill_neg_inf(w->one, nn);
  fill_neg_inf(w->close, nn);
  fill_neg_inf(w->acc, nn);
  for (int span = 1; span <= n; span++) {
    for (int i = 0; i + span <= n; i++) {
      int j = i + span - 1;
      if (span >= MIN_SPAN_CLOSE && is_canonical(q[i], q[j])) {
        float s = NEG_INF;
        if (j - i - 1 <= MAX_LOOP) {
          float hp = hairpin_score(t, q, i, j);
          w->hp_memo[IDX(i, j)] = hp;
          s = lse(s, hp);
        }
        for (int k = i + 1; k < j - 1; k++) {
          if (k - i - 1 > MAX_LOOP) break;
          for (int l = j - 1; l > k; l--) {
            if ((j - l - 1) + (k - i - 1) > MAX_LOOP) break;
            if (w->close[IDX(k, l)] != NEG_INF) {
              float tl = twoloop_score(t, q, i, j, k, l);
              TL(i, j, k - i - 1, j - l - 1) = tl;
              s = lse(s, w->close[IDX(k, l)] + tl);
            }
          }
        }
        float mbc = t->mb_base + t->mb_bp + junction(t, q, n, i, j);
        s = lse(s, w->mb[IDX(i + 1, j - 1)] + mbc);
        float acc_sc = junction(t, q, n, j, i) + t->bp[q[i]][q[j]];
        if (s != NEG_INF) {
          w->mbc_memo[IDX(i, j)] = mbc;
          w->acc_memo[IDX(i, j)] = acc_sc;
          w->close[IDX(i, j)] = s;
          w->acc[IDX(i, j)] = s + acc_sc;
        }
      }
      /* rightmost-basepair sums (external / multibranch weights) */
      float s = NEG_INF, s2 = NEG_INF;
      for (int k = i + 1; k <= j; k++) {
        float x = w->acc[IDX(i, k)];
        if (x != NEG_INF) {
          s = lse(s, x + t->ext_bp + t->ext_unpair * (float)(j - k));
          s2 = lse(s2, x + t->mb_bp + t->mb_unpair * (float)(j - k));
        }
      }
      w->rm_ext[IDX(i, j)] = s;
      w->rm_mb[IDX(i, j)] = s2;
      /* external */
      s = t->ext_unpair * (float)span;
      for (int k = i; k < j; k++) {
        float x = w->rm_ext[IDX(k, j)];
        float y = (i == 0 && k == 0) ? 0.0f : w->ext[IDX(i, k - 1)];
        s = lse(s, x + y);
      }
      w->ext[IDX(i, j)] = s;
      /* multibranch / one-or-more */
      s = w->rm_mb[IDX(i, j)];
      s2 = NEG_INF;
      for (int k = i + 1; k < j; k++) {
        float x = w->rm_mb[IDX(k, j)];
        s = lse(s, x + t->mb_unpair * (float)(k - i));
        s2 = lse(s2, w->one[IDX(i, k - 1)] + x);
      }
      w->mb[IDX(i, j)] = s2;
      s = lse(s, s2);
      w->one[IDX(i, j)] = s;
    }
  }
}

/* CONTRA outside pass -> probability-space BPPs
 * (mccaskill_algo.rs:612-723 semantics) */
static void outside(const Tables *t, const uint8_t *q, int n, Work *w) {
  (void)q;
  size_t nn = (size_t)n * n;
  fill_neg_inf(w->bpp, nn);
  fill_neg_inf(w->pm, nn);
  fill_neg_inf(w->pm2, nn);
  float global = w->ext[IDX(0, n - 1)];
  for (int span = n; span >= MIN_SPAN_CLOSE; span--) {
    for (int i = 0; i + span <= n; i++) {
      int j = i + span - 1;
      float s = NEG_INF, s2 = NEG_INF;
      for (int k = j + 1; k < n; k++) {
        if (w->close[IDX(i, k)] != NEG_INF) {
          float x = w->bpp[IDX(i, k)] + w->mbc_memo[IDX(i, k)] -
                    w->close[IDX(i, k)];
          s = lse(s, x + w->one[IDX(j + 1, k - 1)]);
          s2 = lse(s2, x + t->mb_unpair * (float)(k - j - 1));
        }
      }
      w->pm[IDX(i, j)] = s;
      w->pm2[IDX(i, j)] = s2;
      if (w->close[IDX(i, j)] == NEG_INF) continue;
      float sum_close = w->close[IDX(i, j)];
      float left = i < 1 ? 0.0f : w->ext[IDX(0, i - 1)];
      float right = j > n - 2 ? 0.0f : w->ext[IDX(j + 1, n - 1)];
      s = left + right + w->acc[IDX(i, j)] + t->ext_bp - global;
      for (int k = i - 1; k >= 0; k--) {
        if (i - k - 1 > MAX_LOOP) break;
        for (int l = j + 1; l < n; l++) {
          if ((l - j - 1) + (i - k - 1) > MAX_LOOP) break;
          if (w->close[IDX(k, l)] != NEG_INF)
            s = lse(s, w->bpp[IDX(k, l)] + sum_close - w->close[IDX(k, l)] +
                           TL(k, l, i - k - 1, l - j - 1));
        }
      }
      float acc_mb = w->acc[IDX(i, j)] + t->mb_bp;
      for (int k = 0; k < i; k++) {
        float x = w->one[IDX(k + 1, i - 1)];
        s = lse(s, acc_mb + w->pm2[IDX(k, j)] + x);
        float y = w->pm[IDX(k, j)];
        s = lse(s, acc_mb + y + t->mb_unpair * (float)(i - k - 1));
        s = lse(s, acc_mb + x + y);
      }
      if (s != NEG_INF) w->bpp[IDX(i, j)] = s;
    }
  }
  /* log -> probability space */
  for (size_t k = 0; k < nn; k++)
    w->bpp[k] = w->bpp[k] == NEG_INF ? 0.0f : expf_cubic(w->bpp[k]);
}

/* Turner inside pass (mccaskill_algo.rs:282-378 semantics; mirrors
 * tests/oracle/fold_oracle.py::inside_turner).  Differences from CONTRA:
 * spans start at MIN_SPAN_CLOSE; hairpins have no loop-length cap
 * (extrapolation); rightmost-basepair sums carry no per-base weights; the
 * multibranch weighting reuses the external sums + COEFF_NUM_BRANCHES. */
static void inside_turner(const TTables *t, const uint8_t *q, int n, Work *w) {
  size_t nn = (size_t)n * n;
  memset(w->ext, 0, nn * 4);
  fill_neg_inf(w->rm_ext, nn);
  fill_neg_inf(w->mb, nn);
  fill_neg_inf(w->one, nn);
  fill_neg_inf(w->close, nn);
  fill_neg_inf(w->acc, nn);
  for (int span = MIN_SPAN_CLOSE; span <= n; span++) {
    for (int i = 0; i + span <= n; i++) {
      int j = i + span - 1;
      if (is_canonical(q[i], q[j])) {
        float s = NEG_INF;
        float hp = hairpin_turner(t, q, i, j);
        w->hp_memo[IDX(i, j)] = hp;
        s = lse(s, hp);
        for (int k = i + 1; k < j - 1; k++) {
          if (k - i - 1 > MAX_LOOP) break; /* MAX_2LOOP_LEN */
          for (int l = j - 1; l > k; l--) {
            if ((j - l - 1) + (k - i - 1) > MAX_LOOP) break;
            if (w->close[IDX(k, l)] != NEG_INF) {
              float tl = twoloop_turner(t, q, i, j, k, l);
              TL(i, j, k - i - 1, j - l - 1) = tl;
              s = lse(s, w->close[IDX(k, l)] + tl);
            }
          }
        }
        float mbc = mbc_turner(t, q, i, j);
        s = lse(s, w->mb[IDX(i + 1, j - 1)] + mbc);
        float acc_sc = acc_turner(t, q, n, i, j);
        if (s != NEG_INF) {
          w->mbc_memo[IDX(i, j)] = mbc;
          w->acc_memo[IDX(i, j)] = acc_sc;
          w->close[IDX(i, j)] = s;
          w->acc[IDX(i, j)] = s + acc_sc;
        }
      }
      /* rightmost-basepair sums (external weighting, no per-base terms) */
      float s = NEG_INF;
      for (int k = i + 1; k <= j; k++) {
        float x = w->acc[IDX(i, k)];
        if (x != NEG_INF) s = lse(s, x);
      }
      w->rm_ext[IDX(i, j)] = s;
      /* external (empty = 0) */
      s = 0.0f;
      for (int k = i; k < j; k++) {
        float x = w->rm_ext[IDX(k, j)];
        float y = (i == 0 && k == 0) ? 0.0f : w->ext[IDX(i, k - 1)];
        s = lse(s, x + y);
      }
      w->ext[IDX(i, j)] = s;
      /* multibranch / one-or-more: external sums + branch coefficient */
      s = w->rm_ext[IDX(i, j)] + t->coeff_branches;
      float s2 = NEG_INF;
      for (int k = i + 1; k < j; k++) {
        float x = w->rm_ext[IDX(k, j)] + t->coeff_branches;
        s = lse(s, x);
        s2 = lse(s2, w->one[IDX(i, k - 1)] + x);
      }
      w->mb[IDX(i, j)] = s2;
      s = lse(s, s2);
      w->one[IDX(i, j)] = s;
    }
  }
}

/* Turner outside pass -> probability-space BPPs
 * (mccaskill_algo.rs:518-610 semantics; mirrors fold_oracle._outside with
 * model="turner": unweighted pm2 accumulation, left+acc+right-global
 * external term order, COEFF_NUM_BRANCHES multibranch weighting). */
static void outside_turner(const TTables *t, const uint8_t *q, int n,
                           Work *w) {
  (void)q;
  size_t nn = (size_t)n * n;
  fill_neg_inf(w->bpp, nn);
  fill_neg_inf(w->pm, nn);
  fill_neg_inf(w->pm2, nn);
  float global = w->ext[IDX(0, n - 1)];
  for (int span = n; span >= MIN_SPAN_CLOSE; span--) {
    for (int i = 0; i + span <= n; i++) {
      int j = i + span - 1;
      float s = NEG_INF, s2 = NEG_INF;
      for (int k = j + 1; k < n; k++) {
        if (w->close[IDX(i, k)] != NEG_INF) {
          float x = w->bpp[IDX(i, k)] + w->mbc_memo[IDX(i, k)] -
                    w->close[IDX(i, k)];
          s = lse(s, x + w->one[IDX(j + 1, k - 1)]);
          s2 = lse(s2, x);
        }
      }
      w->pm[IDX(i, j)] = s;
      w->pm2[IDX(i, j)] = s2;
      if (w->close[IDX(i, j)] == NEG_INF) continue;
      float sum_close = w->close[IDX(i, j)];
      float left = i < 1 ? 0.0f : w->ext[IDX(0, i - 1)];
      float right = j > n - 2 ? 0.0f : w->ext[IDX(j + 1, n - 1)];
      s = left + w->acc[IDX(i, j)];
      s = s + right;
      s = s - global;
      for (int k = i - 1; k >= 0; k--) {
        if (i - k - 1 > MAX_LOOP) break;
        for (int l = j + 1; l < n; l++) {
          if ((l - j - 1) + (i - k - 1) > MAX_LOOP) break;
          if (w->close[IDX(k, l)] != NEG_INF)
            s = lse(s, w->bpp[IDX(k, l)] + sum_close - w->close[IDX(k, l)] +
                           TL(k, l, i - k - 1, l - j - 1));
        }
      }
      float acc_mb = w->acc[IDX(i, j)] + t->coeff_branches;
      for (int k = 0; k < i; k++) {
        float x = w->one[IDX(k + 1, i - 1)];
        s = lse(s, acc_mb + w->pm2[IDX(k, j)] + x);
        float y = w->pm[IDX(k, j)];
        s = lse(s, acc_mb + y);
        s = lse(s, acc_mb + x + y);
      }
      if (s != NEG_INF) w->bpp[IDX(i, j)] = s;
    }
  }
  for (size_t k = 0; k < nn; k++)
    w->bpp[k] = w->bpp[k] == NEG_INF ? 0.0f : expf_cubic(w->bpp[k]);
}

/* ---- driver ---- */

static void read_exact(void *p, size_t sz, FILE *f, const char *what) {
  if (fread(p, 1, sz, f) != sz) {
    fprintf(stderr, "short read: %s\n", what);
    exit(2);
  }
}

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s tables.bin seqs.bin reps [dump_bpp0.bin]\n",
            argv[0]);
    return 2;
  }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror(argv[1]); return 2; }
  Tables t;
  TTables *tt = NULL;
  uint32_t magic;
  read_exact(&magic, 4, f, "magic");
  if (magic == 0x52424131u) { /* "RBA1": CONTRA */
    read_exact(&t, sizeof(Tables), f, "tables");
  } else if (magic == 0x52425431u) { /* "RBT1": Turner */
    tt = malloc(sizeof(TTables));
    read_exact(tt->stack, sizeof tt->stack, f, "stack");
    read_exact(tt->tm_hairpin, sizeof tt->tm_hairpin, f, "tm_hairpin");
    read_exact(tt->tm_interior, sizeof tt->tm_interior, f, "tm_interior");
    read_exact(tt->tm_1xmany, sizeof tt->tm_1xmany, f, "tm_1xmany");
    read_exact(tt->tm_2x3, sizeof tt->tm_2x3, f, "tm_2x3");
    read_exact(tt->tm_mb, sizeof tt->tm_mb, f, "tm_mb");
    read_exact(tt->dangle5, sizeof tt->dangle5, f, "dangle5");
    read_exact(tt->dangle3, sizeof tt->dangle3, f, "dangle3");
    read_exact(tt->hairpin_init, sizeof tt->hairpin_init, f, "hairpin_init");
    read_exact(tt->bulge_init, sizeof tt->bulge_init, f, "bulge_init");
    read_exact(tt->interior_init, sizeof tt->interior_init, f, "interior_init");
    read_exact(tt->int_1x1, sizeof tt->int_1x1, f, "int_1x1");
    read_exact(tt->int_1x2, sizeof tt->int_1x2, f, "int_1x2");
    read_exact(tt->int_2x2, sizeof tt->int_2x2, f, "int_2x2");
    read_exact(tt->sp_scores, sizeof tt->sp_scores, f, "sp_scores");
    read_exact(&tt->ninio_coeff, 4, f, "ninio_coeff");
    read_exact(&tt->ninio_max, 4, f, "ninio_max");
    read_exact(&tt->augu, 4, f, "augu");
    read_exact(&tt->mb_base, 4, f, "mb_base");
    read_exact(&tt->coeff_branches, 4, f, "coeff_branches");
    read_exact(&tt->hp_extrap, 4, f, "hp_extrap");
    read_exact(tt->sp_seqs, sizeof tt->sp_seqs, f, "sp_seqs");
    read_exact(tt->sp_lens, sizeof tt->sp_lens, f, "sp_lens");
  } else {
    fprintf(stderr, "bad tables magic\n");
    return 2;
  }
  fclose(f);

  f = fopen(argv[2], "rb");
  if (!f) { perror(argv[2]); return 2; }
  uint32_t nseqs;
  read_exact(&nseqs, 4, f, "nseqs");
  uint8_t **seqs = malloc(nseqs * sizeof(uint8_t *));
  uint32_t *lens = malloc(nseqs * 4);
  int max_n = 0;
  for (uint32_t k = 0; k < nseqs; k++) {
    read_exact(&lens[k], 4, f, "len");
    seqs[k] = malloc(lens[k]);
    read_exact(seqs[k], lens[k], f, "seq");
    if ((int)lens[k] > max_n) max_n = lens[k];
  }
  fclose(f);

  int reps = atoi(argv[3]);
  Work w;
  work_alloc(&w, max_n);

  /* warm pass (page in buffers) + optional BPP dump for validation */
  if (tt) {
    inside_turner(tt, seqs[0], lens[0], &w);
    outside_turner(tt, seqs[0], lens[0], &w);
  } else {
    inside(&t, seqs[0], lens[0], &w);
    outside(&t, seqs[0], lens[0], &w);
  }
  if (argc > 4) {
    FILE *d = fopen(argv[4], "wb");
    uint32_t n0 = lens[0];
    fwrite(&n0, 4, 1, d);
    fwrite(w.bpp, 4, (size_t)n0 * n0, d);
    /* validation extras: inside tables */
    fwrite(w.ext, 4, (size_t)n0 * n0, d);
    fwrite(w.close, 4, (size_t)n0 * n0, d);
    fwrite(w.one, 4, (size_t)n0 * n0, d);
    fclose(d);
  }

  double checksum = 0.0;
  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  for (int r = 0; r < reps; r++) {
    for (uint32_t k = 0; k < nseqs; k++) {
      int n = lens[k];
      if (tt) {
        inside_turner(tt, seqs[k], n, &w);
        outside_turner(tt, seqs[k], n, &w);
      } else {
        inside(&t, seqs[k], n, &w);
        outside(&t, seqs[k], n, &w);
      }
      for (int i = 0; i < n; i += 7) checksum += w.bpp[IDX(i, n - 1 - i)];
    }
  }
  clock_gettime(CLOCK_MONOTONIC, &t1);
  double secs = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
  printf(
      "{\"batch_seqs\": %u, \"reps\": %d, \"secs\": %.6f, "
      "\"seqs_per_s\": %.3f, \"checksum\": %.6g}\n",
      nseqs, reps, secs, nseqs * (double)reps / secs, checksum);
  return 0;
}
