"""Synthetic Rfam-seed-like Stockholm generator for the eval pipeline.

The reference eval consumes Rfam 14.3 seed alignments
(`/root/reference/scripts/compile_rna_fams.py:19`), but the `.sth` asset is a
missing large blob upstream (`.MISSING_LARGE_BLOBS`).  This module
synthesizes a REPRESENTATIVE seed set so the pipeline can run end-to-end
(VERDICT round 1, item 4): each family is built from a random nested
secondary-structure template, and member sequences are sampled to be
*compatible* with it (canonical pairs at paired columns, covariation across
members, point mutations and gap columns at unpaired positions).  The
generating structure is the family's reference structure, so estimator
accuracy against it is a meaningful — if easier-than-Rfam — signal, and the
filters of compile_rna_fams (<= 10 seqs, <= 200 cols, ambiguity codes) are
exercised by deliberately out-of-spec families.

Deterministic for a given seed; the committed dataset is
assets/synth_rfam_seed.sth (scripts/run_eval.py regenerates it).
"""

import numpy as np

PAIR_CHOICES = ["AU", "UA", "CG", "GC", "GU", "UG"]
PAIR_WEIGHTS = np.array([0.22, 0.22, 0.24, 0.24, 0.04, 0.04])
BASES = "ACGU"


def random_structure(rng, n):
    """Random nested dot-bracket of length n (hairpin loops >= 3)."""
    if n < 10:
        return "." * n
    r = rng.random()
    if r < 0.55:
        s = int(rng.integers(3, 8))
        s = min(s, (n - 5) // 2)
        if s < 2:
            return "." * n
        return "(" * s + random_structure(rng, n - 2 * s) + ")" * s
    if r < 0.8 and n >= 24:
        k = int(rng.integers(10, n - 10))
        return random_structure(rng, k) + random_structure(rng, n - k)
    u = int(rng.integers(1, 5))
    return "." * u + random_structure(rng, n - u)


def pair_table(ss):
    stack, pairs = [], []
    for i, ch in enumerate(ss):
        if ch == "(":
            stack.append(i)
        elif ch == ")":
            pairs.append((stack.pop(), i))
    return pairs


def sample_family(rng, n_seqs, length, mut_rate=0.08, gap_rate=0.06):
    """(rows, ss_cons): aligned member sequences compatible with one template."""
    ss = random_structure(rng, length)
    pairs = pair_table(ss)
    paired = {i for p in pairs for i in p}
    # family consensus sequence
    cols = [BASES[rng.integers(4)] for _ in range(length)]
    for i, j in pairs:
        p = PAIR_CHOICES[rng.choice(len(PAIR_CHOICES), p=PAIR_WEIGHTS)]
        cols[i], cols[j] = p[0], p[1]
    rows = []
    for s in range(n_seqs):
        seq = list(cols)
        for i, j in pairs:
            if rng.random() < mut_rate:  # covarying pair substitution
                p = PAIR_CHOICES[rng.choice(len(PAIR_CHOICES), p=PAIR_WEIGHTS)]
                seq[i], seq[j] = p[0], p[1]
        for i in range(length):
            if i not in paired:
                if rng.random() < gap_rate:
                    seq[i] = "-"
                elif rng.random() < mut_rate:
                    seq[i] = BASES[rng.integers(4)]
        rows.append((f"fam/seq{s}", "".join(seq)))
    return rows, ss


def write_stockholm(path, families):
    """families = [(rows, ss_cons)] -> one multi-alignment Stockholm file."""
    with open(path, "w") as f:
        for rows, ss in families:
            f.write("# STOCKHOLM 1.0\n")
            width = max(
                max(len(name) for name, _ in rows), len("#=GC SS_cons")
            ) + 2
            for name, seq in rows:
                f.write(f"{name:<{width}}{seq}\n")
            f.write(f"{'#=GC SS_cons':<{width}}{ss}\n//\n")


def generate_seed_set(path, n_families=20, seed=20260819):
    """Write a synthetic seed set; returns the number of VALID families.

    Includes out-of-spec families (too many members, too wide, ambiguity
    codes) so compile_rna_fams' filters are exercised on realistic input.
    """
    rng = np.random.default_rng(seed)
    fams = []
    valid = 0
    for k in range(n_families):
        length = int(rng.integers(60, 190))
        n_seqs = int(rng.integers(3, 10))
        fams.append(sample_family(rng, n_seqs, length))
        valid += 1
    # out-of-spec: too many sequences
    fams.append(sample_family(rng, 14, 80))
    # out-of-spec: too wide
    fams.append(sample_family(rng, 4, 240))
    # out-of-spec: ambiguity code
    rows, ss = sample_family(rng, 4, 70)
    rows = [(n, s.replace("A", "N", 1)) for n, s in rows]
    fams.append((rows, ss))
    write_stockholm(path, fams)
    return valid
