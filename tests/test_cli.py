"""CLI format contracts vs the reference byte layouts (SURVEY C12-C14)."""

import os
import re

import pytest

from rna_algos_tpu.cli import centroid_fold as cf_cli
from rna_algos_tpu.cli import durbin as du_cli
from rna_algos_tpu.cli import generate_align_scores as gas_cli
from rna_algos_tpu.cli import mccaskill as mc_cli

FIXTURE = "assets/sampled_trnas.fa"
TRIPLE = re.compile(r"^\d+,\d+,(\d+(\.\d+)?|0\.\d+) $")


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    mc = root / "bpps.txt"
    cf = root / "cf"
    du = root / "durbin.txt"
    mc_cli.main(["-i", FIXTURE, "-o", str(mc), "-c"])
    cf_cli.main(["-i", FIXTURE, "-o", str(cf), "-c", "-g", "16"])
    du_cli.main(["-i", FIXTURE, "-o", str(du)])
    return mc, cf, du


def test_mccaskill_format(outputs):
    mc, _, _ = outputs
    text = mc.read_text()
    # exact reference header (bin/mccaskill_algo.rs:94)
    assert text.startswith(
        "# Format = >{RNA sequence id} {line break} {basepairing left "
        "nucleotide}, {basepairing right nucleotide}, {basepairing "
        "probability} ..."
    )
    blocks = text.split("\n\n")[1:]
    assert len(blocks) == 6
    for rid, block in enumerate(blocks):
        head, triples = block.split("\n", 1)
        assert head == f">{rid}"
        for trip in triples.split(" "):
            if trip:
                i, j, p = trip.split(",")
                assert int(i) < int(j)
                assert 0.0 <= float(p) <= 1.001


def test_centroid_format(outputs):
    _, cf, _ = outputs
    files = os.listdir(cf)
    assert files == ["centroid_threshold=16.fa"]
    lines = (cf / files[0]).read_text().split("\n")
    assert lines[0] == ">0"
    assert set(lines[1]) <= set("().")
    # record separator layout: >idx / fold alternating, no trailing newline
    assert lines[-2] == ">5"
    assert len(lines) == 12


def test_durbin_format(outputs):
    _, _, du = outputs
    text = du.read_text()
    assert text.startswith(
        "# Format = >{RNA sequence id 1},{RNA sequence id 2} {line break} "
        "{nucleotide 1}, {nucleotide 2}, {nucletide matching probability} ..."
    )
    blocks = text.split("\n\n")[1:]
    assert len(blocks) == 15  # all unordered pairs of 6 records
    assert blocks[0].split("\n")[0] == ">0,1"


def test_numerics_flag(tmp_path, outputs):
    """--numerics fast: same format, values within the cubic error budget."""
    from rna_algos_tpu import numerics

    mc, _, _ = outputs
    out = tmp_path / "bpps_fast.txt"
    try:
        mc_cli.main(["-i", FIXTURE, "-o", str(out), "-c", "--numerics", "fast"])
    finally:
        numerics.set_mode("exact")
    fast_blocks = out.read_text().split("\n\n")
    exact_blocks = mc.read_text().split("\n\n")
    assert len(fast_blocks) == len(exact_blocks) == 7
    for fb, eb in zip(fast_blocks[1:], exact_blocks[1:]):

        def parse(block):
            lines = block.strip().splitlines()
            vals = {}
            for tok in " ".join(lines[1:]).split():
                i, j, p = tok.split(",")
                vals[(int(i), int(j))] = float(p)
            return lines[0], vals

        fid, fv = parse(fb)
        eid, ev = parse(eb)
        assert fid == eid
        deltas = [
            abs(fv.get(k, 0.0) - ev.get(k, 0.0)) for k in set(fv) | set(ev)
        ]
        assert max(deltas) < 5e-4


def test_generate_align_scores(tmp_path):
    out = tmp_path / "scores.py"
    gas_cli.main(["-i", "assets/contralign.params.rna", "-o", str(out)])
    ns: dict = {}
    exec(out.read_text(), ns)  # generated module is importable
    assert ns["MATCH_SCORES"].shape == (5, 5)
    # symmetrization quirk preserved (generate_align_scores.rs:61-68)
    assert ns["MATCH_SCORES"][0][1] == ns["MATCH_SCORES"][1][0]
    assert float(ns["MATCH2MATCH_SCORE"]) == pytest.approx(2.50575671)