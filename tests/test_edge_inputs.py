"""Degenerate inputs: empty file, all-N read, sub-seed-length read."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="module")
def edge_reads():
    fq = DATA / "edge.fq"
    fq.write_bytes(
        b"@allN\nNNNNNNNNNNNNNNNNNNNNNNNNNNNNNN\n+\n"
        b"IIIIIIIIIIIIIIIIIIIIIIIIIIIIII\n"
        b"@tiny\nACGT\n+\nIIII\n"
        b"@ok\n" + b"ACGTAGGCTTAACGTGTTAGACGTCTATATCTCAGATAAAAAAGAGGTGG"
        b"\n+\n" + b"I" * 50 + b"\n")
    empty = DATA / "edge_empty.fq"
    empty.write_bytes(b"")
    return fq, empty


def _pair(oracle_bwa, args):
    ro = subprocess.run([str(oracle_bwa), *args], capture_output=True)
    rt = subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                        capture_output=True, cwd=REPO)
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@")]
    assert strip(rt.stdout) == strip(ro.stdout), args


def test_edge_inputs(oracle_bwa, small_genome, edge_reads):
    fq, empty = edge_reads
    for sub in ("mem", "aln", "bwasw", "fastmap"):
        _pair(oracle_bwa, [sub, str(small_genome), str(fq)])
    _pair(oracle_bwa, ["mem", str(small_genome), str(empty)])
