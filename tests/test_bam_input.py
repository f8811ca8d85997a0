"""aln -b / samse / sampe over BAM input: byte-equality vs oracle."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")

COMP = bytes.maketrans(b"ACGTN", b"TGCAN")


@pytest.fixture(scope="module")
def bam_reads(small_genome):
    from datagen import random_genome, simulate_reads

    from bwa_tpu.io.bam import write_bam

    bam = DATA / "bt_reads.bam"
    if not bam.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        r1, r2 = simulate_reads(contigs, 40, read_len=50, seed=77,
                                err_rate=0.01, indel_rate=0.002, paired=True,
                                insert_mean=250, insert_std=30)
        rng = np.random.default_rng(5)
        recs = []
        for (n1, s1, q1), (n2, s2, q2) in zip(r1, r2):
            f1, f2 = 0x1 | 0x40, 0x1 | 0x80
            if rng.random() < 0.5:
                f1 |= 0x10
                s1, q1 = s1.translate(COMP)[::-1], q1[::-1]
            if rng.random() < 0.5:
                f2 |= 0x10
                s2, q2 = s2.translate(COMP)[::-1], q2[::-1]
            recs.append((f1, n1, s1.decode(), q1.decode()))
            recs.append((f2, n2, s2.decode(), q2.decode()))
        recs.append((0, "solo", "ACGT" * 12 + "AC", "I" * 50))
        write_bam(bam, recs, targets=[("ctg0", 100226)])
    return bam


def _mine(args):
    return subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                          check=True, capture_output=True, cwd=REPO).stdout


def _oracle(oracle_bwa, args):
    return subprocess.run([str(oracle_bwa), *args], check=True,
                          capture_output=True).stdout


def _nopg(b):
    return b"\n".join(l for l in b.splitlines() if not l.startswith(b"@PG"))


def test_aln_bam_variants(oracle_bwa, small_genome, bam_reads):
    for extra in (["-b", "-1"], ["-b", "-2"], ["-b", "-0"], ["-b"],
                  ["-b", "-q15"]):
        args = ["aln", *extra, str(small_genome), str(bam_reads)]
        assert _mine(args) == _oracle(oracle_bwa, args), extra


def test_samse_sampe_bam(oracle_bwa, small_genome, bam_reads, tmp_path):
    sai1 = tmp_path / "r1.sai"
    sai2 = tmp_path / "r2.sai"
    sai1.write_bytes(_oracle(oracle_bwa, ["aln", "-b", "-1",
                                          str(small_genome), str(bam_reads)]))
    sai2.write_bytes(_oracle(oracle_bwa, ["aln", "-b", "-2",
                                          str(small_genome), str(bam_reads)]))
    args = ["samse", str(small_genome), str(sai1), str(bam_reads)]
    assert _nopg(_mine(args)) == _nopg(_oracle(oracle_bwa, args))
    args = ["sampe", str(small_genome), str(sai1), str(sai2),
            str(bam_reads), str(bam_reads)]
    assert _nopg(_mine(args)) == _nopg(_oracle(oracle_bwa, args))
