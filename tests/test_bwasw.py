"""BWA-SW: SAM byte-equality vs oracle `bwa bwasw` (SE, PE, options)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="module")
def sw2_reads(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    lr = DATA / "sw2_long.fq"
    ns = DATA / "sw2_ns.fq"
    r1 = DATA / "sw2_pe_1.fq"
    r2 = DATA / "sw2_pe_2.fq"
    fa = DATA / "sw2_long.fa"
    contigs = random_genome(200_000, seed=7, n_contigs=2)
    if not lr.exists():
        reads = simulate_reads(contigs, 60, read_len=400, seed=133,
                               err_rate=0.01, indel_rate=0.001)
        write_fastq(lr, reads)
        # same reads as FASTA (no quality) exercises the qual=None path
        with open(fa, "w") as f:
            for name, seq, _ in reads:
                f.write(f">{name}\n{seq.decode()}\n")
    if not ns.exists():
        reads = simulate_reads(contigs, 25, read_len=350, seed=134,
                               err_rate=0.02, indel_rate=0.002)
        rng = np.random.default_rng(9)
        noisy = []
        for name, seq, q in reads:
            s = bytearray(seq)
            for _ in range(int(rng.integers(0, 6))):
                s[int(rng.integers(0, len(s)))] = ord("N")
            noisy.append((name, bytes(s), q))
        write_fastq(ns, noisy)
    if not r1.exists():
        a, b = simulate_reads(contigs, 40, read_len=250, seed=135,
                              err_rate=0.01, indel_rate=0.001, paired=True,
                              insert_mean=600, insert_std=60)
        write_fastq(r1, a)
        write_fastq(r2, b)
    return lr, fa, ns, r1, r2


def _mine(args):
    return subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                          check=True, capture_output=True, cwd=REPO).stdout


def _oracle(oracle_bwa, args):
    return subprocess.run([str(oracle_bwa), *args], check=True,
                          capture_output=True).stdout


def test_bwasw_se_bytes(oracle_bwa, small_genome, sw2_reads):
    lr = sw2_reads[0]
    theirs = _oracle(oracle_bwa, ["bwasw", "-t1", str(small_genome), str(lr)])
    mine = _mine(["bwasw", "-t1", str(small_genome), str(lr)])
    assert mine == theirs


def test_bwasw_fasta_input(oracle_bwa, small_genome, sw2_reads):
    fa = sw2_reads[1]
    theirs = _oracle(oracle_bwa, ["bwasw", str(small_genome), str(fa)])
    mine = _mine(["bwasw", str(small_genome), str(fa)])
    assert mine == theirs


def test_bwasw_ambiguous_bases(oracle_bwa, small_genome, sw2_reads):
    ns = sw2_reads[2]
    theirs = _oracle(oracle_bwa, ["bwasw", str(small_genome), str(ns)])
    mine = _mine(["bwasw", str(small_genome), str(ns)])
    assert mine == theirs


def test_bwasw_pe_bytes(oracle_bwa, small_genome, sw2_reads):
    _, _, _, r1, r2 = sw2_reads
    args = ["bwasw", str(small_genome), str(r1), str(r2)]
    assert _mine(args) == _oracle(oracle_bwa, args)
    args = ["bwasw", "-S", str(small_genome), str(r1), str(r2)]
    assert _mine(args) == _oracle(oracle_bwa, args)


def test_bwasw_option_variants(oracle_bwa, small_genome, sw2_reads):
    lr = sw2_reads[0]
    for extra in (["-z10"], ["-b5", "-q2", "-r1", "-z10"], ["-H", "-M"],
                  ["-s5", "-T20"], ["-N1", "-G500"], ["-w20"], ["-a2"]):
        args = ["bwasw", *extra, str(small_genome), str(lr)]
        assert _mine(args) == _oracle(oracle_bwa, args), extra
