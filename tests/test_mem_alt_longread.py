"""ALT-aware mapping and long-read presets: SAM byte-equality vs oracle."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


def _mine(args):
    return subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                          check=True, capture_output=True, cwd=REPO).stdout


def _oracle(oracle_bwa, args):
    return subprocess.run([str(oracle_bwa), *args], check=True,
                          capture_output=True).stdout


def _nopg(b):
    return [l for l in b.decode().splitlines() if not l.startswith("@PG")]


def _assert_same(oracle_bwa, args):
    assert _nopg(_mine(["mem", *args])) == _nopg(_oracle(oracle_bwa,
                                                         ["mem", *args]))


@pytest.fixture(scope="module")
def alt_genome(oracle_bwa):
    """A genome whose second contig is a (duplicated, mutated) ALT of a
    region of the first, with a .alt file marking it."""
    from datagen import random_genome, simulate_reads, write_fasta, write_fastq

    fa = DATA / "alt_ref.fa"
    fq = DATA / "alt_reads.fq"
    if not fa.exists():
        rng = np.random.default_rng(17)
        (n0, s0), = random_genome(150_000, seed=23, n_contigs=1)
        # ALT contig: copy of a 30kb window with 1% divergence
        win = bytearray(s0[60_000:90_000])
        idx = rng.random(len(win)) < 0.01
        bases = b"ACGT"
        for i in np.nonzero(idx)[0]:
            win[i] = bases[rng.integers(0, 4)]
        contigs = [("chr_pri", s0), ("chr_alt", bytes(win))]
        write_fasta(fa, contigs)
        (fa.parent / (fa.name + ".alt")).write_text(
            "chr_alt\t0\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
        subprocess.run([str(oracle_bwa), "index", str(fa)], check=True,
                       capture_output=True)
        # reads from both the shared region and elsewhere
        reads = simulate_reads(contigs, 300, read_len=150, seed=29,
                               err_rate=0.01, indel_rate=0.001)
        write_fastq(fq, reads)
    return fa, fq


def test_mem_alt_aware(oracle_bwa, alt_genome):
    fa, fq = alt_genome
    _assert_same(oracle_bwa, [str(fa), str(fq)])
    _assert_same(oracle_bwa, ["-a", str(fa), str(fq)])


@pytest.fixture(scope="module")
def long_reads(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA / "long_pb.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 24, read_len=1800, seed=41,
                               err_rate=0.06, indel_rate=0.01)
        write_fastq(fq, reads)
    return fq


def test_mem_longread_presets(oracle_bwa, small_genome, long_reads):
    for preset in ("pacbio", "ont2d", "intractg"):
        _assert_same(oracle_bwa,
                     ["-x", preset, str(small_genome), str(long_reads)])


def test_mem_longread_default(oracle_bwa, small_genome, long_reads):
    _assert_same(oracle_bwa, [str(small_genome), str(long_reads)])


@pytest.fixture(scope="module")
def multi_alt_genome(oracle_bwa):
    """TWO ALT contigs duplicating the same primary window: a read hitting
    the window gets hits on all three, exercising the XA drop-ratio path
    where the score product straddles an integer (the reference stores
    XA_drop_ratio as C float, bwamem.h:76 -- 150*(float)0.8 > 120, so a
    score-120 XA candidate is EXCLUDED; double 0.8 would include it)."""
    from datagen import random_genome, simulate_reads, write_fasta, write_fastq

    fa = DATA / "alt2_ref.fa"
    fq = DATA / "alt2_reads.fq"
    if not fa.exists():
        rng = np.random.default_rng(41)
        (n0, s0), = random_genome(120_000, seed=43, n_contigs=1)
        bases = b"ACGT"
        contigs = [("chr_pri", s0)]
        for ai, div in ((1, 0.02), (2, 0.04)):
            win = bytearray(s0[40_000:80_000])
            idx = rng.random(len(win)) < div
            for i in np.nonzero(idx)[0]:
                win[i] = bases[rng.integers(0, 4)]
            contigs.append((f"chr_alt{ai}", bytes(win)))
        write_fasta(fa, contigs)
        (fa.parent / (fa.name + ".alt")).write_text(
            "chr_alt1\t0\t*\t0\t0\n" "chr_alt2\t0\t*\t0\t0\n")
        subprocess.run([str(oracle_bwa), "index", str(fa)], check=True,
                       capture_output=True)
        reads = simulate_reads(contigs, 400, read_len=150, seed=47,
                               err_rate=0.02)
        write_fastq(fq, reads)
    return fa, fq


def test_mem_multi_alt_xa(oracle_bwa, multi_alt_genome):
    fa, fq = multi_alt_genome
    _assert_same(oracle_bwa, [str(fa), str(fq)])
