"""Repeat-rich stress: exercises seed-cap retry, stack overflow fallback,
max_occ sampling and frac_rep on a genome with heavy tandem repeats."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="module")
def repeat_genome(oracle_bwa):
    from datagen import random_genome, simulate_reads, write_fasta, write_fastq

    fa = DATA / "rep_ref.fa"
    fq = DATA / "rep_reads.fq"
    r1 = DATA / "rep_pe_1.fq"
    r2 = DATA / "rep_pe_2.fq"
    if not fa.exists():
        rng = np.random.default_rng(71)
        (_, base), = random_genome(300_000, seed=73, n_contigs=1)
        # alpha-repeat-style: a 171bp monomer tandem-repeated with 2%
        # divergence, plus a 2kb segment duplicated 40 times
        monomer = bytes(base[1000:1171])
        bases = b"ACGT"
        arr = []
        for _ in range(400):
            m = bytearray(monomer)
            for i in np.nonzero(rng.random(len(m)) < 0.02)[0]:
                m[i] = bases[rng.integers(0, 4)]
            arr.append(bytes(m))
        alpha = b"".join(arr)
        seg = bytes(base[50_000:52_000])
        dups = []
        for _ in range(40):
            s = bytearray(seg)
            for i in np.nonzero(rng.random(len(s)) < 0.01)[0]:
                s[i] = bases[rng.integers(0, 4)]
            dups.append(bytes(s))
        genome = base[:100_000] + alpha + b"".join(dups) + base[100_000:]
        contigs = [("rep1", genome)]
        write_fasta(fa, contigs)
        subprocess.run([str(oracle_bwa), "index", str(fa)], check=True,
                       capture_output=True)
        reads = simulate_reads(contigs, 400, read_len=150, seed=79,
                               err_rate=0.01, indel_rate=0.001)
        write_fastq(fq, reads)
        a, b = simulate_reads(contigs, 150, read_len=150, seed=83,
                              err_rate=0.01, indel_rate=0.001, paired=True,
                              insert_mean=350, insert_std=40)
        write_fastq(r1, a)
        write_fastq(r2, b)
    return fa, fq, r1, r2


def _mine(args):
    return [l for l in subprocess.run(
        [sys.executable, "-m", "bwa_tpu.cli", *args], check=True,
        capture_output=True, cwd=REPO).stdout.decode().splitlines()
        if not l.startswith("@PG")]


def _oracle(oracle_bwa, args):
    return [l for l in subprocess.run(
        [str(oracle_bwa), *args], check=True,
        capture_output=True).stdout.decode().splitlines()
        if not l.startswith("@PG")]


def test_repeat_heavy_se(oracle_bwa, repeat_genome):
    fa, fq, _, _ = repeat_genome
    args = ["mem", str(fa), str(fq)]
    assert _mine(args) == _oracle(oracle_bwa, args)
    # the -c/-m mitigation from NEWS.md:296-300
    args = ["mem", "-c", "2000", "-m", "50", str(fa), str(fq)]
    assert _mine(args) == _oracle(oracle_bwa, args)


def test_repeat_heavy_pe(oracle_bwa, repeat_genome):
    fa, _, r1, r2 = repeat_genome
    args = ["mem", str(fa), str(r1), str(r2)]
    assert _mine(args) == _oracle(oracle_bwa, args)


def test_mem_repeat_heavy_ladder(oracle_bwa, tmp_path):
    """A genome dominated by a tandem repeat family: reads inside the
    repeats overflow the default seed/stack caps, exercising the device
    cap ladder (batch_seed.se_flat_buckets) that replaced the host-spec
    fallback — on GRCh38-scale repeat genomes that fallback was 90% of
    wall time.  Byte-equality proves the ladder (or, if exceeded, the
    residual tuple-path fallback) is exact."""
    import subprocess

    import numpy as np
    from datagen import write_fasta, write_fastq, simulate_reads

    rng = np.random.default_rng(77)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    unit = BASES[rng.integers(0, 4, 700)]
    genome = np.concatenate(
        [np.tile(unit, 60)] +
        [BASES[rng.integers(0, 4, 60_000)]] +
        [np.tile(unit[:320], 40)])
    contigs = [("rep", genome.tobytes())]
    fa = tmp_path / "rep.fa"
    write_fasta(fa, contigs)
    subprocess.run([str(oracle_bwa), "index", str(fa)], check=True,
                   capture_output=True)
    reads = simulate_reads(contigs, 600, read_len=150, seed=79,
                           err_rate=0.01)
    fq = tmp_path / "rep.fq"
    write_fastq(fq, reads)
    theirs = subprocess.run([str(oracle_bwa), "mem", "-t1", str(fa), str(fq)],
                            check=True, capture_output=True).stdout
    import os
    import sys
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    mine = subprocess.run([sys.executable, "-m", "bwa_tpu.cli", "mem",
                           str(fa), str(fq)], check=True,
                          capture_output=True, env=env).stdout
    strip = lambda b: [l for l in b.split(b"\n") if not l.startswith(b"@PG")]
    assert strip(theirs) == strip(mine)
