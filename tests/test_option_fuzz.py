"""Seeded option-combination fuzz: random flag pairs vs oracle."""

import random
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")

MEM_FLAGS = [[], ["-a"], ["-T", "12"], ["-k", "15"], ["-L", "3,8"],
             ["-O", "5,7"], ["-E", "2,3"], ["-B", "2"], ["-A", "2"],
             ["-d", "50"], ["-r", "1.2"], ["-c", "50"], ["-D", "0.3"],
             ["-W", "10"], ["-y", "10"], ["-U", "5"], ["-w", "30"],
             ["-s", "2"]]


@pytest.fixture(scope="module")
def fuzz_reads(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA / "fuzz_se.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 80, read_len=120, seed=61,
                               err_rate=0.02, indel_rate=0.004)
        write_fastq(fq, reads)
    return fq


def test_mem_flag_combos(oracle_bwa, small_genome, fuzz_reads):
    rnd = random.Random(777)
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@PG")]
    for _ in range(6):
        picks = rnd.sample(MEM_FLAGS, rnd.randint(1, 3))
        flags = [x for f in picks for x in f]
        cmd = ["mem", *flags, str(small_genome), str(fuzz_reads)]
        ro = subprocess.run([str(oracle_bwa), *cmd], capture_output=True)
        rt = subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *cmd],
                            capture_output=True, cwd=REPO)
        assert strip(rt.stdout) == strip(ro.stdout), flags
