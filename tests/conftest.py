import os
import subprocess
import sys
from pathlib import Path

# Tests run sharding logic on a virtual 8-device CPU mesh.  The axon
# environment exports JAX_PLATFORMS=axon and its sitecustomize initializes
# the backend before conftest runs, so force CPU and reset the backends.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")


def _force_cpu_mesh():
    import jax
    from jax._src import xla_bridge as xb

    jax.config.update("jax_platforms", "cpu")
    if xb._backends:
        xb._clear_backends()


_force_cpu_mesh()

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pytest  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
ORACLE_SRC = Path("/root/reference")
ORACLE_DIR = Path("/tmp/bwa_oracle")
DATA_DIR = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="session")
def oracle_bwa() -> Path:
    """Locally compiled reference bwa binary (the golden oracle)."""
    exe = ORACLE_DIR / "src" / "bwa"
    if not exe.exists():
        src = ORACLE_DIR / "src"
        src.mkdir(parents=True, exist_ok=True)
        for pat in ("*.c", "*.h", "Makefile"):
            for f in ORACLE_SRC.glob(pat):
                (src / f.name).write_bytes(f.read_bytes())
        subprocess.run(["make", "-j4"], cwd=src, check=True, capture_output=True)
    return exe


@pytest.fixture(scope="session")
def small_genome(oracle_bwa) -> Path:
    """200kb 2-contig genome with N holes, indexed by the oracle."""
    from datagen import random_genome, write_fasta

    DATA_DIR.mkdir(parents=True, exist_ok=True)
    fa = DATA_DIR / "small.fa"
    if not fa.exists():
        write_fasta(fa, random_genome(200_000, seed=7, n_contigs=2))
        subprocess.run([str(oracle_bwa), "index", str(fa)], check=True,
                       capture_output=True)
    return fa


@pytest.fixture(scope="session")
def small_reads_se(small_genome) -> Path:
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA_DIR / "small_se.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 500, read_len=150, seed=13)
        write_fastq(fq, reads)
    return fq


@pytest.fixture(scope="session")
def small_reads_pe(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    fq1 = DATA_DIR / "small_pe_1.fq"
    fq2 = DATA_DIR / "small_pe_2.fq"
    if not fq1.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        r1, r2 = simulate_reads(contigs, 400, read_len=150, seed=17, paired=True)
        write_fastq(fq1, r1)
        write_fastq(fq2, r2)
    return fq1, fq2
