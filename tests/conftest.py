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

# ---------------------------------------------------------------------------
# Test tiers (CLAUDE.md "Verification"): the QUICK tier is the inner-loop
# suite (`pytest -m "not slow"`, target < 3 min quiet); the full suite is
# the pre-commit gate.  Functions listed here measured >= ~8 s in the
# round-5 timing run (pytest --durations); parametrized variants inherit
# the mark.  Everything still runs in the full suite.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_shm_stage_attach_destroy", "test_dryrun_multichip_8",
    "test_aln_device_sai_bytes", "test_mem_pe",
    "test_seek_path_reads_own_share_only", "test_mem_longread_presets",
    "test_mem_pacbio_tpu_engine_sharded", "test_mem_pe_isize_override",
    "test_repeat_heavy_se", "test_finalize_device_ext_byte_identical",
    "test_edge_inputs", "test_exact_match_intervals",
    "test_gap_machine_int64_coords", "test_mem_smart_pairing",
    "test_refill_mem_sam_byte_identical", "test_gap_machine_default",
    "test_mem_alt_aware", "test_mem_flag_combos",
    "test_two_real_processes_jax_distributed",
    "test_two_host_merge_matches_oracle", "test_mem_trip_sort_tpu_engine",
    "test_gap_machine_options", "test_mem_multi_alt_xa",
    "test_sampe_sam_hard", "test_refill_ladder_on_tiny_cap",
    "test_mem_se_flags", "test_gap_machine_cap_ladder",
    "test_fused_matches_four_call_path", "test_bwasw_option_variants",
    "test_mem_repeat_heavy_ladder", "test_refill_queue_wraps_lanes",
    "test_mem_fastmap_tpu_engine", "test_refill_matches_static",
    "test_aln_bam_variants", "test_repeat_heavy_pe",
    "test_aln_options_sai_bytes", "test_seed_machine_int64_coords",
    "test_index_rb2_oracle_bytes",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        if it.name.split("[")[0] in SLOW_TESTS:
            it.add_marker(pytest.mark.slow)


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
