"""CLI-level oracle diff with the batched (tpu) engine pinned.

The rest of the suite drives the CLI with the host engine (the CPU
default of engine.make_engine's auto mode); this closes the coverage
hole for the device-engine wiring — collect_seeds, the seed demux, the
width-sliced D2H and the batched fastmap path all sit between the CLI
and the oracle here."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


def _run_pair(oracle_bwa, args, env=None):
    e = dict(os.environ)
    e.update(env or {})
    ro = subprocess.run([str(oracle_bwa), *args], capture_output=True)
    rt = subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                        capture_output=True, cwd=REPO, env=e)
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@")]
    assert strip(rt.stdout) == strip(ro.stdout), (args, rt.stderr[-300:])


def test_mem_pacbio_tpu_engine_sharded(oracle_bwa, small_genome):
    """Long reads through the device engine: lane-SHARDED seeding (one
    read's start-cursor range split over n_shard lanes + provenance-
    tagged dedup, batch_seed._pack_bucket/_demux_bucket) and the
    speculative device extension — byte-diffed against the oracle."""
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA / "tpu_engine_pb.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 24, read_len=1100, seed=93,
                               err_rate=0.05, indel_rate=0.02)
        write_fastq(fq, reads)
    env = {"BWA_TPU_ENGINE": "tpu", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(REPO), "BWA_TPU_SEED_SHARD": "4"}
    _run_pair(oracle_bwa, ["mem", "-x", "pacbio", str(small_genome),
                           str(fq)], env)


def test_mem_fastmap_tpu_engine(oracle_bwa, small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA / "tpu_engine_se.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 200, read_len=120, seed=91,
                               err_rate=0.02, indel_rate=0.004)
        write_fastq(fq, reads)
    # drop the axon plugin from PYTHONPATH so its sitecustomize cannot
    # claim the backend — the batched engine must run on host CPU here
    env = {"BWA_TPU_ENGINE": "tpu", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(REPO)}
    _run_pair(oracle_bwa, ["mem", str(small_genome), str(fq)], env)
    _run_pair(oracle_bwa, ["fastmap", str(small_genome), str(fq)], env)


def test_mem_trip_sort_tpu_engine(oracle_bwa, small_genome, small_reads_se,
                                  small_reads_pe):
    """Trip-sorted antithetic bucket packing (batch_seed.trip_order):
    reads flow through seeding in probe-predicted trip order, SAM
    scatters back to file order with ORIGINAL hash_64 ids — byte-diffed
    against the oracle for SE (per-bucket finalize with the ids array)
    and PE (collect_se_flat's segment gather back to file order).
    force bypasses the B>=4096 amortization gate so the small suite
    genuinely exercises the permuted path."""
    env = {"BWA_TPU_ENGINE": "tpu", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(REPO), "BWA_TPU_TRIP_SORT": "force"}
    _run_pair(oracle_bwa, ["mem", str(small_genome), str(small_reads_se)],
              env)
    fq1, fq2 = small_reads_pe
    _run_pair(oracle_bwa, ["mem", str(small_genome), str(fq1), str(fq2)],
              env)
