"""Multi-host sharding: 2-host merged SAM == single-host == oracle."""

import subprocess
from pathlib import Path

import pytest

DATA = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="module")
def mh_reads(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA / "mh_se.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 400, read_len=150, seed=57,
                               err_rate=0.01, indel_rate=0.001)
        write_fastq(fq, reads)
    return fq


def test_two_real_processes_jax_distributed(oracle_bwa, small_genome,
                                            mh_reads, tmp_path):
    """Two REAL processes under jax.distributed.initialize (CPU backend,
    local coordinator): each runs align_distributed, all barrier via
    sync_global_devices, process 0 merges — merged bytes == oracle with
    the same -K chunking."""
    import os
    import socket
    import sys
    from pathlib import Path

    REPO = Path(__file__).resolve().parent.parent
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    shard = tmp_path / "dshards"
    out = tmp_path / "dmerged.sam"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": str(REPO),  # no axon plugin in the workers
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        env.pop("XLA_FLAGS", None)
        args = [sys.executable, "-m", "bwa_tpu.parallel.multihost",
                str(small_genome), str(mh_reads), "--shard-dir",
                str(shard), "--engine", "host", "--chunk-size", "20000"]
        if pid == 0:
            args += ["--out", str(out)]
        procs.append(subprocess.Popen(args, env=env, cwd=REPO,
                                      stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    r = subprocess.run([str(oracle_bwa), "mem", "-K", "20000",
                        str(small_genome), str(mh_reads)],
                       check=True, capture_output=True)
    oracle_body = "".join(l + "\n" for l in r.stdout.decode().splitlines()
                          if not l.startswith("@"))
    assert out.read_text() == oracle_body


def test_two_host_merge_matches_oracle(oracle_bwa, small_genome, mh_reads,
                                       tmp_path):
    from bwa_tpu.options import MemOptions
    from bwa_tpu.parallel.multihost import align_shard, merge_shards

    # small chunks so the run spans several batches
    def mk_opt():
        o = MemOptions()
        o.chunk_size = 20_000
        o.n_threads = 1
        return o

    shard = tmp_path / "shards"
    n0 = align_shard(str(small_genome), str(mh_reads), None, 0, 2,
                     str(shard), opt=mk_opt(), engine_kind="host")
    n1 = align_shard(str(small_genome), str(mh_reads), None, 1, 2,
                     str(shard), opt=mk_opt(), engine_kind="host")
    assert n0 + n1 >= 3  # actually sharded across several batches
    merged = tmp_path / "merged.sam"
    merge_shards(str(shard), str(merged))

    # single "host" with identical chunking
    shard1 = tmp_path / "one"
    align_shard(str(small_genome), str(mh_reads), None, 0, 1, str(shard1),
                opt=mk_opt(), engine_kind="host")
    single = tmp_path / "single.sam"
    merge_shards(str(shard1), str(single))
    assert merged.read_text() == single.read_text()

    # oracle with the same -K chunking (body lines; headers differ by @PG)
    r = subprocess.run([str(oracle_bwa), "mem", "-K", "20000",
                        str(small_genome), str(mh_reads)],
                       check=True, capture_output=True)
    oracle_body = "".join(l + "\n" for l in r.stdout.decode().splitlines()
                          if not l.startswith("@"))
    assert merged.read_text() == oracle_body


def test_seek_path_reads_own_share_only(small_genome, mh_reads, tmp_path):
    """The pre-scanned offset table (scan_batch_offsets) lets a host seek
    to its own batches: byte-identical output to the streaming path with
    each worker's alignment phase reading ~1/2 of the input, not all of
    it (the round-3 O(n_hosts x input) amplification)."""
    from bwa_tpu.options import MemOptions
    from bwa_tpu.parallel import multihost
    from bwa_tpu.parallel.multihost import (align_shard, merge_shards,
                                            scan_batch_offsets)

    def mk_opt():
        o = MemOptions()
        o.chunk_size = 20_000
        o.n_threads = 1
        return o

    total = mh_reads.stat().st_size
    offsets = scan_batch_offsets(mk_opt(), str(mh_reads), None)
    assert len(offsets) >= 3
    shard = tmp_path / "shards"
    per_host = []
    for h in range(2):
        align_shard(str(small_genome), str(mh_reads), None, h, 2,
                    str(shard), opt=mk_opt(), engine_kind="host",
                    offsets=offsets)
        per_host.append(multihost.last_bytes_read)
    # each host consumed well under the whole file, and the two shares
    # cover it together (boundary slop: one record of read-ahead/batch)
    for n in per_host:
        assert n < 0.75 * total, (n, total)
    assert sum(per_host) < 1.25 * total
    merged = tmp_path / "m.sam"
    merge_shards(str(shard), str(merged))

    # identical to the streaming (parse-everything) path
    shard2 = tmp_path / "stream"
    for h in range(2):
        align_shard(str(small_genome), str(mh_reads), None, h, 2,
                    str(shard2), opt=mk_opt(), engine_kind="host",
                    offsets=None)
    # offsets=None + n_hosts>1 + seekable scans internally; force the
    # streaming path via a non-seekable stand-in: gzip the input
    import gzip as _gz
    gz = tmp_path / "r.fq.gz"
    gz.write_bytes(_gz.compress(mh_reads.read_bytes()))
    shard3 = tmp_path / "gz"
    for h in range(2):
        align_shard(str(small_genome), str(gz), None, h, 2, str(shard3),
                    opt=mk_opt(), engine_kind="host")
    m3 = tmp_path / "m3.sam"
    merge_shards(str(shard3), str(m3))
    assert merged.read_text() == m3.read_text()
