"""Multi-host data parallelism over DCN (SURVEY §5 distributed design).

The reference has no distributed backend; its determinism story is `-K`
fixed chunking so output is independent of thread count (fastmap.c:303).
The TPU-native equivalent keeps that exact property across HOSTS:

  * every host streams the same FASTQ(s) with the same chunk boundaries
    (`-K`-style fixed chunk_size x n_threads bases, even count for PE),
  * host h aligns the batches with index % n_hosts == h on its local
    chip(s) (the FM-index is replicated in each host's HBM; within a
    host, reads shard over the chip mesh — parallel/mesh.py),
  * each host writes its batches as ordered shards; `merge_shards`
    concatenates them in global batch order (the kt_pipeline ordered-
    step analog, kthread.c:96-113).

Because batch composition is identical to a single-host run, the
per-batch output — including `mem_pestat`'s batch statistics — is
byte-identical to the single-host (and reference) output after the merge.
In a real deployment each host calls `align_shard` under
`jax.distributed.initialize`; the function itself only needs (host_id,
n_hosts), so the tests drive it as separate processes/calls.
"""

from __future__ import annotations

import os
from pathlib import Path

from bwa_tpu.engine import make_engine
from bwa_tpu.index.fmindex import FMIndex
from bwa_tpu.io.fastq import SeqReader, read_batch
from bwa_tpu.options import MEM_F_PE


def distributed_init(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """jax.distributed scaffold for real multi-host runs: call once per
    host before align_shard.  Reads JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID when args are omitted (the
    standard launcher contract); no-ops on a single process so the same
    entry point serves one host and many.  Returns (host_id, n_hosts)."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_index(), jax.process_count()
    return process_id, num_processes


def align_distributed(prefix: str, fq1: str, fq2: str | None,
                      shard_dir: str, out_path: str | None = None,
                      opt=None, engine_kind=None, rg_id=None,
                      header: str = "") -> int:
    """Whole multi-host entry: jax.distributed init -> shard-aligned
    batches -> (on host 0) ordered merge.  Every host runs this same
    function; batch ownership is j %% n_hosts (the -K-deterministic
    chunking keeps the merged bytes identical to a single-host run)."""
    host_id, n_hosts = distributed_init()
    n = align_shard(prefix, fq1, fq2, host_id, n_hosts, shard_dir,
                    opt=opt, engine_kind=engine_kind, rg_id=rg_id)
    if n_hosts > 1:
        # EVERY process barriers before host 0 merges (a one-sided
        # barrier would deadlock the coordinator)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("bwa_tpu_merge")
    if out_path and host_id == 0:
        merge_shards(shard_dir, out_path, header)
    return n


def iter_batches(opt, fq1: str, fq2: str | None):
    """Deterministic batch stream shared by all hosts (bseq_read with the
    actual_chunk_size semantics of fastmap.c:394)."""
    ks1 = SeqReader(fq1)
    ks2 = SeqReader(fq2) if fq2 else None
    chunk = opt.chunk_size * opt.n_threads
    while True:
        reads = read_batch(ks1, ks2, chunk)
        if not reads:
            break
        yield reads


def align_shard(prefix: str, fq1: str, fq2: str | None, host_id: int,
                n_hosts: int, shard_dir: str, opt=None,
                engine_kind: str | None = None, rg_id=None) -> int:
    """Align this host's batches; writes <shard_dir>/batch<j>.sam per owned
    batch.  Returns the number of batches owned."""
    from bwa_tpu.mem.pipeline import process_seqs

    from bwa_tpu.options import MemOptions

    opt = opt or MemOptions()
    if fq2:
        opt.flag |= MEM_F_PE
    fm = FMIndex.load(prefix)
    engine = make_engine(fm, engine_kind)
    shard = Path(shard_dir)
    shard.mkdir(parents=True, exist_ok=True)
    n_processed = 0
    n_own = 0
    for j, reads in enumerate(iter_batches(opt, fq1, fq2)):
        if j % n_hosts == host_id:
            process_seqs(opt, engine, fm, reads, n_processed, None, rg_id)
            with open(shard / f"batch{j:08d}.sam", "w") as f:
                for r in reads:
                    f.write(r.sam)
            n_own += 1
        n_processed += len(reads)
    return n_own


def _main(argv=None) -> int:
    """Per-host launcher: `python -m bwa_tpu.parallel.multihost <prefix>
    <fq1> [fq2] --shard-dir D [--out merged.sam] [--engine host|tpu]`.
    Run once per host with the standard jax.distributed env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); host
    0 merges after the global barrier."""
    import argparse

    ap = argparse.ArgumentParser(prog="bwa_tpu.parallel.multihost")
    ap.add_argument("prefix")
    ap.add_argument("fq1")
    ap.add_argument("fq2", nargs="?", default=None)
    ap.add_argument("--shard-dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--engine", default=None)
    ap.add_argument("--chunk-size", type=int, default=None)
    a = ap.parse_args(argv)
    opt = None
    if a.chunk_size:
        from bwa_tpu.options import MemOptions

        opt = MemOptions()
        opt.chunk_size = a.chunk_size
        opt.n_threads = 1
    align_distributed(a.prefix, a.fq1, a.fq2, a.shard_dir, out_path=a.out,
                      opt=opt, engine_kind=a.engine)
    return 0


def merge_shards(shard_dir: str, out_path: str, header: str = "") -> int:
    """Ordered merge of every host's batch shards (host-side concatenation
    in chunk order — the ordered kt_pipeline step)."""
    shard = Path(shard_dir)
    parts = sorted(shard.glob("batch*.sam"))
    with open(out_path, "w") as out:
        if header:
            out.write(header)
        for p in parts:
            out.write(p.read_text())
    return len(parts)


if __name__ == "__main__":
    import sys

    sys.exit(_main())
