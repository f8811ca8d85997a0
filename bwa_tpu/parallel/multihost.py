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
