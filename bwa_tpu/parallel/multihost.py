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
    offsets = None
    can_seek = _seekable(fq1) and (fq2 is None or _seekable(fq2))
    if n_hosts > 1 and can_seek:
        # scan the -K batch boundaries ONCE (host 0) and share the table,
        # so each host reads only its own ~1/n_hosts of the input
        import json

        from jax.experimental import multihost_utils

        from bwa_tpu.options import MemOptions

        tbl = Path(shard_dir) / "offsets.json"
        if host_id == 0:
            tbl.parent.mkdir(parents=True, exist_ok=True)
            offsets = scan_batch_offsets(opt or MemOptions(), fq1, fq2)
            tbl.write_text(json.dumps(offsets))
        multihost_utils.sync_global_devices("bwa_tpu_offsets")
        if host_id != 0:
            offsets = [tuple(row) for row in json.loads(tbl.read_text())]
    n = align_shard(prefix, fq1, fq2, host_id, n_hosts, shard_dir,
                    opt=opt, engine_kind=engine_kind, rg_id=rg_id,
                    offsets=offsets)
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


def _seekable(path) -> bool:
    """Plain uncompressed regular file (the seek-to-batch fast path);
    gz/stdin/URL inputs keep the streaming path."""
    p = str(path)
    if p == "-" or p.startswith(("http://", "ftp://", "https://")):
        return False
    try:
        with open(p, "rb") as f:
            return f.read(2) != b"\x1f\x8b"
    except OSError:
        return False


def _scan_records(path) -> list[tuple[int, int]]:
    """One sequential lex pass over an uncompressed FASTA/FASTQ: returns
    (byte offset of record header, sequence length) per record, with
    exactly SeqReader's record-boundary semantics (multi-line sequences,
    blank-line skips, qual read until len(qual) >= len(seq))."""
    out: list[tuple[int, int]] = []
    with open(str(path), "rb") as f:
        pos = 0
        pending: tuple[bytes, int] | None = None  # pushed-back header
        while True:
            if pending is not None:
                line, start = pending
                pending = None
            else:
                start = pos
                line = f.readline()
                pos += len(line)
            if not line:
                break
            s = line.rstrip(b"\r\n")
            if not s:
                continue
            if s[:1] not in (b"@", b">"):
                raise ValueError(f"malformed record header: {s[:40]!r}")
            seq_len = 0
            while True:
                lstart = pos
                body = f.readline()
                pos += len(body)
                if not body:
                    break
                b = body.rstrip(b"\r\n")
                if b[:1] == b"+":
                    got = 0
                    while got < seq_len:
                        ql = f.readline()
                        if not ql:
                            break
                        pos += len(ql)
                        got += len(ql.rstrip(b"\r\n"))
                    break
                if b[:1] in (b"@", b">"):
                    pending = (body, lstart)
                    break
                seq_len += len(b)
            out.append((start, seq_len))
    return out


def scan_batch_offsets(opt, fq1: str, fq2: str | None):
    """Pre-scan the -K batch boundaries ONCE: returns one row per batch,
    (off1, off2, n_records_per_file, n_processed_before).  Row j lets a
    host seek straight to its own batches instead of parsing the entire
    input and discarding (n_hosts-1)/n_hosts of it — while preserving
    bseq_read's exact batch composition (size >= chunk AND even read
    count, bwa.c:79-112), so the merged output stays byte-identical."""
    recs1 = _scan_records(fq1)
    recs2 = _scan_records(fq2) if fq2 else None
    if recs2 is not None and len(recs2) < len(recs1):
        import sys
        print("[W::bseq_read] the 2nd file has fewer sequences.",
              file=sys.stderr)
    n = min(len(recs1), len(recs2)) if recs2 is not None else len(recs1)
    chunk = opt.chunk_size * opt.n_threads
    batches = []
    i = 0
    n_processed = 0
    while i < n:
        off1 = recs1[i][0]
        off2 = recs2[i][0] if recs2 is not None else -1
        size = 0
        cnt = 0
        j = i
        while j < n:
            size += recs1[j][1]
            cnt += 1
            if recs2 is not None:
                size += recs2[j][1]
                cnt += 1
            j += 1
            if size >= chunk and cnt % 2 == 0:
                break
        batches.append((off1, off2, j - i, n_processed))
        n_processed += cnt
        i = j
    return batches


def _read_n(ks1: SeqReader, ks2: SeqReader | None, n: int):
    """Read exactly n records per file, building the batch exactly like
    read_batch (interleaved PE, batch-local ids, comments dropped)."""
    reads = []
    for _ in range(n):
        r1 = next(iter(ks1))
        r1.id = len(reads)
        r1.comment = None
        reads.append(r1)
        if ks2 is not None:
            r2 = next(iter(ks2))
            r2.id = len(reads)
            r2.comment = None
            reads.append(r2)
    return reads


# bytes of FASTQ consumed by the last align_shard call's alignment phase
# (excludes any offset pre-scan) — observability for the no-amplification
# property: host h should read ~1/n_hosts of the input, not all of it
last_bytes_read = 0


class _CountingFile:
    """Minimal readline wrapper that counts bytes consumed."""

    def __init__(self, f):
        self.f = f
        self.n = 0

    def readline(self):
        l = self.f.readline()
        self.n += len(l)
        return l

    def close(self):
        self.f.close()


def align_shard(prefix: str, fq1: str, fq2: str | None, host_id: int,
                n_hosts: int, shard_dir: str, opt=None,
                engine_kind: str | None = None, rg_id=None,
                offsets=None) -> int:
    """Align this host's batches; writes <shard_dir>/batch<j>.sam per owned
    batch.  Returns the number of batches owned.

    With seekable inputs the host seeks straight to its own batches via
    the pre-scanned offset table (`offsets`, or scanned here when None)
    instead of parsing the whole input and discarding the other hosts'
    share; gz/stdin/URL inputs fall back to the streaming path (same
    bytes out either way — batch composition is identical)."""
    global last_bytes_read
    from bwa_tpu.mem.pipeline import process_seqs
    from bwa_tpu.options import MemOptions

    opt = opt or MemOptions()
    if fq2:
        opt.flag |= MEM_F_PE
    fm = FMIndex.load(prefix)
    engine = make_engine(fm, engine_kind)
    shard = Path(shard_dir)
    shard.mkdir(parents=True, exist_ok=True)
    n_own = 0
    can_seek = _seekable(fq1) and (fq2 is None or _seekable(fq2))
    if offsets is None and can_seek and n_hosts > 1:
        offsets = scan_batch_offsets(opt, fq1, fq2)
    if offsets is not None and can_seek:
        last_bytes_read = 0
        f1 = _CountingFile(open(str(fq1), "rb"))
        f2 = _CountingFile(open(str(fq2), "rb")) if fq2 else None
        for j, (off1, off2, n_rec, n_processed) in enumerate(offsets):
            if j % n_hosts != host_id:
                continue
            f1.f.seek(off1)
            ks1 = SeqReader(f1)
            ks2 = None
            if f2 is not None:
                f2.f.seek(off2)
                ks2 = SeqReader(f2)
            reads = _read_n(ks1, ks2, n_rec)
            process_seqs(opt, engine, fm, reads, n_processed, None, rg_id)
            with open(shard / f"batch{j:08d}.sam", "w") as f:
                for r in reads:
                    f.write(r.sam)
            n_own += 1
        last_bytes_read = f1.n + (f2.n if f2 is not None else 0)
        f1.close()
        if f2 is not None:
            f2.close()
        return n_own
    n_processed = 0
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
