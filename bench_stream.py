#!/usr/bin/env python
"""Sustained-scale streaming benchmark (production shape: a long FASTQ
streamed through the CLI's 3-stage pipeline against a big index).

The one-shot scale numbers (bench_scale.py) time a single 8192-read batch;
production shape is a multi-chunk stream where the reader thread parses
chunk k+2 and the writer drains chunk k-1 while chunk k computes (the
kt_pipeline analog, kthread.c:119-147 / fastmap.c:64-123).  This bench
streams >=1M reads and reports:

  * sustained reads/s over the whole stream (wall, warm engine),
  * steady-state reads/s over the last 80% of chunks (excludes ramp),
  * the oracle's reads/s measured on a prefix (a full oracle run at
    GRCh38 scale takes hours; the per-read rate is flat across chunks,
    so a prefix rate is the honest denominator — noted in the output),
  * byte-identity of our first-chunk SAM records vs the oracle on the
    same prefix with the same -K chunking (PE insert-size stats are
    per-chunk, so equal chunk boundaries make records comparable).

Usage: python bench_stream.py [--dir D] [--reads N] [--pe] [--bp N]
Prints one JSON line.
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

ORACLE = Path("/tmp/bwa_oracle/src/bwa")
READ_LEN = 150
PREFIX_READS = 16384  # oracle parity prefix = exactly one -K chunk


def _strip_hdr(sam: bytes) -> list[bytes]:
    return [l for l in sam.split(b"\n") if l and not l.startswith(b"@")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=None)
    ap.add_argument("--bp", type=int, default=3_100_000_000)
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--pe", action="store_true")
    args = ap.parse_args()

    d = Path(args.dir or f"/tmp/bwa_tpu_scale_{args.bp // 1_000_000}M")
    fa = d / "genome.fa"
    if not (d / "genome.fa.bwt").exists():
        print(f"[stream] no index under {d}; run bench_scale.py first",
              file=sys.stderr)
        return 1

    from datagen import simulate_reads_stream, write_fastq

    tag = "pe" if args.pe else "se"
    fq1 = d / f"stream_{tag}_{args.reads}_1.fq"
    fq2 = d / f"stream_{tag}_{args.reads}_2.fq"
    if not fq1.exists():
        print(f"[stream] simulating {args.reads} {tag.upper()} reads",
              file=sys.stderr)
        if args.pe:
            r1, r2 = simulate_reads_stream(fa, args.reads, paired=True)
            write_fastq(fq1, r1)
            write_fastq(fq2, r2)
        else:
            write_fastq(fq1, simulate_reads_stream(fa, args.reads))
    # parity prefix files (named by the parent read set: a prefix of a
    # different-sized simulation is a different read set entirely)
    pfq1 = d / f"stream_{tag}_{args.reads}_prefix_1.fq"
    pfq2 = d / f"stream_{tag}_{args.reads}_prefix_2.fq"
    if not pfq1.exists():
        for src, dst in ([(fq1, pfq1), (fq2, pfq2)] if args.pe
                         else [(fq1, pfq1)]):
            with open(src, "rb") as f, open(dst, "wb") as g:
                for _ in range(PREFIX_READS * 4 // (2 if args.pe else 1)):
                    g.write(f.readline())

    chunk_bases = PREFIX_READS * READ_LEN  # one -K chunk == the prefix
    kargs = ["-K", str(chunk_bases)]

    # oracle prefix rate + parity bytes
    o_sam = o_dt = None
    if ORACLE.exists():
        fqs = [str(pfq1), str(pfq2)] if args.pe else [str(pfq1)]
        t0 = time.perf_counter()
        r = subprocess.run([str(ORACLE), "mem", "-t1", *kargs, str(fa), *fqs],
                           check=True, capture_output=True)
        o_dt = time.perf_counter() - t0
        o_sam = r.stdout
        print(f"[stream] oracle prefix ({PREFIX_READS} reads): {o_dt:.1f}s",
              file=sys.stderr)

    # our full stream, in-process (warm engine measured separately from
    # the per-process index load / program warm-up)
    from bwa_tpu import cli

    out_path = d / f"stream_{tag}_out.sam"
    stream_argv = [*kargs, str(fa)] + ([str(fq1), str(fq2)] if args.pe
                                       else [str(fq1)])
    chunk_ts: list[tuple[float, int]] = []  # (t_done, n_reads) per chunk

    t0 = time.perf_counter()
    with open(out_path, "w") as f:
        rc = cli.main_mem(stream_argv, out_fp_override=f,
                          chunk_done_hook=lambda n: chunk_ts.append(
                              (time.perf_counter(), n)))
    wall = time.perf_counter() - t0
    assert rc == 0

    n_total = sum(n for _, n in chunk_ts)
    sustained = n_total / wall
    # steady state: drop the first 20% of chunks (engine warm-up, first
    # program load at each shape)
    steady = None
    if len(chunk_ts) >= 5:
        k = max(1, len(chunk_ts) // 5)
        t_start = chunk_ts[k - 1][0]
        n_tail = sum(n for _, n in chunk_ts[k:])
        steady = n_tail / (chunk_ts[-1][0] - t_start)

    # parity: our first-chunk records vs the oracle prefix run
    byte_identical = None
    if o_sam is not None:
        ours_lines = _strip_hdr(out_path.read_bytes())
        oracle_lines = _strip_hdr(o_sam)
        byte_identical = ours_lines[:len(oracle_lines)] == oracle_lines
        if not byte_identical:
            for i, (a, b) in enumerate(zip(ours_lines, oracle_lines)):
                if a != b:
                    print(f"[stream] first diff at record {i}:\n  ours   {a[:160]!r}\n  oracle {b[:160]!r}",
                          file=sys.stderr)
                    break

    oracle_rate = (PREFIX_READS * (2 if args.pe else 1) / o_dt) if o_dt else None
    print(json.dumps({
        "metric": f"stream_{tag}_reads_per_sec",
        "value": round(sustained, 1),
        "unit": "reads/s",
        "vs_baseline": round(sustained / oracle_rate, 3) if oracle_rate else None,
        "steady_reads_per_sec": round(steady, 1) if steady else None,
        "n_reads": n_total,
        "wall_s": round(wall, 1),
        "chunks": len(chunk_ts),
        "oracle_prefix_reads_per_sec": round(oracle_rate, 1) if oracle_rate else None,
        "oracle_note": "oracle rate measured on a prefix (full run is hours); per-read rate is chunk-flat",
        "byte_identical_prefix": byte_identical,
        "engine": os.environ.get("BWA_TPU_ENGINE", "tpu"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
