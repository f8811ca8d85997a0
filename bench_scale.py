#!/usr/bin/env python
"""Genome-scale end-to-end benchmark (BASELINE.md GRCh38+ALT config).

Synthesizes a GRCh38-scale genome (default 3.1 Gbp + ALT contigs + N
holes + repeat library), builds OUR index (the oracle then maps with our
byte-compatible index files — cross-tool interop is the parity check),
simulates an SE read set, and times oracle `mem -t1` vs the TPU pipeline
with a SAM byte-diff (modulo @PG).

Usage: python bench_scale.py [--bp N] [--reads N] [--dir D] [--skip-build]
Prints one JSON line with build time, reads/s both sides, and parity.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bp", type=int, default=3_100_000_000)
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    d = Path(args.dir or f"/tmp/bwa_tpu_scale_{args.bp // 1_000_000}M")
    d.mkdir(parents=True, exist_ok=True)
    fa = d / "genome.fa"
    fq = d / "reads_se.fq"
    out = {"metric": "scale_mem_se", "bp": args.bp}

    from datagen import write_big_fasta, simulate_reads_stream, write_fastq

    if not fa.exists():
        print(f"[scale] writing {args.bp / 1e9:.2f} Gbp genome", file=sys.stderr)
        t0 = time.perf_counter()
        write_big_fasta(fa, args.bp)
        out["genome_write_s"] = round(time.perf_counter() - t0, 1)
    if not fq.exists():
        print("[scale] simulating reads", file=sys.stderr)
        reads = simulate_reads_stream(fa, args.reads)
        write_fastq(fq, reads)
    if not (d / "genome.fa.bwt").exists():
        print("[scale] building index", file=sys.stderr)
        from bwa_tpu.index.build import index_build

        t0 = time.perf_counter()
        index_build(fa)
        out["index_build_s"] = round(time.perf_counter() - t0, 1)
        print(f"[scale] index built in {out['index_build_s']}s", file=sys.stderr)

    # oracle maps with OUR index files (byte-compatible formats)
    base_ts, oracle_sam = [], None
    if ORACLE.exists():
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = subprocess.run([str(ORACLE), "mem", "-t1", str(fa), str(fq)],
                               check=True, capture_output=True)
            base_ts.append(time.perf_counter() - t0)
            oracle_sam = r.stdout
        out["oracle_s"] = [round(t, 2) for t in base_ts]

    from bwa_tpu.engine import make_engine
    from bwa_tpu.index.fmindex import FMIndex
    from bwa_tpu.io.fastq import SeqReader, read_batch
    from bwa_tpu.mem.pipeline import process_seqs
    from bwa_tpu.options import MemOptions
    from bwa_tpu.cli import _hdr_lines

    fm = FMIndex.load(fa)
    engine = make_engine(fm, os.environ.get("BWA_TPU_ENGINE", "tpu"))
    opt = MemOptions()
    reads = read_batch(SeqReader(fq), None, 1 << 62)
    process_seqs(opt, engine, fm, reads)  # warm-up/compile
    ours_ts = []
    for _ in range(args.reps):
        for r in reads:
            r.sam = ""
        t0 = time.perf_counter()
        process_seqs(opt, engine, fm, reads)
        ours_ts.append(time.perf_counter() - t0)
    out["ours_s"] = [round(t, 2) for t in ours_ts]
    out["reads_per_sec"] = round(args.reads / min(ours_ts), 1)
    if base_ts:
        out["oracle_reads_per_sec"] = round(args.reads / min(base_ts), 1)
        out["vs_baseline"] = round(min(base_ts) / min(ours_ts), 4)
    if oracle_sam is not None:
        strip = lambda s: b"\n".join(
            l for l in s.split(b"\n") if not l.startswith(b"@PG"))
        hdr = _hdr_lines(fm.bnt, None, "@PG\tID:bwa")
        mine = (hdr + "".join(r.sam for r in reads)).encode()
        out["byte_identical"] = strip(oracle_sam) == strip(mine)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
