#!/usr/bin/env python
"""Full-scale bounded-memory index build (VERDICT r3 task 5).

Synthesizes the 3.1 Gbp GRCh38-scale genome (same generator as
bench_scale.py), runs OUR `index -a bwtsw` (the bounded incremental
builder, native/bwtinc.cpp — the bwt_gen.c:1431 memory property) over
the 6.2e9-char doubled text, records wall time and peak RSS, then
validates by cross-tool interop: the ORACLE maps reads with OUR index
files and the SAM is byte-diffed against our own mapping (plus the
existing 1e8-char byte-diff vs the oracle's own build in
tests/test_index.py).  Prints one JSON line.
"""

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

ORACLE = Path("/tmp/bwa_oracle/src/bwa")
D = Path(os.environ.get("BWA_TPU_SCALE_DIR", "/tmp/bwa_tpu_scale_3100M"))


def rss_sampler(stop, peak):
    pid = os.getpid()
    while not stop.is_set():
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        peak[0] = max(peak[0], int(line.split()[1]))
        except OSError:
            pass
        stop.wait(2.0)


def main():
    D.mkdir(parents=True, exist_ok=True)
    fa = D / "genome.fa"
    fq = D / "reads_se.fq"
    out = {"metric": "bounded_index_build", "bp": 3_100_000_000}

    from datagen import simulate_reads_stream, write_big_fasta, write_fastq

    if not fa.exists():
        print("[scale] writing 3.10 Gbp genome", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        write_big_fasta(fa, 3_100_000_000)
        out["genome_write_s"] = round(time.perf_counter() - t0, 1)
    if not fq.exists():
        write_fastq(fq, simulate_reads_stream(fa, 8192))

    stop = threading.Event()
    peak = [0]
    t = threading.Thread(target=rss_sampler, args=(stop, peak), daemon=True)
    t.start()
    from bwa_tpu.index.build import index_build

    print("[scale] index -a bwtsw (bounded builder)", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    index_build(fa, algo="bwtsw")
    out["build_s"] = round(time.perf_counter() - t0, 1)
    stop.set()
    out["peak_rss_gb"] = round(peak[0] / 1e6, 2)
    for ext in (".pac", ".ann", ".amb", ".bwt", ".sa"):
        out["size" + ext] = (Path(str(fa) + ext)).stat().st_size

    # cross-tool validation: oracle maps with OUR index; our pipeline maps
    # with the same index (host engine: no device dependency); byte-diff.
    print("[scale] oracle mapping over our index", file=sys.stderr,
          flush=True)
    r = subprocess.run([str(ORACLE), "mem", "-t1", str(fa), str(fq)],
                       check=True, capture_output=True)
    env = dict(os.environ, BWA_TPU_ENGINE=os.environ.get(
        "BWA_TPU_ENGINE", "tpu"))
    m = subprocess.run([sys.executable, "-m", "bwa_tpu.cli", "mem", "-t1",
                        str(fa), str(fq)], check=True, capture_output=True,
                       env=env, cwd=str(REPO))
    strip = lambda s: [l for l in s.split(b"\n") if not l.startswith(b"@PG")]
    out["byte_identical"] = strip(r.stdout) == strip(m.stdout)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
