#!/usr/bin/env python
"""Multi-host scaling proxy measurement (SURVEY §6 north star: >=80%
efficiency at 2 hosts).

This box has ONE CPU core, so 2-process wall-clock cannot demonstrate
scaling; the honest, contention-robust proxy is CPU seconds: run the
1-host alignment and both 2-host shards in one process (host engine,
identical -K chunking — the shard split the real jax.distributed path
uses, tests/test_multihost.py), and compare total compute CPU.

    efficiency = cpu(1 host) / sum(cpu(host h of 2))

With the pre-scanned batch-offset table (multihost.scan_batch_offsets)
each worker also READS only ~1/2 of the FASTQ — both numbers are
printed.  Prints one JSON line.
"""

import json
import os
import resource
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

BENCH_DIR = Path(os.environ.get("BWA_TPU_BENCH_DIR", "/tmp/bwa_tpu_bench24"))


def cpu_s() -> float:
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


N_READS = int(os.environ.get("BWA_TPU_MH_READS", 8192))


def main():
    from bench import _ensure_data, _ensure_oracle  # bench genome/reads

    _ensure_oracle()
    fa, fq = _ensure_data()
    if N_READS:  # 4-line FASTQ records — head -n is exact
        sub = BENCH_DIR / f"mh_{N_READS}.fq"
        if not sub.exists():
            with open(fq) as src, open(sub, "w") as dst:
                for i, line in enumerate(src):
                    if i >= 4 * N_READS:
                        break
                    dst.write(line)
        fq = sub
    from bwa_tpu.options import MemOptions
    from bwa_tpu.parallel import multihost
    from bwa_tpu.parallel.multihost import (align_shard, merge_shards,
                                            scan_batch_offsets)

    def mk_opt():
        o = MemOptions()
        o.n_threads = 1
        # ~16 -K batches so the round-robin shard split is balanced
        o.chunk_size = max(20_000, N_READS * 150 // 16)
        return o

    import tempfile

    total_bytes = Path(fq).stat().st_size
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        offsets = scan_batch_offsets(mk_opt(), str(fq), None)

        t0 = cpu_s()
        align_shard(str(fa), str(fq), None, 0, 1, str(td / "one"),
                    opt=mk_opt(), engine_kind="host", offsets=offsets)
        cpu1 = cpu_s() - t0

        cpu2, bytes2 = [], []
        for h in range(2):
            t0 = cpu_s()
            align_shard(str(fa), str(fq), None, h, 2, str(td / "two"),
                        opt=mk_opt(), engine_kind="host", offsets=offsets)
            cpu2.append(cpu_s() - t0)
            bytes2.append(multihost.last_bytes_read)

        m1, m2 = td / "one.sam", td / "two.sam"
        merge_shards(str(td / "one"), str(m1))
        merge_shards(str(td / "two"), str(m2))
        identical = m1.read_bytes() == m2.read_bytes()

    eff = cpu1 / sum(cpu2)
    print(json.dumps({
        "metric": "multihost_2proc_cpu_efficiency", "value": round(eff, 4),
        "unit": "ratio", "vs_baseline": round(eff / 0.80, 4),
        "cpu_1host_s": round(cpu1, 2),
        "cpu_2host_s": [round(c, 2) for c in cpu2],
        "bytes_read_frac": [round(b / total_bytes, 3) for b in bytes2],
        "byte_identical_merge": identical,
    }))


if __name__ == "__main__":
    main()
