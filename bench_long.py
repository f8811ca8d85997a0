#!/usr/bin/env python
"""Long-read / extra-config benchmark harness (pacbio, bwasw, aln+samse,
fastmap) vs the locally compiled reference.

Usage: python bench_long.py [pacbio|bwasw|backtrack|fastmap] ...
Prints one JSON line per config.  Data cached in /tmp/bwa_tpu_bench_long.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

BENCH_DIR = Path("/tmp/bwa_tpu_bench_long")
ORACLE = Path("/tmp/bwa_oracle/src/bwa")
N_REPS = int(os.environ.get("BWA_TPU_BENCH_REPS", 3))


def _ensure_data():
    from datagen import random_genome, simulate_reads, write_fasta, write_fastq

    BENCH_DIR.mkdir(parents=True, exist_ok=True)
    fa = BENCH_DIR / "bench.fa"
    if not fa.exists():
        contigs = random_genome(2_000_000, seed=101, n_contigs=1,
                                with_ns=False)
        write_fasta(fa, contigs)
        pb = simulate_reads(contigs, 512, read_len=2000, seed=107,
                            err_rate=0.05, indel_rate=0.03)
        write_fastq(BENCH_DIR / "pb.fq", pb)
        se = simulate_reads(contigs, 8192, read_len=150, seed=103)
        write_fastq(BENCH_DIR / "se150.fq", se)
    if not (BENCH_DIR / "pe_1.fq").exists():
        contigs = random_genome(2_000_000, seed=101, n_contigs=1,
                                with_ns=False)
        r1, r2 = simulate_reads(contigs, 12288, read_len=150, seed=109,
                                paired=True)
        write_fastq(BENCH_DIR / "pe_1.fq", r1)
        write_fastq(BENCH_DIR / "pe_2.fq", r2)
    if not (fa.parent / (fa.name + ".sad.npy")).exists():
        from bwa_tpu.index.build import index_build

        index_build(fa)
    return fa


def _time_oracle(args, reps=N_REPS, stdout_to=None):
    best = 1e9
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = subprocess.run([str(ORACLE), *args], check=True,
                           capture_output=True)
        best = min(best, time.perf_counter() - t0)
        out = r.stdout
    return best, out


def bench_pacbio(fa):
    from bwa_tpu.engine import make_engine
    from bwa_tpu.index.fmindex import FMIndex
    from bwa_tpu.io.fastq import SeqReader, read_batch
    from bwa_tpu.mem.pipeline import process_seqs
    from bwa_tpu.options import MemOptions

    fq = BENCH_DIR / "pb.fq"
    fm = FMIndex.load(fa)
    engine = make_engine(fm, os.environ.get("BWA_TPU_ENGINE", "tpu"))
    opt = MemOptions()
    opt.apply_mode("pacbio")
    reads = read_batch(SeqReader(fq), None, 1 << 62)

    def run():
        for r in reads:
            r.sam = ""
        t0 = time.perf_counter()
        process_seqs(opt, engine, fm, reads)
        return time.perf_counter() - t0

    run()  # warm
    o_best, o_sam = _time_oracle(["mem", "-t1", "-x", "pacbio", str(fa),
                                  str(fq)])
    ts = [run() for _ in range(N_REPS)]
    strip = lambda b: [l for l in b.split(b"\n") if not l.startswith(b"@")]
    ours_sam = "".join(r.sam for r in reads).encode()
    ident = strip(o_sam) == strip(ours_sam)
    best = min(ts)
    print(json.dumps({
        "metric": "pacbio_512x2k_s", "value": round(best, 3), "unit": "s",
        "vs_baseline": round(o_best / best, 3),
        "oracle_s": round(o_best, 3), "byte_identical": ident,
        "ours_s": [round(t, 3) for t in ts]}))


def bench_pe(fa):
    """mem PE, 12288 x 2 x 150bp (one -K chunk: pestat/pairing included),
    warm in-process engine vs oracle -t1 (bwamem_pair.c hot path)."""
    from bwa_tpu.engine import make_engine
    from bwa_tpu.index.fmindex import FMIndex
    from bwa_tpu.io.fastq import SeqReader, read_batch
    from bwa_tpu.mem.pipeline import process_seqs
    from bwa_tpu.options import MEM_F_PE, MemOptions

    fq1, fq2 = BENCH_DIR / "pe_1.fq", BENCH_DIR / "pe_2.fq"
    fm = FMIndex.load(fa)
    engine = make_engine(fm, os.environ.get("BWA_TPU_ENGINE", "tpu"))
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    reads = read_batch(SeqReader(fq1), SeqReader(fq2), 1 << 62)

    def run():
        for r in reads:
            r.sam = ""
        t0 = time.perf_counter()
        process_seqs(opt, engine, fm, reads)
        return time.perf_counter() - t0

    run()  # warm
    o_best, o_sam = _time_oracle(["mem", "-t1", str(fa), str(fq1), str(fq2)])
    ts = [run() for _ in range(N_REPS)]
    strip = lambda b: [l for l in b.split(b"\n") if not l.startswith(b"@")]
    ours_sam = "".join(r.sam for r in reads).encode()
    ident = strip(o_sam) == strip(ours_sam)
    best = min(ts)
    n = len(reads)
    print(json.dumps({
        "metric": "mem_pe_reads_per_sec", "value": round(n / best, 1),
        "unit": "reads/s", "vs_baseline": round(o_best / best, 3),
        "oracle_s": round(o_best, 3), "byte_identical": ident,
        "n_reads": n, "ours_s": [round(t, 3) for t in ts]}))


def bench_bwasw(fa):
    """BWA-SW 512 x 2kb (the bsw2 native pipeline), with phase profile."""
    import ctypes
    import io

    import numpy as np

    from bwa_tpu import cli
    from bwa_tpu.native.build import get_lib

    fq = BENCH_DIR / "pb.fq"
    o_best, o_sam = _time_oracle(["bwasw", str(fa), str(fq)])

    def run():
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            t0 = time.perf_counter()
            cli.main_bwasw([str(fa), str(fq)])
            dt = time.perf_counter() - t0
        finally:
            sys.stdout = old
        return dt, buf.getvalue()

    run()
    ts = []
    sam = None
    for _ in range(N_REPS):
        dt, sam = run()
        ts.append(dt)
    lib = get_lib()
    lib.bsw2_prof_read.argtypes = [ctypes.POINTER(ctypes.c_int64)]
    prof = np.zeros(16, np.int64)
    lib.bsw2_prof_read(prof.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    print(f"[bwasw prof] core={prof[0]/1e9:.2f}s resolve={prof[1]/1e9:.2f}s "
          f"rest={prof[2]/1e9:.2f}s cells={prof[8+2]} live={prof[8+3]} "
          f"occ={prof[8+0]} rocc={prof[8+1]} fused2={prof[8+4]}",
          file=sys.stderr)
    strip = lambda b: [l for l in b.split(b"\n") if not l.startswith(b"@")]
    ident = strip(o_sam) == strip(sam.encode())
    best = min(ts)
    print(json.dumps({
        "metric": "bwasw_512x2k_s", "value": round(best, 3), "unit": "s",
        "vs_baseline": round(o_best / best, 3), "oracle_s": round(o_best, 3),
        "byte_identical": ident, "ours_s": [round(t, 3) for t in ts]}))


def bench_backtrack(fa):
    """aln+samse and aln+sampe end-to-end (subprocess CLI, like a user)."""
    import tempfile

    from bwa_tpu.native.build import client_exe

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    env["BWA_TPU_PYTHON"] = sys.executable
    client = str(client_exe())  # the production front-end: strips the
    fq = BENCH_DIR / "se150.fq"  # TPU plugin env for host-only commands

    def run_cli(args, out_path):
        t0 = time.perf_counter()
        with open(out_path, "wb") as f:
            subprocess.run([client, *args], check=True, stdout=f,
                           stderr=subprocess.DEVNULL, env=env)
        return time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        # SE
        o_aln = _time_oracle(["aln", "-t1", str(fa), str(fq)])[0]
        t0 = time.perf_counter()
        r = subprocess.run([str(ORACLE), "aln", "-t1", str(fa), str(fq)],
                           capture_output=True, check=True)
        (td / "o.sai").write_bytes(r.stdout)
        o_samse, o_sam = _time_oracle(["samse", str(fa), str(td / "o.sai"),
                                       str(fq)])
        t_aln = min(run_cli(["aln", "-t1", str(fa), str(fq)], td / "t.sai")
                    for _ in range(N_REPS))
        t_samse = min(run_cli(["samse", str(fa), str(td / "t.sai"), str(fq)],
                              td / "t.sam") for _ in range(N_REPS))
        strip = lambda b: [l for l in b.split(b"\n")
                           if not l.startswith(b"@")]
        ident = strip(o_sam) == strip((td / "t.sam").read_bytes())
        print(json.dumps({
            "metric": "aln_samse_s", "value": round(t_aln + t_samse, 3),
            "unit": "s", "vs_baseline": round((o_aln + o_samse)
                                              / (t_aln + t_samse), 3),
            "oracle_s": [round(o_aln, 3), round(o_samse, 3)],
            "ours_s": [round(t_aln, 3), round(t_samse, 3)],
            "byte_identical": ident}))
        # PE (needs paired files)
        from datagen import random_genome, simulate_reads, write_fastq

        fq1 = BENCH_DIR / "pe150_1.fq"
        fq2 = BENCH_DIR / "pe150_2.fq"
        if not fq1.exists():
            contigs = random_genome(2_000_000, seed=101, n_contigs=1,
                                    with_ns=False)
            r1, r2 = simulate_reads(contigs, 4096, read_len=150, seed=109,
                                    paired=True)
            write_fastq(fq1, r1)
            write_fastq(fq2, r2)
        o_a1 = _time_oracle(["aln", "-t1", str(fa), str(fq1)])[0]
        o_a2 = _time_oracle(["aln", "-t1", str(fa), str(fq2)])[0]
        for name, fqx in (("o1.sai", fq1), ("o2.sai", fq2)):
            r = subprocess.run([str(ORACLE), "aln", "-t1", str(fa),
                                str(fqx)], capture_output=True, check=True)
            (td / name).write_bytes(r.stdout)
        o_sampe, o_psam = _time_oracle(
            ["sampe", str(fa), str(td / "o1.sai"), str(td / "o2.sai"),
             str(fq1), str(fq2)])
        t_a1 = min(run_cli(["aln", "-t1", str(fa), str(fq1)], td / "t1.sai")
                   for _ in range(N_REPS))
        t_a2 = min(run_cli(["aln", "-t1", str(fa), str(fq2)], td / "t2.sai")
                   for _ in range(N_REPS))
        t_sampe = min(run_cli(["sampe", str(fa), str(td / "t1.sai"),
                               str(td / "t2.sai"), str(fq1), str(fq2)],
                              td / "t.pe.sam") for _ in range(N_REPS))
        ident = strip(o_psam) == strip((td / "t.pe.sam").read_bytes())
        tot_o = o_a1 + o_a2 + o_sampe
        tot_t = t_a1 + t_a2 + t_sampe
        print(json.dumps({
            "metric": "aln_sampe_s", "value": round(tot_t, 3), "unit": "s",
            "vs_baseline": round(tot_o / tot_t, 3),
            "oracle_s": [round(o_a1, 3), round(o_a2, 3), round(o_sampe, 3)],
            "ours_s": [round(t_a1, 3), round(t_a2, 3), round(t_sampe, 3)],
            "byte_identical": ident}))


def bench_fastmap(fa):
    """fastmap one-shot (CLI subprocess, like a user): the native client
    runs the SMEM dump fully in C (btcli.cpp cmd_fastmap)."""
    import tempfile

    from bwa_tpu.native.build import client_exe

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    env["BWA_TPU_PYTHON"] = sys.executable
    client = str(client_exe())
    fq = BENCH_DIR / "se150.fq"
    with tempfile.TemporaryDirectory() as td:
        env["BWA_TPU_DAEMON_DIR"] = td  # measure the cold one-shot
        o_best, o_out = _time_oracle(["fastmap", str(fa), str(fq)])
        best = 1e9
        out = None
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            r = subprocess.run([client, "fastmap", str(fa), str(fq)],
                               check=True, capture_output=True, env=env)
            best = min(best, time.perf_counter() - t0)
            out = r.stdout
        print(json.dumps({
            "metric": "fastmap_8192_s", "value": round(best, 3),
            "unit": "s", "vs_baseline": round(o_best / best, 3),
            "oracle_s": round(o_best, 3),
            "byte_identical": out == o_out}))


def bench_backtrack_daemon(fa):
    """Backtrack one-shots through the resident daemon (warm index +
    warm interpreter; the production path once any daemon is up)."""
    import tempfile

    from bwa_tpu.native.build import client_exe

    sockdir = tempfile.mkdtemp(prefix="bwa_tpu_bench_daemon")
    env = dict(os.environ)
    env.update({"BWA_TPU_DAEMON_DIR": sockdir,
                "BWA_TPU_DAEMON_NO_WARM": "1",
                "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": f"{REPO}:{env.get('PYTHONPATH', '')}",
                "BWA_TPU_PYTHON": sys.executable})
    client = str(client_exe())
    fq = BENCH_DIR / "se150.fq"
    daemon = subprocess.Popen(
        [sys.executable, "-m", "bwa_tpu.cli", "daemon", "start", str(fa)],
        env=env, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            r = subprocess.run([sys.executable, "-m", "bwa_tpu.cli",
                                "daemon", "status", str(fa)], env=env,
                               capture_output=True)
            if r.returncode == 0:
                break
            time.sleep(0.5)

        def run_cli(args, out_path):
            t0 = time.perf_counter()
            with open(out_path, "wb") as f:
                subprocess.run([client, *args], check=True, stdout=f,
                               stderr=subprocess.DEVNULL, env=env)
            return time.perf_counter() - t0

        with tempfile.TemporaryDirectory() as td:
            td = Path(td)
            o_aln = _time_oracle(["aln", "-t1", str(fa), str(fq)])[0]
            t_aln = min(run_cli(["aln", "-t1", str(fa), str(fq)],
                                td / "t.sai") for _ in range(N_REPS))
            r = subprocess.run([str(ORACLE), "aln", "-t1", str(fa),
                                str(fq)], capture_output=True, check=True)
            ident_sai = r.stdout == (td / "t.sai").read_bytes()
            o_samse, o_sam = _time_oracle(
                ["samse", str(fa), str(td / "t.sai"), str(fq)])
            t_samse = min(run_cli(["samse", str(fa), str(td / "t.sai"),
                                   str(fq)], td / "t.sam")
                          for _ in range(N_REPS))
            strip = lambda b: [l for l in b.split(b"\n")
                               if not l.startswith(b"@")]
            ident = strip(o_sam) == strip((td / "t.sam").read_bytes())
            print(json.dumps({
                "metric": "aln_samse_daemon_s",
                "value": round(t_aln + t_samse, 3), "unit": "s",
                "vs_baseline": round((o_aln + o_samse)
                                     / (t_aln + t_samse), 3),
                "oracle_s": [round(o_aln, 3), round(o_samse, 3)],
                "ours_s": [round(t_aln, 3), round(t_samse, 3)],
                "byte_identical": bool(ident and ident_sai)}))
    finally:
        subprocess.run([sys.executable, "-m", "bwa_tpu.cli", "daemon",
                        "stop", str(fa)], env=env, capture_output=True)
        daemon.wait(timeout=30)


def main():
    assert ORACLE.exists(), "build the oracle first (tests/conftest.py)"
    fa = _ensure_data()
    which = sys.argv[1:] or ["pacbio"]
    if "pacbio" in which:
        bench_pacbio(fa)
    if "pe" in which:
        bench_pe(fa)
    if "bwasw" in which:
        bench_bwasw(fa)
    if "backtrack" in which:
        bench_backtrack(fa)
    if "fastmap" in which:
        bench_fastmap(fa)
    if "backtrack_daemon" in which:
        bench_backtrack_daemon(fa)


if __name__ == "__main__":
    main()
