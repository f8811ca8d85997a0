"""shm analog: stage/attach/list/destroy and mem-over-shm equality."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, env):
    return subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                          capture_output=True, cwd=REPO, env=env)


def test_shm_stage_attach_destroy(small_genome, small_reads_se, tmp_path):
    env = dict(os.environ)
    env["BWA_TPU_SHM_DIR"] = str(tmp_path)

    # baseline: mem from disk
    disk = _run(["mem", str(small_genome), str(small_reads_se)], env)
    assert disk.returncode == 0

    # stage, list, re-stage message
    r = _run(["shm", str(small_genome)], env)
    assert r.returncode == 0, r.stderr
    r = _run(["shm", "-l"], env)
    assert r.stdout.decode().startswith(small_genome.name + "\t")
    r = _run(["shm", str(small_genome)], env)
    assert b"already in shared memory" in r.stderr

    # mem now attaches from shm and produces identical SAM
    via_shm = _run(["mem", str(small_genome), str(small_reads_se)], env)
    assert b"load the bwa index from shared memory" in via_shm.stderr
    assert via_shm.stdout == disk.stdout

    # destroy drops everything
    r = _run(["shm", "-d"], env)
    assert r.returncode == 0
    again = _run(["mem", str(small_genome), str(small_reads_se)], env)
    assert b"shared memory" not in again.stderr
    assert again.stdout == disk.stdout
