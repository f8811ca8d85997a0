"""Round-trip tests for the resident-engine daemon (bwa_tpu/server.py).

Covers the transparent socket forward for mem AND fastmap (the fastmap
payload regression: output must reach the CLIENT's stdout, not the
daemon's), exit-code propagation, and the stdin no-forward guard.
"""

import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="module")
def daemon(small_genome, tmp_path_factory):
    sockdir = tmp_path_factory.mktemp("daemon")
    env = dict(os.environ)
    env.update({
        "BWA_TPU_DAEMON_DIR": str(sockdir),
        "BWA_TPU_DAEMON_NO_WARM": "1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
    })
    proc = subprocess.Popen(
        [sys.executable, "-m", "bwa_tpu.cli", "daemon", "start",
         str(small_genome)],
        cwd=REPO, env=env, stderr=subprocess.PIPE)
    # wait for the socket to come up
    deadline = time.time() + 120
    socks = []
    while time.time() < deadline:
        socks = list(sockdir.glob("*.sock"))
        if socks:
            try:
                s = socket.socket(socket.AF_UNIX)
                s.settimeout(2.0)
                s.connect(str(socks[0]))
                s.sendall(b'{"ping": 1}\n')
                if s.recv(16).startswith(b"pong"):
                    s.close()
                    break
                s.close()
            except OSError:
                pass
        if proc.poll() is not None:
            raise RuntimeError(proc.stderr.read().decode()[-2000:])
        time.sleep(0.2)
    else:
        proc.kill()
        raise RuntimeError("daemon did not come up")
    yield env
    subprocess.run([sys.executable, "-m", "bwa_tpu.cli", "daemon", "stop",
                    str(small_genome)], cwd=REPO, env=env,
                   capture_output=True)
    proc.wait(timeout=30)


def _reads_fq(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA / "daemon_se.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 64, read_len=120, seed=17,
                               err_rate=0.02, indel_rate=0.004)
        write_fastq(fq, reads)
    return fq


def _client(args, env, stdin=None):
    return subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                          capture_output=True, cwd=REPO, env=env,
                          input=stdin)


def test_daemon_mem_forward(oracle_bwa, small_genome, daemon):
    fq = _reads_fq(small_genome)
    ro = subprocess.run([str(oracle_bwa), "mem", str(small_genome), str(fq)],
                        capture_output=True)
    rt = _client(["mem", str(small_genome), str(fq)], daemon)
    assert b"forwarding to the resident engine daemon" in rt.stderr, \
        rt.stderr[-500:]
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@")]
    assert strip(rt.stdout) == strip(ro.stdout)
    assert rt.returncode == 0


def test_daemon_fastmap_forward(oracle_bwa, small_genome, daemon):
    fq = _reads_fq(small_genome)
    ro = subprocess.run([str(oracle_bwa), "fastmap", str(small_genome),
                         str(fq)], capture_output=True)
    rt = _client(["fastmap", str(small_genome), str(fq)], daemon)
    assert b"forwarding to the resident engine daemon" in rt.stderr, \
        rt.stderr[-500:]
    assert rt.stdout == ro.stdout  # the payload must reach the CLIENT
    assert rt.stdout  # and must be non-empty
    assert rt.returncode == 0


def test_daemon_exit_code_propagates(small_genome, daemon):
    # missing reads file: main_mem returns 1 inside the daemon; the
    # client must NOT report success.  /nonexistent fails the isfile
    # forward guard, so point at a real-but-bogus regular file instead.
    bogus = DATA / "daemon_missing.fq"
    bogus.write_text("not a fastq\n")
    rt = _client(["mem", str(small_genome), str(bogus), str(bogus),
                  str(bogus)], daemon)  # 3 read args -> usage error rc=1
    assert rt.returncode != 0


def test_daemon_stdin_runs_locally(oracle_bwa, small_genome, daemon):
    fq = _reads_fq(small_genome)
    ro = subprocess.run([str(oracle_bwa), "mem", str(small_genome), "-"],
                        capture_output=True, input=fq.read_bytes())
    rt = _client(["mem", str(small_genome), "-"], daemon,
                 stdin=fq.read_bytes())
    assert b"forwarding" not in rt.stderr  # must not forward stdin
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@")]
    assert strip(rt.stdout) == strip(ro.stdout)


# ---------------------------------------------------------------------------
# native CLI client (native/client.c): forwards without starting Python
# ---------------------------------------------------------------------------

def _native_client(args, env, stdin=None):
    from bwa_tpu.native.build import client_exe

    env = dict(env)
    env["BWA_TPU_PYTHON"] = sys.executable
    return subprocess.run([str(client_exe()), *args], capture_output=True,
                          cwd=REPO, env=env, input=stdin)


def test_native_client_daemon_forward(oracle_bwa, small_genome, daemon):
    """client.c connects to the daemon socket directly (no interpreter)
    and streams the SAM payload + exit code."""
    fq = _reads_fq(small_genome)
    ro = subprocess.run([str(oracle_bwa), "mem", str(small_genome), str(fq)],
                        capture_output=True)
    rt = _native_client(["mem", str(small_genome), str(fq)], daemon)
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@")]
    assert strip(rt.stdout) == strip(ro.stdout)
    assert rt.returncode == 0


def test_native_client_exit_code(small_genome, daemon):
    bogus = DATA / "daemon_missing.fq"
    bogus.write_text("not a fastq\n")
    rt = _native_client(["mem", str(small_genome), str(bogus), str(bogus),
                         str(bogus)], daemon)
    assert rt.returncode != 0


def test_native_client_python_fallback(small_genome, daemon):
    """Commands outside FWD_CMDS exec the Python CLI transparently."""
    rt = _native_client(["xa2multi"], daemon,
                        stdin=b"@HD\tVN:1.5\n")
    assert rt.returncode == 0
    assert rt.stdout == b"@HD\tVN:1.5\n"


def test_daemon_backtrack_forward(oracle_bwa, small_genome, daemon,
                                  tmp_path):
    """aln/samse/sampe forward to the warm daemon; the binary .sai
    payload and the SAM must be byte-identical to the oracle's."""
    fq = _reads_fq(small_genome)
    o_sai = subprocess.run([str(oracle_bwa), "aln", str(small_genome),
                            str(fq)], capture_output=True).stdout
    rt = _client(["aln", str(small_genome), str(fq)], daemon)
    assert b"forwarding to the resident engine daemon" in rt.stderr, \
        rt.stderr[-500:]
    assert rt.stdout == o_sai  # binary .sai through the socket
    sai = tmp_path / "d.sai"
    sai.write_bytes(rt.stdout)
    o_sam = subprocess.run([str(oracle_bwa), "samse", str(small_genome),
                            str(sai), str(fq)], capture_output=True).stdout
    rs = _client(["samse", str(small_genome), str(sai), str(fq)], daemon)
    assert b"forwarding" in rs.stderr
    strip = lambda b: [l for l in b.splitlines() if not l.startswith(b"@")]
    assert strip(rs.stdout) == strip(o_sam)
    # sampe (pair the same file with itself both ends)
    o_pe = subprocess.run([str(oracle_bwa), "sampe", str(small_genome),
                           str(sai), str(sai), str(fq), str(fq)],
                          capture_output=True).stdout
    rp = _client(["sampe", str(small_genome), str(sai), str(sai), str(fq),
                  str(fq)], daemon)
    assert b"forwarding" in rp.stderr
    assert strip(rp.stdout) == strip(o_pe)
