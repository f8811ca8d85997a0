"""Resident-engine daemon: a warm process holding the loaded index and
compiled device programs so CLI one-shots skip the per-process program
load (1-3 min on the tunnel backend even with a persistent jit-cache hit
— PERF.md §6b).  This is the process-level completion of the `bwa shm`
idea (bwashm.c keeps the INDEX warm; the TPU path also needs the warm
EXECUTABLES, which only live inside a process).

    bwa-tpu daemon start <idxbase>     # load index + engine, listen
    bwa-tpu mem <idxbase> reads.fq     # auto-forwards when a daemon
                                       # for that index is running
    bwa-tpu daemon stop <idxbase>

Protocol (unix socket): client sends one JSON line {"argv": [...],
"cwd": ...}; the daemon runs the command with its warm engine, streaming
stdout back; the connection closing marks completion; the final 8 bytes
after the payload carry the exit code is avoided by framing: stdout is
sent as raw bytes after a JSON status line.
"""

from __future__ import annotations

import io
import json
import os
import socket
import sys
from pathlib import Path


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit — shared with the native CLI client (client.c),
    which must compute the same socket name without Python."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def sock_path(prefix: str) -> Path:
    """Socket path for an index prefix (by absolute path identity)."""
    key = f"{fnv1a64(os.path.abspath(prefix).encode()):016x}"
    base = Path(os.environ.get("BWA_TPU_DAEMON_DIR", "/tmp/bwa_tpu_daemon"))
    base.mkdir(parents=True, exist_ok=True)
    return base / f"engine-{key}.sock"


def daemon_available(prefix: str) -> bool:
    p = sock_path(prefix)
    if not p.exists():
        return False
    s = socket.socket(socket.AF_UNIX)
    try:
        s.settimeout(2.0)
        s.connect(str(p))
        s.sendall(b'{"ping": 1}\n')
        ok = s.recv(16).startswith(b"pong")
        s.close()
        return ok
    except OSError:
        try:
            p.unlink()  # stale socket
        except OSError:
            pass
        return False


def client_run(prefix: str, argv: list[str], out_fp=None) -> int:
    """Forward a CLI command to the resident daemon; stream stdout back.
    Returns the exit code."""
    out_fp = out_fp or sys.stdout
    s = socket.socket(socket.AF_UNIX)
    s.connect(str(sock_path(prefix)))
    req = json.dumps({"argv": argv}) + "\n"
    s.sendall(req.encode())
    f = s.makefile("rb")
    status = json.loads(f.readline())
    if "error" in status:
        print(f"[daemon] {status['error']}", file=sys.stderr)
        return 1
    buf = out_fp.buffer if hasattr(out_fp, "buffer") else out_fp
    while True:
        chunk = f.read(1 << 20)
        if not chunk:
            break
        if isinstance(buf, io.TextIOBase):
            buf.write(chunk.decode())
        else:
            buf.write(chunk)
    f.close()
    s.close()
    return int(status.get("ok", 0))


class _BinOut:
    """Bytes accumulator that accepts both str (SAM text) and bytes
    (.sai) writes — the daemon runs text commands (mem/samse) and binary
    ones (aln) through one framing."""

    def __init__(self):
        self._b = io.BytesIO()
        self.buffer = self  # main_aln writes to out_fp directly

    def write(self, d) -> int:
        return self._b.write(d.encode() if isinstance(d, str) else d)

    def flush(self) -> None:
        pass

    def getvalue(self) -> bytes:
        return self._b.getvalue()


def _warm(fm, engine) -> None:
    """Run synthetic batches through every forwardable pipeline shape
    before accepting requests: on the tunnel backend every program pays
    a 1-3 min FIRST-use load per process, and absorbing that at daemon
    start is the daemon's whole point.  Warms SE, PE, fastmap and (set
    BWA_TPU_DAEMON_WARM=all) pacbio long-read shapes; each stage is
    best-effort (skipped on any error)."""
    if os.environ.get("BWA_TPU_DAEMON_NO_WARM") == "1":
        return
    import time

    import numpy as np

    from bwa_tpu.mem.types import Read
    from bwa_tpu.options import MEM_F_PE, MemOptions

    rng = np.random.default_rng(0)
    codes = fm.pac_codes
    b5 = np.frombuffer(b"ACGTN", np.uint8)

    def synth(n, L, err=0.0, name_of=lambda i: f"w{i}", off=0):
        reads = []
        for i in range(n):
            s = int(rng.integers(0, max(1, fm.l_pac - L - off)))
            frag = np.minimum(codes[s + off:s + off + L], 4).copy()
            if frag.shape[0] < L:
                frag = np.pad(frag, (0, L - frag.shape[0]))
            if err > 0.0:
                m = rng.random(L) < err
                frag[m] = (frag[m] + rng.integers(1, 4, int(m.sum()))) % 4
            reads.append(Read(name=name_of(i), seq=b5[frag].tobytes()))
        return reads

    def stage(tag, fn):
        t0 = time.time()
        print(f"[daemon] warming {tag}...", file=sys.stderr, flush=True)
        try:
            fn()
            print(f"[daemon] {tag} warm in {time.time() - t0:.0f}s",
                  file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover - warm is best-effort
            print(f"[daemon] {tag} warm-up skipped: {e!r}",
                  file=sys.stderr, flush=True)

    def warm_se():
        from bwa_tpu.mem.pipeline import process_seqs

        process_seqs(MemOptions(), engine, fm, synth(8192, 150))

    def warm_pe():
        from bwa_tpu.mem.pipeline import process_seqs

        # proper FR pairs at insert ~350 so pestat converges like a
        # real library; read2 is the reverse complement of the mate-end
        # window (to_codes_batch recomputes codes from seq text)
        pairs = []
        rc = {0: b"T", 1: b"G", 2: b"C", 3: b"A", 4: b"N"}
        for i in range(2048):
            ins = int(rng.normal(350, 40))
            ins = max(200, min(500, ins))
            s = int(rng.integers(0, max(1, fm.l_pac - ins - 1)))
            f1 = np.minimum(codes[s:s + 150], 4)
            f2 = np.minimum(codes[s + ins - 150:s + ins], 4)
            if f1.shape[0] < 150 or f2.shape[0] < 150:
                continue
            seq2 = b"".join(rc[int(c)] for c in f2[::-1])
            pairs.append(Read(name=f"p{i}", seq=b5[f1].tobytes()))
            pairs.append(Read(name=f"p{i}", seq=seq2))
        o = MemOptions()
        o.flag |= MEM_F_PE
        process_seqs(o, engine, fm, pairs)

    def warm_fastmap():
        from bwa_tpu.mem.fastmap import fastmap_batch

        list(fastmap_batch(fm, engine, synth(512, 150, name_of=str),
                           20, 17, False, 1, 0))

    def warm_long():
        from bwa_tpu.mem.pipeline import process_seqs

        o = MemOptions()
        o.apply_mode("pacbio")
        process_seqs(o, engine, fm, synth(256, 1200, err=0.08))

    stage("SE", warm_se)
    stage("PE", warm_pe)
    stage("fastmap", warm_fastmap)
    if os.environ.get("BWA_TPU_DAEMON_WARM", "") == "all":
        stage("pacbio", warm_long)


def serve(prefix: str, foreground: bool = True) -> int:
    """Load the index + engine once and serve mem/fastmap commands."""
    from bwa_tpu import cli as cli_mod
    from bwa_tpu.engine import make_engine
    from bwa_tpu.index.fmindex import FMIndex

    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps stacks
    prefix = os.path.abspath(prefix)
    fm = FMIndex.load(prefix)
    engine = make_engine(fm)
    cli_mod._ENGINE_CACHE[prefix] = (fm, engine)
    _warm(fm, engine)
    sp = sock_path(prefix)
    if sp.exists():
        sp.unlink()
    srv = socket.socket(socket.AF_UNIX)
    srv.bind(str(sp))
    srv.listen(4)
    print(f"[daemon] serving {prefix} on {sp}", file=sys.stderr)
    while True:
        conn, _ = srv.accept()
        try:
            # NOTE: makefile() dups the socket fd — it must be closed too
            # or the client never sees EOF on the response stream
            f = conn.makefile("rb")
            req = json.loads(f.readline())
            if req.get("ping"):
                conn.sendall(b"pong\n")
                f.close()
                conn.close()
                continue
            if req.get("shutdown"):
                conn.sendall(b'{"ok": 1}\n')
                f.close()
                conn.close()
                break
            argv = req["argv"]
            print(f"[daemon] request: {argv}", file=sys.stderr, flush=True)
            out = _BinOut()
            try:
                rc = cli_mod.main(argv, out_fp=out, _in_daemon=True)
                print(f"[daemon] done rc={rc} bytes={len(out.getvalue())}",
                      file=sys.stderr, flush=True)
                conn.sendall(json.dumps({"ok": rc}).encode() + b"\n")
                conn.sendall(out.getvalue())
            except Exception as e:  # keep serving
                conn.sendall(json.dumps({"error": repr(e)}).encode() + b"\n")
            f.close()
            conn.close()
        except OSError:
            pass
    srv.close()
    sp.unlink()
    return 0


def main_daemon(argv: list[str]) -> int:
    if not argv or argv[0] not in ("start", "stop", "status"):
        print("Usage: bwa-tpu daemon start|stop|status <idxbase>",
              file=sys.stderr)
        return 1
    cmd, prefix = argv[0], argv[1]
    if cmd == "start":
        return serve(prefix)
    if cmd == "status":
        up = daemon_available(prefix)
        print(f"[daemon] {'running' if up else 'not running'} for {prefix}",
              file=sys.stderr)
        return 0 if up else 1
    # stop
    try:
        s = socket.socket(socket.AF_UNIX)
        s.connect(str(sock_path(prefix)))
        s.sendall(b'{"shutdown": 1}\n')
        s.recv(16)
        s.close()
        print("[daemon] stopped", file=sys.stderr)
        return 0
    except OSError:
        print("[daemon] not running", file=sys.stderr)
        return 1
