"""Backtrack (aln/samse/sampe): .sai and SAM byte-equality vs oracle."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="module")
def bt_reads(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    se = DATA / "bt_se.fq"
    r1 = DATA / "bt_pe_1.fq"
    r2 = DATA / "bt_pe_2.fq"
    if not se.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        reads = simulate_reads(contigs, 150, read_len=50, seed=31,
                               err_rate=0.01, indel_rate=0.002)
        write_fastq(se, reads)
    if not r1.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        a, b = simulate_reads(contigs, 200, read_len=50, seed=37,
                              err_rate=0.01, indel_rate=0.002, paired=True,
                              insert_mean=250, insert_std=30)
        write_fastq(r1, a)
        write_fastq(r2, b)
    return se, r1, r2


def _mine(args):
    return subprocess.run([sys.executable, "-m", "bwa_tpu.cli", *args],
                          check=True, capture_output=True, cwd=REPO).stdout


def _oracle(oracle_bwa, args):
    return subprocess.run([str(oracle_bwa), *args], check=True,
                          capture_output=True).stdout


def _nopg(b):
    return [l for l in b.decode().splitlines() if not l.startswith("@PG")]


def test_aln_sai_bytes(oracle_bwa, small_genome, bt_reads, tmp_path):
    se, _, _ = bt_reads
    theirs = _oracle(oracle_bwa, ["aln", str(small_genome), str(se)])
    mine = _mine(["aln", str(small_genome), str(se)])
    assert mine == theirs


def test_aln_options_sai_bytes(oracle_bwa, small_genome, bt_reads):
    se, _, _ = bt_reads
    for extra in (["-n", "6"], ["-o", "2"], ["-N"], ["-l", "20"]):
        theirs = _oracle(oracle_bwa, ["aln", *extra, str(small_genome), str(se)])
        mine = _mine(["aln", *extra, str(small_genome), str(se)])
        assert mine == theirs, extra


def test_samse_sam(oracle_bwa, small_genome, bt_reads, tmp_path):
    se, _, _ = bt_reads
    sai = tmp_path / "se.sai"
    sai.write_bytes(_oracle(oracle_bwa, ["aln", str(small_genome), str(se)]))
    theirs = _nopg(_oracle(oracle_bwa, ["samse", str(small_genome), str(sai), str(se)]))
    mine = _nopg(_mine(["samse", str(small_genome), str(sai), str(se)]))
    assert mine == theirs


def test_sampe_sam(oracle_bwa, small_genome, bt_reads, tmp_path):
    _, r1, r2 = bt_reads
    s1 = tmp_path / "1.sai"
    s2 = tmp_path / "2.sai"
    s1.write_bytes(_oracle(oracle_bwa, ["aln", str(small_genome), str(r1)]))
    s2.write_bytes(_oracle(oracle_bwa, ["aln", str(small_genome), str(r2)]))
    theirs = _nopg(_oracle(oracle_bwa, ["sampe", str(small_genome),
                                        str(s1), str(s2), str(r1), str(r2)]))
    mine = _nopg(_mine(["sampe", str(small_genome), str(s1), str(s2),
                        str(r1), str(r2)]))
    assert mine == theirs


def test_sampe_sam_hard(oracle_bwa, small_genome, tmp_path):
    """sampe with mate-rescue / discordant / unmapped ends + option
    variants, native == oracle AND native == Python spec (rng stream)."""
    import os

    from datagen import random_genome, simulate_reads, write_fastq

    contigs = random_genome(200_000, seed=7, n_contigs=2)
    a, b = simulate_reads(contigs, 300, read_len=50, seed=41,
                          err_rate=0.03, indel_rate=0.01, paired=True,
                          insert_mean=250, insert_std=30)
    # break pairing: swap some mate2s (discordant), garble others
    # (unmapped -> bwa_paired_sw rescue)
    import random

    rnd = random.Random(5)
    for i in range(0, 60, 3):
        b[i], b[i + 1] = b[i + 1], b[i]
        nm0, _, q0 = b[i]
        nm1, _, q1 = b[i + 1]
        b[i] = (nm0, b[i][1], q0)
        b[i + 1] = (nm1, b[i + 1][1], q1)
    b = [(n, s, q) if i % 7 else
         (n, bytes(rnd.choice(b"ACGT") for _ in range(len(s))), q)
         for i, (n, s, q) in enumerate(b)]
    # fix names after the swap (mates must share names in file order)
    a = [(f"p{i}", s, q) for i, (n, s, q) in enumerate(a)]
    b = [(f"p{i}", s, q) for i, (n, s, q) in enumerate(b)]
    r1 = tmp_path / "h1.fq"
    r2 = tmp_path / "h2.fq"
    write_fastq(r1, a)
    write_fastq(r2, b)
    s1 = tmp_path / "1.sai"
    s2 = tmp_path / "2.sai"
    s1.write_bytes(_oracle(oracle_bwa, ["aln", str(small_genome), str(r1)]))
    s2.write_bytes(_oracle(oracle_bwa, ["aln", str(small_genome), str(r2)]))
    for extra in ([], ["-s"], ["-n", "0", "-N", "0"], ["-a", "150"],
                  ["-A"]):
        args = ["sampe", *extra, str(small_genome), str(s1), str(s2),
                str(r1), str(r2)]
        theirs = _nopg(_oracle(oracle_bwa, args))
        mine = _nopg(_mine(args))
        assert mine == theirs, ("native vs oracle", extra)
    # native == spec (drand48 stream + ii carry identical)
    env = dict(os.environ)
    env["BWA_TPU_SAMPE"] = "spec"
    spec = subprocess.run(
        [sys.executable, "-m", "bwa_tpu.cli", "sampe", str(small_genome),
         str(s1), str(s2), str(r1), str(r2)],
        check=True, capture_output=True, cwd=REPO, env=env).stdout
    assert _nopg(spec) == _nopg(_mine(
        ["sampe", str(small_genome), str(s1), str(s2), str(r1), str(r2)]))


def test_native_client_one_shots(oracle_bwa, small_genome, bt_reads,
                                 tmp_path):
    """The C client's fully-native aln/samse/sampe one-shots
    (native/btcli.cpp bt_cli_main): .sai and SAM byte-identical to the
    oracle AND to our Python CLI (including the header)."""
    import os

    from bwa_tpu.native.build import client_exe

    client = str(client_exe())
    env = dict(os.environ)
    env["BWA_TPU_DAEMON_DIR"] = str(tmp_path / "nodaemon")  # no forward

    def run(args, out):
        with open(out, "wb") as f:
            subprocess.run([client, *args], check=True, stdout=f,
                           stderr=subprocess.DEVNULL, env=env)
        return Path(out).read_bytes()

    se, r1, r2 = bt_reads
    fa = str(small_genome)
    sai = run(["aln", fa, str(se)], tmp_path / "n.sai")
    assert sai == _oracle(oracle_bwa, ["aln", fa, str(se)])
    (tmp_path / "o.sai").write_bytes(sai)
    sam = run(["samse", "-r", "@RG\\tID:rg1\\tSM:s1", fa,
               str(tmp_path / "o.sai"), str(se)], tmp_path / "n.sam")
    theirs = _oracle(oracle_bwa, ["samse", "-r", "@RG\\tID:rg1\\tSM:s1",
                                  fa, str(tmp_path / "o.sai"), str(se)])
    assert _nopg(sam) == _nopg(theirs)
    mine_py = _mine(["samse", "-r", "@RG\\tID:rg1\\tSM:s1", fa,
                     str(tmp_path / "o.sai"), str(se)])
    assert sam == mine_py  # byte-identical incl. @PG/@HD header
    # PE
    s1 = run(["aln", fa, str(r1)], tmp_path / "1.sai")
    s2 = run(["aln", fa, str(r2)], tmp_path / "2.sai")
    (tmp_path / "1.sai").write_bytes(s1)
    (tmp_path / "2.sai").write_bytes(s2)
    pe = run(["sampe", fa, str(tmp_path / "1.sai"), str(tmp_path / "2.sai"),
              str(r1), str(r2)], tmp_path / "n.pe.sam")
    theirs = _oracle(oracle_bwa, ["sampe", fa, str(tmp_path / "1.sai"),
                                  str(tmp_path / "2.sai"), str(r1),
                                  str(r2)])
    assert _nopg(pe) == _nopg(theirs)
    # unsupported shapes fall back to Python transparently (-n 0.02 is
    # supported; BAM flags are not -- just check fallback exits cleanly)
    out = subprocess.run([client, "aln", "-n", "0.04", fa, str(se)],
                         check=True, capture_output=True, env=env).stdout
    assert out == _oracle(oracle_bwa, ["aln", "-n", "0.04", fa, str(se)])
    # native fastmap one-shot (btcli.cpp cmd_fastmap)
    fm = subprocess.run([client, "fastmap", fa, str(se)], check=True,
                        capture_output=True, env=env).stdout
    assert fm == _oracle(oracle_bwa, ["fastmap", fa, str(se)])
    fm = subprocess.run([client, "fastmap", "-w", "3", "-l", "20", fa,
                         str(se)], check=True, capture_output=True,
                        env=env).stdout
    assert fm == _oracle(oracle_bwa, ["fastmap", "-w", "3", "-l", "20",
                                      fa, str(se)])
