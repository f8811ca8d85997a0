"""End-to-end `mem` SAM byte-equality vs the oracle (modulo @PG)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_oracle(oracle_bwa, args):
    out = subprocess.run([str(oracle_bwa), "mem", *args], check=True,
                         capture_output=True)
    return [l for l in out.stdout.decode().splitlines()
            if not l.startswith("@PG")]


def _run_mine(args):
    out = subprocess.run(
        [sys.executable, "-m", "bwa_tpu.cli", "mem", *args],
        check=True, capture_output=True, cwd=REPO)
    return [l for l in out.stdout.decode().splitlines()
            if not l.startswith("@PG")]


def _assert_same(oracle_bwa, args):
    theirs = _run_oracle(oracle_bwa, args)
    mine = _run_mine(args)
    assert len(mine) == len(theirs)
    for i, (m, t) in enumerate(zip(mine, theirs)):
        assert m == t, f"line {i}:\n  mine:   {m}\n  oracle: {t}"


def test_mem_se(oracle_bwa, small_genome, small_reads_se):
    _assert_same(oracle_bwa, [str(small_genome), str(small_reads_se)])


def test_mem_pe(oracle_bwa, small_genome, small_reads_pe):
    fq1, fq2 = small_reads_pe
    _assert_same(oracle_bwa, [str(small_genome), str(fq1), str(fq2)])


@pytest.mark.parametrize("extra", [
    ["-a"],            # output all alignments
    ["-T", "20"],      # lower score threshold
    ["-k", "25"],      # longer min seed
    ["-Y"],            # softclip supplementary
    ["-M"],            # mark split hits secondary
])
def test_mem_se_flags(oracle_bwa, small_genome, small_reads_se, extra):
    _assert_same(oracle_bwa, [*extra, str(small_genome), str(small_reads_se)])


def test_mem_pe_isize_override(oracle_bwa, small_genome, small_reads_pe):
    r1, r2 = small_reads_pe
    for spec in ("250,30", "250,30,400,100"):
        args = ["mem", "-I", spec, str(small_genome), str(r1), str(r2)]
        _assert_same(oracle_bwa, args[1:])


def test_mem_smart_pairing(oracle_bwa, small_genome, small_reads_pe, tmp_path):
    r1, r2 = small_reads_pe
    a = Path(r1).read_bytes().splitlines()
    b = Path(r2).read_bytes().splitlines()
    inter = tmp_path / "inter.fq"
    out = []
    for i in range(0, len(a), 4):
        out += a[i:i + 4] + b[i:i + 4]
    inter.write_bytes(b"\n".join(out) + b"\n")
    _assert_same(oracle_bwa, ["-p", str(small_genome), str(inter)])
