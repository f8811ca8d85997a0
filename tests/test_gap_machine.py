"""Device `aln` search (ops/gap_machine.py): exactness vs the native
search and .sai bytes vs the oracle through the CLI driver."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/bwa_tpu_testdata")


@pytest.fixture(scope="module")
def gap_reads(small_genome):
    from datagen import random_genome, simulate_reads, write_fastq

    fq = DATA / "gap_se.fq"
    if not fq.exists():
        contigs = random_genome(200_000, seed=7, n_contigs=2)
        # indel-heavy + higher error so gap states and the exact-match
        # walk (m == 0) are all exercised; 60 bp so the seed region
        # (seed_len 32) is active
        reads = simulate_reads(contigs, 200, read_len=60, seed=41,
                               err_rate=0.03, indel_rate=0.01)
        write_fastq(fq, reads)
    return fq


@pytest.fixture(scope="module")
def gap_env(small_genome):
    """Small lane pool so CPU tests stay fast."""
    os.environ["BWA_TPU_ALN_LANES"] = "256"
    yield
    os.environ.pop("BWA_TPU_ALN_LANES", None)


def _batches(small_genome, fq, opt):
    from bwa_tpu.aln.batch_search import aln_batch_device
    from bwa_tpu.aln.driver import _aln_batch_native
    from bwa_tpu.aln.seqio import open_reads, read_bt_packed
    from bwa_tpu.engine import make_engine
    from bwa_tpu.index.fmindex import FMIndex

    fm = FMIndex.load(str(small_genome))
    eng = make_engine(fm, "tpu")
    reader = open_reads(opt.mode, str(fq))
    pk = read_bt_packed(reader, 100000, opt.mode, opt.trim_qual)
    dev = aln_batch_device(fm, eng, pk, opt)
    nat = _aln_batch_native(fm, pk, opt)
    return dev, nat


def _assert_equal(dev, nat):
    on_d, rows_d = dev
    on_n, rows_n = nat
    assert np.array_equal(on_d, on_n), "per-read aln counts differ"
    assert np.array_equal(rows_d, rows_n), "aln records differ"


def test_gap_machine_default(small_genome, gap_reads, gap_env):
    from bwa_tpu.aln.opts import GapOpt

    _assert_equal(*_batches(small_genome, gap_reads, GapOpt()))


@pytest.mark.parametrize("kw", [
    dict(fnr=0.0, max_diff=2),                  # -n 2 (integer max_diff)
    dict(max_gapo=2, max_gape=3),               # gap-heavy
    dict(seed_len=20, max_seed_diff=1),         # tighter seed region
    dict(mode=0x02 | 0x04, fnr=0.0, max_diff=2),  # LOGGAP, no GAPE
    # -N: NONSTOP disables the best-first stop and max_diff narrowing
    dict(mode=0x03 | 0x10, fnr=0.0, max_diff=2, max_top2=0x7FFFFFFF),
    dict(trim_qual=20),                         # -q read trimming
    dict(s_mm=2, s_gapo=5, s_gape=2),           # -M/-O/-E rescaling
    dict(indel_end_skip=2, max_del_occ=3),      # -i/-d gate variants
])
def test_gap_machine_options(small_genome, gap_reads, gap_env, kw):
    from bwa_tpu.aln.opts import GapOpt

    _assert_equal(*_batches(small_genome, gap_reads, GapOpt(**kw)))


def test_gap_machine_cap_ladder(small_genome, gap_reads, gap_env):
    """Tiny caps force every rung: machine retry + host-spec fallback."""
    from bwa_tpu.aln.opts import GapOpt

    os.environ["BWA_TPU_ALN_CAPS"] = "8,16"
    os.environ["BWA_TPU_ALN_CAPA"] = "2"
    os.environ["BWA_TPU_ALN_MAX_STEPS"] = "120"
    try:
        _assert_equal(*_batches(small_genome, gap_reads, GapOpt()))
    finally:
        for v in ("BWA_TPU_ALN_CAPS", "BWA_TPU_ALN_CAPA",
                  "BWA_TPU_ALN_MAX_STEPS"):
            os.environ.pop(v, None)


def test_gap_machine_max_entries(small_genome, gap_reads, gap_env):
    """A tiny -m makes the stack-size stop (bwtgap.c:143) observable."""
    from bwa_tpu.aln.opts import GapOpt

    _assert_equal(*_batches(small_genome, gap_reads,
                            GapOpt(max_entries=20)))


def test_gap_machine_int64_coords():
    """GRCh38-scale genomes run the machine with int64 coordinates under
    jax_enable_x64; the while carry must not drift (the seeding machine
    once broke on a jnp.sum accumulator promotion) and the results must
    match the host spec exactly."""
    import types

    import jax

    old_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        from bwa_tpu.aln.batch_search import (_host_fallback, _prep_chunk,
                                              aln_batch_device)
        from bwa_tpu.aln.opts import GapOpt
        from bwa_tpu.engine import make_engine
        from bwa_tpu.index.fmindex import FMIndex

        rng = np.random.default_rng(17)
        fwd = rng.integers(0, 4, 60000, dtype=np.uint8)
        fm = FMIndex.build_in_memory(fwd)
        fm.ckpt = fm.ckpt.astype(np.int64)
        fm.ssa = fm.ssa.astype(np.int64)
        orig_cd = FMIndex.coord_dtype
        FMIndex.coord_dtype = property(lambda self: np.int64)
        try:
            eng = make_engine(fm, "tpu")
            n, L = 48, 60
            starts = rng.integers(0, len(fwd) - L, n)
            reads = fwd[starts[:, None] + np.arange(L)].copy()
            muts = rng.random((n, L)) < 0.03
            reads[muts] = (reads[muts]
                           + rng.integers(1, 4, int(muts.sum()))) % 4
            reads[0, 5] = 4  # one ambiguous base
            pk = types.SimpleNamespace(
                n=n, lens=np.full(n, L, np.int32),
                codes_off=np.arange(n + 1, dtype=np.int64) * L,
                codes_flat=reads.reshape(-1))
            opt = GapOpt()
            out_n, rows = aln_batch_device(fm, eng, pk, opt)
            _, md, mg, orig, _, _, _, _, skip = _prep_chunk(pk, opt)
            off = 0
            for i in range(n):
                if skip[i]:
                    exp = np.zeros((0, 8), np.int64)
                else:
                    alns = _host_fallback(eng, opt, orig[i], L,
                                          md[i], mg[i])
                    exp = np.array(
                        [[a.n_mm, a.n_gapo, a.n_gape, a.score, a.n_ins,
                          a.n_del, a.k, a.l] for a in alns],
                        np.int64).reshape(-1, 8)
                got = rows[off:off + out_n[i]]
                assert np.array_equal(got, exp), f"read {i} differs"
                off += out_n[i]
        finally:
            FMIndex.coord_dtype = orig_cd
    finally:
        jax.config.update("jax_enable_x64", old_x64)


def test_aln_device_sai_bytes(oracle_bwa, small_genome, gap_reads,
                              gap_env, tmp_path):
    """End-to-end: CLI aln with BWA_TPU_ALN=device == oracle .sai."""
    theirs = subprocess.run(
        [str(oracle_bwa), "aln", str(small_genome), str(gap_reads)],
        check=True, capture_output=True).stdout
    # minimal env: keep the axon plugin's sitecustomize off PYTHONPATH so
    # it cannot claim the backend (same pattern as test_engine_tpu_cli)
    env = {"BWA_TPU_ALN": "device", "BWA_TPU_ALN_LANES": "256",
           "JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO),
           "PATH": os.environ.get("PATH", ""),
           "HOME": os.environ.get("HOME", "/root")}
    mine = subprocess.run(
        [sys.executable, "-m", "bwa_tpu.cli", "aln", str(small_genome),
         str(gap_reads)],
        check=True, capture_output=True, cwd=REPO, env=env).stdout
    assert mine == theirs
