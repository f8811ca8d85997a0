"""Retire-and-refill seeding (BWA_TPU_SEED_REFILL) vs the static path.

The refill machine (ops/fm_machine.py seed_machine_seg refill=True) must
produce byte-for-byte the same flat seed arrays as the static
read->lane packing: same seeds, same per-read order, same SA
occurrence expansion.  Exactness here transfers to SAM identity (the
finalize consumes only these arrays).
"""

import os

import numpy as np
import pytest

from bwa_tpu.index.fmindex import FMIndex


@pytest.fixture(scope="module")
def fm(small_genome):
    return FMIndex.load(small_genome)


@pytest.fixture(scope="module")
def dev(fm):
    from bwa_tpu.ops.fm import BatchedFMEngine

    return BatchedFMEngine(fm)


def _codes(n, seed, L=151, with_n=True):
    """Reads simulated FROM the fixture genome (real SMEM structure —
    random reads against a random genome seed almost nothing, which
    would make the comparison vacuous), plus a few pure-random and
    N-riddled ones for the edge paths."""
    import datagen

    from bwa_tpu.index.pack import NT4_TABLE

    contigs = datagen.random_genome(200_000, seed=7, n_contigs=2)
    sim = datagen.simulate_reads(contigs, max(1, n - n // 8),
                                 read_len=min(150, L - 1), seed=seed,
                                 err_rate=0.02, indel_rate=0.002)
    out = [NT4_TABLE[np.frombuffer(s, dtype=np.uint8)].copy()
           for _, s, _ in sim]
    rng = np.random.default_rng(seed)
    for _ in range(n - len(out)):
        ln = int(rng.integers(40, L))
        r = rng.integers(0, 4, size=ln).astype(np.uint8)
        if with_n and rng.random() < 0.5:
            r[rng.integers(0, ln)] = 4
        out.append(r)
    return out[:n]


def _flat(opt, dev, fm, codes, cap_s, refill, monkeypatch, lanes=None):
    from bwa_tpu.mem.batch_seed import collect_se_flat

    if refill:
        monkeypatch.setenv("BWA_TPU_SEED_REFILL", "1")
        if lanes is not None:
            monkeypatch.setenv("BWA_TPU_REFILL_LANES", str(lanes))
    else:
        monkeypatch.delenv("BWA_TPU_SEED_REFILL", raising=False)
    return collect_se_flat(opt, dev, fm, codes, cap_s)


@pytest.mark.parametrize("n_reads,seed", [(97, 3), (300, 5)])
def test_refill_matches_static(dev, fm, monkeypatch, n_reads, seed):
    from bwa_tpu.options import MemOptions

    opt = MemOptions()
    codes = _codes(n_reads, seed)
    a = _flat(opt, dev, fm, codes, 24, False, monkeypatch)
    b = _flat(opt, dev, fm, codes, 24, True, monkeypatch)
    assert a is not None and b is not None
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_refill_queue_wraps_lanes(dev, fm, monkeypatch):
    """More reads than lanes: every lane recycles through several reads
    (the utilization mechanism) and the queue drains exactly."""
    from bwa_tpu.options import MemOptions

    opt = MemOptions()
    codes = _codes(200, 11, with_n=True)
    # cap lanes well below n_reads so refill actually recycles
    monkeypatch.setenv("BWA_TPU_REFILL_LANES", "32")
    # _lane_bucket floors at 256 lanes; drive the machine directly too
    a = _flat(opt, dev, fm, codes, 24, False, monkeypatch)
    b = _flat(opt, dev, fm, codes, 24, True, monkeypatch)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_refill_ladder_on_tiny_cap(dev, fm, monkeypatch):
    """A deliberately tiny per-lane buffer forces the n_drawn<n /
    overflow ladder; output must still match the static path."""
    from bwa_tpu.mem.batch_seed import collect_se_flat
    from bwa_tpu.options import MemOptions

    opt = MemOptions()
    codes = _codes(150, 17)
    monkeypatch.delenv("BWA_TPU_SEED_REFILL", raising=False)
    a = collect_se_flat(opt, dev, fm, codes, 24)
    monkeypatch.setenv("BWA_TPU_SEED_REFILL", "1")
    # engine-level: tiny total cap (< one read's worth of slack)
    out, n_drawn = dev.collect_seeds_refill(
        *_pad(codes), opt, cap_s=26, cap_r=24, lanes=16)
    # the tiny buffer must trip a degraded mode: per-lane overflow
    # (retried at a higher cap) or an undrained queue
    assert (out[5] > 26).any() or n_drawn < len(codes)
    b = collect_se_flat(opt, dev, fm, codes, 24)  # driver ladder handles it
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def _pad(codes):
    from bwa_tpu.mem.batch_seed import _len_bucket, _pad_reads

    L = _len_bucket(max(len(c) for c in codes))
    return _pad_reads(codes, L)


def test_refill_mem_sam_byte_identical(oracle_bwa, small_genome,
                                       small_reads_se):
    """Full `mem` SE run with BWA_TPU_SEED_REFILL=1 vs the oracle."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out_o = subprocess.run(
        [str(oracle_bwa), "mem", str(small_genome), str(small_reads_se)],
        check=True, capture_output=True)
    env = dict(os.environ, BWA_TPU_SEED_REFILL="1")
    out_m = subprocess.run(
        [sys.executable, "-m", "bwa_tpu.cli", "mem", str(small_genome),
         str(small_reads_se)],
        check=True, capture_output=True, cwd=repo, env=env)
    strip = lambda b: [l for l in b.decode().splitlines()
                       if not l.startswith("@PG")]
    assert strip(out_m.stdout) == strip(out_o.stdout)
