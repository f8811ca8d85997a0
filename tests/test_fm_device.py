"""Batched device FM ops vs the scalar host spec (CPU backend, jitted)."""

import numpy as np
import pytest

from bwa_tpu.index.fmindex import FMIndex
from bwa_tpu.ops.fm_host import HostFM


@pytest.fixture(scope="module")
def fm(small_genome):
    return FMIndex.load(small_genome)


@pytest.fixture(scope="module")
def hostfm(fm):
    return HostFM(fm)


@pytest.fixture(scope="module")
def dev(fm):
    from bwa_tpu.ops.fm import BatchedFMEngine

    return BatchedFMEngine(fm)


def _reads(n, L, seed, with_n=False):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ln = int(rng.integers(30, L + 1))
        r = rng.integers(0, 4, size=ln).astype(np.uint8)
        if with_n and rng.random() < 0.5:
            r[rng.integers(0, ln)] = 4
        out.append(r)
    return out


def test_sa_batch_matches_host(dev, hostfm, fm):
    rng = np.random.default_rng(0)
    ks = rng.integers(1, fm.seq_len, size=500)
    got = dev.sa_many(ks)
    expect = np.array([hostfm.sa(int(k)) for k in ks])
    assert (got == expect).all()


def test_smem_batch_matches_host(dev, hostfm, fm, small_reads_se):
    # use real reads (they have genuine SMEM structure) + random ones
    import datagen

    contigs = datagen.random_genome(200_000, seed=7, n_contigs=2)
    reads = datagen.simulate_reads(contigs, 60, read_len=150, seed=23)
    codes = []
    from bwa_tpu.index.pack import NT4_TABLE
    for _, seq, _ in reads:
        codes.append(NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)])
    codes += _reads(20, 150, seed=1, with_n=True)

    B = len(codes)
    L = max(len(c) for c in codes)
    q = np.full((B, L), 4, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, c in enumerate(codes):
        q[i, : len(c)] = c
        lens[i] = len(c)
    rng = np.random.default_rng(2)
    xs = np.array([rng.integers(0, max(1, l - 5)) for l in lens], dtype=np.int32)
    minv = np.ones(B, dtype=np.int64)
    for max_intv in (0, 30):
        active = np.ones(B, dtype=bool)
        ret, m0, m1, m2, ms, me, mem_n = dev.smem_pass(
            q, lens, xs, minv, max_intv, active, L + 2)
        for b in range(B):
            r_exp, mems_exp = hostfm.smem1a(codes[b], int(xs[b]), 1, max_intv)
            assert ret[b] == r_exp, (b, max_intv)
            got = [(int(m0[b, j]), int(m1[b, j]), int(m2[b, j]),
                    (int(ms[b, j]) << 32) | int(me[b, j]))
                   for j in range(int(mem_n[b]) - 1, -1, -1)]
            assert got == mems_exp, (b, max_intv)


def test_seed3_batch_matches_host(dev, hostfm):
    codes = _reads(40, 150, seed=3, with_n=True)
    B = len(codes)
    L = max(len(c) for c in codes)
    q = np.full((B, L), 4, dtype=np.uint8)
    lens = np.array([len(c) for c in codes], dtype=np.int32)
    for i, c in enumerate(codes):
        q[i, : len(c)] = c
    xs = np.zeros(B, dtype=np.int32)
    active = np.ones(B, dtype=bool)
    ret, found, r0, r1, r2, s0, s1 = dev.seed3_pass(q, lens, xs, 19, 20, active)
    for b in range(B):
        r_exp, m_exp = hostfm.seed_strategy1(codes[b], 0, 19, 20)
        assert ret[b] == r_exp
        if m_exp is None or m_exp[2] == 0:
            assert not found[b] or int(r2[b]) == 0
        else:
            assert found[b]
            info = (int(s0[b]) << 32) | int(s1[b])
            assert (int(r0[b]), int(r1[b]), int(r2[b]), info) == m_exp


def test_collect_intv_batch_matches_host(dev, hostfm, fm):
    from bwa_tpu.mem.batch_seed import collect_intv_batch
    from bwa_tpu.mem.seeding import collect_intv
    from bwa_tpu.options import MemOptions
    import datagen
    from bwa_tpu.index.pack import NT4_TABLE

    opt = MemOptions()
    contigs = datagen.random_genome(200_000, seed=7, n_contigs=2)
    reads = datagen.simulate_reads(contigs, 40, read_len=150, seed=29)
    codes = [NT4_TABLE[np.frombuffer(s, dtype=np.uint8)] for _, s, _ in reads]
    got = collect_intv_batch(opt, dev, codes)
    for b, c in enumerate(codes):
        expect = collect_intv(opt, hostfm, c)
        assert got[b] == expect, b


def test_seed_machine_int64_coords(small_genome):
    """The int64-coordinate machine (GRCh38-scale genomes force
    jax_enable_x64) must compile (no int32/int64 while-carry drift — a
    jnp.sum accumulator promotion under x64 once broke it) and match the
    host spec exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bwa_tpu.index.fmindex import DeviceFMIndex, FMIndex
    from bwa_tpu.mem.seeding import collect_intv
    from bwa_tpu.ops import fm_machine
    from bwa_tpu.ops.fm import _next_valid_device
    from bwa_tpu.ops.fm_host import HostFM
    from bwa_tpu.options import MemOptions

    old_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(5)
        fm = FMIndex.build_in_memory(
            rng.integers(0, 4, 50000, dtype=np.uint8))
        fm.ckpt = fm.ckpt.astype(np.int64)
        fm.ssa = fm.ssa.astype(np.int64)
        fm.__dict__["sad"] = None
        orig = FMIndex.coord_dtype
        FMIndex.coord_dtype = property(lambda self: np.int64)
        try:
            idx = DeviceFMIndex(fm).tree()
            B, L = 32, 128
            q = rng.integers(0, 4, (B, L)).astype(np.uint8)
            qlen = jnp.full((B,), L, jnp.int32)
            nv = _next_valid_device(jnp.asarray(q), qlen)
            out = fm_machine.seed_machine(
                idx, jnp.asarray(q), qlen, nv, np.int32(19), np.int32(28),
                np.int64(10), np.int64(20), cap=16, cap_s=24, use_p3=True)
            srt = np.asarray(fm_machine.sort_seeds(out[0], out[1],
                                                   key64=False))
            seed_n = np.asarray(out[1])
            host = HostFM(fm)
            opt = MemOptions()
            for b in range(B):
                mems = collect_intv(opt, host, q[b])
                got = [(int(srt[b, j, 0]), int(srt[b, j, 2]),
                        int(srt[b, j, 3]), int(srt[b, j, 4]))
                       for j in range(int(seed_n[b]))]
                want = [(m[0], m[2], m[3] >> 32, m[3] & 0xFFFFFFFF)
                        for m in mems]
                assert got == want, f"read {b} differs"
        finally:
            FMIndex.coord_dtype = orig
    finally:
        jax.config.update("jax_enable_x64", old_x64)
