"""Device-side speculative extension (mem/ext_device.py + ops/ext_gather.py)
== the scalar host DP, end-to-end through the native finalize."""

import numpy as np
import pytest


def _mat():
    mat = np.full((5, 5), -4, np.int8)
    for i in range(4):
        mat[i, i] = 1
    mat[4, :] = -1
    mat[:, 4] = -1
    return mat


def test_ext_gather_matches_scalar():
    """ExtGatherEngine.run (resident-pac gather + banded kernel) ==
    bt_ksw_extend2 on both strands and directions."""
    import ctypes

    from bwa_tpu.native.build import get_lib
    from bwa_tpu.ops.ext_gather import ExtGatherEngine, band_clamp
    from bwa_tpu.index.pack import pack_codes

    rng = np.random.default_rng(11)
    l_pac = 4096
    ref = rng.integers(0, 4, l_pac).astype(np.uint8)
    pac = np.zeros(l_pac // 4 + 1, np.uint8)
    pac[: (l_pac + 3) // 4] = pack_codes(ref)[: (l_pac + 3) // 4]
    qflat = rng.integers(0, 4, 2048).astype(np.uint8)
    qflat[100:105] = 4  # ambiguous bases in the read
    mat = _mat()

    lib = get_lib()
    lib.bt_ksw_extend2.restype = ctypes.c_int
    i32p = ctypes.POINTER(ctypes.c_int32)

    def scalar(q, t, w, h0):
        outs = [ctypes.c_int32(0) for _ in range(5)]
        u8 = ctypes.POINTER(ctypes.c_uint8)
        qa = np.ascontiguousarray(q, np.uint8)
        ta = np.ascontiguousarray(t, np.uint8)
        sc = lib.bt_ksw_extend2(
            len(q), qa.ctypes.data_as(u8), len(t), ta.ctypes.data_as(u8),
            5, mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            6, 1, 6, 1, int(w), 5, 100, int(h0),
            *[ctypes.byref(o) for o in outs])
        return [sc] + [o.value for o in outs]

    eng = ExtGatherEngine(pac, l_pac, np.int32, interpret=True)
    eng.set_reads(qflat)

    n = 24
    qbase = rng.integers(64, 1900, n)
    qdir = np.where(rng.random(n) < 0.5, 1, -1).astype(np.int32)
    qlen = rng.integers(0, 70, n)
    qlen[0] = 0  # degenerate: no query
    tbase = rng.integers(80, 2 * l_pac - 80, n)
    tdir = np.where(rng.random(n) < 0.5, 1, -1).astype(np.int32)
    tlen = rng.integers(0, 120, n)
    tlen[1] = 0  # degenerate: no target
    # keep target walks inside [0, 2*l_pac)
    tlen = np.minimum(tlen, np.where(tdir > 0, 2 * l_pac - tbase, tbase + 1))
    h0 = rng.integers(1, 80, n)
    ws = band_clamp(qlen, np.full(n, 100), 1, 6, 1, 6, 1, 5)

    keep = qlen > 0
    res = eng.run(qbase[keep], qdir[keep], qlen[keep], tbase[keep],
                  tdir[keep], tlen[keep], ws[keep], h0[keep],
                  mat, 6, 1, 6, 1, 100)
    ki = np.nonzero(keep)[0]
    for row, i in enumerate(ki):
        q = np.array([qflat[qbase[i] + qdir[i] * j] for j in range(qlen[i])])
        t = []
        for j in range(tlen[i]):
            x = tbase[i] + tdir[i] * j
            t.append(ref[x] if x < l_pac else 3 - ref[2 * l_pac - 1 - x])
        exp = scalar(q, np.array(t, np.uint8), ws[i], h0[i])
        got = list(res[row])
        assert got == exp, (i, got, exp)


@pytest.mark.parametrize("stage", ["first", "all"])
@pytest.mark.parametrize("pe", [False, True])
def test_finalize_device_ext_byte_identical(pe, stage, small_genome):
    """Native finalize with the Pallas extension callback == without, on
    long reads (the production pacbio wiring, interpret mode on CPU).
    stage="first" is the staged path (only first-in-chain jobs resolved on
    device, consumed misses fall back to the inline scalar DP in
    chain2aln); stage="all" is the full speculative table."""
    import os

    from datagen import random_genome, simulate_reads

    from bwa_tpu.engine import make_engine
    from bwa_tpu.index.fmindex import FMIndex
    from bwa_tpu.mem.pipeline import process_seqs
    from bwa_tpu.mem.types import Read
    from bwa_tpu.options import MEM_F_PE, MemOptions

    fm = FMIndex.load(small_genome)
    engine = make_engine(fm, "tpu")
    contigs = random_genome(200_000, seed=7, n_contigs=2)  # == small_genome
    sim = simulate_reads(contigs, 12 if pe else 24, read_len=700, seed=9,
                         err_rate=0.04, indel_rate=0.02)
    reads = [Read(name=n, seq=s, qual=q) for n, s, q in sim]
    opt = MemOptions()
    opt.apply_mode("pacbio")
    if pe:
        opt.flag |= MEM_F_PE

    def run(mode):
        os.environ["BWA_TPU_EXT"] = mode
        os.environ["BWA_TPU_EXT_STAGE"] = stage
        try:
            for r in reads:
                r.sam = ""
            process_seqs(opt, engine, fm, reads)
            return [r.sam for r in reads]
        finally:
            del os.environ["BWA_TPU_EXT"]
            del os.environ["BWA_TPU_EXT_STAGE"]

    host = run("host")
    dev = run("device")
    assert host == dev


def test_fused_matches_four_call_path(small_genome):
    """ExtGatherEngine.run_fused (one program: left, left-retry, right,
    right-retry chained in-jit) == the 4-call DeviceExtContext path,
    including the band-doubling retry bookkeeping (aw column)."""
    import os

    from bwa_tpu.index.fmindex import FMIndex
    from bwa_tpu.mem.ext_device import DeviceExtContext
    from bwa_tpu.mem.pipeline import to_codes_batch
    from bwa_tpu.mem.types import Read
    from bwa_tpu.options import MemOptions
    from datagen import random_genome, simulate_reads

    fm = FMIndex.load(small_genome)
    contigs = random_genome(200_000, seed=7, n_contigs=2)
    sim = simulate_reads(contigs, 6, read_len=600, seed=21,
                         err_rate=0.05, indel_rate=0.03)
    reads = [Read(name=n, seq=s, qual=q) for n, s, q in sim]
    codes = to_codes_batch(reads)
    l_off = np.zeros(len(codes) + 1, np.int64)
    for i, c in enumerate(codes):
        l_off[i + 1] = l_off[i] + len(c)
    flat = np.concatenate(codes).astype(np.uint8)
    opt = MemOptions()
    opt.apply_mode("pacbio")

    # synthetic but structurally valid job table: seeds at varying spots
    rng = np.random.default_rng(5)
    n = 64
    metas = np.zeros((n, 8), np.int64)
    for j in range(n):
        r = rng.integers(0, len(codes))
        L = l_off[r + 1] - l_off[r]
        qb = int(rng.integers(0, L - 40))
        sl = int(rng.integers(20, min(120, L - qb)))
        rb = int(rng.integers(300, fm.l_pac - 2000))
        metas[j] = (l_off[r], L, qb, sl, rb,
                    max(0, rb - qb - 100), min(2 * fm.l_pac,
                                               rb + sl + (L - qb - sl) + 100),
                    sl)  # h0 = seed length * a (a=1 under pacbio preset)

    def run(fused: bool):
        os.environ["BWA_TPU_EXT_FUSED"] = "1" if fused else "0"
        try:
            ctx = DeviceExtContext(opt, fm, flat)
            lres = np.zeros((n, 6), np.int32)
            rres = np.zeros((n, 6), np.int32)
            ctx._extend_all(metas, np.ones(n, np.uint8), lres, rres)
            return lres, rres
        finally:
            del os.environ["BWA_TPU_EXT_FUSED"]

    l1, r1 = run(True)
    l0, r0 = run(False)
    assert (l1 == l0).all(), np.argwhere(l1 != l0)
    assert (r1 == r0).all(), np.argwhere(r1 != r0)
