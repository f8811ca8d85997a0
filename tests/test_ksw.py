"""DP kernels vs the reference ksw.c compiled as a shared library."""

import ctypes

import numpy as np
import pytest

from bwa_tpu.options import fill_scmat
from bwa_tpu.ops import ksw_host

REF_SO = "/tmp/bwa_oracle/ksw_ref.so"

KSW_XBYTE = 0x10000
KSW_XSTOP = 0x20000
KSW_XSUBO = 0x40000
KSW_XSTART = 0x80000


class KswrT(ctypes.Structure):
    _fields_ = [("score", ctypes.c_int), ("te", ctypes.c_int),
                ("qe", ctypes.c_int), ("score2", ctypes.c_int),
                ("te2", ctypes.c_int), ("tb", ctypes.c_int),
                ("qb", ctypes.c_int)]


@pytest.fixture(scope="module")
def ref():
    import subprocess, pathlib
    if not pathlib.Path(REF_SO).exists():
        subprocess.run(["gcc", "-O2", "-shared", "-fPIC",
                        "/root/reference/ksw.c", "-o", REF_SO], check=True)
    lib = ctypes.CDLL(REF_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    ip = ctypes.POINTER(ctypes.c_int)
    c = ctypes.c_int
    lib.ksw_extend2.restype = c
    lib.ksw_extend2.argtypes = [c, u8p, c, u8p, c, i8p, c, c, c, c, c, c, c, c,
                                ip, ip, ip, ip, ip]
    lib.ksw_global2.restype = c
    lib.ksw_global2.argtypes = [c, u8p, c, u8p, c, i8p, c, c, c, c, c,
                                ip, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32))]
    lib.ksw_align2.restype = KswrT
    lib.ksw_align2.argtypes = [c, u8p, c, u8p, c, i8p, c, c, c, c, c,
                               ctypes.c_void_p]
    return lib


def _seqs(rng, qlen, tlen, relatedness=0.9):
    t = rng.integers(0, 4, size=tlen).astype(np.uint8)
    if rng.random() < relatedness:
        off = int(rng.integers(0, max(1, tlen - qlen))) if tlen > qlen else 0
        q = t[off:off + qlen].copy()
        nmut = int(rng.integers(0, max(2, qlen // 10)))
        for _ in range(nmut):
            q[int(rng.integers(0, len(q)))] = rng.integers(0, 4)
    else:
        q = rng.integers(0, 4, size=qlen).astype(np.uint8)
    return q, t


def _p(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def test_extend2_matches_reference(ref):
    rng = np.random.default_rng(5)
    mat = fill_scmat(1, 4).reshape(-1)
    for trial in range(300):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(1, 160))
        q, t = _seqs(rng, qlen, tlen)
        h0 = int(rng.integers(1, 80))
        w = int(rng.choice([10, 100, 200]))
        zdrop = int(rng.choice([0, 100]))
        outs = [ctypes.c_int(0) for _ in range(5)]
        sc_ref = ref.ksw_extend2(
            len(q), _p(q, ctypes.c_uint8), len(t), _p(t, ctypes.c_uint8), 5,
            _p(mat, ctypes.c_int8), 6, 1, 6, 1, w, 5, zdrop, h0,
            *[ctypes.byref(o) for o in outs])
        mine = ksw_host.ksw_extend2(q, t, mat, 6, 1, 6, 1, w, 5, zdrop, h0)
        expect = (sc_ref, outs[0].value, outs[1].value, outs[2].value,
                  outs[3].value, outs[4].value)
        assert mine == expect, (trial, mine, expect)


def test_global2_matches_reference(ref):
    rng = np.random.default_rng(6)
    mat = fill_scmat(1, 4).reshape(-1)
    for trial in range(300):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(max(1, qlen - 20), qlen + 20))
        q, t = _seqs(rng, qlen, tlen)
        # the reference's backtrack has UB for infeasible bands
        # (w < |tlen-qlen|); bwa_gen_cigar2 always passes a feasible band
        w = int(rng.choice([3, 10, 50, 150])) + abs(tlen - qlen)
        ncig = ctypes.c_int(0)
        cig_p = ctypes.POINTER(ctypes.c_uint32)()
        sc_ref = ref.ksw_global2(
            len(q), _p(q, ctypes.c_uint8), len(t), _p(t, ctypes.c_uint8), 5,
            _p(mat, ctypes.c_int8), 6, 1, 6, 1, w,
            ctypes.byref(ncig), ctypes.byref(cig_p))
        ref_cigar = [(cig_p[i] & 0xF, cig_p[i] >> 4) for i in range(ncig.value)]
        sc, cigar = ksw_host.ksw_global2(q, t, mat, 6, 1, 6, 1, w)
        assert sc == sc_ref, (trial, sc, sc_ref)
        assert cigar == ref_cigar, (trial, cigar, ref_cigar)


def test_align2_matches_reference(ref):
    rng = np.random.default_rng(7)
    mat = fill_scmat(1, 4).reshape(-1)
    for trial in range(300):
        qlen = int(rng.integers(10, 150))
        tlen = int(rng.integers(20, 400))
        q, t = _seqs(rng, qlen, tlen)
        use_byte = bool(rng.integers(0, 2))
        thres = 19
        xtra = KSW_XSUBO | KSW_XSTART | (KSW_XBYTE if use_byte else 0) | thres
        qc = q.copy(); tc = t.copy()
        r = ref.ksw_align2(len(qc), _p(qc, ctypes.c_uint8), len(tc),
                           _p(tc, ctypes.c_uint8), 5, _p(mat, ctypes.c_int8),
                           6, 1, 6, 1, xtra, None)
        mine = ksw_host.ksw_align2(q, t, mat, 6, 1, 6, 1, use_byte=use_byte,
                                   use_start=True, use_subo=True, thres=thres)
        expect = (r.score, r.te, r.qe, r.score2, r.te2, r.tb, r.qb)
        got = (mine.score, mine.te, mine.qe, mine.score2, mine.te2, mine.tb, mine.qb)
        assert got == expect, (trial, got, expect, use_byte)
