"""FM-index host primitives vs brute force and vs oracle `bwa fastmap`."""

import subprocess

import numpy as np
import pytest

from bwa_tpu.index.fmindex import FMIndex
from bwa_tpu.index.build import bwt_from_sa
from bwa_tpu.native.build import suffix_array
from bwa_tpu.ops.fm_host import HostFM
from bwa_tpu.mem.fastmap import fastmap_lines


@pytest.fixture(scope="module")
def fm(small_genome):
    return FMIndex.load(small_genome)


@pytest.fixture(scope="module")
def hostfm(fm):
    return HostFM(fm)


@pytest.fixture(scope="module")
def truth(fm):
    """Ground truth: doubled text, suffix array, BWT string."""
    fwd = fm.pac_codes
    code2 = np.concatenate([fwd, (3 - fwd)[::-1]])
    sa = suffix_array(code2)
    bwt_str, primary = bwt_from_sa(code2, sa)
    assert primary == fm.primary
    return code2, sa, bwt_str


def test_occ4_matches_bruteforce(hostfm, truth):
    _, _, bwt_str = truth
    csum = np.zeros((len(bwt_str) + 1, 4), dtype=np.int64)
    onehot = np.zeros((len(bwt_str), 4), dtype=np.int64)
    onehot[np.arange(len(bwt_str)), bwt_str] = 1
    np.cumsum(onehot, axis=0, out=csum[1:])

    rng = np.random.default_rng(0)
    ks = np.concatenate([
        rng.integers(0, hostfm.seq_len, 300),
        [0, 1, hostfm.seq_len - 1, hostfm.seq_len,
         hostfm.primary - 1, hostfm.primary, hostfm.primary + 1, -1],
    ])
    for k in ks:
        k = int(k)
        got = hostfm.occ4(k)
        if k == -1:
            expect = np.zeros(4, dtype=np.int64)
        else:
            kk = k - (k >= hostfm.primary)
            if k == hostfm.seq_len:
                expect = csum[-1]
            else:
                expect = csum[kk + 1]  # inclusive count of B[0..kk]
        assert (got == expect).all(), (k, got, expect)


def test_sa_matches_suffix_array(hostfm, truth, fm):
    _, sa, _ = truth
    rows = np.empty(fm.seq_len + 1, dtype=np.int64)
    rows[0] = fm.seq_len
    rows[1:] = sa
    rng = np.random.default_rng(1)
    for k in rng.integers(1, fm.seq_len, 200):
        assert hostfm.sa(int(k)) == rows[int(k)]


def test_exact_match_intervals(hostfm, truth, fm):
    """Backward-search interval of a random substring covers exactly its
    occurrences."""
    code2, sa, _ = truth
    rng = np.random.default_rng(2)
    rows = np.empty(fm.seq_len + 1, dtype=np.int64)
    rows[0] = fm.seq_len
    rows[1:] = sa
    for _ in range(30):
        ln = int(rng.integers(12, 40))
        pos = int(rng.integers(0, fm.l_pac - ln))
        pat = code2[pos:pos + ln]
        # backward search via 2occ (use occ4)
        k, l = 0, fm.seq_len
        for c in pat[::-1]:
            c = int(c)
            ok = hostfm.occ(k - 1, c)
            ol = hostfm.occ(l, c)
            k = int(fm.L2[c]) + ok + 1
            l = int(fm.L2[c]) + ol
            if k > l:
                break
        assert k <= l
        hits = sorted(rows[np.arange(k, l + 1)])
        # brute force occurrences in doubled text
        expect = []
        for s in range(fm.seq_len - ln + 1):
            if (code2[s:s + ln] == pat).all():
                expect.append(s)
        assert hits == expect


def test_fastmap_matches_oracle(fm, hostfm, small_genome, small_reads_se, oracle_bwa):
    out = subprocess.run(
        [str(oracle_bwa), "fastmap", str(small_genome), str(small_reads_se)],
        check=True, capture_output=True)
    oracle_lines = out.stdout.decode().splitlines()

    mine = []
    from datagen import BASES  # noqa
    import itertools
    with open(small_reads_se) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                break
            seq = f.readline().strip().encode()
            f.readline(); f.readline()
            name = hdr[1:].split()[0]
            mine.extend(fastmap_lines(fm, hostfm, name, seq))
    assert mine == oracle_lines
