"""Batched device extension DP vs the scalar native spec."""

import numpy as np
import pytest

from bwa_tpu.options import fill_scmat
from bwa_tpu.ops import ksw_host


def _mk_problems(rng, n, Q, T):
    qs = np.full((n, Q), 4, dtype=np.uint8)
    ts = np.full((n, T), 4, dtype=np.uint8)
    qlens = np.zeros(n, dtype=np.int32)
    tlens = np.zeros(n, dtype=np.int32)
    h0s = np.zeros(n, dtype=np.int32)
    ws = np.zeros(n, dtype=np.int32)
    for i in range(n):
        ql = int(rng.integers(1, Q + 1))
        tl = int(rng.integers(1, T + 1))
        t = rng.integers(0, 4, size=tl).astype(np.uint8)
        if rng.random() < 0.85 and tl >= ql:
            off = int(rng.integers(0, tl - ql + 1))
            qq = t[off:off + ql].copy()
            for _ in range(int(rng.integers(0, max(2, ql // 8)))):
                qq[int(rng.integers(0, ql))] = rng.integers(0, 4)
        else:
            qq = rng.integers(0, 4, size=ql).astype(np.uint8)
        qs[i, :ql] = qq
        ts[i, :tl] = t
        qlens[i] = ql
        tlens[i] = tl
        h0s[i] = int(rng.integers(1, 100))
        ws[i] = int(rng.choice([10, 100]))
    return qs, qlens, ts, tlens, h0s, ws


def test_extend_batch_matches_scalar():
    from bwa_tpu.ops.ksw_batch import extend_batch
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    mat = fill_scmat(1, 4)
    Q, T = 96, 128
    n = 64
    for trial in range(4):
        qs, qlens, ts, tlens, h0s, ws = _mk_problems(rng, n, Q, T)
        zdrop = [0, 100][trial % 2]
        out = extend_batch(jnp.asarray(qs), jnp.asarray(qlens),
                           jnp.asarray(ts), jnp.asarray(tlens),
                           jnp.asarray(mat.astype(np.int32)),
                           6, 1, 6, 1, jnp.asarray(ws), 5, zdrop,
                           jnp.asarray(h0s), T)
        out = [np.asarray(o) for o in out]
        for i in range(n):
            expect = ksw_host.ksw_extend2(
                qs[i, :qlens[i]], ts[i, :tlens[i]], mat, 6, 1, 6, 1,
                int(ws[i]), 5, zdrop, int(h0s[i]))
            got = tuple(int(o[i]) for o in out)
            assert got == expect, (trial, i, got, expect)
