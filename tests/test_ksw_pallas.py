"""Pallas extension kernel == the validated XLA row-scan spec."""

import numpy as np
import pytest


@pytest.mark.parametrize("seed,n,q,t,zdrop", [
    (1, 37, 80, 150, 100),
    (2, 64, 128, 128, -1),     # no z-drop
    (3, 16, 33, 300, 20),      # aggressive z-drop, ragged lens
])
def test_extend_pallas_matches_spec(seed, n, q, t, zdrop):
    import jax.numpy as jnp

    from bwa_tpu.ops.ksw_batch import extend_batch
    from bwa_tpu.ops.ksw_pallas import extend_batch_pallas

    rng = np.random.default_rng(seed)
    mat = np.full((5, 5), -4, np.int32)
    for i in range(4):
        mat[i, i] = 1
    mat[4, :] = -1
    mat[:, 4] = -1
    qs = rng.integers(0, 4, (n, q)).astype(np.uint8)
    ts = rng.integers(0, 4, (n, t)).astype(np.uint8)
    lim = min(q, t - 3)
    ts[:, 3:3 + lim] = np.where(rng.random((n, lim)) < 0.85,
                                qs[:, :lim], ts[:, 3:3 + lim])
    qlens = rng.integers(q // 3, q + 1, n).astype(np.int32)
    tlens = rng.integers(t // 3, t + 1, n).astype(np.int32)
    ws = rng.integers(10, 120, n).astype(np.int32)
    h0s = rng.integers(1, 60, n).astype(np.int32)
    spec = extend_batch(jnp.asarray(qs), jnp.asarray(qlens),
                        jnp.asarray(ts), jnp.asarray(tlens),
                        jnp.asarray(mat), 6, 1, 6, 1, jnp.asarray(ws),
                        5, zdrop, jnp.asarray(h0s), max_tlen=t)
    spec = [np.asarray(x) for x in spec]
    pal = extend_batch_pallas(qs, qlens, ts, tlens, mat, 6, 1, 6, 1,
                              ws, 5, zdrop, h0s, interpret=True)
    for name, a, b in zip(("score", "qle", "tle", "gtle", "gscore",
                           "max_off"), spec, pal):
        assert (a == b).all(), name


@pytest.mark.parametrize("seed,n,q,t,zdrop", [
    (1, 37, 80, 150, 100),
    (2, 64, 128, 128, -1),
    (3, 16, 33, 300, 20),
    (4, 8, 700, 900, 100),     # long-read shape: band << qlen
])
def test_extend_band_pallas_matches_spec(seed, n, q, t, zdrop):
    import jax.numpy as jnp

    from bwa_tpu.ops.ksw_batch import extend_batch
    from bwa_tpu.ops.ksw_pallas import extend_band_pallas

    rng = np.random.default_rng(seed)
    mat = np.full((5, 5), -4, np.int32)
    for i in range(4):
        mat[i, i] = 1
    mat[4, :] = -1
    mat[:, 4] = -1
    qs = rng.integers(0, 4, (n, q)).astype(np.uint8)
    ts = rng.integers(0, 4, (n, t)).astype(np.uint8)
    lim = min(q, t - 3)
    ts[:, 3:3 + lim] = np.where(rng.random((n, lim)) < 0.85,
                                qs[:, :lim], ts[:, 3:3 + lim])
    qlens = rng.integers(q // 3, q + 1, n).astype(np.int32)
    tlens = rng.integers(t // 3, t + 1, n).astype(np.int32)
    ws = rng.integers(10, 120, n).astype(np.int32)
    h0s = rng.integers(1, 60, n).astype(np.int32)
    spec = extend_batch(jnp.asarray(qs), jnp.asarray(qlens),
                        jnp.asarray(ts), jnp.asarray(tlens),
                        jnp.asarray(mat), 6, 1, 6, 1, jnp.asarray(ws),
                        5, zdrop, jnp.asarray(h0s), max_tlen=t)
    spec = [np.asarray(x) for x in spec]
    pal = extend_band_pallas(qs, qlens, ts, tlens, mat, 6, 1, 6, 1,
                             ws, 5, zdrop, h0s, interpret=True)
    for name, a, b in zip(("score", "qle", "tle", "gtle", "gscore",
                           "max_off"), spec, pal):
        assert (a == b).all(), name
