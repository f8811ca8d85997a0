#!/usr/bin/env python
"""Extension-kernel GCUPS microbenchmark (the SURVEY §6 north-star kernel).

Times ops/ksw_pallas.py extend_band_pallas (exact ksw_extend2 semantics,
/root/reference/ksw.c:416-515) on random problems and prints one JSON
line per shape with banded-cell GCUPS (cells actually in the band) and
full-equivalent GCUPS (qlen*tlen cells the unbanded spec would compute),
plus the roofline context (see PERF.md "extension-kernel roofline").
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_shape(N, Q, T, w, reps=3, h0=60):
    import jax

    from bwa_tpu.ops.ksw_pallas import extend_band_pallas

    rng = np.random.default_rng(42)
    qs = rng.integers(0, 4, (N, Q), dtype=np.uint8)
    ts = rng.integers(0, 4, (N, T), dtype=np.uint8)
    # make targets mostly-matching so z-drop does not cut rows early
    # (worst-case work): copy query into target prefix with 5% noise
    L = min(Q, T)
    ts[:, :L] = np.where(rng.random((N, L)) < 0.95, qs[:, :L], ts[:, :L])
    qlens = np.full(N, Q, np.int64)
    tlens = np.full(N, T, np.int64)
    mat = np.array([[1, -4, -4, -4, -1],
                    [-4, 1, -4, -4, -1],
                    [-4, -4, 1, -4, -1],
                    [-4, -4, -4, 1, -1],
                    [-1, -1, -1, -1, -1]], np.int32)
    ws = np.full(N, w, np.int64)
    h0s = np.full(N, h0, np.int64)

    args = (qs, qlens, ts, tlens, mat, 6, 1, 6, 1, ws, 5, 100, h0s)
    out = extend_band_pallas(*args)  # warm/compile
    jax.device_get(out[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = extend_band_pallas(*args)
        jax.device_get(out[0])
        best = min(best, time.perf_counter() - t0)
    band_cells = N * T * min(2 * w + 1, Q)
    full_cells = N * Q * T
    return {
        "metric": "ksw_extend_band_gcups",
        "shape": f"{N}x{Q}x{T}/w{w}",
        "s": round(best, 4),
        "band_gcups": round(band_cells / best / 1e9, 2),
        "full_equiv_gcups": round(full_cells / best / 1e9, 2),
    }


def main():
    shapes = [(1024, 2048, 2048, 100), (1024, 1024, 1024, 100),
              (4096, 256, 512, 100)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    for N, Q, T, w in shapes:
        print(json.dumps(run_shape(N, Q, T, w)))


if __name__ == "__main__":
    main()
