#!/usr/bin/env python
"""Extension-kernel GCUPS microbenchmark (the SURVEY §6 north-star kernel).

Times ops/ksw_pallas.py's banded kernel (exact ksw_extend2 semantics,
/root/reference/ksw.c:416-515) two ways and prints one JSON line per
shape:

- kernel_*: device-RESIDENT inputs (what the production ExtGatherEngine
  path sees — sequences are gathered in-jit from resident arrays).  This
  is the kernel's true rate.
- e2e_*: the host-upload wrapper (extend_band_pallas), which ships
  ~8.5 MB of int32 band inputs per 1024x2048 call — over this ~55 MB/s
  tunnel that is transfer-bound, NOT a kernel number.  Round-2/3 PERF
  "9.8 GCUPS" figures were this wrapper; the kernel itself measured
  ~10x higher once the upload was taken off the clock (round 4).

Sequences are 95%-matching so z-drop never cuts rows early (worst-case
work).  Cells: banded = N*T*min(2w+1, Q); full-equiv = N*Q*T (what the
unbanded spec computes for the same problems).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_problems(N, Q, T, w, h0=60):
    rng = np.random.default_rng(42)
    qs = rng.integers(0, 4, (N, Q), dtype=np.uint8)
    ts = rng.integers(0, 4, (N, T), dtype=np.uint8)
    L = min(Q, T)
    ts[:, :L] = np.where(rng.random((N, L)) < 0.95, qs[:, :L], ts[:, :L])
    mat = np.array([[1, -4, -4, -4, -1],
                    [-4, 1, -4, -4, -1],
                    [-4, -4, 1, -4, -1],
                    [-4, -4, -4, 1, -1],
                    [-1, -1, -1, -1, -1]], np.int32)
    return (qs, np.full(N, Q, np.int64), ts, np.full(N, T, np.int64), mat,
            np.full(N, w, np.int64), np.full(N, h0, np.int64))


def run_shape(N, Q, T, w, reps=3):
    import jax
    import jax.numpy as jnp

    from bwa_tpu.ops.ksw_pallas import (_band_for, _extend_band,
                                        extend_band_pallas)

    qs, qlens, ts, tlens, mat, ws, h0s = make_problems(N, Q, T, w)
    args = (qs, qlens, ts, tlens, mat, 6, 1, 6, 1, ws, 5, 100, h0s)

    # --- end-to-end wrapper (host inputs, uploads per call) ---
    out = extend_band_pallas(*args)
    jax.device_get(out[0])
    e2e = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = extend_band_pallas(*args)
        jax.device_get(out[0])
        e2e = min(e2e, time.perf_counter() - t0)

    # --- kernel with device-resident band inputs ---
    P = _band_for(w)
    W = P // 2 - 1
    qpad = np.full((N, W + Q + P), 4, np.uint8)
    qpad[:, W:W + Q] = qs
    qb0 = jnp.asarray(np.ascontiguousarray(qpad[:, :P]).astype(np.int32))
    qn_h = np.zeros((N, T), np.int32)
    take = min(T, qpad.shape[1] - (P - 1))
    qn_h[:, :take] = qpad[:, P - 1:P - 1 + take]
    qn = jnp.asarray(qn_h)
    tsd = jnp.asarray(ts.astype(np.int32))
    sc = np.zeros((1, 128), np.int32)
    sc[0, :25] = mat.reshape(-1)
    sc = jnp.asarray(sc)
    par = np.zeros((N, 128), np.int32)
    par[:, 0], par[:, 1], par[:, 2], par[:, 3] = Q, T, w, 60
    par = jnp.asarray(par)
    kern_args = (qb0, qn, tsd, sc, par, P, W, 6, 1, 6, 1, 100, False)
    jax.device_get(_extend_band(*kern_args))
    kern = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(_extend_band(*kern_args))
        kern = min(kern, time.perf_counter() - t0)

    band_cells = N * T * min(2 * w + 1, Q)
    full_cells = N * Q * T
    return {
        "metric": "ksw_extend_band_gcups",
        "shape": f"{N}x{Q}x{T}/w{w}",
        "kernel_s": round(kern, 4),
        "kernel_band_gcups": round(band_cells / kern / 1e9, 2),
        "kernel_full_equiv_gcups": round(full_cells / kern / 1e9, 2),
        "e2e_s": round(e2e, 4),
        "e2e_band_gcups": round(band_cells / e2e / 1e9, 2),
        "e2e_full_equiv_gcups": round(full_cells / e2e / 1e9, 2),
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
