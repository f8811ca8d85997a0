"""Device-side batched extension over RESIDENT reference/read arrays.

The banded Pallas kernel (ops/ksw_pallas.py, exact ksw_extend2 semantics,
ksw.c:416-515) needs band-space query windows and target rows per job.
Building those host-side would mean shipping megabytes of sequence per
call over the slow tunnel; instead the 2-bit packed forward reference
(.pac bytes) and the batch's flat read codes live on device, and this
module gathers every sequence IN-JIT from tiny per-job coordinate vectors
(the H2D payload is a few KB of job metadata).

Coordinate conventions match bns_get_seq (bntseq.c:403-424): a position
x in [0, 2*l_pac) reads pac[x] on the forward half and the reverse
complement 3 - pac[2*l_pac-1-x] on the reverse half.  Left extensions
walk query/target backwards (dir = -1) exactly like the reversed copies
mem_chain2aln builds (bwamem.c:691-701).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bwa_tpu.ops.ksw_pallas import TB, _band_for, _mk_band_kernel, _tile_band


def _pac_gather(pac, l_pac, pos, valid):
    """Codes at doubled-genome positions (int32, 0..3; 4 where ~valid)."""
    two_l = l_pac * 2
    pos_c = jnp.clip(pos, 0, two_l - 1)
    fwd = pos_c < l_pac
    idx_f = jnp.where(fwd, pos_c, two_l - 1 - pos_c)
    byte = pac[(idx_f >> 2).astype(pos.dtype)].astype(jnp.int32)
    sh = (((~idx_f) & 3) << 1).astype(jnp.int32)
    code = (byte >> sh) & 3
    code = jnp.where(fwd, code, 3 - code)
    return jnp.where(valid, code, 4)


def _q_gather(qflat, qbase, qdir, qlen, j):
    """Read codes at query offsets j (band space); 4 outside [0, qlen)."""
    valid = (j >= 0) & (j < qlen)
    idx = qbase + qdir * j.astype(qbase.dtype)
    idx = jnp.clip(idx, 0, qflat.shape[0] - 1)
    code = qflat[idx].astype(jnp.int32)
    return jnp.where(valid, code, 4)


@partial(jax.jit, static_argnames=("P", "W", "Tp", "o_del", "e_del",
                                   "o_ins", "e_ins", "zdrop", "interpret",
                                   "packed"))
def _ext_band_meta(pac, l_pac, qflat, qbase, qdir, qlen, tbase, tdir, tlen,
                   ws, h0s, sc, P: int, W: int, Tp: int, o_del: int,
                   e_del: int, o_ins: int, e_ins: int, zdrop: int,
                   interpret: bool = False, packed: bool = False):
    Np = qbase.shape[0]
    TILE = _tile_band(P)
    # band-space query windows: qb0[p] = q[p - W], qn[i] = q[i - W + P - 1]
    colp = lax.broadcasted_iota(jnp.int32, (Np, P), 1)
    coli = lax.broadcasted_iota(jnp.int32, (Np, Tp), 1)
    qb0 = _q_gather(qflat, qbase[:, None], qdir[:, None], qlen[:, None],
                    colp - W)
    qn = _q_gather(qflat, qbase[:, None], qdir[:, None], qlen[:, None],
                   coli - W + P - 1)
    ts = _pac_gather(pac, l_pac,
                     tbase[:, None] + tdir[:, None] * coli.astype(tbase.dtype),
                     coli < tlen[:, None])
    par = jnp.zeros((Np, 128), jnp.int32)
    par = par.at[:, 0].set(qlen.astype(jnp.int32))
    par = par.at[:, 1].set(tlen.astype(jnp.int32))
    par = par.at[:, 2].set(ws.astype(jnp.int32))
    par = par.at[:, 3].set(h0s.astype(jnp.int32))
    kern = _mk_band_kernel(P, W, Tp, o_del, e_del, o_ins, e_ins, zdrop,
                           packed)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Np, 128), jnp.int32),
        grid=(Np // TILE, Tp // TB),
        in_specs=[
            pl.BlockSpec((TILE, P), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TB), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TB), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, P), jnp.int32),
                        pltpu.VMEM((TILE, P), jnp.int32),
                        pltpu.VMEM((TILE, P), jnp.int32),
                        pltpu.VMEM((TILE, 128), jnp.int32)],
        interpret=interpret,
    )(qb0, qn, ts, sc, par)


def _band_clamp_jnp(qlens, ws, mat_max, o_del, e_del, o_ins, e_ins,
                    end_bonus):
    """band_clamp (ksw.c:435-443) in-jit; same integer results."""
    qlens = qlens.astype(jnp.int64)
    num_ins = qlens * mat_max + end_bonus - o_ins
    max_ins = jnp.where(num_ins >= 0, num_ins // e_ins + 1,
                        -((-num_ins) // e_ins) + 1)
    w = jnp.minimum(ws.astype(jnp.int64), jnp.maximum(max_ins, 1))
    num_del = qlens * mat_max + end_bonus - o_del
    max_del = jnp.where(num_del >= 0, num_del // e_del + 1,
                        -((-num_del) // e_del) + 1)
    return jnp.minimum(w, jnp.maximum(max_del, 1))


def _side_call(pac, l_pac, qflat, qbase, qdir, qlen, tbase, tdir, tlen,
               ws, h0s, sc, P, Tp, o_del, e_del, o_ins, e_ins, zdrop,
               interpret, packed=False):
    """Build band-space inputs for one extension pass and run the kernel.
    Returns the [Np, 128] kernel output (cols 0-5 = score,qle,tle,gtle,
    gscore,max_off)."""
    W = P // 2 - 1
    Np = qbase.shape[0]
    colp = lax.broadcasted_iota(jnp.int32, (Np, P), 1)
    coli = lax.broadcasted_iota(jnp.int32, (Np, Tp), 1)
    qb0 = _q_gather(qflat, qbase[:, None], qdir[:, None], qlen[:, None],
                    colp - W)
    qn = _q_gather(qflat, qbase[:, None], qdir[:, None], qlen[:, None],
                   coli - W + P - 1)
    ts = _pac_gather(pac, l_pac,
                     tbase[:, None] + tdir[:, None] * coli.astype(tbase.dtype),
                     coli < tlen[:, None])
    par = jnp.zeros((Np, 128), jnp.int32)
    par = par.at[:, 0].set(qlen.astype(jnp.int32))
    par = par.at[:, 1].set(tlen.astype(jnp.int32))
    par = par.at[:, 2].set(ws.astype(jnp.int32))
    par = par.at[:, 3].set(h0s.astype(jnp.int32))
    TILE = _tile_band(P)
    kern = _mk_band_kernel(P, W, Tp, o_del, e_del, o_ins, e_ins, zdrop,
                           packed)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Np, 128), jnp.int32),
        grid=(Np // TILE, Tp // TB),
        in_specs=[
            pl.BlockSpec((TILE, P), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TB), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TB), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, P), jnp.int32),
                        pltpu.VMEM((TILE, P), jnp.int32),
                        pltpu.VMEM((TILE, P), jnp.int32),
                        pltpu.VMEM((TILE, 128), jnp.int32)],
        interpret=interpret,
    )(qb0, qn, ts, sc, par)


@partial(jax.jit, static_argnames=("P1", "P2", "Tp", "w_raw", "mat_max",
                                   "o_del", "e_del", "o_ins", "e_ins",
                                   "zdrop", "pen_clip5", "pen_clip3",
                                   "interpret", "packed"))
def _ext_fused_meta(pac, l_pac, qflat, q_base, l_query, qbeg, slen, rbeg,
                    rmax0, rmax1, h0, P1: int, P2: int, Tp: int,
                    w_raw: int, mat_max: int, o_del: int, e_del: int,
                    o_ins: int, e_ins: int, zdrop: int, pen_clip5: int,
                    pen_clip3: int, sc=None, interpret: bool = False,
                    packed: bool = False):
    """The WHOLE mem_chain2aln extension batch as ONE device program:
    left pass at band w, left band-doubling retry (bwamem.c:706-712),
    right pass seeded from the left's FINAL score (bwamem.c:719), right
    retry — four pallas calls chained in-jit, one packed [Np, 12] D2H.
    One program per (P1, P2, Tp, opts): the per-batch program swaps that
    made BWA_TPU_EXT=device lose 3.3x (PERF.md round 4) collapse to one."""
    Np = q_base.shape[0]
    i32 = jnp.int32
    thr = (w_raw >> 1) + (w_raw >> 2)
    minus = jnp.full(Np, -1, i32)
    one = jnp.full(Np, 1, i32)

    def run(P, qbase, qdir, qlen, tbase, tdir, tlen, ws, h0s):
        out = _side_call(pac, l_pac, qflat, qbase, qdir, qlen, tbase,
                         tdir, tlen, ws, h0s, sc, P, Tp, o_del, e_del,
                         o_ins, e_ins, zdrop, interpret, packed)
        return out[:, :6]

    def run_compact(P, live, qbase, qdir, qlen, tbase, tdir, tlen, ws,
                    h0s):
        """Retry passes: `live` rows are sparse, but the kernel's
        grid-step skip works at TILE-row granularity — so permute live
        rows to the front (stable sort by ~live) and the dead tail's
        blocks never run.  Results are scattered back to job order."""
        perm = jnp.argsort(jnp.where(live, 0, 1), stable=True)
        inv = jnp.argsort(perm, stable=True)
        tk = lambda a: jnp.take(a, perm, axis=0)
        out = run(P, tk(qbase), tk(qdir), tk(qlen), tk(tbase), tk(tdir),
                  jnp.where(tk(live), tk(tlen), 0), tk(ws), tk(h0s))
        return jnp.take(out, inv, axis=0)

    # ---- left (dir -1), h0 from the seed ----
    lm = qbeg > 0
    qlen_l = jnp.where(lm, qbeg, 0).astype(i32)
    qbase_l = q_base + qbeg - 1
    tlen_l = jnp.where(lm, rbeg - rmax0, 0).astype(i32)
    w0_l = _band_clamp_jnp(qlen_l, jnp.full(Np, w_raw, jnp.int64), mat_max,
                           o_del, e_del, o_ins, e_ins, pen_clip5)
    r1 = run(P1, qbase_l, minus, qlen_l, rbeg - 1, minus, tlen_l, w0_l, h0)
    retry_l = lm & (r1[:, 5] >= thr)
    w1_l = _band_clamp_jnp(qlen_l, jnp.full(Np, w_raw << 1, jnp.int64),
                           mat_max, o_del, e_del, o_ins, e_ins, pen_clip5)
    r2 = run_compact(P2, retry_l, qbase_l, minus, qlen_l, rbeg - 1,
                     minus, tlen_l, w1_l, h0)
    lres = jnp.where(retry_l[:, None], r2, r1)
    lres = jnp.where(lm[:, None], lres, jnp.zeros_like(lres))
    aw_l = jnp.where(retry_l, i32(w_raw << 1), i32(w_raw))
    lres = lres.at[:, 5].set(jnp.where(lm, aw_l, 0))

    # ---- right (dir +1), h0 chains from the left's FINAL score ----
    sc0 = jnp.where(lm, lres[:, 0].astype(h0.dtype), h0)
    qe = qbeg + slen
    rm = qe < l_query
    qlen_r = jnp.where(rm, l_query - qe, 0).astype(i32)
    qbase_r = q_base + qe
    tbase_r = rbeg + slen
    tlen_r = jnp.where(rm, rmax1 - tbase_r, 0).astype(i32)
    w0_r = _band_clamp_jnp(qlen_r, jnp.full(Np, w_raw, jnp.int64), mat_max,
                           o_del, e_del, o_ins, e_ins, pen_clip3)
    s1 = run(P1, qbase_r, one, qlen_r, tbase_r, one, tlen_r, w0_r, sc0)
    retry_r = rm & (s1[:, 5] >= thr) & (s1[:, 0] != sc0.astype(i32))
    w1_r = _band_clamp_jnp(qlen_r, jnp.full(Np, w_raw << 1, jnp.int64),
                           mat_max, o_del, e_del, o_ins, e_ins, pen_clip3)
    s2 = run_compact(P2, retry_r, qbase_r, one, qlen_r, tbase_r, one,
                     tlen_r, w1_r, sc0)
    rres = jnp.where(retry_r[:, None], s2, s1)
    rres = jnp.where(rm[:, None], rres, jnp.zeros_like(rres))
    aw_r = jnp.where(retry_r, i32(w_raw << 1), i32(w_raw))
    rres = rres.at[:, 5].set(jnp.where(rm, aw_r, 0))
    return jnp.concatenate([lres, rres], axis=1)


def band_clamp(qlens, ws, mat_max, o_del, e_del, o_ins, e_ins, end_bonus):
    """The per-problem band clamp of ksw.c:435-443 (host numpy)."""
    qlens = np.asarray(qlens, np.int64)
    num_ins = qlens * mat_max + end_bonus - o_ins
    max_ins = np.where(num_ins >= 0, num_ins // e_ins + 1,
                       -((-num_ins) // e_ins) + 1)
    w = np.minimum(np.asarray(ws, np.int64), np.maximum(max_ins, 1))
    num_del = qlens * mat_max + end_bonus - o_del
    max_del = np.where(num_del >= 0, num_del // e_del + 1,
                       -((-num_del) // e_del) + 1)
    return np.minimum(w, np.maximum(max_del, 1)).astype(np.int64)


class ExtGatherEngine:
    """Resident-array extension runner.

    Holds the device copies of the packed reference and the current read
    batch; run() executes one batch of same-direction extension problems
    described purely by coordinates."""

    def __init__(self, pac: np.ndarray, l_pac: int, coord_dtype,
                 interpret: bool | None = None):
        self.pac = jnp.asarray(np.ascontiguousarray(pac, np.uint8))
        self.l_pac = int(l_pac)
        self.cdt = coord_dtype
        self._qflat = None
        if interpret is None:  # Pallas-TPU kernels need interpret on CPU
            interpret = jax.default_backend() == "cpu"
        self.interpret = bool(interpret)

    def set_reads(self, qflat: np.ndarray) -> None:
        self._qflat = jnp.asarray(np.ascontiguousarray(qflat, np.uint8))

    def run_fused(self, meta: np.ndarray, opt) -> np.ndarray:
        """One device program for a whole mem_chain2aln extension batch
        (meta rows: q_base, l_query, qbeg, slen, rbeg, rmax0, rmax1, h0 —
        the exact job table memfin.cpp's callback passes).  Returns
        [n, 12] = (left 6 | right 6) with the same values the 4-call
        run() sequence produces.  Jobs are sorted by their larger target
        length so trailing T blocks of short jobs stay skippable."""
        n = meta.shape[0]
        assert n > 0
        mat_max = int(np.asarray(opt.mat).max())
        w_raw = int(opt.w)
        # band buckets: pass-1 band w, retry band 2w (both post-clamp
        # bands are <= the raw values, so these P are sufficient)
        P1 = _band_for(w_raw)
        P2 = _band_for(w_raw << 1)
        # pad the job axis to a multiple of the LARGER tile: both kernels
        # compute grid = Np // TILE_P, so an Np that only fits the smaller
        # tile would TRUNCATE the other kernel's grid to zero steps and
        # leave its output block uninitialized
        TILE = max(_tile_band(P1), _tile_band(P2))
        q_base, l_query, qbeg, slen = meta[:, 0], meta[:, 1], meta[:, 2], \
            meta[:, 3]
        rbeg, rmax0, rmax1, h0 = meta[:, 4], meta[:, 5], meta[:, 6], \
            meta[:, 7]
        tl = np.maximum(rbeg - rmax0, rmax1 - (rbeg + slen))
        order = np.argsort(-tl, kind="stable")
        ntiles = 1 << (max(1, -(-n // TILE)) - 1).bit_length()
        Np = ntiles * TILE
        Tp = max(TB, -(-int(tl.max(initial=1)) // TB) * TB)
        Tp = 1 << (Tp - 1).bit_length()
        cdt = self.cdt

        def pad(a, dt):
            out = np.zeros(Np, dt)
            out[:n] = np.asarray(a)[order]
            return jnp.asarray(out)

        sc = np.zeros((1, 128), np.int32)
        sc[0, :25] = np.asarray(opt.mat, np.int32).reshape(-1)
        # packed max+argmax single-reduce rows need score*P to fit int32
        smax = int(np.max(h0, initial=0)) + \
            int(np.max(l_query, initial=0)) * mat_max + 64
        packed = (smax + 4) * max(P1, P2) < (1 << 30)
        out = _ext_fused_meta(
            self.pac, cdt(self.l_pac), self._qflat,
            pad(q_base, cdt), pad(l_query, np.int64), pad(qbeg, np.int64),
            pad(slen, np.int64), pad(rbeg, cdt), pad(rmax0, cdt),
            pad(rmax1, cdt), pad(h0, np.int64),
            int(P1), int(P2), int(Tp), w_raw, mat_max, int(opt.o_del),
            int(opt.e_del), int(opt.o_ins), int(opt.e_ins), int(opt.zdrop),
            int(opt.pen_clip5), int(opt.pen_clip3), sc=jnp.asarray(sc),
            interpret=self.interpret, packed=packed)
        out = np.asarray(jax.device_get(out))
        res = np.zeros((n, 12), np.int32)
        res[order] = out[:n, :12]
        return res

    def run(self, qbase, qdir, qlen, tbase, tdir, tlen, ws, h0s, mat,
            o_del, e_del, o_ins, e_ins, zdrop):
        """Batched extend; returns (score, qle, tle, gtle, gscore,
        max_off) numpy arrays.  ws must already be band-clamped."""
        n = len(qbase)
        assert n > 0
        w_max = int(np.max(ws, initial=1))
        P = _band_for(w_max)
        W = P // 2 - 1
        TILE = _tile_band(P)
        # one generous T bucket (the kernel skips dead grid steps);
        # sort by tlen so short jobs share skippable blocks
        Tp = max(TB, -(-int(np.max(tlen, initial=1)) // TB) * TB)
        Tp = 1 << (Tp - 1).bit_length()
        order = np.argsort(-np.asarray(tlen, np.int64), kind="stable")
        ntiles = 1 << (max(1, -(-n // TILE)) - 1).bit_length()
        Np = ntiles * TILE
        cdt = self.cdt

        def pad(a, dt, fill=0):
            out = np.full(Np, fill, dt)
            out[:n] = np.asarray(a)[order]
            return jnp.asarray(out)

        sc = np.zeros((1, 128), np.int32)
        sc[0, :25] = np.asarray(mat, np.int32).reshape(-1)
        # packed max+argmax single-reduce rows need score*P to fit int32
        smax = int(np.max(h0s, initial=0)) + \
            int(np.max(qlen, initial=0)) * int(np.asarray(mat).max()) + 64
        packed = (smax + 4) * P < (1 << 30)
        out = _ext_band_meta(
            self.pac, cdt(self.l_pac), self._qflat,
            pad(qbase, cdt), pad(qdir, np.int32), pad(qlen, np.int32),
            pad(tbase, cdt), pad(tdir, np.int32), pad(tlen, np.int32),
            pad(ws, np.int32), pad(h0s, np.int32), jnp.asarray(sc),
            int(P), int(W), int(Tp), int(o_del), int(e_del), int(o_ins),
            int(e_ins), int(zdrop), self.interpret, packed)
        out = np.asarray(jax.device_get(out))
        res = np.zeros((n, 6), np.int32)
        res[order] = out[:n, :6]
        return res
