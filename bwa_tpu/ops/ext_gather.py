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
                                   "o_ins", "e_ins", "zdrop", "interpret"))
def _ext_band_meta(pac, l_pac, qflat, qbase, qdir, qlen, tbase, tdir, tlen,
                   ws, h0s, sc, P: int, W: int, Tp: int, o_del: int,
                   e_del: int, o_ins: int, e_ins: int, zdrop: int,
                   interpret: bool = False):
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
    kern = _mk_band_kernel(P, W, Tp, o_del, e_del, o_ins, e_ins, zdrop)
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
        out = _ext_band_meta(
            self.pac, cdt(self.l_pac), self._qflat,
            pad(qbase, cdt), pad(qdir, np.int32), pad(qlen, np.int32),
            pad(tbase, cdt), pad(tdir, np.int32), pad(tlen, np.int32),
            pad(ws, np.int32), pad(h0s, np.int32), jnp.asarray(sc),
            int(P), int(W), int(Tp), int(o_del), int(e_del), int(o_ins),
            int(e_ins), int(zdrop), self.interpret)
        out = np.asarray(jax.device_get(out))
        res = np.zeros((n, 6), np.int32)
        res[order] = out[:n, :6]
        return res
