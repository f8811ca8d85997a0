"""Pallas TPU kernel for batched banded extension (ksw_extend2 semantics).

The XLA row-scan (ops/ksw_batch.py) is the executable spec; it pays
per-op dispatch on every DP row (~0.2 GCUPS on v5e).  This kernel runs
the identical row recurrence fused on the VPU: target rows stream in
128-column blocks along a sequential grid axis, the eh/E state persists
in VMEM scratch across grid steps, the in-row F dependency is a log-tree
prefix max (exact cummax), and every per-lane indexed access is a
one-hot select (no gathers).  Exact semantics preserved: adaptive band
with stale cells, z-drop, h0 seeding, gscore/qle/tle/max_off bookkeeping
and all tie rules (ksw.c:416-515).

Lanes freeze (not retire) on break; the grid always runs all target
blocks, so callers should bucket problems by (qlen, tlen).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.int32(-(1 << 30))
TB = 128     # target rows per grid step


def _tile_for(QP: int, half: bool) -> int:
    """Lanes per kernel instance, bounded by VMEM (~16MB scoped)."""
    if QP <= 384:
        t = 256
    elif QP <= 768:
        t = 128
    elif QP <= 1536:
        t = 64
    else:
        t = 32
    return t * 2 if half else t


def _prefix_max(x, colid, width, sentinel=NEG):
    """Exact inclusive prefix max along axis 1 via a log tree of rolls."""
    off = 1
    while off < width:
        shifted = pltpu.roll(x, off, 1)
        x = jnp.maximum(x, jnp.where(colid >= off, shifted, sentinel))
        off <<= 1
    return x


def _mk_kernel(QP: int, T: int, o_del: int, e_del: int, o_ins: int,
               e_ins: int, zdrop: int, half: bool, packed: bool = False):
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    n_tb = T // TB
    TILE = _tile_for(QP, half)
    vt = jnp.int16 if half else jnp.int32
    neg = np.int16(-20000) if half else NEG

    def kernel(qs_ref, ts_ref, sc_ref, par_ref, out_ref,
               H_ref, E_ref, st_ref):
        tb = pl.program_id(1)
        col = lax.broadcasted_iota(jnp.int32, (TILE, QP), 1)
        sid = lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
        qlen = par_ref[:, 0:1]
        tlen = par_ref[:, 1:2]
        w = par_ref[:, 2:3]
        h0 = par_ref[:, 3:4]

        @pl.when(tb == 0)
        def _():
            # eh row 0 (ksw.c:445-449): eh[0]=h0, eh[1]=max(h0-oe_ins,0),
            # then h-e_ins while the previous value exceeds e_ins; the
            # fill chain is strictly decreasing so the stop is closed-form
            e1 = jnp.maximum(h0 - oe_ins, 0)
            fill = e1 - (col - 1) * e_ins
            prev = e1 - (col - 2) * e_ins
            keep = (col >= 2) & (prev > e_ins) & (col <= qlen)
            H_ref[:] = jnp.where(col == 0, h0,
                                 jnp.where(col == 1, e1,
                                           jnp.where(keep, fill, 0))
                                 ).astype(vt)
            E_ref[:] = jnp.zeros((TILE, QP), vt)
            st = jnp.where(sid == 1, qlen, 0)                 # end = qlen
            st = jnp.where(sid == 2, h0, st)                  # mx = h0
            st = jnp.where((sid >= 3) & (sid <= 6), -1, st)   # mx_i/j/ie,gsc
            st_ref[:] = st

        # per-lane score profiles for the 5 target letters (loop-invariant;
        # recomputed per grid step, a cheap 25-way select)
        qv = qs_ref[:]
        sqs = []
        for c in range(5):
            s = jnp.zeros((TILE, QP), vt)
            for d in range(5):
                s = jnp.where(qv == d, sc_ref[0, c * 5 + d].astype(vt), s)
            sqs.append(s)
        tsb = ts_ref[:]
        st0 = st_ref[:]

        def getcol(st, c):
            return jnp.sum(jnp.where(sid == c, st, 0), axis=1, keepdims=True)

        # NOTE on predicate style: Mosaic cannot truncate (TILE,1)-shaped
        # i8 vectors to i1, so per-lane predicates are int32 0/1 and
        # selections are arithmetic (b + p*(a-b)); every value selected
        # this way is small (scores/positions), so no overflow.  Wide
        # (TILE, QP) boolean masks are native and stay as bools.
        def sel(p, a, b):
            return b + p * (a - b)

        def wide(p):  # 0/1 [TILE,1] -> bool [TILE,QP]
            return p > jnp.zeros_like(col)

        def row_step(r, carry):
            (H, E, tsb_c, beg, end, mx, mx_i, mx_j, mx_ie, gsc, mx_off,
             done) = carry
            i = tb * TB + r
            act = (1 - done) * sel(jnp.ones_like(done) * i < tlen, 1, 0)
            # this row's target char: column 0 of the rotating carry
            # (left-shifted one slot per row) — no per-row reduction
            tci = tsb_c[:, 0:1]
            tsb_c = pltpu.roll(tsb_c, TB - 1, 1)
            beg_r = jnp.maximum(beg, i - w)
            end_r = jnp.minimum(jnp.minimum(end, i + w + 1), qlen)
            h1 = jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0)
            h1_init = sel(sel(beg_r == 0, 1, 0), h1, jnp.zeros_like(h1))
            S = sqs[4]
            for c in range(4):
                S = jnp.where(wide(sel(tci == c, 1, 0)), sqs[c], S)
            inband = (col >= beg_r) & (col < end_r)
            zero_vt = jnp.zeros((), vt)
            M = jnp.where(H != zero_vt, H + S, zero_vt)
            M = jnp.where(inband, M, neg)
            e_cur = jnp.where(inband, E, neg)
            g = jnp.maximum(M - vt(oe_ins), zero_vt)
            g = jnp.where(inband, g, neg)
            colv = col.astype(vt)
            run = _prefix_max(g + colv * vt(e_ins), col, QP, neg)
            if half:
                # keep F = run - (col-1)*e_ins above int16 wrap; -13000
                # still loses to every legitimate value (which are >= 0)
                run = jnp.maximum(run, vt(-13000))
            F = jnp.where(col >= 1,
                          pltpu.roll(run, 1, 1) - (colv - 1) * vt(e_ins),
                          neg)
            F = jnp.where(col == beg_r, zero_vt, F)
            F = jnp.where(inband, F, neg)
            Hrow = jnp.maximum(jnp.maximum(M, e_cur), F)
            Hrow = jnp.where(inband, Hrow, neg)
            if packed:
                # ONE reduce for (row max, argmax): key = score*QP + col.
                # In-band Hrow >= 0 (e_cur is zero-floored), ties prefer
                # the larger col exactly like the two-reduce form, and
                # the caller guarantees score*QP fits int32 (axis-1
                # reduces are ~1.2us each on v5e — this is the per-row
                # diet, PERF.md r4 roofline)
                key = jnp.where(inband,
                                Hrow.astype(jnp.int32) * QP + col,
                                jnp.int32(-(1 << 30)))
                kmax = jnp.max(key, axis=1, keepdims=True)
                mraw = jnp.floor_divide(kmax, QP)
                mrow = jnp.maximum(mraw, 0)
                pos_row = sel(mraw > 0, 1, 0)
                mj = sel(pos_row, kmax - mraw * QP,
                         jnp.full((TILE, 1), -1, jnp.int32))
            else:
                # (Mosaic can't reduce int16 directly: widen first)
                mrow = jnp.maximum(
                    jnp.max(Hrow.astype(jnp.int32), axis=1, keepdims=True),
                    0)
                pos_row = sel(mrow > 0, 1, 0)
                is_max = (Hrow.astype(jnp.int32) == mrow) & inband \
                    & wide(pos_row)
                mj = jnp.max(jnp.where(is_max, col, -1), axis=1,
                             keepdims=True)
                mj = sel(pos_row, mj, jnp.full_like(mj, -1))
            h_last = jnp.sum(
                jnp.where(col == jnp.maximum(end_r - 1, 0),
                          Hrow.astype(jnp.int32), 0),
                axis=1, keepdims=True)
            h_last = sel(sel(end_r > beg_r, 1, 0), h_last, h1_init)
            better = act * sel(end_r == qlen, 1, 0) * sel(h_last >= gsc,
                                                          1, 0)
            mx_ie = sel(better, jnp.full_like(mx_ie, i), mx_ie)
            gsc = sel(better, jnp.maximum(h_last, gsc), gsc)
            t_del = jnp.maximum(M - vt(oe_del), zero_vt)
            Enew = jnp.maximum(e_cur - vt(e_del), t_del)
            Hsh = jnp.where(col >= 1, pltpu.roll(Hrow, 1, 1),
                            h1_init.astype(vt))
            wr = inband & wide(act)
            H2 = jnp.where(wr, Hsh, H)
            E2 = jnp.where(wr, Enew, E)
            endw = (col == end_r) & wide(act)
            H2 = jnp.where(endw, h_last.astype(vt), H2)
            E2 = jnp.where(endw, zero_vt, E2)

            brk0 = act * sel(mrow == 0, 1, 0)
            imp = act * (1 - brk0) * sel(mrow > mx, 1, 0)
            mx_i = sel(imp, jnp.full_like(mx_i, i), mx_i)
            mx_off = sel(imp, jnp.maximum(mx_off, jnp.abs(mj - i)), mx_off)
            mx_j = sel(imp, mj, mx_j)
            zd = act * (1 - brk0) * (1 - imp) * (1 if zdrop > 0 else 0)
            d_i = i - mx_i
            d_j = mj - mx_j
            zc_del = sel(mx - mrow - (d_i - d_j) * e_del > zdrop, 1, 0)
            zc_ins = sel(mx - mrow - (d_j - d_i) * e_ins > zdrop, 1, 0)
            zcond = sel(sel(d_i > d_j, 1, 0), zc_del, zc_ins)
            brkz = zd * zcond
            mx = sel(imp, mrow, mx)

            zero_cell = (H2 == zero_vt) & (E2 == zero_vt)
            in_lo = (col >= beg_r) & (col < end_r)
            first_nz = jnp.min(jnp.where(~zero_cell & in_lo, col, QP + 1),
                               axis=1, keepdims=True)
            beg_n = jnp.minimum(first_nz, end_r)
            in_hi = (col >= beg_n) & (col <= end_r)
            last_nz = jnp.max(jnp.where(~zero_cell & in_hi, col, beg_n - 1),
                              axis=1, keepdims=True)
            end_n = jnp.minimum(last_nz + 2, qlen)

            upd = act * (1 - brk0) * (1 - brkz)
            beg = sel(upd, beg_n, beg)
            end = sel(upd, end_n, end)
            done = jnp.maximum(done, jnp.maximum(brk0, brkz))
            return (H2, E2, tsb_c, beg, end, mx, mx_i, mx_j, mx_ie, gsc,
                    mx_off, done)

        carry = (H_ref[:], E_ref[:], tsb, getcol(st0, 0), getcol(st0, 1),
                 getcol(st0, 2), getcol(st0, 3), getcol(st0, 4),
                 getcol(st0, 5), getcol(st0, 6), getcol(st0, 7),
                 getcol(st0, 8))
        out = lax.fori_loop(0, TB, row_step, carry)
        (H, E, _tsb_c, beg, end, mx, mx_i, mx_j, mx_ie, gsc, mx_off,
         done) = out
        H_ref[:] = H
        E_ref[:] = E
        st = jnp.zeros((TILE, 128), jnp.int32)
        for c, v in ((0, beg), (1, end), (2, mx), (3, mx_i), (4, mx_j),
                     (5, mx_ie), (6, gsc), (7, mx_off), (8, done)):
            st = jnp.where(sid == c, v, st)
        st_ref[:] = st

        @pl.when(tb == n_tb - 1)
        def _():
            # outputs: 0 score, 1 qle, 2 tle, 3 gtle, 4 gscore, 5 max_off
            o = jnp.where(sid == 0, mx, 0)
            o = jnp.where(sid == 1, mx_j + 1, o)
            o = jnp.where(sid == 2, mx_i + 1, o)
            o = jnp.where(sid == 3, mx_ie + 1, o)
            o = jnp.where(sid == 4, gsc, o)
            o = jnp.where(sid == 5, mx_off, o)
            out_ref[:] = o

    return kernel


@partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins",
                                   "zdrop", "half", "interpret", "packed"))
def _extend_pallas(qs, ts, sc, par, o_del, e_del, o_ins, e_ins, zdrop,
                   half, interpret, packed=False):
    N, QP = qs.shape
    T = ts.shape[1]
    TILE = _tile_for(QP, half)
    vt = jnp.int16 if half else jnp.int32
    kern = _mk_kernel(QP, T, o_del, e_del, o_ins, e_ins, zdrop, half,
                      packed)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        grid=(N // TILE, T // TB),
        in_specs=[
            pl.BlockSpec((TILE, QP), lambda i, t: (i, 0),
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
        scratch_shapes=[pltpu.VMEM((TILE, QP), vt),
                        pltpu.VMEM((TILE, QP), vt),
                        pltpu.VMEM((TILE, 128), jnp.int32)],
        interpret=interpret,
    )(qs, ts, sc, par)


def extend_batch_pallas(qs, qlens, ts, tlens, mat, o_del, e_del, o_ins,
                        e_ins, ws, end_bonus, zdrop, h0s,
                        interpret: bool = False):
    """Drop-in equivalent of ops.ksw_batch.extend_batch (same outputs)."""
    qs = np.asarray(qs, np.uint8)
    ts = np.asarray(ts, np.uint8)
    N, Q = qs.shape
    T = ts.shape[1]
    QP = -(-(Q + 1) // 128) * 128        # room for the eh end slot
    # int16 wide math doubles lanes when every intermediate provably
    # fits, but this backend's Mosaic cannot lower pltpu.roll / iota on
    # int16 vectors (probed 2026-08); the machinery stays for a backend
    # that can — force the int32 path until then.
    mmax_v = int(np.asarray(mat).max())
    smax = int(np.max(h0s)) + Q * mmax_v + 64
    half = bool(smax + QP * max(e_ins, e_del) < 19000
                and smax < 19000)
    half = False
    TILE = _tile_for(QP, half)
    Np = -(-N // TILE) * TILE
    Tp = max(TB, -(-T // TB) * TB)
    qsp = np.full((Np, QP), 4, np.int32)
    qsp[:N, :Q] = qs
    tsp = np.full((Np, Tp), 4, np.int32)
    tsp[:N, :T] = ts
    mat = np.asarray(mat, np.int32).reshape(5, 5)
    sc = np.zeros((1, 128), np.int32)
    sc[0, :25] = mat.reshape(-1)
    # band clamp (ksw.c:435-443) on the host, like the spec
    qlens = np.asarray(qlens, np.int64)
    mmax = int(mat.max())
    num_ins = qlens * mmax + end_bonus - o_ins
    max_ins = np.where(num_ins >= 0, num_ins // e_ins + 1,
                       -((-num_ins) // e_ins) + 1)
    w = np.minimum(np.asarray(ws, np.int64), np.maximum(max_ins, 1))
    num_del = qlens * mmax + end_bonus - o_del
    max_del = np.where(num_del >= 0, num_del // e_del + 1,
                       -((-num_del) // e_del) + 1)
    w = np.minimum(w, np.maximum(max_del, 1))
    par = np.zeros((Np, 128), np.int32)
    par[:N, 0] = qlens
    par[:N, 1] = np.asarray(tlens, np.int64)
    par[:N, 2] = w
    par[:N, 3] = np.asarray(h0s, np.int64)
    # packed max+argmax single-reduce rows need score*QP to fit int32
    packed = (smax + 4) * QP < (1 << 30)
    out = _extend_pallas(jnp.asarray(qsp), jnp.asarray(tsp),
                         jnp.asarray(sc), jnp.asarray(par),
                         int(o_del), int(e_del), int(o_ins), int(e_ins),
                         int(zdrop), half, bool(interpret), packed)
    out = np.asarray(jax.device_get(out))[:N]
    return (out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4],
            out[:, 5])


# ---------------------------------------------------------------------------
# Banded variant: band-relative coordinates (p = j - (i - W)).
#
# For long reads the full-width kernel wastes ~qlen/band of its lanes:
# the band is only 2w+1 wide (w=100 by default) while every row scans all
# QP columns.  In band coordinates the DIAGONAL dependency is stationary
# (j-1 at row i-1 lands on the same p), the vertical E dependency is a
# one-slot roll, and F stays an in-row prefix — so each row costs O(P)
# instead of O(qlen).  Semantics stay exactly ksw_extend2 (stale cells,
# adaptive band in absolute j, z-drop, h0 seeding, all tie rules).
# ---------------------------------------------------------------------------


def _band_for(w_max: int) -> int:
    return -(-(2 * w_max + 2) // 128) * 128


def _tile_band(P: int) -> int:
    if P <= 256:
        t = 256
    elif P <= 512:
        t = 128
    elif P <= 1024:
        t = 64
    else:
        t = 32
    return t


def _mk_band_kernel(P: int, W: int, T: int, o_del: int, e_del: int,
                    o_ins: int, e_ins: int, zdrop: int,
                    packed: bool = False):
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    n_tb = T // TB
    TILE = _tile_band(P)
    vt = jnp.int32

    def kernel(qb0_ref, qn_ref, ts_ref, sc_ref, par_ref, out_ref,
               H_ref, E_ref, QB_ref, st_ref):
        tb = pl.program_id(1)
        colp = lax.broadcasted_iota(jnp.int32, (TILE, P), 1)
        sid = lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
        qlen = par_ref[:, 0:1]
        tlen = par_ref[:, 1:2]
        w = par_ref[:, 2:3]
        h0 = par_ref[:, 3:4]
        e1 = jnp.maximum(h0 - oe_ins, 0)

        def eh_init(j):
            # closed-form first-row eh fill (ksw.c:445-449): eh[0]=h0,
            # eh[1]=e1, then e1-(j-1)*e_ins while the previous > e_ins
            fill = e1 - (j - 1) * e_ins
            prev = e1 - (j - 2) * e_ins
            keep = (j >= 2) & (prev > e_ins) & (j <= qlen)
            v = jnp.where(j == 0, h0, jnp.where(j == 1, e1,
                                                jnp.where(keep, fill, 0)))
            return jnp.where((j >= 0) & (j <= qlen), v, 0)

        @pl.when(tb == 0)
        def _():
            j0 = colp - W                       # j at row 0
            H_ref[:] = eh_init(j0).astype(vt)
            E_ref[:] = jnp.zeros((TILE, P), vt)
            QB_ref[:] = qb0_ref[:]
            st = jnp.where(sid == 1, qlen, 0)                 # end = qlen
            st = jnp.where(sid == 2, h0, st)                  # mx = h0
            st = jnp.where((sid >= 3) & (sid <= 6), -1, st)   # mx_i/j/ie,gsc
            st_ref[:] = st

        tsb = ts_ref[:]
        qnb = qn_ref[:]
        st0 = st_ref[:]

        def getcol(st, c):
            return jnp.sum(jnp.where(sid == c, st, 0), axis=1, keepdims=True)

        # the 25 score-matrix entries as loop-invariant scalars: the row
        # loop picks mat[tci][q] with narrow selects instead of 5
        # one-hot reductions per row (the round-2 bookkeeping
        # bottleneck, PERF.md §12)
        ms = [sc_ref[0, k] for k in range(25)]

        def sel(p, a, b):
            return b + p * (a - b)

        def wide(p):  # 0/1 [TILE,1] -> bool [TILE,P]
            return p > jnp.zeros_like(colp)

        # grid-step skip: when every lane of this block is frozen (broke
        # out) or already past its target, the TB-row loop is a no-op —
        # skip it so callers can use one generous T bucket and sort jobs
        # by tlen instead of compiling many shapes (pad lanes have
        # tlen=0 and never go live)
        done0 = getcol(st0, 8)
        live = jnp.max(jnp.where(done0 == 0, tlen - tb * TB, 0)) > 0

        def row_step(r, carry):
            (H, E, QB, tsb_c, qnb_c, beg, end, mx, mx_i, mx_j, mx_ie, gsc,
             mx_off, done) = carry
            i = tb * TB + r
            # this row's target char / entering query char: column 0 of
            # the rotating carries (left-shifted one slot per row) —
            # a static slice instead of a per-row one-hot reduction
            tci = tsb_c[:, 0:1]
            qnew = qnb_c[:, 0:1]
            tsb_c = pltpu.roll(tsb_c, TB - 1, 1)
            qnb_c = pltpu.roll(qnb_c, TB - 1, 1)
            # shift the band one column right: the slot entering at p=P-1
            # carries q[i-W+P-1] and the stale eh-init value for that j
            # (the reference keeps stale eh cells; cells that never saw a
            # write still hold their first-row init)
            shift = jnp.where(jnp.full((TILE, 1), 1, jnp.int32) * i > 0,
                              1, 0)
            j_ent = i - W + P - 1
            h_ent = eh_init(jnp.full((TILE, 1), 1, jnp.int32) * j_ent)
            # left-shift by one == circular roll by P-1 (pltpu.roll
            # only takes non-negative shifts)
            Hs = jnp.where(colp == P - 1, h_ent.astype(vt),
                           pltpu.roll(H, P - 1, 1))
            Es = jnp.where(colp == P - 1, vt(0), pltpu.roll(E, P - 1, 1))
            QBs = jnp.where(colp == P - 1, qnew, pltpu.roll(QB, P - 1, 1))
            H = jnp.where(wide(shift), Hs, H)
            E = jnp.where(wide(shift), Es, E)
            QB = jnp.where(wide(shift), QBs, QB)

            act = (1 - done) * sel(jnp.ones_like(done) * i < tlen, 1, 0)
            colj = colp + (i - W)
            beg_r = jnp.maximum(beg, i - w)
            end_r = jnp.minimum(jnp.minimum(end, i + w + 1), qlen)
            h1 = jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0)
            h1_init = sel(sel(beg_r == 0, 1, 0), h1, jnp.zeros_like(h1))
            # S[p] = mat[tci, QB[p]]: per-lane row pick over the hoisted
            # ms entries (narrow selects), then a 5-way band select
            S = jnp.zeros((TILE, P), vt)
            for c in range(5):
                m_c = ms[4 * 5 + c]
                for t in range(4):
                    m_c = sel(sel(tci == t, 1, 0), ms[t * 5 + c], m_c)
                S = jnp.where(QB == c, jnp.broadcast_to(m_c, (TILE, P)), S)
            inband = (colj >= beg_r) & (colj < end_r)
            zero_vt = jnp.zeros((), vt)
            M = jnp.where(H != zero_vt, H + S, zero_vt)
            M = jnp.where(inband, M, NEG)
            e_cur = jnp.where(inband, E, NEG)
            g = jnp.maximum(M - vt(oe_ins), zero_vt)
            g = jnp.where(inband, g, NEG)
            colv = colj.astype(vt)
            run = _prefix_max(g + colv * vt(e_ins), colp, P, NEG)
            F = jnp.where(colp >= 1,
                          pltpu.roll(run, 1, 1) - (colv - 1) * vt(e_ins),
                          NEG)
            F = jnp.where(colj == beg_r, zero_vt, F)
            F = jnp.where(inband, F, NEG)
            Hrow = jnp.maximum(jnp.maximum(M, e_cur), F)
            Hrow = jnp.where(inband, Hrow, NEG)
            if packed:
                # ONE reduce for (row max, argmax): key = score*P + colp
                # (band-relative column, >= 0).  In-band Hrow >= 0, ties
                # prefer the larger column exactly like the two-reduce
                # form; caller guarantees score*P fits int32
                key = jnp.where(inband, Hrow * P + colp,
                                jnp.int32(-(1 << 30)))
                kmax = jnp.max(key, axis=1, keepdims=True)
                mraw = jnp.floor_divide(kmax, P)
                mrow = jnp.maximum(mraw, 0)
                pos_row = sel(mraw > 0, 1, 0)
                mj = sel(pos_row, kmax - mraw * P + (i - W),
                         jnp.full((TILE, 1), -1, jnp.int32))
            else:
                mrow = jnp.maximum(jnp.max(Hrow, axis=1, keepdims=True), 0)
                pos_row = sel(mrow > 0, 1, 0)
                is_max = (Hrow == mrow) & inband & wide(pos_row)
                mj = jnp.max(jnp.where(is_max, colj, -1), axis=1,
                             keepdims=True)
                mj = sel(pos_row, mj, jnp.full_like(mj, -1))
            h_last = jnp.sum(
                jnp.where(colj == jnp.maximum(end_r - 1, 0), Hrow, 0),
                axis=1, keepdims=True)
            h_last = sel(sel(end_r > beg_r, 1, 0), h_last, h1_init)
            better = act * sel(end_r == qlen, 1, 0) * sel(h_last >= gsc,
                                                          1, 0)
            mx_ie = sel(better, jnp.full_like(mx_ie, i), mx_ie)
            gsc = sel(better, jnp.maximum(h_last, gsc), gsc)
            t_del = jnp.maximum(M - vt(oe_del), zero_vt)
            Enew = jnp.maximum(e_cur - vt(e_del), t_del)
            Hsh = jnp.where(colj >= 1, pltpu.roll(Hrow, 1, 1),
                            h1_init.astype(vt))
            # note: roll along p == shift along j within the row (same row)
            wr = inband & wide(act)
            H2 = jnp.where(wr, Hsh, H)
            E2 = jnp.where(wr, Enew, E)
            endw = (colj == end_r) & wide(act)
            H2 = jnp.where(endw, h_last.astype(vt), H2)
            E2 = jnp.where(endw, zero_vt, E2)

            brk0 = act * sel(mrow == 0, 1, 0)
            imp = act * (1 - brk0) * sel(mrow > mx, 1, 0)
            mx_i = sel(imp, jnp.full_like(mx_i, i), mx_i)
            mx_off = sel(imp, jnp.maximum(mx_off, jnp.abs(mj - i)), mx_off)
            mx_j = sel(imp, mj, mx_j)
            zd = act * (1 - brk0) * (1 - imp) * (1 if zdrop > 0 else 0)
            d_i = i - mx_i
            d_j = mj - mx_j
            zc_del = sel(mx - mrow - (d_i - d_j) * e_del > zdrop, 1, 0)
            zc_ins = sel(mx - mrow - (d_j - d_i) * e_ins > zdrop, 1, 0)
            zcond = sel(sel(d_i > d_j, 1, 0), zc_del, zc_ins)
            brkz = zd * zcond
            mx = sel(imp, mrow, mx)

            zero_cell = (H2 == zero_vt) & (E2 == zero_vt)
            in_lo = (colj >= beg_r) & (colj < end_r)
            first_nz = jnp.min(jnp.where(~zero_cell & in_lo, colj,
                                         jnp.int32(0x3fffffff)),
                               axis=1, keepdims=True)
            beg_n = jnp.minimum(first_nz, end_r)
            in_hi = (colj >= beg_n) & (colj <= end_r)
            last_nz = jnp.max(jnp.where(~zero_cell & in_hi, colj,
                                        beg_n - 1),
                              axis=1, keepdims=True)
            end_n = jnp.minimum(last_nz + 2, qlen)

            upd = act * (1 - brk0) * (1 - brkz)
            beg = sel(upd, beg_n, beg)
            end = sel(upd, end_n, end)
            done = jnp.maximum(done, jnp.maximum(brk0, brkz))
            return (H2, E2, QB, tsb_c, qnb_c, beg, end, mx, mx_i, mx_j,
                    mx_ie, gsc, mx_off, done)

        @pl.when(live)
        def _():
            carry = (H_ref[:], E_ref[:], QB_ref[:], tsb, qnb,
                     getcol(st0, 0),
                     getcol(st0, 1), getcol(st0, 2), getcol(st0, 3),
                     getcol(st0, 4), getcol(st0, 5), getcol(st0, 6),
                     getcol(st0, 7), getcol(st0, 8))
            out = lax.fori_loop(0, TB, row_step, carry)
            (H, E, QB, _tsb_c, _qnb_c, beg, end, mx, mx_i, mx_j, mx_ie,
             gsc, mx_off, done) = out
            H_ref[:] = H
            E_ref[:] = E
            QB_ref[:] = QB
            st = jnp.zeros((TILE, 128), jnp.int32)
            for c, v in ((0, beg), (1, end), (2, mx), (3, mx_i), (4, mx_j),
                         (5, mx_ie), (6, gsc), (7, mx_off), (8, done)):
                st = jnp.where(sid == c, v, st)
            st_ref[:] = st

        @pl.when(tb == n_tb - 1)
        def _():
            stf = st_ref[:]
            o = jnp.where(sid == 0, getcol(stf, 2), 0)
            o = jnp.where(sid == 1, getcol(stf, 4) + 1, o)
            o = jnp.where(sid == 2, getcol(stf, 3) + 1, o)
            o = jnp.where(sid == 3, getcol(stf, 5) + 1, o)
            o = jnp.where(sid == 4, getcol(stf, 6), o)
            o = jnp.where(sid == 5, getcol(stf, 7), o)
            out_ref[:] = o

    return kernel


@partial(jax.jit, static_argnames=("P", "W", "o_del", "e_del", "o_ins",
                                   "e_ins", "zdrop", "interpret", "packed"))
def _extend_band(qb0, qn, ts, sc, par, P, W, o_del, e_del, o_ins, e_ins,
                 zdrop, interpret, packed=False):
    N = qb0.shape[0]
    T = ts.shape[1]
    TILE = _tile_band(P)
    kern = _mk_band_kernel(P, W, T, o_del, e_del, o_ins, e_ins, zdrop,
                           packed)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        grid=(N // TILE, T // TB),
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


def extend_band_pallas(qs, qlens, ts, tlens, mat, o_del, e_del, o_ins,
                       e_ins, ws, end_bonus, zdrop, h0s,
                       interpret: bool = False):
    """Banded drop-in equivalent of extend_batch (same outputs); band
    sized to the max post-clamp w in the batch."""
    qs = np.asarray(qs, np.uint8)
    ts = np.asarray(ts, np.uint8)
    N, Q = qs.shape
    T = ts.shape[1]
    mat = np.asarray(mat, np.int32).reshape(5, 5)
    # band clamp (ksw.c:435-443) on the host, like the spec
    qlens = np.asarray(qlens, np.int64)
    mmax = int(mat.max())
    num_ins = qlens * mmax + end_bonus - o_ins
    max_ins = np.where(num_ins >= 0, num_ins // e_ins + 1,
                       -((-num_ins) // e_ins) + 1)
    w = np.minimum(np.asarray(ws, np.int64), np.maximum(max_ins, 1))
    num_del = qlens * mmax + end_bonus - o_del
    max_del = np.where(num_del >= 0, num_del // e_del + 1,
                       -((-num_del) // e_del) + 1)
    w = np.minimum(w, np.maximum(max_del, 1))
    w_max = int(w.max(initial=1))
    P = _band_for(w_max)
    W = P // 2 - 1
    TILE = _tile_band(P)
    Np = -(-N // TILE) * TILE
    Tp = max(TB, -(-T // TB) * TB)
    # band-space query inputs: qb0[p] = q[p - W] (row 0 window) and
    # qn[i] = q[i - W + P - 1] (the slot entering at row i); pad code 4
    qpad = np.full((Np, W + Q + P), 4, np.uint8)
    qpad[:N, W:W + Q] = qs
    qb0 = np.ascontiguousarray(qpad[:, :P]).astype(np.int32)
    qn = np.zeros((Np, Tp), np.int32)
    avail = qpad.shape[1] - (P - 1)
    take = min(Tp, avail)
    qn[:, :take] = qpad[:, P - 1:P - 1 + take]
    tsp = np.full((Np, Tp), 4, np.int32)
    tsp[:N, :T] = ts
    sc = np.zeros((1, 128), np.int32)
    sc[0, :25] = mat.reshape(-1)
    par = np.zeros((Np, 128), np.int32)
    par[:N, 0] = qlens
    par[:N, 1] = np.asarray(tlens, np.int64)
    par[:N, 2] = w
    par[:N, 3] = np.asarray(h0s, np.int64)
    smax = int(np.max(h0s, initial=0)) + int(qlens.max(initial=0)) * mmax + 64
    packed = (smax + 4) * P < (1 << 30)
    out = _extend_band(jnp.asarray(qb0), jnp.asarray(qn), jnp.asarray(tsp),
                       jnp.asarray(sc), jnp.asarray(par), int(P), int(W),
                       int(o_del), int(e_del), int(o_ins), int(e_ins),
                       int(zdrop), bool(interpret), packed)
    out = np.asarray(jax.device_get(out))[:N]
    return (out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4],
            out[:, 5])
