"""Batched banded extension DP on device (exact ksw_extend2 semantics).

The reference extends one seed at a time with a scalar banded DP
(ksw.c:416-515).  Here N independent extension problems run lock-step as a
row-scan over [N, Q] state vectors:

  * the horizontal F dependency is a running max: F(i,j) only depends on
    M(i,k)=H(i-1,k-1)+S (previous row), so F = cummax(g_k + k*e_ins) -
    (j-1)*e_ins with g = max(M - oe_ins, 0) — one lax.cummax per row, no
    sequential inner loop;
  * the H/E arrays persist across rows and are only written inside the
    per-lane band [beg, end] (+ the end cell), reproducing the reference's
    in-place update pattern exactly — including reads of stale cells when
    the adaptive band re-expands;
  * per-lane early exits (row max 0, z-drop) freeze the lane.

All arithmetic is int32, matching C.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

NEG = np.int32(-(1 << 30))


@partial(jax.jit, static_argnames=("max_tlen",))
def extend_batch(qs, qlens, ts, tlens, mat, o_del, e_del, o_ins, e_ins,
                 ws, end_bonus, zdrop, h0s, max_tlen: int):
    """Batched ksw_extend2.

    qs: [N, Q] uint8 query codes (pad >= 4); qlens: [N] int32
    ts: [N, T] uint8 target codes; tlens: [N] int32
    mat: [5, 5] int32; ws/h0s: [N] int32; scalars o_/e_/end_bonus/zdrop.
    Returns (score, qle, tle, gtle, gscore, max_off), each [N] int32.
    Lanes with qlens==0 or tlens==0 return h0-based defaults like the
    caller would never invoke them (mask on the host).
    """
    N, Q = qs.shape
    i32 = jnp.int32
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    cols = jnp.arange(Q + 1, dtype=i32)[None, :]          # eh index space

    # first row of eh: eh[0]=h0, eh[1]=max(h0-oe_ins,0), then h-e_ins while >e_ins
    h0 = h0s.astype(i32)
    e1 = jnp.maximum(h0 - oe_ins, 0)
    # eh[j] for j>=1: h0 - oe_ins - (j-1)*e_ins while previous > e_ins
    j_idx = cols[:, 1:]                                    # [1, Q]
    fill = e1[:, None] - (j_idx - 1) * e_ins
    # condition: eh[j-1] > e_ins  <=>  fill at j-1 > e_ins; monotone chain
    prev_fill = jnp.concatenate(
        [e1[:, None], fill[:, :-1]], axis=1)
    keep = (prev_fill > e_ins) & (j_idx <= qlens[:, None])
    keep = keep & (j_idx >= 1)
    row1 = jnp.where(j_idx == 1, e1[:, None], jnp.where(keep, fill, 0))
    # j == 1 always set to e1 (even 0), higher j only while the chain holds
    H = jnp.concatenate([h0[:, None], row1], axis=1).astype(i32)  # [N, Q+1]
    # zero out beyond the chain: emulate the scalar loop's stop
    chain_ok = jnp.concatenate(
        [jnp.ones((N, 1), bool),
         jnp.ones((N, 1), bool),
         jnp.cumprod(keep[:, 1:].astype(i32), axis=1).astype(bool)], axis=1)
    H = jnp.where(chain_ok, H, 0)
    E = jnp.zeros((N, Q + 1), dtype=i32)

    # clamp the band per lane (ksw.c:435-443)
    mmax = jnp.max(mat).astype(i32)
    qlf = qlens.astype(jnp.float64) if False else qlens.astype(jnp.float32)
    # integer-exact: (qlen*mmax + end_bonus - o)/e computed in float64 in C;
    # do it in int arithmetic via floor division on non-negatives
    num_ins = qlens * mmax + end_bonus - o_ins
    max_ins = jnp.where(num_ins >= 0, num_ins // e_ins + 1,
                        -((-num_ins) // e_ins) + 1).astype(i32)
    w = jnp.minimum(ws, jnp.maximum(max_ins, 1))
    num_del = qlens * mmax + end_bonus - o_del
    max_del = jnp.where(num_del >= 0, num_del // e_del + 1,
                        -((-num_del) // e_del) + 1).astype(i32)
    w = jnp.minimum(w, jnp.maximum(max_del, 1))

    qv = qs.astype(i32)                                    # [N, Q]
    lane = jnp.arange(N)

    def cond(st):
        (i, H, E, beg, end, mx, mx_i, mx_j, mx_ie, gsc, mx_off, done) = st
        return jnp.any(~done & (i < tlens))

    def body(st):
        (i, H, E, beg, end, mx, mx_i, mx_j, mx_ie, gsc, mx_off, done) = st
        act = ~done & (i < tlens)
        tci = ts[lane, jnp.minimum(i, max_tlen - 1)].astype(i32)  # [N]
        beg_r = jnp.maximum(beg, i - w)
        end_r = jnp.minimum(jnp.minimum(end, i + w + 1), qlens)
        # h1 seed for the first column
        h1_init = jnp.where(beg_r == 0,
                            jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0),
                            0).astype(i32)
        # per-column score row: S[j] = mat[t_i, q_j], column j in eh space
        # maps to query index j (0-based), DP column j processed with
        # diag = H[j] (stale trick)
        S = mat[tci[:, None], jnp.where(cols[:, :Q + 1][:, 1:] - 1 < Q,
                                        qv, 4)]
        # NOTE: columns j=1..Q in eh space correspond to query pos j-1?  No:
        # the scalar loop indexes eh[j] with query position j directly.
        S = mat[tci[:, None], qv]                          # [N, Q] for j=0..Q-1
        inband = (cols[:, :Q] >= beg_r[:, None]) & (cols[:, :Q] < end_r[:, None])
        diag = H[:, :Q]                                    # H(i-1, j-1) at slot j
        M = jnp.where(diag != 0, diag + S, 0)
        M = jnp.where(inband, M, NEG)
        e_cur = jnp.where(inband, E[:, :Q], NEG)
        # F via running max of g = max(M - oe_ins, 0)
        g = jnp.maximum(M - oe_ins, 0)
        g = jnp.where(inband, g, NEG)
        scan_in = g + cols[:, :Q] * e_ins
        run = lax.cummax(scan_in, axis=1)
        F = jnp.concatenate(
            [jnp.full((N, 1), NEG, i32), run[:, :-1]], axis=1) \
            - (cols[:, :Q] - 1) * e_ins
        F = jnp.where(cols[:, :Q] == beg_r[:, None], 0, F)
        F = jnp.where(inband, F, NEG)
        Hrow = jnp.maximum(jnp.maximum(M, e_cur), F)
        Hrow = jnp.where(inband, Hrow, NEG)
        # row max and its LAST attaining column (scalar tie rule: later j wins)
        mrow = jnp.maximum(jnp.max(Hrow, axis=1), 0)  # bands can be empty -> 0
        is_max = (Hrow == mrow[:, None]) & inband & (mrow[:, None] > 0)
        mj = jnp.max(jnp.where(is_max, cols[:, :Q], -1), axis=1)
        mj = jnp.where(mrow > 0, mj, -1)
        # h1 for the end cell: H(i, end-1); when band empty, h1_init
        h_last = jnp.where(end_r > beg_r,
                           Hrow[lane, jnp.maximum(end_r - 1, 0)], h1_init)
        # gscore update when the row reaches the query end
        at_end = act & (end_r == qlens)
        better = at_end & (h_last >= gsc)  # ties: later row wins (ksw.c:487-489)
        mx_ie = jnp.where(better, i, mx_ie)
        gsc = jnp.where(better, jnp.maximum(h_last, gsc), gsc)
        # E update
        t_del = jnp.maximum(M - oe_del, 0)
        Enew = jnp.maximum(e_cur - e_del, t_del)
        # writes: eh[j].h = H(i, j-1) -> shift Hrow right by one into slots
        Hsh = jnp.concatenate([h1_init[:, None], Hrow[:, :-1]], axis=1)
        wr = (cols[:, :Q] >= beg_r[:, None]) & (cols[:, :Q] < end_r[:, None])
        wr = wr & act[:, None]
        Hn = jnp.where(wr, Hsh[:, :Q], H[:, :Q])
        En = jnp.where(wr, Enew, E[:, :Q])
        H2 = jnp.concatenate([Hn, H[:, Q:]], axis=1)
        E2 = jnp.concatenate([En, E[:, Q:]], axis=1)
        # end cell write: eh[end].h = h1; eh[end].e = 0
        H2 = H2.at[lane, end_r].set(jnp.where(act, h_last, H2[lane, end_r]))
        E2 = E2.at[lane, end_r].set(jnp.where(act, 0, E2[lane, end_r]))

        # termination / bookkeeping (exactly ksw.c:490-505)
        brk0 = act & (mrow == 0)
        imp = act & ~brk0 & (mrow > mx)
        mx_i = jnp.where(imp, i, mx_i)
        mx_j = jnp.where(imp, mj, mx_j)
        mx_off = jnp.where(imp, jnp.maximum(mx_off, jnp.abs(mj - i)), mx_off)
        zd = act & ~brk0 & ~imp & (zdrop > 0)
        d_i = i - mx_i
        d_j = mj - mx_j
        zcond = jnp.where(
            d_i > d_j,
            mx - mrow - (d_i - d_j) * e_del > zdrop,
            mx - mrow - (d_j - d_i) * e_ins > zdrop)
        brkz = zd & zcond
        mx = jnp.where(imp, mrow, mx)

        # band shrink over the UPDATED arrays
        zero_cell = (H2[:, :Q + 1] == 0) & (E2[:, :Q + 1] == 0)
        jcols = jnp.arange(Q + 1, dtype=i32)[None, :]
        in_lo = (jcols >= beg_r[:, None]) & (jcols < end_r[:, None])
        nz_lo = ~zero_cell & in_lo
        first_nz = jnp.min(jnp.where(nz_lo, jcols, Q + 1), axis=1)
        beg_n = jnp.minimum(first_nz, end_r)
        in_hi = (jcols >= beg_n[:, None]) & (jcols <= end_r[:, None])
        nz_hi = ~zero_cell & in_hi
        last_nz = jnp.max(jnp.where(nz_hi, jcols, beg_n[:, None] - 1), axis=1)
        end_n = jnp.minimum(last_nz + 2, qlens)

        beg = jnp.where(act & ~brk0 & ~brkz, beg_n, beg)
        end = jnp.where(act & ~brk0 & ~brkz, end_n, end)
        done = done | brk0 | brkz
        i = jnp.where(act, i + 1, i)
        return (i, H2, E2, beg, end, mx, mx_i, mx_j, mx_ie, gsc, mx_off, done)

    st = (jnp.zeros(N, i32), H, E,
          jnp.zeros(N, i32), qlens.astype(i32),
          h0, jnp.full(N, -1, i32), jnp.full(N, -1, i32),
          jnp.full(N, -1, i32), jnp.full(N, -1, i32),
          jnp.zeros(N, i32), jnp.zeros(N, bool))
    (_, _, _, _, _, mx, mx_i, mx_j, mx_ie, gsc, mx_off, _) = lax.while_loop(
        cond, body, st)
    return mx, mx_j + 1, mx_i + 1, mx_ie + 1, gsc, mx_off
