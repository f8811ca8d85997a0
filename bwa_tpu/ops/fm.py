"""Batched FM-index device ops (JAX/XLA, TPU-first).

The reference walks the FM-index one read and one base at a time
(bwt.c:262-379).  Here the same state machines run lock-step over a batch of
reads as fixed-shape masked programs:

  * occ4: one gather of (checkpoint, 8-word block) + popcounts
    (lax.population_count on the 0x55555555-spaced match masks) reproduces
    bwt_occ4 (bwt.c:169-186) for a whole vector of positions at once.
  * extend: two batched occ4 calls + prefix arithmetic = bwt_extend.
  * sa: the <=31-step inverse-Psi walk (bwt.c:86-96) as a masked while_loop
    over a flat vector of SA positions.
  * smem1a / seed_strategy1: the forward/backward SMEM passes
    (bwt.c:289-379) with per-lane cursors, capacity-bounded interval stacks
    and scatter-style pushes.

Coordinates are int32 when 2*l_pac+2 < 2^31 (E. coli, chr20) and int64
otherwise (GRCh38); the popcount core is int32 regardless.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bwa_tpu.index.fmindex import DeviceFMIndex, FMIndex

_M55 = np.uint32(0x55555555)
_MFF = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# occ / extend primitives
# ---------------------------------------------------------------------------

def _occ4(idx, k):
    """Counts of each base in B[0..k] inclusive; k: [N] coord ints.
    Handles k == -1 (zeros) and k == seq_len (L2 diffs) like bwt_occ4/occ."""
    cdt = idx["ckpt"].dtype
    kk = k - (k >= idx["primary"]).astype(cdt)
    kk_safe = jnp.clip(kk, 0, idx["seq_len"] - 1)
    if "occtab" in idx:
        # fused table: checkpoint + text block(s) in ONE gather (~40us/step
        # saved per occ4 call inside the seeding while loop — PERF.md).
        # The table may be re-tiled R disk blocks per row (fewer, fatter
        # rows: the per-ROW gather latency dominates at big genomes while
        # the extra popcount columns fuse for free).
        nw = idx["occtab"].shape[1] - 4          # 8R words per row
        rbits = (nw // 8).bit_length() - 1       # log2(R)
        j = (kk_safe >> (7 + rbits)).astype(jnp.int32)
        row = idx["occtab"][j]                  # [N, 4 + 8R] uint32
        base = row[:, :4].astype(cdt)
        blk = row[:, 4:]
    else:
        nw = 8
        j = (kk_safe >> 7).astype(jnp.int32)
        base = idx["ckpt"][j]                   # [N, 4]
        blk = idx["words"][j]                   # [N, 8] uint32
    kw = ((kk_safe >> 4) & (nw - 1)).astype(jnp.int32)  # word containing kk
    kb = (kk_safe & 15).astype(jnp.int32)
    widx = jnp.arange(nw, dtype=jnp.int32)
    nkeep = jnp.clip((kw[:, None] - widx[None, :]) * 16 + kb[:, None] + 1, 0, 16)
    shift = ((16 - nkeep) << 1).astype(jnp.uint32)
    mask = jnp.where(nkeep > 0,
                     _MFF << jnp.minimum(shift, np.uint32(31)),
                     np.uint32(0)).astype(jnp.uint32)
    w = blk & mask
    vm = mask & _M55
    hi = (w >> 1) & _M55
    lo = w & _M55
    pc = lax.population_count
    c3 = pc(hi & lo).astype(jnp.int32)
    nhi = pc(hi).astype(jnp.int32)
    nlo = pc(lo).astype(jnp.int32)
    nv = pc(vm).astype(jnp.int32)
    cnt = jnp.stack([nv - nhi - nlo + c3, nlo - c3, nhi - c3, c3], axis=-1)
    add = cnt.sum(axis=1).astype(cdt)           # [N, 4]
    out = base + add
    L2d = (idx["L2"][1:5] - idx["L2"][0:4]).astype(cdt)
    out = jnp.where((k == idx["seq_len"])[:, None], L2d[None, :], out)
    out = jnp.where((k == -1)[:, None], jnp.zeros_like(out), out)
    return out


def _extend(idx, x0, x1, x2, is_back: bool):
    """bwt_extend (bwt.c:262-275) batched; returns (ok0, ok1, ok2) each
    [N, 4] (indexed by extension base c)."""
    cdt = x0.dtype
    fwd = x0 if is_back else x1                 # x[!is_back]
    tk = _occ4(idx, fwd - 1)
    tl = _occ4(idx, fwd - 1 + x2)
    ok_nb = idx["L2"][:4][None, :].astype(cdt) + 1 + tk
    ok_sz = (tl - tk).astype(cdt)
    bk = x1 if is_back else x0                  # x[is_back]
    span = ((fwd <= idx["primary"]) & (fwd + x2 - 1 >= idx["primary"])).astype(cdt)
    b3 = bk + span
    b2 = b3 + ok_sz[:, 3]
    b1 = b2 + ok_sz[:, 2]
    b0 = b1 + ok_sz[:, 1]
    bks = jnp.stack([b0, b1, b2, b3], axis=-1)
    if is_back:
        return ok_nb, bks, ok_sz
    return bks, ok_nb, ok_sz


def _B0(idx, x):
    """BWT char at $-removed position x."""
    word = idx["words"][(x >> 7).astype(jnp.int32),
                        ((x >> 4) & 7).astype(jnp.int32)]
    sh = (((15 - (x & 15)) << 1)).astype(jnp.uint32)
    return ((word >> sh) & 3).astype(jnp.int32)


def _occ1(idx, k, c):
    """Single-base occ: count of base c in B[0..k] (bwt_occ semantics for
    k in [0, seq_len)); one popcount instead of four."""
    cdt = idx["ckpt"].dtype
    kk = k - (k >= idx["primary"]).astype(cdt)
    kk_safe = jnp.clip(kk, 0, idx["seq_len"] - 1)
    j = (kk_safe >> 7).astype(jnp.int32)
    base = idx["ckpt"][j, c]
    blk = idx["words"][j]
    kw = ((kk_safe >> 4) & 7).astype(jnp.int32)
    kb = (kk_safe & 15).astype(jnp.int32)
    widx = jnp.arange(8, dtype=jnp.int32)
    nkeep = jnp.clip((kw[:, None] - widx[None, :]) * 16 + kb[:, None] + 1, 0, 16)
    shift = ((16 - nkeep) << 1).astype(jnp.uint32)
    mask = jnp.where(nkeep > 0,
                     _MFF << jnp.minimum(shift, np.uint32(31)),
                     np.uint32(0)).astype(jnp.uint32)
    w = blk & mask
    hi = (w >> 1) & _M55
    lo = w & _M55
    c_arr = c[:, None]
    sel_hi = jnp.where((c_arr & 2) != 0, hi, ~hi & (mask & _M55))
    sel_lo = jnp.where((c_arr & 1) != 0, lo, ~lo & (mask & _M55))
    cnt = lax.population_count(sel_hi & sel_lo).astype(jnp.int32).sum(axis=1)
    out = base + cnt.astype(cdt)
    L2d = (idx["L2"][c + 1] - idx["L2"][c]).astype(cdt)
    out = jnp.where(k == idx["seq_len"], L2d, out)
    out = jnp.where(k == -1, jnp.zeros_like(out), out)
    return out


@jax.jit
def _pack_meta(seed_n, ovf, done_step, steps):
    """Stack the machine's small outputs into one [4, B] int32 so the
    host pulls them in a single D2H round-trip."""
    i32 = jnp.int32
    return jnp.stack([seed_n.astype(i32), ovf.astype(i32),
                      done_step.astype(i32),
                      jnp.broadcast_to(steps.astype(i32), seed_n.shape)])


@jax.jit
def _next_valid_device(q, qlen):
    """Per-position next non-ambiguous index table nv[b, p] = min over
    p' >= p of (p' if q[b,p'] < 4 else L), capped at qlen — the device
    replacement for the host-built table (a suffix cummin), so the only
    per-bucket H2D transfer is q itself."""
    B, L = q.shape
    i32 = jnp.int32
    pos = jnp.arange(L, dtype=i32)[None, :]
    val = jnp.where(q < 4, pos, jnp.int32(L))
    suf = lax.cummin(val[:, ::-1], axis=1)[:, ::-1]
    nv = jnp.concatenate([suf, jnp.full((B, 1), L, i32)], axis=1)
    return jnp.minimum(nv, qlen[:, None])


@jax.jit
def _gather_pack(q_all, pa, pb):
    """Build the pack_k=2 lane layout ON DEVICE from a batch-resident
    read matrix: lane i = q_all[pa[i]] | 4 | q_all[pb[i]] | 4 (the exact
    _pack_bucket layout).  The batch q uploads ONCE (the trip-count
    probe already needs it); per-bucket H2D shrinks from the ~2.4 MB
    packed lanes to two [B2] int32 index vectors — the transfer diet
    that makes trip-sorted packing pay on the ~55 MB/s tunnel."""
    B2 = pa.shape[0]
    sep = jnp.full((B2, 1), 4, q_all.dtype)
    qb = q_all[jnp.maximum(pb, 0)]
    qb = jnp.where((pb >= 0)[:, None], qb, q_all.dtype.type(4))
    return jnp.concatenate([q_all[pa], sep, qb, sep], axis=1)


@jax.jit
def _refill_table(q, qlen):
    """Per-READ device table for the retire-and-refill machine: one int32
    row per read = qlen | chars[L] | next-valid[L+1] — so the machine's
    only per-step indirection is a single row gather by read id."""
    nv = _next_valid_device(q, qlen)
    return jnp.concatenate([qlen[:, None], q.astype(jnp.int32), nv], axis=1)


@partial(jax.jit, static_argnames=())
def sa_batch(idx, k):
    """bwt_sa (bwt.c:86-96) over a vector of SA rows k; returns positions."""
    cdt = idx["ckpt"].dtype
    k = k.astype(cdt)
    intv_mask = idx["sa_intv"] - 1

    def cond(state):
        k, steps = state
        return jnp.any((k & intv_mask) != 0)

    def body(state):
        k, steps = state
        live = (k & intv_mask) != 0
        x = k - (k > idx["primary"]).astype(cdt)
        c = _B0(idx, x)
        occ = _occ1(idx, k, c)
        nk = jnp.where(k == idx["primary"], jnp.zeros_like(k),
                       idx["L2"][c].astype(cdt) + occ)
        k = jnp.where(live, nk, k)
        steps = steps + live.astype(cdt)
        return k, steps

    k, steps = lax.while_loop(cond, body, (k, jnp.zeros_like(k)))
    # sa_intv is a power of two (32): k // 32
    return steps + idx["ssa"][(k >> 5).astype(jnp.int32)]


# ---------------------------------------------------------------------------
# batched SMEM (bwt_smem1a) and 3rd-round seeding
# ---------------------------------------------------------------------------

def _set_intv(idx, c):
    """bwt_set_intv for a vector of first bases c (clamped to [0,3]).

    The L2 picks are one-hot contractions over the 4 columns instead of
    L2[cc]-style gathers: a dynamic gather costs ~40us/step inside the
    seeding while_loop on this backend while the 4-wide select chain
    fuses for free (PERF.md)."""
    cdt = idx["ckpt"].dtype
    cc = jnp.clip(c, 0, 3)
    L2 = idx["L2"].astype(cdt)
    oh = jnp.arange(4, dtype=cc.dtype)[None, :] == cc[:, None]
    tab = jnp.stack([L2[:4], L2[1:5], L2[:4][::-1]], axis=-1)  # [4, 3]
    z = jnp.sum(jnp.where(oh[:, :, None], tab[None, :, :], 0),
                axis=1, dtype=cdt)                             # [B, 3]
    x0 = z[:, 0] + 1
    x1 = z[:, 2] + 1
    x2 = z[:, 1] - z[:, 0]
    return x0, x1, x2


@jax.jit
def probe_breaks(idx, q, qlen):
    """Trip-count predictor for seeding-bucket packing: ONE lockstep
    forward scan over x = 0..L-1 maintaining a single forward interval,
    restarting on extension failure.  Exactly L steps per lane (a
    lax.scan, no divergent tail), so it costs ~44 ms on a 24k x 150 bp
    batch.  Returns [B] break counts — measured corr 0.97 with the real
    per-read machine trip counts (PERF.md round 5): a read's machine
    trips are dominated by its restart count (sequencing errors split
    SMEMs), which is exactly what the breaks count.

    This is an ORDERING HEURISTIC only — seeding results are per-read
    and order-independent, so byte-identity never depends on it."""
    from bwa_tpu.ops.fm_machine import _pick3

    cdt = idx["ckpt"].dtype
    B, L = q.shape
    i32 = jnp.int32
    L2r = idx["L2"][:4][None, :].astype(cdt)

    def step(carry, c_t):
        x0, x1, x2, started, breaks = carry
        c = c_t.astype(i32)
        good = c < 4
        # forward extension by char c == backward extension of the
        # reverse-complement interval (the bwt_extend is_back=0 case)
        tk = _occ4(idx, x1 - 1)
        tl = _occ4(idx, x1 - 1 + x2)
        ok_nb = L2r + 1 + tk
        ok_sz = (tl - tk).astype(cdt)
        span = ((x1 <= idx["primary"])
                & (x1 + x2 - 1 >= idx["primary"])).astype(cdt)
        acc3 = x0 + span
        acc2 = acc3 + ok_sz[:, 3]
        acc1 = acc2 + ok_sz[:, 2]
        acc0 = acc1 + ok_sz[:, 1]
        accs = jnp.stack([acc0, acc1, acc2, acc3], axis=-1)
        cf = jnp.clip(3 - c, 0, 3)
        of = _pick3(accs, ok_nb, ok_sz, cf)
        ext_ok = started & good & (of[:, 2] >= 1)
        brk = started & good & (of[:, 2] < 1)
        s0, s1, s2 = _set_intv(idx, c)
        restart = good & ~ext_ok
        x0n = jnp.where(ext_ok, of[:, 0], jnp.where(restart, s0, x0))
        x1n = jnp.where(ext_ok, of[:, 1], jnp.where(restart, s1, x1))
        x2n = jnp.where(ext_ok, of[:, 2], jnp.where(restart, s2, x2))
        return (x0n, x1n, x2n, good, breaks + brk.astype(i32)), None

    init = (jnp.ones(B, cdt), jnp.ones(B, cdt), jnp.zeros(B, cdt),
            jnp.zeros(B, bool), jnp.zeros(B, i32))
    out, _ = lax.scan(step, init, jnp.transpose(q, (1, 0)))
    return out[4]


def _push(buf_x0, buf_x1, buf_x2, buf_i0, buf_i1, n, mask, x0, x1, x2, i0, i1):
    """Conditional append into per-lane stacks buf[B, C]."""
    b = jnp.arange(n.shape[0])
    slot = jnp.minimum(n, buf_x0.shape[1] - 1)
    buf_x0 = buf_x0.at[b, slot].set(jnp.where(mask, x0, buf_x0[b, slot]))
    buf_x1 = buf_x1.at[b, slot].set(jnp.where(mask, x1, buf_x1[b, slot]))
    buf_x2 = buf_x2.at[b, slot].set(jnp.where(mask, x2, buf_x2[b, slot]))
    buf_i0 = buf_i0.at[b, slot].set(jnp.where(mask, i0, buf_i0[b, slot]))
    buf_i1 = buf_i1.at[b, slot].set(jnp.where(mask, i1, buf_i1[b, slot]))
    n = n + mask.astype(n.dtype)
    return buf_x0, buf_x1, buf_x2, buf_i0, buf_i1, n


def _smem1a_core(idx, q, qlen, x, min_intv, max_intv, active, cap: int):
    """bwt_smem1a (bwt.c:289-351) lock-step over B reads (traceable core).

    q: [B, L] uint8 (>=4 beyond qlen); x: [B] start positions;
    min_intv: [B]; max_intv: scalar; active: [B] bool.
    Returns (ret [B], mem_* [B, cap], mem_n [B]).  Output mems are in the
    reference's pre-reversal order (host reverses: sorted by start).
    """
    cdt = idx["ckpt"].dtype
    B, L = q.shape
    bidx = jnp.arange(B)
    i32 = jnp.int32

    qx = q[bidx, jnp.clip(x, 0, L - 1)].astype(i32)
    valid = active & (qx < 4) & (x < qlen)
    min_intv = jnp.maximum(min_intv, 1).astype(cdt)

    ik0, ik1, ik2 = _set_intv(idx, qx)
    info_end = (x + 1).astype(i32)  # forward info = end position

    zero_buf = jnp.zeros((B, cap), dtype=cdt)
    zero_i = jnp.zeros((B, cap), dtype=i32)
    curr = (zero_buf, zero_buf, zero_buf, zero_i, zero_i)  # x0 x1 x2 end start(unused fwd)
    curr_n = jnp.zeros(B, dtype=i32)

    # ---- forward pass ----
    def fwd_cond(st):
        (i, ik0, ik1, ik2, info_end, cbufs, cn, done) = st
        return jnp.any(~done & (i < qlen))

    def fwd_body(st):
        (i, ik0, ik1, ik2, info_end, cbufs, cn, done) = st
        cx0, cx1, cx2, cend, cstart = cbufs
        act = ~done & (i < qlen)
        qi = q[bidx, jnp.clip(i, 0, L - 1)].astype(i32)
        small = act & (ik2 < max_intv)
        amb = act & ~small & (qi >= 4)
        ext = act & ~small & ~amb
        ok0, ok1, ok2 = _extend(idx, ik0, ik1, ik2, False)
        c = jnp.clip(3 - qi, 0, 3)
        okc0 = ok0[bidx, c]
        okc1 = ok1[bidx, c]
        okc2 = ok2[bidx, c]
        changed = ext & (okc2 != ik2)
        push_m = small | amb | changed
        cx0, cx1, cx2, cend, cstart = _push(
            cx0, cx1, cx2, cend, cstart, cn, push_m,
            ik0, ik1, ik2, info_end, jnp.zeros_like(info_end))[:5]
        cn = cn + push_m.astype(i32)
        too_small = changed & (okc2 < min_intv)
        stop = small | amb | too_small
        adv = ext & ~stop
        ik0 = jnp.where(adv, okc0, ik0)
        ik1 = jnp.where(adv, okc1, ik1)
        ik2 = jnp.where(adv, okc2, ik2)
        info_end = jnp.where(adv, (i + 1).astype(i32), info_end)
        i = jnp.where(adv, i + 1, i)
        done = done | stop
        return (i, ik0, ik1, ik2, info_end,
                (cx0, cx1, cx2, cend, cstart), cn, done)

    i0 = x + 1
    st = (i0, ik0, ik1, ik2, info_end, curr, curr_n, ~valid)
    (i, ik0, ik1, ik2, info_end, cbufs, cn, done) = lax.while_loop(
        fwd_cond, fwd_body, st)
    # final push for lanes that ran off the end (i == qlen, not stopped)
    tail = valid & ~done
    cx0, cx1, cx2, cend, cstart = cbufs
    cx0, cx1, cx2, cend, cstart = _push(
        cx0, cx1, cx2, cend, cstart, cn, tail,
        ik0, ik1, ik2, info_end, jnp.zeros_like(info_end))[:5]
    cn = cn + tail.astype(i32)

    # reverse curr so longer matches come first (bwt_reverse_intvs)
    ridx = jnp.clip(cn[:, None] - 1 - jnp.arange(cap)[None, :], 0, cap - 1)
    pv0 = jnp.take_along_axis(cx0, ridx, axis=1)
    pv1 = jnp.take_along_axis(cx1, ridx, axis=1)
    pv2 = jnp.take_along_axis(cx2, ridx, axis=1)
    pve = jnp.take_along_axis(cend, ridx, axis=1)
    ret = jnp.where(valid, pve[:, 0], x + 1).astype(i32)

    # ---- backward pass ----
    mem0 = jnp.zeros((B, cap), dtype=cdt)
    mem1 = jnp.zeros((B, cap), dtype=cdt)
    mem2 = jnp.zeros((B, cap), dtype=cdt)
    mem_s = jnp.zeros((B, cap), dtype=i32)
    mem_e = jnp.zeros((B, cap), dtype=i32)
    mem_n = jnp.zeros(B, dtype=i32)
    ik_x2 = ik2  # the leftover forward ik's size (reference reuses the var)

    def bwd_cond(st):
        i, prevs, pn, mems, mn, ik_x2, done = st
        return jnp.any(~done & (i >= -1))

    def bwd_body(st):
        i, prevs, pn, mems, mn, ik_x2, done = st
        p0, p1, p2, pe = prevs
        m0, m1, m2, ms, me, = mems[:5]
        mn_ = mn
        qi = jnp.where(i >= 0, q[bidx, jnp.clip(i, 0, L - 1)].astype(i32), 4)
        c = jnp.where((i >= 0) & (qi < 4), qi, -1)
        act_l = ~done & (i >= -1)

        n0 = jnp.zeros(B, dtype=i32)          # curr_n
        z = jnp.zeros((B, cap), dtype=cdt)
        zi = jnp.zeros((B, cap), dtype=i32)
        last_x2 = jnp.zeros(B, dtype=cdt)

        def j_body(j, jst):
            (c0, c1, c2, ce, n0, last_x2, m0, m1, m2, ms, me, mn_, ik_x2) = jst
            jact = act_l & (j < pn)
            jj = jnp.minimum(j, cap - 1)
            px0 = p0[:, jj]
            px1 = p1[:, jj]
            px2 = p2[:, jj]
            pinfo = pe[:, jj]
            ok0, ok1, ok2 = _extend(idx, px0, px1, px2, True)
            cc = jnp.clip(c, 0, 3)
            okc0 = ok0[bidx, cc]
            okc1 = ok1[bidx, cc]
            okc2 = ok2[bidx, cc]
            keep = jact & ((c < 0) | (ik_x2 < max_intv) | (okc2 < min_intv))
            # mem emission: only when curr empty and not contained
            m_last_start = ms[bidx, jnp.maximum(mn_ - 1, 0)]
            can_emit = keep & (n0 == 0) & ((mn_ == 0) | ((i + 1) < m_last_start))
            m0, m1, m2, ms, me, mn_ = _push(
                m0, m1, m2, ms, me, mn_, can_emit,
                px0, px1, px2, (i + 1).astype(i32), pinfo)
            ik_x2 = jnp.where(can_emit, px2, ik_x2)
            # push extended interval to curr when distinct size
            push_c = jact & ~keep & ((n0 == 0) | (okc2 != last_x2))
            c0, c1, c2, ce, _, n0 = _push(
                c0, c1, c2, ce, zi, n0, push_c,
                okc0, okc1, okc2, pinfo, jnp.zeros_like(pinfo))
            last_x2 = jnp.where(push_c, okc2, last_x2)
            return (c0, c1, c2, ce, n0, last_x2,
                    m0, m1, m2, ms, me, mn_, ik_x2)

        max_pn = jnp.max(jnp.where(act_l, pn, 0))
        jst = (z, z, z, zi, n0, last_x2, m0, m1, m2, ms, me, mn_, ik_x2)
        jst = lax.fori_loop(0, max_pn, j_body, jst)
        (c0, c1, c2, ce, n0, last_x2, m0, m1, m2, ms, me, mn_, ik_x2) = jst

        done = done | (act_l & (n0 == 0))
        new_prevs = (jnp.where(act_l[:, None], c0, p0),
                     jnp.where(act_l[:, None], c1, p1),
                     jnp.where(act_l[:, None], c2, p2),
                     jnp.where(act_l[:, None], ce, pe))
        new_pn = jnp.where(act_l, n0, pn)
        i = jnp.where(act_l, i - 1, i)
        return (i, new_prevs, new_pn, (m0, m1, m2, ms, me), mn_, ik_x2, done)

    bst = (x - 1, (pv0, pv1, pv2, pve), cn,
           (mem0, mem1, mem2, mem_s, mem_e), mem_n, ik_x2, ~valid)
    (_, _, _, mems, mem_n, _, _) = lax.while_loop(bwd_cond, bwd_body, bst)
    m0, m1, m2, ms, me = mems
    return ret, m0, m1, m2, ms, me, mem_n


smem1a_batch = jax.jit(_smem1a_core, static_argnames=("cap",))


def _seed_strategy1_core(idx, q, qlen, x, min_len, max_intv, active):
    """bwt_seed_strategy1 (bwt.c:358-379) lock-step over B reads.
    Returns (ret [B], found [B] bool, x0, x1, x2 [B], start [B], end [B])."""
    cdt = idx["ckpt"].dtype
    B, L = q.shape
    bidx = jnp.arange(B)
    i32 = jnp.int32

    qx = q[bidx, jnp.clip(x, 0, L - 1)].astype(i32)
    valid = active & (qx < 4) & (x < qlen)
    ik0, ik1, ik2 = _set_intv(idx, qx)

    def cond(st):
        i, ik0, ik1, ik2, found, r0, r1, r2, ret, done = st
        return jnp.any(~done & (i < qlen))

    def body(st):
        i, ik0, ik1, ik2, found, r0, r1, r2, ret, done = st
        act = ~done & (i < qlen)
        qi = q[bidx, jnp.clip(i, 0, L - 1)].astype(i32)
        amb = act & (qi >= 4)
        ext = act & ~amb
        ok0, ok1, ok2 = _extend(idx, ik0, ik1, ik2, False)
        c = jnp.clip(3 - qi, 0, 3)
        okc0 = ok0[bidx, c]
        okc1 = ok1[bidx, c]
        okc2 = ok2[bidx, c]
        hit = ext & (okc2 < max_intv) & ((i - x) >= min_len)
        found = found | hit
        r0 = jnp.where(hit, okc0, r0)
        r1 = jnp.where(hit, okc1, r1)
        r2 = jnp.where(hit, okc2, r2)
        ret = jnp.where(amb | hit, (i + 1).astype(i32), ret)
        done = done | amb | hit
        ik0 = jnp.where(ext & ~hit, okc0, ik0)
        ik1 = jnp.where(ext & ~hit, okc1, ik1)
        ik2 = jnp.where(ext & ~hit, okc2, ik2)
        i = jnp.where(ext & ~hit, i + 1, i)
        return (i, ik0, ik1, ik2, found, r0, r1, r2, ret, done)

    zero = jnp.zeros(B, dtype=cdt)
    ret0 = jnp.where(valid, qlen.astype(i32), (x + 1).astype(i32))
    st = (x + 1, ik0, ik1, ik2, jnp.zeros(B, bool), zero, zero, zero,
          ret0, ~valid)
    (_, _, _, _, found, r0, r1, r2, ret, _) = lax.while_loop(cond, body, st)
    return ret, found & valid, r0, r1, r2, x.astype(i32), ret


seed_strategy1_batch = jax.jit(_seed_strategy1_core)


# ---------------------------------------------------------------------------
# Fused 3-pass seed collection: mem_collect_intv (bwamem.c:140-188) as ONE
# device program.  The tunnel to the chip makes host<->device round trips
# expensive (~9ms per MB D2H), so the pass-1 "advance x, rerun SMEM" loop,
# the pass-2 re-seeding jobs and pass-3 LAST-like seeding all stay on
# device; one transfer returns the final per-read seed arrays.
# ---------------------------------------------------------------------------

def _append_filtered(seeds, seed_n, m0, m1, m2, ms, me, mem_n,
                     min_seed_len, lane_mask, cap_s: int):
    """Append (reversed-order) qualifying mems into the per-lane seed store.
    Mirrors the host loops in mem_collect_intv: mems come out of the
    backward pass newest-first; the reference visits them oldest-first."""
    s0, s1, s2, ss, se, = seeds
    B, cap = m0.shape
    i32 = jnp.int32
    bidx = jnp.arange(B)

    def body(j, st):
        s0, s1, s2, ss, se, seed_n = st
        # reversed index: element mem_n-1-j (oldest-first)
        jj = jnp.clip(mem_n - 1 - j, 0, cap - 1)
        ok = lane_mask & (j < mem_n)
        slen = me[bidx, jj] - ms[bidx, jj]
        ok = ok & (slen >= min_seed_len)
        slot = jnp.minimum(seed_n, cap_s - 1)
        s0 = s0.at[bidx, slot].set(jnp.where(ok, m0[bidx, jj], s0[bidx, slot]))
        s1 = s1.at[bidx, slot].set(jnp.where(ok, m1[bidx, jj], s1[bidx, slot]))
        s2 = s2.at[bidx, slot].set(jnp.where(ok, m2[bidx, jj], s2[bidx, slot]))
        ss = ss.at[bidx, slot].set(jnp.where(ok, ms[bidx, jj], ss[bidx, slot]))
        se = se.at[bidx, slot].set(jnp.where(ok, me[bidx, jj], se[bidx, slot]))
        seed_n = seed_n + ok.astype(i32)
        return (s0, s1, s2, ss, se, seed_n)

    max_n = jnp.max(jnp.where(lane_mask, mem_n, 0))
    st = (s0, s1, s2, ss, se, seed_n)
    st = lax.fori_loop(0, max_n, body, st)
    return st[:5], st[5]


def _skip_amb(q, qlen, x):
    """Advance x past ambiguous bases (the `else ++x` branch)."""
    B, L = q.shape
    bidx = jnp.arange(B)

    def cond(x):
        qx = q[bidx, jnp.clip(x, 0, L - 1)]
        return jnp.any((x < qlen) & (qx >= 4))

    def body(x):
        qx = q[bidx, jnp.clip(x, 0, L - 1)]
        return jnp.where((x < qlen) & (qx >= 4), x + 1, x)

    return lax.while_loop(cond, body, x)


@partial(jax.jit, static_argnames=("cap", "cap_s", "key64"))
def collect_intv_device(idx, q, qlen, min_seed_len, split_len, split_width,
                        max_mem_intv, cap: int, cap_s: int, key64: bool):
    """All three seeding passes fused; returns per-read seed arrays sorted
    by (start, end) == the reference's .info order.
    Output: (s0, s1, s2 [B,cap_s] coord, ss, se [B,cap_s] i32, seed_n [B])."""
    cdt = idx["ckpt"].dtype
    B, L = q.shape
    i32 = jnp.int32
    seeds = tuple(jnp.zeros((B, cap_s), dt) for dt in (cdt, cdt, cdt, i32, i32))
    seed_n = jnp.zeros(B, dtype=i32)
    ones = jnp.ones(B, dtype=cdt)

    # ---- pass 1 ----
    def p1_cond(st):
        x, seeds, seed_n = st
        return jnp.any(x < qlen)

    def p1_body(st):
        x, seeds, seed_n = st
        x = _skip_amb(q, qlen, x)
        active = x < qlen
        ret, m0, m1, m2, ms, me, mem_n = _smem1a_core(
            idx, q, qlen, x, ones, cdt.type(0), active, cap)
        seeds, seed_n = _append_filtered(
            seeds, seed_n, m0, m1, m2, ms, me, mem_n,
            min_seed_len, active, cap_s)
        x = jnp.where(active, ret, x)
        return x, seeds, seed_n

    x0 = jnp.zeros(B, dtype=i32)
    x0 = _skip_amb(q, qlen, x0)
    _, seeds, seed_n = lax.while_loop(
        p1_cond, p1_body, (x0, seeds, seed_n))

    # ---- pass 2: re-seed long low-occ SMEMs from their midpoints ----
    old_n = seed_n

    def p2_body(k, st):
        seeds, seed_n = st
        s0, s1, s2, ss, se = seeds
        kk = jnp.minimum(k, cap_s - 1)
        bidx = jnp.arange(B)
        have = k < old_n
        start = ss[bidx, kk]
        end = se[bidx, kk]
        x2 = s2[bidx, kk]
        need = have & ((end - start) >= split_len) & (x2 <= split_width)
        mid = ((start + end) >> 1).astype(i32)
        ret, m0, m1, m2, ms, me, mem_n = _smem1a_core(
            idx, q, qlen, mid, x2 + 1, cdt.type(0), need, cap)
        seeds, seed_n = _append_filtered(
            seeds, seed_n, m0, m1, m2, ms, me, mem_n,
            min_seed_len, need, cap_s)
        return seeds, seed_n

    max_old = jnp.max(old_n)
    seeds, seed_n = lax.fori_loop(0, max_old, p2_body, (seeds, seed_n))

    # ---- pass 3: LAST-like seeding ----
    def p3_cond(st):
        x, seeds, seed_n = st
        return jnp.any(x < qlen)

    def p3_body(st):
        x, seeds, seed_n = st
        x = _skip_amb(q, qlen, x)
        active = x < qlen
        ret, found, r0, r1, r2, rs, re_ = _seed_strategy1_core(
            idx, q, qlen, x, min_seed_len, cdt.type(0) + max_mem_intv, active)
        s0, s1, s2, ss, se = seeds
        ok = active & found & (r2 > 0)
        bidx = jnp.arange(B)
        slot = jnp.minimum(seed_n, cap_s - 1)
        s0 = s0.at[bidx, slot].set(jnp.where(ok, r0, s0[bidx, slot]))
        s1 = s1.at[bidx, slot].set(jnp.where(ok, r1, s1[bidx, slot]))
        s2 = s2.at[bidx, slot].set(jnp.where(ok, r2, s2[bidx, slot]))
        ss = ss.at[bidx, slot].set(jnp.where(ok, rs, ss[bidx, slot]))
        se = se.at[bidx, slot].set(jnp.where(ok, re_, se[bidx, slot]))
        seed_n = seed_n + ok.astype(i32)
        seeds = (s0, s1, s2, ss, se)
        x = jnp.where(active, ret, x)
        return x, seeds, seed_n

    if True:  # max_mem_intv==0 disables pass 3 at trace time is not known;
        # the reference guard is opt.max_mem_intv > 0 -- handled by caller
        x0 = jnp.zeros(B, dtype=i32)
        x0 = _skip_amb(q, qlen, x0)
        _, seeds, seed_n = lax.while_loop(
            p3_cond, p3_body, (x0, seeds, seed_n))

    # ---- stable sort by info == (start, end) lexicographic ----
    s0, s1, s2, ss, se = seeds
    kdt = jnp.int64 if key64 else i32
    shift = 32 if key64 else 16
    key = (ss.astype(kdt) << shift) | se.astype(kdt)
    pad = jnp.arange(cap_s)[None, :] >= seed_n[:, None]
    key = jnp.where(pad, jnp.iinfo(kdt).max, key)
    order = jnp.argsort(key, axis=1, stable=True)
    s0 = jnp.take_along_axis(s0, order, axis=1)
    s1 = jnp.take_along_axis(s1, order, axis=1)
    s2 = jnp.take_along_axis(s2, order, axis=1)
    ss = jnp.take_along_axis(ss, order, axis=1)
    se = jnp.take_along_axis(se, order, axis=1)
    return s0, s1, s2, ss, se, seed_n


# ---------------------------------------------------------------------------
# Engine: batch precompute driven from the host pipeline
# ---------------------------------------------------------------------------

class BatchedFMEngine:
    """Batched device engine with the same logical API as HostFM, plus
    batch precompute used by the pipeline."""

    def __init__(self, fm: FMIndex):
        self.fm = fm
        # persistent compile cache: the SMEM/SA programs are stable across
        # runs, so CLI startup pays tracing only once per machine
        cache_dir = os.environ.get("BWA_TPU_JIT_CACHE", "/tmp/bwa_tpu_jit_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        if fm.coord_dtype == np.int64:
            jax.config.update("jax_enable_x64", True)
        # big genomes upload only the occtab (the production machine's
        # sole table; SA walks/extension are host-native) — the full
        # array set costs ~100s of tunnel H2D at GRCh38 scale
        light = fm.words.shape[0] > (1 << 20)
        self.dev = DeviceFMIndex(fm, light=light)
        self.idx = self.dev.tree()
        self._host = None
        # multi-chip: when more than one device is visible, replicate the
        # index over a "dp" mesh and run the seeding machine under
        # shard_map (parallel/mesh.py machine_sharded) — the kt_for
        # read-parallelism analog, so the production CLI uses every chip
        self.mesh = None
        if (os.environ.get("BWA_TPU_MESH", "auto") != "off"
                and len(jax.devices()) > 1):
            from jax.sharding import NamedSharding, PartitionSpec

            from bwa_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh()
            rep = NamedSharding(self.mesh, PartitionSpec())
            self.idx = jax.device_put(self.idx, rep)
            self._mesh_step = {}  # keyed by (shape, consts) config

    @property
    def host(self):
        if self._host is None:
            from bwa_tpu.ops.fm_host import HostFM

            self._host = HostFM(self.fm)
        return self._host

    # scalar API fallbacks (used by fastmap iterator etc.)
    def smem1a(self, q, x, min_intv, max_intv):
        return self.host.smem1a(q, x, min_intv, max_intv)

    def seed_strategy1(self, q, x, min_len, max_intv):
        return self.host.seed_strategy1(q, x, min_len, max_intv)

    def sa(self, k):
        return self.host.sa(k)

    def fetch_seq(self, beg, mid, end):
        return self.fm.fetch_seq(beg, mid, end)

    # ---- batched entry points ----

    def sa_many(self, ks: np.ndarray) -> np.ndarray:
        if len(ks) == 0:
            return np.zeros(0, dtype=np.int64)
        # dense sidecar (small genomes) or native C++ walker (GRCh38
        # scale); the device sa_batch program stays available as a
        # cross-checked alternative (tests/test_fm_device.py) but the
        # host path avoids a program swap against the seeding machine
        return self.fm.sa_lookup(ks)

    def probe_trips(self, codes_list) -> np.ndarray:
        """[B] predicted machine trip counts (break counts from ONE
        lockstep forward scan, probe_breaks above) used to order reads
        into seeding buckets so packed lanes finish together.  Shapes
        bucket like the machine's: L to the 64-multiple, B up to the
        next pow2 (<= one BATCH_BUCKET) or BATCH_BUCKET multiple."""
        from bwa_tpu.mem.batch_seed import (BATCH_BUCKET, _len_bucket,
                                            _pad_reads)

        B = len(codes_list)
        L = _len_bucket(max(len(c) for c in codes_list))
        if B <= BATCH_BUCKET:
            Bp = max(256, 1 << (B - 1).bit_length())
        else:
            Bp = -(-B // BATCH_BUCKET) * BATCH_BUCKET
        q, lens = _pad_reads(codes_list, L)
        if Bp > B:
            q = np.concatenate([q, np.full((Bp - B, L), 4, np.uint8)])
            lens = np.concatenate([lens, np.zeros(Bp - B, np.int32)])
        qd = jnp.asarray(q)
        br = probe_breaks(self.idx, qd, jnp.asarray(lens))
        # keep the batch device-resident: collect_seeds_dispatch_gather
        # packs lanes from it on device, so the bucket loop never
        # re-uploads q
        self._qdev_cache = (qd, lens[:B], L, B)
        return np.asarray(jax.device_get(br))[:B]

    def collect_seeds_dispatch_gather(self, pa, pb, qlen, opt, cap_s: int,
                                      stack_cap: int | None = None):
        """collect_seeds_dispatch for a bucket whose packed lanes are
        GATHERED on device from the probe_trips-resident batch matrix
        (_gather_pack): pa/pb are original-read row indices per lane
        (pb = -1 masks to an all-N slot-1), qlen the packed per-lane
        lengths.  Only valid right after probe_trips on the same batch;
        the caller checks qdev_batch()."""
        from bwa_tpu.ops import fm_machine

        cdt = self.fm.coord_dtype
        qd_all, _, L, B = self._qdev_cache
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        if stack_cap is None:
            stack_cap = int(os.environ.get("BWA_TPU_STACK_CAP", "16"))
        Lp = 2 * (L + 1)
        stack_cap = min(stack_cap, Lp + 2)
        use_p3 = bool(opt.max_mem_intv > 0)
        qd = _gather_pack(qd_all, jnp.asarray(pa.astype(np.int32)),
                          jnp.asarray(pb.astype(np.int32)))
        qld = jnp.asarray(qlen.astype(np.int32))
        nvd = _next_valid_device(qd, qld)
        seeds, seed_n, st1, ovf, ds1 = fm_machine.seed_machine(
            self.idx, qd, qld, nvd, np.int32(opt.min_seed_len),
            np.int32(split_len), cdt(opt.split_width),
            cdt(opt.max_mem_intv), cap=stack_cap, cap_s=cap_s,
            use_p3=use_p3, shard=None)
        meta = _pack_meta(seed_n, ovf, ds1, st1)
        seeds = fm_machine.sort_seeds(seeds, seed_n, key64=bool(Lp >= 32768))
        return (seeds, meta, cap_s)

    def qdev_batch(self) -> int:
        """Batch size of the device-resident read matrix left by the
        last probe_trips call, or -1 when absent."""
        c = getattr(self, "_qdev_cache", None)
        return c[3] if c is not None else -1

    def collect_seeds(self, q_pad: np.ndarray, qlen: np.ndarray, opt,
                      cap_s: int, fused: bool = False,
                      stack_cap: int | None = None, shard=None):
        """3-pass seed collection on device; one transfer at the end.

        Default path: the unified per-lane state machine (ops/fm_machine.py,
        no lock-step restarts).  fused=True selects the older lock-step
        program (kept as a cross-check).
        Returns numpy (s0, s1, s2, ss, se, seed_n)."""
        cdt = self.fm.coord_dtype
        B, L = q_pad.shape
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        if fused:
            out = collect_intv_device(
                self.idx, jnp.asarray(q_pad),
                jnp.asarray(qlen.astype(np.int32)),
                np.int32(opt.min_seed_len), np.int32(split_len),
                cdt(opt.split_width), cdt(opt.max_mem_intv),
                cap=L + 2, cap_s=cap_s, key64=bool(L >= 32768))
            return [np.asarray(jax.device_get(o)) for o in out]

        from bwa_tpu.ops import fm_machine

        if (os.environ.get("BWA_TPU_SEED_MACHINE", "unified") != "split"
                and not os.environ.get("BWA_TPU_SEED_COMPACT")):
            # default: unified single-segment machine via the async
            # dispatch/wait pair (back-to-back here; pipelined callers
            # interleave a host finalize between the halves)
            h = self.collect_seeds_dispatch(q_pad, qlen, opt, cap_s,
                                            stack_cap, shard=shard)
            return self.collect_seeds_wait(h)

        # (a 2-bit pack of q + device unpack was tried for the H2D side
        # and measured neutral — the uint8 upload is not the bottleneck)
        qd = jnp.asarray(q_pad)
        qld = jnp.asarray(qlen.astype(np.int32))
        # next non-ambiguous position table, built ON DEVICE from q: the
        # host version is a 4*B*(L+1)-byte H2D transfer (~95 ms/bucket
        # over the tunnel), the device one is a suffix cummin
        nvd = _next_valid_device(qd, qld)
        i32 = jnp.int32
        seeds = jnp.zeros((B, cap_s, 5), cdt)
        seed_n = jnp.zeros(B, i32)
        # interval stacks use a small cap: typical prev/curr lists hold a
        # handful of rows, and per-step cost streams the whole buffer; the
        # rare deeper read is flagged by the machine and redone on host
        stack_cap = min(int(os.environ.get("BWA_TPU_STACK_CAP", "16")), L + 2)
        if os.environ.get("BWA_TPU_SEED_MACHINE", "unified") == "split":
            # three-call cross-check path
            seeds, seed_n, st1, ov1, ds1 = fm_machine.smem_machine(
                self.idx, qd, qld, nvd, np.int32(opt.min_seed_len),
                np.int32(split_len), cdt(opt.split_width), seeds, seed_n,
                jnp.zeros(B, i32), cap=stack_cap, cap_s=cap_s, pass2=False)
            old_n = seed_n
            seeds, seed_n, st2, ov2, ds2 = fm_machine.smem_machine(
                self.idx, qd, qld, nvd, np.int32(opt.min_seed_len),
                np.int32(split_len), cdt(opt.split_width), seeds, seed_n,
                old_n, cap=stack_cap, cap_s=cap_s, pass2=True)
            st3 = None
            if opt.max_mem_intv > 0:
                seeds, seed_n, st3 = fm_machine.seed3_machine(
                    self.idx, qd, qld, nvd, np.int32(opt.min_seed_len),
                    cdt(opt.max_mem_intv), seeds, seed_n, cap_s=cap_s)
            self.last_done = (np.asarray(jax.device_get(ds1)),
                              np.asarray(jax.device_get(ds2)))
            self.last_steps = tuple(
                int(jax.device_get(s)) if s is not None else 0
                for s in (st1, st2, st3))
            ovf = ov1 | ov2
        else:
            # unified machine with tail compaction: run a segment, retire
            # finished lanes, shrink the bucket, continue.  The machine
            # runs at the speed of the slowest lane (utilization ~48% on
            # the bench data), so compaction reclaims most of the tail.
            use_p3 = bool(opt.max_mem_intv > 0)
            kw = dict(cap=stack_cap, cap_s=cap_s, use_p3=use_p3)
            consts = (np.int32(opt.min_seed_len), np.int32(split_len),
                      cdt(opt.split_width), cdt(opt.max_mem_intv))
            seg0 = int(os.environ.get("BWA_TPU_SEED_SEG", "448"))
            seg = int(os.environ.get("BWA_TPU_SEED_SEG2", "256"))
            min_b = 256
            big = jnp.int32(0x7fffffff)
            state = fm_machine.seed_state_init(B, stack_cap, cap_s, cdt)
            out_seeds = jnp.zeros((B + 1, cap_s, 5), cdt)
            out_sn = jnp.zeros(B + 1, i32)
            out_ovf = jnp.zeros(B + 1, bool)
            orig = jnp.arange(B + 1, dtype=i32)[:B]
            qd_l, qld_l, nvd_l = qd, qld, nvd
            B_l = B
            first = True
            total_steps = 0
            while True:
                ms = jnp.int32(seg0 if first else seg)
                if B_l <= min_b:
                    ms = big
                state = fm_machine.seed_machine_seg(
                    state, self.idx, qd_l, qld_l, nvd_l, *consts, ms, **kw)
                first = False
                d = dict(zip(fm_machine.SEED_KEYS, state))
                # write this level's results home (alive lanes get
                # overwritten by their retirement level later)
                out_seeds = out_seeds.at[orig].set(d["seeds"])
                out_sn = out_sn.at[orig].set(d["seed_n"])
                out_ovf = out_ovf.at[orig].set(d["ovf"])
                total_steps = int(jax.device_get(d["steps"]))
                phase = np.asarray(jax.device_get(d["phase"]))
                alive = np.nonzero(phase != fm_machine.P_DONE)[0]
                if os.environ.get("BWA_TPU_SEED_DEBUG"):
                    import time as _t
                    print(f"[seed] level B={B_l} cum_steps={total_steps} "
                          f"alive={alive.size} t={_t.perf_counter():.3f}")
                if alive.size == 0:
                    break
                B2 = max(min_b, 1 << int(alive.size - 1).bit_length())
                if B2 >= B_l:  # not enough retirement to shrink: run out
                    state = fm_machine.seed_machine_seg(
                        state, self.idx, qd_l, qld_l, nvd_l, *consts, big,
                        **kw)
                    d = dict(zip(fm_machine.SEED_KEYS, state))
                    out_seeds = out_seeds.at[orig].set(d["seeds"])
                    out_sn = out_sn.at[orig].set(d["seed_n"])
                    out_ovf = out_ovf.at[orig].set(d["ovf"])
                    total_steps = int(jax.device_get(d["steps"]))
                    if os.environ.get("BWA_TPU_SEED_DEBUG"):
                        import time as _t
                        print(f"[seed] runout B={B_l} cum={total_steps} "
                              f"t={_t.perf_counter():.3f}")
                    break
                pad = np.zeros(B2, np.int64)
                pad[:alive.size] = alive
                pidx = jnp.asarray(pad)
                live2 = jnp.arange(B2) < alive.size
                state = tuple(
                    a[pidx] if (hasattr(a, "ndim") and a.ndim >= 1
                                and a.shape[0] == B_l) else a
                    for a in state)
                d = dict(zip(fm_machine.SEED_KEYS, state))
                d["phase"] = jnp.where(live2, d["phase"],
                                       jnp.int32(fm_machine.P_DONE))
                state = tuple(d[k] for k in fm_machine.SEED_KEYS)
                orig = jnp.where(live2, orig[pidx], B)  # parked -> junk row
                qd_l = qd_l[pidx]
                qld_l = qld_l[pidx]
                nvd_l = nvd_l[pidx]
                B_l = B2
            seeds, seed_n = out_seeds[:B], out_sn[:B]
            ovf = out_ovf[:B]
            self.last_done = (np.zeros(B, np.int32),)
            self.last_steps = (total_steps,)
        seeds = fm_machine.sort_seeds(seeds, seed_n, key64=bool(L >= 32768))
        return self._fetch_seeds(seeds, seed_n, ovf, cap_s)

    def collect_seeds_dispatch(self, q_pad: np.ndarray, qlen: np.ndarray,
                               opt, cap_s: int, stack_cap: int | None = None,
                               shard=None):
        """Async half of collect_seeds (default unified machine): uploads
        the bucket and dispatches the seeding program + sort + packed-meta
        kernels WITHOUT blocking — JAX async dispatch queues them on the
        device.  Pair with collect_seeds_wait; between the two calls the
        host is free (the kt_pipeline analog: the previous bucket's C++
        finalize runs while this bucket seeds on the chip)."""
        from bwa_tpu.ops import fm_machine

        cdt = self.fm.coord_dtype
        B, L = q_pad.shape
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        if stack_cap is None:
            stack_cap = int(os.environ.get("BWA_TPU_STACK_CAP", "16"))
        stack_cap = min(stack_cap, L + 2)
        use_p3 = bool(opt.max_mem_intv > 0)
        qd = jnp.asarray(q_pad)
        qld = jnp.asarray(qlen.astype(np.int32))
        if self.mesh is not None and B % self.mesh.devices.size == 0:
            # multi-chip: reads data-parallel over the mesh, index
            # replicated (mesh.machine_sharded); per-lane sort included
            from bwa_tpu.parallel.mesh import machine_sharded

            key = (L, B, cap_s, stack_cap, use_p3, shard is not None,
                   int(opt.min_seed_len), split_len,
                   int(opt.split_width), int(opt.max_mem_intv))
            fn = self._mesh_step.get(key)
            if fn is None:
                fn = machine_sharded(
                    self.idx, self.mesh, opt.min_seed_len, split_len,
                    opt.split_width, opt.max_mem_intv, cap=stack_cap,
                    cap_s=cap_s, use_p3=use_p3, tagged=shard is not None)
                self._mesh_step[key] = fn
            args = (qd, qld) if shard is None else (
                qd, qld, jnp.asarray(shard[0].astype(np.int32)),
                jnp.asarray(shard[1].astype(np.int32)),
                jnp.asarray(shard[2].astype(np.int32)))
            seeds, seed_n, ovf, ds1, st1 = fn(*args)
            meta = _pack_meta(seed_n, ovf, ds1, st1)
            return (seeds, meta, cap_s)
        nvd = _next_valid_device(qd, qld)
        seeds, seed_n, st1, ovf, ds1 = fm_machine.seed_machine(
            self.idx, qd, qld, nvd, np.int32(opt.min_seed_len),
            np.int32(split_len), cdt(opt.split_width),
            cdt(opt.max_mem_intv), cap=stack_cap, cap_s=cap_s,
            use_p3=use_p3, shard=shard)
        meta = _pack_meta(seed_n, ovf, ds1, st1)
        seeds = fm_machine.sort_seeds(seeds, seed_n, key64=bool(L >= 32768))
        return (seeds, meta, cap_s)

    def collect_seeds_wait(self, handle):
        """Blocking half: one packed D2H for the small outputs (each
        separate device_get is a ~5-9ms tunnel round-trip), then the
        width-dieted seed transfer."""
        seeds, meta, cap_s = handle
        meta = np.asarray(jax.device_get(meta))
        sn_h = meta[0]
        ovf_h = meta[1] != 0
        self.last_done = (meta[2],)
        self.last_steps = (int(meta[3, 0]),)
        return self._fetch_seeds(seeds, sn_h, ovf_h, cap_s)

    def _fetch_seeds(self, seeds, seed_n, ovf, cap_s: int):
        """Seed D2H with a width diet: pull the tiny per-lane counts
        first and slice the sorted [B, cap_s, 5] buffer to a bucketed
        max(seed_n) before the big transfer (tunnel D2H is ~55 MB/s, so
        the full buffer costs ~70 ms/bucket while typical seed counts
        fill a third of it).  Rows past seed_n are pad (sorted last);
        callers mask by seed_n, so the narrower width is transparent."""
        sn = np.asarray(jax.device_get(seed_n))  # no-op if already host
        ovf = np.asarray(jax.device_get(ovf))
        m = int(sn.max(initial=0))
        lvl = cap_s
        for cand in (4, 8, 12, 16, 24, 32):
            if m <= cand < cap_s:
                lvl = cand
                break
        sd = np.asarray(jax.device_get(seeds[:, :lvl]))
        sn = np.where(ovf, cap_s + 1, sn)  # force the host-redo path
        out = (sd[:, :, 0], sd[:, :, 1], sd[:, :, 2],
               sd[:, :, 3].astype(np.int32), sd[:, :, 4].astype(np.int32),
               sn)
        if sd.shape[2] > 5:  # sharded run: provenance column last
            out = out + (sd[:, :, 5],)
        return out

    def collect_seeds_refill_dispatch(self, q_all: np.ndarray,
                                      qlen_all: np.ndarray, opt,
                                      cap_s: int, cap_r: int, lanes: int,
                                      stack_cap: int | None = None):
        """Async retire-and-refill seeding: ALL of a bucket's reads go up
        as one device table and `lanes` machine lanes draw from the shared
        queue (fm_machine.seed_machine_seg refill mode) — lane utilization
        is bounded by total-work/longest-read instead of the unluckiest
        static read->lane packing (~55% measured, PERF.md).  Seeds come
        back with the read id in the provenance column."""
        from bwa_tpu.ops import fm_machine

        cdt = self.fm.coord_dtype
        N, L = q_all.shape
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        if stack_cap is None:
            stack_cap = int(os.environ.get("BWA_TPU_STACK_CAP", "16"))
        stack_cap = min(stack_cap, L + 2)
        use_p3 = bool(opt.max_mem_intv > 0)
        qd = jnp.asarray(q_all)
        qld = jnp.asarray(qlen_all.astype(np.int32))
        table = _refill_table(qd, qld)
        B = lanes
        state = fm_machine.seed_state_init(B, stack_cap, cap_s, cdt,
                                           tagged=True)
        d = dict(zip(fm_machine.SEED_KEYS, state))
        init_n = min(B, N)
        d["read_idx"] = jnp.asarray(
            np.minimum(np.arange(B), max(N - 1, 0)).astype(np.int32))
        phase0 = np.full(B, fm_machine.P_NEXT, np.int32)
        phase0[init_n:] = fm_machine.P_DONE
        d["phase"] = jnp.asarray(phase0)
        d["qctr"] = jnp.asarray(np.int32(init_n))
        state = tuple(d[k] for k in fm_machine.SEED_KEYS)
        dummy = jnp.zeros(1, jnp.int32)
        st = fm_machine.seed_machine_seg(
            state, self.idx, table, dummy, None,
            np.int32(opt.min_seed_len), np.int32(split_len),
            cdt(opt.split_width), cdt(opt.max_mem_intv),
            jnp.int32(0x7fffffff), cap=stack_cap, cap_s=cap_s,
            use_p3=use_p3, tagged=True, refill=True,
            n_queue=jnp.int32(N), cap_r=jnp.int32(cap_r))
        d = dict(zip(fm_machine.SEED_KEYS, st))
        seeds = fm_machine.sort_seeds(d["seeds"], d["seed_n"], key64=False)
        i32 = jnp.int32
        meta = jnp.concatenate(
            [_pack_meta(d["seed_n"], d["ovf"], d["done_step"], d["steps"]),
             jnp.broadcast_to(d["qctr"].astype(i32),
                              d["seed_n"].shape)[None, :]])
        return (seeds, meta, cap_s)

    def collect_seeds_refill_wait(self, handle):
        """Blocking half of the refill dispatch.  Returns the usual
        7-tuple (tag column = read id) plus n_drawn: how many queue reads
        were started — a remainder below N means every lane filled its
        seed buffer, and the caller runs another invocation for the rest."""
        seeds, meta, cap_s = handle
        meta = np.asarray(jax.device_get(meta))
        sn_h = meta[0]
        ovf_h = meta[1] != 0
        self.last_done = (meta[2],)
        self.last_steps = (int(meta[3, 0]),)
        n_drawn = int(meta[4, 0])
        return self._fetch_seeds(seeds, sn_h, ovf_h, cap_s), n_drawn

    def collect_seeds_refill(self, q_all, qlen_all, opt, cap_s: int,
                             cap_r: int, lanes: int,
                             stack_cap: int | None = None):
        h = self.collect_seeds_refill_dispatch(q_all, qlen_all, opt, cap_s,
                                               cap_r, lanes, stack_cap)
        return self.collect_seeds_refill_wait(h)

    def smem_pass(self, q_pad: np.ndarray, qlen: np.ndarray, x: np.ndarray,
                  min_intv: np.ndarray, max_intv: int, active: np.ndarray,
                  cap: int):
        cdt = self.fm.coord_dtype
        out = smem1a_batch(
            self.idx, jnp.asarray(q_pad), jnp.asarray(qlen.astype(np.int32)),
            jnp.asarray(x.astype(np.int32)),
            jnp.asarray(min_intv.astype(cdt)),
            jnp.asarray(cdt(max_intv)), jnp.asarray(active), cap)
        return [np.asarray(jax.device_get(o)) for o in out]

    def seed3_pass(self, q_pad, qlen, x, min_len: int, max_intv: int, active):
        out = seed_strategy1_batch(
            self.idx, jnp.asarray(q_pad), jnp.asarray(qlen.astype(np.int32)),
            jnp.asarray(x.astype(np.int32)), np.int32(min_len),
            self.fm.coord_dtype(max_intv), jnp.asarray(active))
        return [np.asarray(jax.device_get(o)) for o in out]
