"""Unified per-lane SMEM state machine (the fast path of seed collection).

Each lane runs its OWN state machine — acquire next start, forward pass,
backward pass, chain to the next start — inside a single device while_loop;
one batched occ4 pair per global step serves whatever micro-op each lane is
on.  No lock-step restarts: a lane never waits for the slowest lane's call.

Buffers are packed ([B, cap, 4] interval stacks, [B, cap_s, 5] seed store)
and every per-lane access is a one-hot select/contraction: on this backend
a dynamic gather costs ~40us/step regardless of operand size and each
separate reduction is a ~10us kernel, while elementwise chains fuse for
free — so the body avoids gathers entirely and batches its one-hot picks
into single stacked reduces (PERF.md step-cost model).

Emission order within a lane differs from the reference's collection order,
but the final stable sort by (start, end) makes the result identical: tied
keys always carry identical payloads (an interval is determined by its
substring).  Semantics per bwt.c:289-379 and bwamem.c:140-188.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bwa_tpu.ops.fm import _extend, _occ4, _set_intv

P_NEXT = 0
P_FWD = 1
P_BWD = 2
P_DONE = 3


def _push_row(buf, n, mask, row, cap):
    """buf: [B, cap, W]; row: [B, W]; conditional append per lane.

    Implemented as a one-hot select over the cap axis: XLA:TPU lowers
    batched scatter/gather on a loop-carried [B, cap, W] buffer ~10x
    slower than a fused full-buffer select (measured on v5e), and the
    while_loop step cost is what bounds seeding throughput.
    """
    slot = jnp.minimum(n, cap - 1)
    sel = mask[:, None] & (jnp.arange(cap, dtype=n.dtype)[None, :]
                           == slot[:, None])
    buf = jnp.where(sel[:, :, None], row.astype(buf.dtype)[:, None, :], buf)
    return buf, n + mask.astype(n.dtype), mask & (n >= cap)


def _row_read(buf, pos):
    """buf[b, pos[b]] via one-hot contraction; pos is clipped by caller.
    sum dtype pinned: under jax_enable_x64 (int64-coordinate genomes)
    jnp.sum would promote an int32 accumulator to int64 and break the
    while-loop carry types."""
    cap = buf.shape[1]
    oh = jnp.arange(cap, dtype=pos.dtype)[None, :] == pos[:, None]
    return jnp.sum(jnp.where(oh[:, :, None], buf, 0), axis=1,
                   dtype=buf.dtype)


def _vec_read(vec, pos, dtype=jnp.int32):
    """vec[b, pos[b]] via one-hot contraction (vec: [B, L])."""
    L = vec.shape[1]
    oh = jnp.arange(L, dtype=pos.dtype)[None, :] == pos[:, None]
    return jnp.sum(jnp.where(oh, vec, 0).astype(dtype), axis=1, dtype=dtype)


def _col4(mat, c):
    """mat[b, c[b]] for a [B, 4] matrix — one-hot contraction instead of
    mat[bidx, c]: every dynamic gather costs ~40us/step on this backend
    regardless of size, while the 4-wide compare/where/sum chain fuses
    into the surrounding elementwise work for free (PERF.md)."""
    oh = jnp.arange(4, dtype=c.dtype)[None, :] == c[:, None]
    return jnp.sum(jnp.where(oh, mat, 0), axis=1, dtype=mat.dtype)


def _pick3(a0, a1, a2, c):
    """(a0[b,c[b]], a1[b,c[b]], a2[b,c[b]]) stacked [B, 3] — the shared
    column select for the of/ob interval updates.  One reduction over a
    stacked [B, 4, 3] tensor: each separate reduce is its own kernel
    launch (~10us) inside the while body, so fewer reduces > fewer ops."""
    oh = jnp.arange(4, dtype=c.dtype)[None, :] == c[:, None]
    a = jnp.stack([a0, a1, a2], axis=-1)            # [B, 4, 3]
    return jnp.sum(jnp.where(oh[:, :, None], a, 0), axis=1, dtype=a.dtype)


@partial(jax.jit, static_argnames=("cap", "cap_s", "pass2"))
def smem_machine(idx, q, qlen, next_valid, min_seed_len, split_len,
                 split_width, seeds_in, seed_n_in, old_n,
                 cap: int, cap_s: int, pass2: bool):
    """Run pass 1 (pass2=False) or pass 2 (pass2=True) to completion.

    seeds_in: [B, cap_s, 5] coord dtype — fields (x0, x1, x2, start, end).
    Pass 2 reads its jobs from seeds_in[0..old_n) and appends in place.
    Returns (seeds, seed_n, steps, stack_overflow) — lanes whose interval
    stacks outgrew `cap` are flagged and must be redone on the host.
    """
    cdt = idx["ckpt"].dtype
    B, L = q.shape
    i32 = jnp.int32
    bidx = jnp.arange(B)

    st = dict(
        phase=jnp.full(B, P_NEXT, i32),
        job=jnp.zeros(B, i32),
        x=jnp.zeros(B, i32),
        minv=jnp.ones(B, cdt),
        ik=jnp.zeros((B, 3), cdt),
        info_end=jnp.zeros(B, i32),
        i=jnp.zeros(B, i32),
        j=jnp.zeros(B, i32),
        stkA=jnp.zeros((B, cap, 4), cdt), an=jnp.zeros(B, i32),
        stkB=jnp.zeros((B, cap, 4), cdt), bn=jnp.zeros(B, i32),
        cur_is_a=jnp.ones(B, bool),
        rev_read=jnp.ones(B, bool),
        last_x2=jnp.zeros(B, cdt),
        call_last_start=jnp.zeros(B, i32),
        call_mem_n=jnp.zeros(B, i32),
        ret=jnp.zeros(B, i32),
        seeds=seeds_in, seed_n=seed_n_in,
        steps=jnp.zeros((), i32),
        ovf=jnp.zeros(B, bool),
        done_step=jnp.zeros(B, i32),
    )
    keys = list(st.keys())

    if pass2:
        # pass-2 jobs come from the (fixed) first old_n seed rows; their
        # qualification and start/min-interval tables are loop-invariant
        sidx = jnp.arange(cap_s, dtype=i32)
        qual_tab = ((sidx[None, :] < old_n[:, None])
                    & ((seeds_in[:, :, 4] - seeds_in[:, :, 3]) >= split_len)
                    & (seeds_in[:, :, 2] <= split_width))      # [B, cap_s]
        xnew_tab = ((seeds_in[:, :, 3] + seeds_in[:, :, 4]) >> 1).astype(i32)
        minv_tab = seeds_in[:, :, 2] + 1

    def cond(t):
        return jnp.any(t[0] != P_DONE)

    def body(t):
        d = dict(zip(keys, t))
        phase = d["phase"]

        # ---------- P_NEXT: acquire the next job ----------
        nx = phase == P_NEXT
        if not pass2:
            x_new = _vec_read(next_valid, jnp.clip(d["job"], 0, L))
            have = nx & (x_new < qlen)
        else:
            cand = qual_tab & (sidx[None, :] >= d["job"][:, None])
            jj_first = jnp.min(jnp.where(cand, sidx[None, :], cap_s), axis=1)
            found = jj_first < cap_s
            jj = jnp.where(found, jj_first, old_n)
            k = jnp.minimum(jj, cap_s - 1)
            have = nx & found & (jj < old_n)
            x_new = _vec_read(xnew_tab, k)
            d["minv"] = jnp.where(have, _vec_read(minv_tab, k, minv_tab.dtype),
                                  d["minv"])
            d["job"] = jnp.where(nx, jj + have.astype(i32), d["job"])

        d["x"] = jnp.where(have, x_new, d["x"])
        if not pass2:
            d["minv"] = jnp.where(nx, jnp.ones_like(d["minv"]), d["minv"])
        qx = _vec_read(q, jnp.clip(d["x"], 0, L - 1))
        startable = have & (qx < 4)
        k0, k1, k2 = _set_intv(idx, qx)
        ik_new = jnp.stack([k0, k1, k2], axis=-1)
        d["ik"] = jnp.where(startable[:, None], ik_new, d["ik"])
        d["info_end"] = jnp.where(startable, d["x"] + 1, d["info_end"])
        d["i"] = jnp.where(startable, d["x"] + 1, d["i"])
        d["an"] = jnp.where(startable, 0, d["an"])
        d["minv"] = jnp.maximum(d["minv"], 1)
        d["phase"] = jnp.where(startable, P_FWD,
                               jnp.where(nx & ~have, P_DONE, phase))

        # ---------- shared batched occ work ----------
        in_fwd = d["phase"] == P_FWD
        in_bwd = d["phase"] == P_BWD
        pn = jnp.where(d["cur_is_a"], d["an"], d["bn"])
        jj2 = jnp.where(d["rev_read"], pn - 1 - d["j"], d["j"])
        jj2 = jnp.clip(jj2, 0, cap - 1)
        # one read across both stacks (index cap+jj2 selects stkB): one
        # reduce kernel instead of two row_reads + a select
        stk2 = jnp.concatenate([d["stkA"], d["stkB"]], axis=1)
        p = _row_read(stk2, jnp.where(d["cur_is_a"], jj2, jj2 + cap))
        ex = jnp.where(in_bwd[:, None], p[:, :3], d["ik"])  # x0 x1 x2
        fwd_side = jnp.where(in_bwd, ex[:, 0], ex[:, 1])
        # NOTE: keep tk/tl as two separate occ4 calls — fusing them into
        # one [2B] call wins ~20us in isolation but regresses the full
        # body by ~150us/step (the concat splits the big fused
        # elementwise kernel; measured twice, also pre-diet)
        tk = _occ4(idx, fwd_side - 1)
        tl = _occ4(idx, fwd_side - 1 + ex[:, 2])
        L2r = idx["L2"][:4][None, :].astype(cdt)
        ok_nb = L2r + 1 + tk
        ok_sz = (tl - tk).astype(cdt)
        bk = jnp.where(in_bwd, ex[:, 1], ex[:, 0])
        span = ((fwd_side <= idx["primary"])
                & (fwd_side + ex[:, 2] - 1 >= idx["primary"])).astype(cdt)
        acc3 = bk + span
        acc2 = acc3 + ok_sz[:, 3]
        acc1 = acc2 + ok_sz[:, 2]
        acc0 = acc1 + ok_sz[:, 1]
        accs = jnp.stack([acc0, acc1, acc2, acc3], axis=-1)

        # ---------- P_FWD micro-op ----------
        qi = _vec_read(q, jnp.clip(d["i"], 0, L - 1))
        qb_i = jnp.where(d["i"] >= 0, qi, 4)  # P_BWD's base char (same i)
        run_f = in_fwd & (d["i"] < qlen)
        off_end = in_fwd & ~run_f
        amb = run_f & (qi >= 4)
        ext_m = run_f & ~amb
        cf = jnp.clip(3 - qi, 0, 3)
        of = _pick3(accs, ok_nb, ok_sz, cf)
        changed = ext_m & (of[:, 2] != d["ik"][:, 2])
        push_f = amb | changed | off_end
        rowf = jnp.concatenate(
            [d["ik"], d["info_end"][:, None].astype(cdt)], axis=1)
        d["stkA"], d["an"], o1 = _push_row(d["stkA"], d["an"], push_f, rowf,
                                           cap)
        d["ovf"] = d["ovf"] | o1
        too_small = changed & (of[:, 2] < d["minv"])
        stop_f = amb | too_small | off_end
        adv = ext_m & ~stop_f
        d["ik"] = jnp.where(adv[:, None], of, d["ik"])
        d["info_end"] = jnp.where(adv, d["i"] + 1, d["info_end"])
        d["i"] = jnp.where(adv, d["i"] + 1, d["i"])
        to_bwd = stop_f
        # at to_bwd the stack top is always the row pushed THIS step
        # (stop_f implies push_f: amb/off_end push directly, too_small
        # implies changed), and adv is disjoint from to_bwd, so the top's
        # .info field is exactly the current info_end — no re-read needed
        d["ret"] = jnp.where(to_bwd, d["info_end"], d["ret"])
        d["cur_is_a"] = jnp.where(to_bwd, True, d["cur_is_a"])
        d["rev_read"] = jnp.where(to_bwd, True, d["rev_read"])
        d["bn"] = jnp.where(to_bwd, 0, d["bn"])
        d["j"] = jnp.where(to_bwd, 0, d["j"])
        d["i"] = jnp.where(to_bwd, d["x"] - 1, d["i"])
        d["call_mem_n"] = jnp.where(to_bwd, 0, d["call_mem_n"])
        d["last_x2"] = jnp.where(to_bwd, jnp.zeros_like(d["last_x2"]),
                                 d["last_x2"])
        d["phase"] = jnp.where(to_bwd, P_BWD, d["phase"])

        # ---------- P_BWD micro-op (one j of row i) ----------
        # qb_i comes from the shared q read at the top of P_FWD: in_bwd
        # lanes' i is untouched by the FWD updates (those only rewrite
        # in_fwd lanes), so the earlier read saw the same index
        c = jnp.where((d["i"] >= 0) & (qb_i < 4), qb_i, -1)
        jact = in_bwd & (d["j"] < pn)
        cb = jnp.clip(c, 0, 3)
        ob = _pick3(ok_nb, accs, ok_sz, cb)
        keep = jact & ((c < 0) | (ob[:, 2] < d["minv"]))
        curr_n_now = jnp.where(d["cur_is_a"], d["bn"], d["an"])
        can_emit = keep & (curr_n_now == 0) & (
            (d["call_mem_n"] == 0) | ((d["i"] + 1) < d["call_last_start"]))
        slen = p[:, 3].astype(i32) - (d["i"] + 1)
        write = can_emit & (slen >= min_seed_len)
        seed_row = jnp.concatenate(
            [p[:, :3], (d["i"] + 1)[:, None].astype(cdt), p[:, 3:4]], axis=1)
        d["seeds"], d["seed_n"], _ = _push_row(d["seeds"], d["seed_n"],
                                               write, seed_row, cap_s)
        d["call_last_start"] = jnp.where(can_emit, d["i"] + 1,
                                         d["call_last_start"])
        d["call_mem_n"] = d["call_mem_n"] + can_emit.astype(i32)
        push_b = jact & ~keep & ((curr_n_now == 0) | (ob[:, 2] != d["last_x2"]))
        rowb = jnp.concatenate([ob, p[:, 3:4]], axis=1)
        d["stkA"], d["an"], o2 = _push_row(d["stkA"], d["an"],
                                           push_b & ~d["cur_is_a"], rowb, cap)
        d["stkB"], d["bn"], o3 = _push_row(d["stkB"], d["bn"],
                                           push_b & d["cur_is_a"], rowb, cap)
        d["ovf"] = d["ovf"] | o2 | o3
        d["last_x2"] = jnp.where(push_b, ob[:, 2], d["last_x2"])
        d["j"] = jnp.where(jact, d["j"] + 1, d["j"])
        row_done = in_bwd & (d["j"] >= pn)
        new_n = jnp.where(d["cur_is_a"], d["bn"], d["an"])
        call_over = row_done & ((new_n == 0) | (d["i"] < 0))
        keep_going = row_done & ~call_over
        d["cur_is_a"] = jnp.where(keep_going, ~d["cur_is_a"], d["cur_is_a"])
        d["rev_read"] = jnp.where(keep_going, False, d["rev_read"])
        # clear the NEW curr stack (the one that is not prev after the flip)
        d["bn"] = jnp.where(keep_going & d["cur_is_a"], 0, d["bn"])
        d["an"] = jnp.where(keep_going & ~d["cur_is_a"], 0, d["an"])
        d["i"] = jnp.where(keep_going, d["i"] - 1, d["i"])
        d["j"] = jnp.where(keep_going, 0, d["j"])
        d["last_x2"] = jnp.where(keep_going, jnp.zeros_like(d["last_x2"]),
                                 d["last_x2"])
        if not pass2:
            d["job"] = jnp.where(call_over, d["ret"], d["job"])
        d["phase"] = jnp.where(call_over, P_NEXT, d["phase"])
        d["steps"] = d["steps"] + 1
        d["done_step"] = jnp.where((d["phase"] == P_DONE)
                                   & (d["done_step"] == 0),
                                   d["steps"], d["done_step"])

        return tuple(d[k] for k in keys)

    t = tuple(st[k] for k in keys)
    t = lax.while_loop(cond, body, t)
    d = dict(zip(keys, t))
    return d["seeds"], d["seed_n"], d["steps"], d["ovf"], d["done_step"]


S_P1, S_P2, S_P3 = 0, 1, 2


SEED_KEYS = ("phase", "stage", "old_n", "job", "x", "minv", "ik",
             "info_end", "i", "j", "stkA", "an", "stkB", "bn", "cur_is_a",
             "rev_read", "last_x2", "call_last_start", "call_mem_n", "ret",
             "seeds", "seed_n", "qmask", "cur_tag", "steps", "ovf",
             "done_step", "read_idx", "seed_base", "qctr")


def seed_state_init(B: int, cap: int, cap_s: int, cdt,
                    tagged: bool = False,
                    job_lo: np.ndarray | None = None) -> tuple:
    """Fresh per-lane machine state (lanes start in P_NEXT/pass-1).

    tagged: seeds get a 6th provenance column (0 = pass-1, -1 = pass-3,
    else the pass-2 source seed's (start<<15)|end) so a sharded run's
    cross-lane duplicates can be removed exactly (same source job AND
    same interval) while the duplicates the reference itself produces
    (different jobs, same interval) are kept.  job_lo: per-lane initial
    start-position cursor (lane sharding of one long read's job range).
    """
    i32 = jnp.int32
    st = dict(
        phase=jnp.full(B, P_NEXT, i32),
        stage=jnp.zeros(B, i32),
        old_n=jnp.zeros(B, i32),
        job=(jnp.asarray(job_lo.astype(np.int32)) if job_lo is not None
             else jnp.zeros(B, i32)),
        x=jnp.zeros(B, i32),
        minv=jnp.ones(B, cdt),
        ik=jnp.zeros((B, 3), cdt),
        info_end=jnp.zeros(B, i32),
        i=jnp.zeros(B, i32),
        j=jnp.zeros(B, i32),
        stkA=jnp.zeros((B, cap, 4), cdt), an=jnp.zeros(B, i32),
        stkB=jnp.zeros((B, cap, 4), cdt), bn=jnp.zeros(B, i32),
        cur_is_a=jnp.ones(B, bool),
        rev_read=jnp.ones(B, bool),
        last_x2=jnp.zeros(B, cdt),
        call_last_start=jnp.zeros(B, i32),
        call_mem_n=jnp.zeros(B, i32),
        ret=jnp.zeros(B, i32),
        seeds=jnp.zeros((B, cap_s, 6 if tagged else 5), cdt),
        seed_n=jnp.zeros(B, i32),
        qmask=jnp.zeros((B, cap_s), bool),  # row qualifies for pass-2
        cur_tag=jnp.zeros(B, cdt),
        steps=jnp.zeros((), i32),
        ovf=jnp.zeros(B, bool),
        done_step=jnp.zeros(B, i32),
        # retire-and-refill (refill=True machines): per-lane current read,
        # first seed slot of that read, and the shared queue cursor
        read_idx=jnp.zeros(B, i32),
        seed_base=jnp.zeros(B, i32),
        qctr=jnp.zeros((), i32),
    )
    return tuple(st[k] for k in SEED_KEYS)


@partial(jax.jit, static_argnames=("cap", "cap_s", "use_p3", "tagged",
                                   "refill"))
def seed_machine_seg(state, idx, q, qlen, next_valid, min_seed_len,
                     split_len, split_width, max_intv3, max_steps,
                     cap: int, cap_s: int, use_p3: bool,
                     hi1=None, hi3=None, tagged: bool = False,
                     refill: bool = False, n_queue=None, cap_r=None):
    """All three seeding passes in ONE while_loop with a per-lane stage
    cursor (pass1 SMEMs -> pass2 re-seeding -> pass3 LAST-like).

    A lane moves to its own pass 2 the moment its pass 1 finishes, so the
    program runs for max-of-sums steps instead of the three-call
    sum-of-maxima (bwamem.c:140-188 semantics unchanged; the final
    sort_seeds canonicalizes emission order as before).  Runs at most
    max_steps more steps (traced; pass a huge value for run-to-done) so
    the driver can compact away finished lanes between segments.
    Returns the updated state tuple.

    Lane sharding (long reads): hi1/hi3 bound the pass-1/pass-3 start
    cursors per lane (defaults: qlen).  With K lanes per read, lane k
    acquires pass-1 jobs in [job_lo_k, hi1_k) — exact because every
    maximal exact match starting in a lane's range passes through one of
    that lane's visited positions (the bwt_smem1 chain argument,
    bwt.c:289-351, applied per range) — and runs pass 2 for the seeds it
    found; `tagged` provenance lets the demux drop the cross-lane
    duplicates exactly.  Pass 3's emitted set depends on the visit
    sequence (bwt.c:358-379), so only lane 0 of a read runs it
    (hi3 = qlen there, 0 elsewhere).

    Retire-and-refill (refill=True, short reads): the machine runs at
    the slowest lane's pace, and static read->lane assignment leaves
    ~55% mean lane utilization (PERF.md).  Here `q` is instead a device
    table [N, 2L+2] int32 of per-READ rows (qlen | chars | next-valid),
    each lane carries read_idx into it, and a lane whose read completes
    draws the next read from the shared queue cursor instead of going
    P_DONE — util is bounded by total-work/longest-read, not by the
    unluckiest static packing.  Requires tagged=True: the provenance
    column carries the read id for the host demux.  A lane stops
    drawing when its seed buffer cannot hold another read's cap_r rows;
    qctr in the final state tells the caller how many reads were drawn
    (undrawn remainder -> another invocation).
    """
    cdt = idx["ckpt"].dtype
    i32 = jnp.int32
    if refill:
        L = (q.shape[1] - 2) // 2
        B = state[0].shape[0]
    else:
        B, L = q.shape
    bidx = jnp.arange(B)
    sidx = jnp.arange(cap_s, dtype=i32)
    keys = list(SEED_KEYS)
    stop_at = state[keys.index("steps")] + max_steps
    if hi1 is None:
        hi1 = qlen
    if hi3 is None:
        hi3 = qlen

    def cond(t):
        return jnp.any(t[0] != P_DONE) & (t[keys.index("steps")] < stop_at)

    def body(t):
        d = dict(zip(keys, t))
        phase = d["phase"]
        st1m = d["stage"] == S_P2
        st2m = d["stage"] == S_P3

        if refill:
            # one dynamic row gather per step: the lane's current read
            # (chars + next-valid + length); everything downstream is the
            # usual one-hot work over the gathered [B, *] rows
            trow = q[d["read_idx"]]
            qlen_l = trow[:, 0]
            qv = trow[:, 1:L + 1]
            nv = trow[:, L + 1:]
            hi1_l = hi3_l = qlen_l
        else:
            qv, nv, qlen_l = q, next_valid, qlen
            hi1_l, hi3_l = hi1, hi3

        # ---------- P_NEXT: acquire the next job (stage-dependent) ----------
        nx = phase == P_NEXT
        # stages 1 and 3 walk start positions via the next-valid table,
        # bounded by the lane's shard range (hi1/hi3 == qlen unsharded)
        xv = _vec_read(nv, jnp.clip(d["job"], 0, L))
        have_nv = nx & ~st1m & (xv < jnp.where(st2m, hi3_l, hi1_l))
        # stage 2 scans this lane's first old_n seed rows for long, unique
        # SMEMs to re-seed from their midpoints (bwamem.c:160-168); the
        # qualification bit is maintained at push time (qmask)
        qual = d["qmask"] & (sidx[None, :] < d["old_n"][:, None])
        cand = qual & (sidx[None, :] >= d["job"][:, None])
        jj_first = jnp.min(jnp.where(cand, sidx[None, :], cap_s), axis=1)
        found = jj_first < cap_s
        jj = jnp.where(found, jj_first, d["old_n"])
        k = jnp.minimum(jj, cap_s - 1)
        have_s1 = nx & st1m & found & (jj < d["old_n"])
        row = _row_read(d["seeds"], k)
        x_s1 = ((row[:, 3] + row[:, 4]) >> 1).astype(i32)
        if tagged:  # provenance of this pass-2 job = its source seed
            d["cur_tag"] = jnp.where(have_s1,
                                     (row[:, 3] << 15) | row[:, 4],
                                     d["cur_tag"])

        have = jnp.where(st1m, have_s1, have_nv)
        x_new = jnp.where(st1m, x_s1, xv)
        d["minv"] = jnp.where(nx,
                              jnp.where(st1m,
                                        jnp.where(have_s1, row[:, 2] + 1,
                                                  d["minv"]),
                                        jnp.ones_like(d["minv"])),
                              d["minv"])
        d["job"] = jnp.where(nx & st1m, jj + have_s1.astype(i32), d["job"])
        d["x"] = jnp.where(have, x_new, d["x"])

        # stage advance when this stage has no more jobs
        exh = nx & ~have
        to_s2 = exh & (d["stage"] == S_P1)
        to_s3 = exh & st1m & use_p3
        to_done = exh & (st2m | (st1m & (not use_p3)))
        d["old_n"] = jnp.where(to_s2, d["seed_n"], d["old_n"])
        d["stage"] = jnp.where(to_s2, S_P2,
                               jnp.where(to_s3, S_P3, d["stage"]))
        # pass-2's slot scan covers the CURRENT read's seeds: they start
        # at seed_base (always 0 without refill)
        d["job"] = jnp.where(to_s2, d["seed_base"],
                             jnp.where(to_s3, 0, d["job"]))
        st2m = d["stage"] == S_P3  # refresh after transitions

        if refill:
            # retire-and-refill: a finishing lane draws the next queued
            # read instead of going P_DONE.  Same-step finishers get
            # consecutive queue slots via an exclusive prefix sum; a lane
            # without room for another read's cap_r seed rows stops
            # drawing (the queue remainder is another invocation's job).
            room = d["seed_n"] <= cap_s - cap_r
            want = to_done & room
            wanti = want.astype(i32)
            rank = jnp.cumsum(wanti) - wanti
            new_idx = d["qctr"] + rank
            acq = want & (new_idx < n_queue)
            d["read_idx"] = jnp.where(acq, new_idx, d["read_idx"])
            d["seed_base"] = jnp.where(acq, d["seed_n"], d["seed_base"])
            d["stage"] = jnp.where(acq, S_P1, d["stage"])
            d["job"] = jnp.where(acq, 0, d["job"])
            d["qctr"] = d["qctr"] + jnp.sum(acq, dtype=i32)
            # the acquired lane idles this step (its gathered row is the
            # old read's) and starts the new read's pass 1 next step
            to_done = to_done & ~acq

        qx = _vec_read(qv, jnp.clip(d["x"], 0, L - 1))
        startable = have & (qx < 4)
        k0, k1, k2 = _set_intv(idx, qx)
        ik_new = jnp.stack([k0, k1, k2], axis=-1)
        d["ik"] = jnp.where(startable[:, None], ik_new, d["ik"])
        d["info_end"] = jnp.where(startable, d["x"] + 1, d["info_end"])
        d["i"] = jnp.where(startable, d["x"] + 1, d["i"])
        d["an"] = jnp.where(startable, 0, d["an"])
        d["minv"] = jnp.maximum(d["minv"], 1)
        d["phase"] = jnp.where(startable, P_FWD,
                               jnp.where(to_done, P_DONE, phase))

        # ---------- shared batched occ work ----------
        in_fwd = d["phase"] == P_FWD
        in_bwd = d["phase"] == P_BWD
        pn = jnp.where(d["cur_is_a"], d["an"], d["bn"])
        jj2 = jnp.where(d["rev_read"], pn - 1 - d["j"], d["j"])
        jj2 = jnp.clip(jj2, 0, cap - 1)
        # one read across both stacks (index cap+jj2 selects stkB): one
        # reduce kernel instead of two row_reads + a select
        stk2 = jnp.concatenate([d["stkA"], d["stkB"]], axis=1)
        p = _row_read(stk2, jnp.where(d["cur_is_a"], jj2, jj2 + cap))
        ex = jnp.where(in_bwd[:, None], p[:, :3], d["ik"])  # x0 x1 x2
        fwd_side = jnp.where(in_bwd, ex[:, 0], ex[:, 1])
        # NOTE: keep tk/tl as two separate occ4 calls — fusing them into
        # one [2B] call wins ~20us in isolation but regresses the full
        # body by ~150us/step (the concat splits the big fused
        # elementwise kernel; measured twice, also pre-diet)
        tk = _occ4(idx, fwd_side - 1)
        tl = _occ4(idx, fwd_side - 1 + ex[:, 2])
        L2r = idx["L2"][:4][None, :].astype(cdt)
        ok_nb = L2r + 1 + tk
        ok_sz = (tl - tk).astype(cdt)
        bk = jnp.where(in_bwd, ex[:, 1], ex[:, 0])
        span = ((fwd_side <= idx["primary"])
                & (fwd_side + ex[:, 2] - 1 >= idx["primary"])).astype(cdt)
        acc3 = bk + span
        acc2 = acc3 + ok_sz[:, 3]
        acc1 = acc2 + ok_sz[:, 2]
        acc0 = acc1 + ok_sz[:, 1]
        accs = jnp.stack([acc0, acc1, acc2, acc3], axis=-1)

        # ---------- P_FWD micro-op (SMEM forward for stages 1/2) ----------
        qi = _vec_read(qv, jnp.clip(d["i"], 0, L - 1))
        qb_i = jnp.where(d["i"] >= 0, qi, 4)  # P_BWD's base char (same i)
        fwd_s12 = in_fwd & ~st2m
        run_f = fwd_s12 & (d["i"] < qlen_l)
        off_end = fwd_s12 & ~run_f
        amb = run_f & (qi >= 4)
        ext_m = run_f & ~amb
        cf = jnp.clip(3 - qi, 0, 3)
        of = _pick3(accs, ok_nb, ok_sz, cf)
        changed = ext_m & (of[:, 2] != d["ik"][:, 2])
        push_f = amb | changed | off_end
        rowf = jnp.concatenate(
            [d["ik"], d["info_end"][:, None].astype(cdt)], axis=1)
        d["stkA"], d["an"], o1 = _push_row(d["stkA"], d["an"], push_f, rowf,
                                           cap)
        d["ovf"] = d["ovf"] | o1
        too_small = changed & (of[:, 2] < d["minv"])
        stop_f = amb | too_small | off_end
        adv = ext_m & ~stop_f
        d["ik"] = jnp.where(adv[:, None], of, d["ik"])
        d["info_end"] = jnp.where(adv, d["i"] + 1, d["info_end"])
        d["i"] = jnp.where(adv, d["i"] + 1, d["i"])
        to_bwd = stop_f
        # at to_bwd the stack top is always the row pushed THIS step
        # (stop_f implies push_f: amb/off_end push directly, too_small
        # implies changed), and adv is disjoint from to_bwd, so the top's
        # .info field is exactly the current info_end — no re-read needed
        d["ret"] = jnp.where(to_bwd, d["info_end"], d["ret"])
        d["cur_is_a"] = jnp.where(to_bwd, True, d["cur_is_a"])
        d["rev_read"] = jnp.where(to_bwd, True, d["rev_read"])
        d["bn"] = jnp.where(to_bwd, 0, d["bn"])
        d["j"] = jnp.where(to_bwd, 0, d["j"])
        d["i"] = jnp.where(to_bwd, d["x"] - 1, d["i"])
        d["call_mem_n"] = jnp.where(to_bwd, 0, d["call_mem_n"])
        d["last_x2"] = jnp.where(to_bwd, jnp.zeros_like(d["last_x2"]),
                                 d["last_x2"])
        d["phase"] = jnp.where(to_bwd, P_BWD, d["phase"])

        # ---------- P_FWD micro-op, stage 3 (bwt_seed_strategy1) ----------
        if use_p3:
            f3 = in_fwd & st2m
            run3 = f3 & (d["i"] < qlen_l)
            hit_end3 = f3 & ~run3
            amb3 = run3 & (qi >= 4)
            ext3 = run3 & ~amb3
            hit3 = ext3 & (of[:, 2] < max_intv3) & \
                ((d["i"] - d["x"]) >= min_seed_len)
            write3 = hit3 & (of[:, 2] > 0)
            row3 = jnp.concatenate(
                [of, d["x"][:, None].astype(cdt),
                 (d["i"] + 1)[:, None].astype(cdt)], axis=1)
            adv3 = ext3 & ~hit3
            d["ik"] = jnp.where(adv3[:, None], of, d["ik"])
            d["i"] = jnp.where(adv3, d["i"] + 1, d["i"])
            over3 = amb3 | hit3 | hit_end3
            d["job"] = jnp.where(amb3 | hit3, d["i"] + 1,
                                 jnp.where(hit_end3, qlen_l, d["job"]))
            d["phase"] = jnp.where(over3, P_NEXT, d["phase"])
        else:
            write3 = jnp.zeros(B, bool)
            row3 = jnp.zeros((B, 5), cdt)

        # ---------- P_BWD micro-op (one j of row i) ----------
        # qb_i comes from the shared q read at the top of P_FWD: in_bwd
        # lanes' i is untouched by the FWD updates (those only rewrite
        # in_fwd lanes), so the earlier read saw the same index
        c = jnp.where((d["i"] >= 0) & (qb_i < 4), qb_i, -1)
        jact = in_bwd & (d["j"] < pn)
        cb = jnp.clip(c, 0, 3)
        ob = _pick3(ok_nb, accs, ok_sz, cb)
        keep = jact & ((c < 0) | (ob[:, 2] < d["minv"]))
        curr_n_now = jnp.where(d["cur_is_a"], d["bn"], d["an"])
        can_emit = keep & (curr_n_now == 0) & (
            (d["call_mem_n"] == 0) | ((d["i"] + 1) < d["call_last_start"]))
        slen = p[:, 3].astype(i32) - (d["i"] + 1)
        write = can_emit & (slen >= min_seed_len)
        seed_row = jnp.concatenate(
            [p[:, :3], (d["i"] + 1)[:, None].astype(cdt), p[:, 3:4]], axis=1)
        # stage-3 hits merge into the same (disjoint-lane) push
        write_any = write | write3
        seed_row = jnp.where(write3[:, None], row3, seed_row)
        if tagged:  # provenance column: 0 = pass-1, -1 = pass-3, else
            if refill:  # the demux key is simply the read id
                tag = d["read_idx"].astype(cdt)
            else:
                tag = jnp.where(write3,  # the pass-2 source key
                                jnp.full_like(d["cur_tag"], -1),
                                jnp.where(st1m, d["cur_tag"],
                                          jnp.zeros_like(d["cur_tag"])))
            seed_row = jnp.concatenate([seed_row, tag[:, None]], axis=1)
        qual_new = ((seed_row[:, 4] - seed_row[:, 3]) >= split_len) \
            & (seed_row[:, 2] <= split_width)
        slot_q = jnp.minimum(d["seed_n"], cap_s - 1)
        sel_q = write_any[:, None] & (sidx[None, :] == slot_q[:, None])
        d["qmask"] = jnp.where(sel_q, qual_new[:, None], d["qmask"])
        d["seeds"], d["seed_n"], _ = _push_row(d["seeds"], d["seed_n"],
                                               write_any, seed_row, cap_s)
        d["call_last_start"] = jnp.where(can_emit, d["i"] + 1,
                                         d["call_last_start"])
        d["call_mem_n"] = d["call_mem_n"] + can_emit.astype(i32)
        push_b = jact & ~keep & ((curr_n_now == 0) | (ob[:, 2] != d["last_x2"]))
        rowb = jnp.concatenate([ob, p[:, 3:4]], axis=1)
        d["stkA"], d["an"], o2 = _push_row(d["stkA"], d["an"],
                                           push_b & ~d["cur_is_a"], rowb, cap)
        d["stkB"], d["bn"], o3 = _push_row(d["stkB"], d["bn"],
                                           push_b & d["cur_is_a"], rowb, cap)
        d["ovf"] = d["ovf"] | o2 | o3
        d["last_x2"] = jnp.where(push_b, ob[:, 2], d["last_x2"])
        d["j"] = jnp.where(jact, d["j"] + 1, d["j"])
        row_done = in_bwd & (d["j"] >= pn)
        new_n = jnp.where(d["cur_is_a"], d["bn"], d["an"])
        call_over = row_done & ((new_n == 0) | (d["i"] < 0))
        keep_going = row_done & ~call_over
        d["cur_is_a"] = jnp.where(keep_going, ~d["cur_is_a"], d["cur_is_a"])
        d["rev_read"] = jnp.where(keep_going, False, d["rev_read"])
        d["bn"] = jnp.where(keep_going & d["cur_is_a"], 0, d["bn"])
        d["an"] = jnp.where(keep_going & ~d["cur_is_a"], 0, d["an"])
        d["i"] = jnp.where(keep_going, d["i"] - 1, d["i"])
        d["j"] = jnp.where(keep_going, 0, d["j"])
        d["last_x2"] = jnp.where(keep_going, jnp.zeros_like(d["last_x2"]),
                                 d["last_x2"])
        # pass-1 chains to the next start from the forward-pass return
        d["job"] = jnp.where(call_over & (d["stage"] == S_P1), d["ret"],
                             d["job"])
        d["phase"] = jnp.where(call_over, P_NEXT, d["phase"])
        d["steps"] = d["steps"] + 1
        d["done_step"] = jnp.where((d["phase"] == P_DONE)
                                   & (d["done_step"] == 0),
                                   d["steps"], d["done_step"])

        return tuple(d[k] for k in keys)

    # unroll: the per-iteration dispatch floor is ~60us on this backend
    # (PERF.md step-cost model) — amortize it over UNROLL machine steps.
    # An extra trailing step is a no-op (every update is masked by phase,
    # and done_step is latched by its ==0 guard), so correctness is
    # unroll-invariant; the cond is simply checked every UNROLL steps.
    unroll = int(os.environ.get("BWA_TPU_SEED_UNROLL", "2"))

    def body_n(t):
        for _ in range(unroll):
            t = body(t)
        return t

    return lax.while_loop(cond, body_n, state)


def seed_machine(idx, q, qlen, next_valid, min_seed_len, split_len,
                 split_width, max_intv3, cap: int, cap_s: int, use_p3: bool,
                 shard=None):
    """Single-shot convenience wrapper: init + run to completion.
    shard: optional (job_lo, hi1, hi3) numpy arrays for lane sharding —
    seeds come back with the provenance column (see seed_machine_seg)."""
    cdt = idx["ckpt"].dtype
    if shard is None:
        state = seed_state_init(q.shape[0], cap, cap_s, cdt)
        hi1 = hi3 = None
        tagged = False
    else:
        job_lo, hi1, hi3 = shard
        state = seed_state_init(q.shape[0], cap, cap_s, cdt, tagged=True,
                                job_lo=job_lo)
        hi1 = jnp.asarray(hi1.astype(np.int32))
        hi3 = jnp.asarray(hi3.astype(np.int32))
        tagged = True
    t = seed_machine_seg(state, idx, q, qlen, next_valid, min_seed_len,
                         split_len, split_width, max_intv3,
                         jnp.int32(0x7fffffff), cap=cap, cap_s=cap_s,
                         use_p3=use_p3, hi1=hi1, hi3=hi3, tagged=tagged)
    d = dict(zip(SEED_KEYS, t))
    return d["seeds"], d["seed_n"], d["steps"], d["ovf"], d["done_step"]


@partial(jax.jit, static_argnames=("cap_s",))
def seed3_machine(idx, q, qlen, next_valid, min_len, max_intv,
                  seeds_in, seed_n_in, cap_s: int):
    """Pass 3 (bwt_seed_strategy1 over all starts) as a unified loop."""
    cdt = idx["ckpt"].dtype
    B, L = q.shape
    i32 = jnp.int32
    bidx = jnp.arange(B)

    def cond(t):
        return jnp.any(t[0] != P_DONE)

    def body(t):
        (phase, job, x, i, ik, seeds, seed_n, ns) = t
        nx = phase == P_NEXT
        xj = _vec_read(next_valid, jnp.clip(job, 0, L))
        have = nx & (xj < qlen)
        qx = _vec_read(q, jnp.clip(xj, 0, L - 1))
        k0, k1, k2 = _set_intv(idx, qx)
        x = jnp.where(have, xj, x)
        ik = jnp.where(have[:, None], jnp.stack([k0, k1, k2], axis=-1), ik)
        i = jnp.where(have, xj + 1, i)
        phase = jnp.where(have, P_FWD, jnp.where(nx, P_DONE, phase))

        run_any = phase == P_FWD
        act = run_any & (i < qlen)
        hit_end = run_any & ~act
        qi = _vec_read(q, jnp.clip(i, 0, L - 1))
        amb = act & (qi >= 4)
        ext = act & ~amb
        ok0, ok1, ok2 = _extend(idx, ik[:, 0], ik[:, 1], ik[:, 2], False)
        cc = jnp.clip(3 - qi, 0, 3)
        o = _pick3(ok0, ok1, ok2, cc)
        hit = ext & (o[:, 2] < max_intv) & ((i - x) >= min_len)
        write = hit & (o[:, 2] > 0)
        row = jnp.concatenate(
            [o, x[:, None].astype(cdt), (i + 1)[:, None].astype(cdt)], axis=1)
        seeds, seed_n, _ = _push_row(seeds, seed_n, write, row, cap_s)
        adv = ext & ~hit
        ik = jnp.where(adv[:, None], o, ik)
        i = jnp.where(adv, i + 1, i)
        over = amb | hit | hit_end
        job = jnp.where(amb | hit, i + 1, jnp.where(hit_end, qlen, job))
        phase = jnp.where(over, P_NEXT, phase)
        return (phase, job, x, i, ik, seeds, seed_n, ns + 1)

    t = (jnp.full(B, P_NEXT, i32), jnp.zeros(B, i32), jnp.zeros(B, i32),
         jnp.zeros(B, i32), jnp.zeros((B, 3), cdt), seeds_in, seed_n_in,
         jnp.zeros((), i32))
    t = lax.while_loop(cond, body, t)
    return t[5], t[6], t[7]


@partial(jax.jit, static_argnames=("key64",))
def sort_seeds(seeds, seed_n, key64: bool):
    """Stable sort by (start, end) == the reference's .info order."""
    kdt = jnp.int64 if key64 else jnp.int32
    shift = 32 if key64 else 16
    cap_s = seeds.shape[1]
    key = (seeds[:, :, 3].astype(kdt) << shift) | seeds[:, :, 4].astype(kdt)
    pad = jnp.arange(cap_s)[None, :] >= seed_n[:, None]
    key = jnp.where(pad, jnp.iinfo(kdt).max, key)
    order = jnp.argsort(key, axis=1, stable=True)
    return jnp.take_along_axis(seeds, order[:, :, None], axis=1)
