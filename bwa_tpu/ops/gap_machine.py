"""Device bounded-difference gapped backward search (bwa aln).

The TPU reformulation of bwt_match_gap (/root/reference/bwtgap.c:109-264)
planned in SURVEY.md §2: each lane runs ONE read's best-first search —
pop the lowest-score / most-recent stack entry, expand it with one
batched occ4 pair, push up to 9 children — inside a single while_loop,
batched over B lanes.  aln/search.py match_gap is the executable spec;
this machine reproduces its result lists EXACTLY (same aln order, same
early-stop behavior), because every observable of the search depends on
the pop order:

- the score-indexed LIFO discipline (gap_stack_t, bwtgap.c:17-84) is a
  per-lane [cap] key array: key = score * 2^18 + (2^18-1 - seqno), so a
  single min-reduce pops "lowest score, most recently pushed" and a
  free slot is just key == INT32_MAX;
- seqnos are assigned in the reference's push call order within a step
  (ins/gape-ext, 4 deletions, 4 substitutions — bwtgap.c:178-253);
- the hit bookkeeping (first-hit max_diff narrowing, best_cnt/max_top2
  stop, tandem duplicate test, gap_shadow width mutation bwtgap.c:86-96)
  runs masked in the same step as the pop that produced the hit;
- bwt_match_exact_alt (bwt.c:241-256) — the m==0 shortcut — becomes a
  per-lane walk sub-phase consuming one character per machine step.

Per the measured step-cost model (PERF.md): no dynamic gathers except
the two occ4 table rows; every per-lane pick is a one-hot contraction;
the 9 candidate pushes land as a fused where-chain, not scatters.

Exactness risks that cannot be represented (stack deeper than `cap`,
more than cap_a hits, score/seqno key overflow) flag `ovf`; the driver
(aln/batch_search.py) re-runs those lanes up a cap ladder and falls
back to the host spec, so results are exact for every read.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bwa_tpu.ops.fm import _occ4
from bwa_tpu.ops.fm_machine import _col4, _push_row, _vec_read

P_RUN = 0
P_WALK = 1
P_DONE = 2

STATE_M = 0
STATE_I = 1
STATE_D = 2

SENT = np.int32(0x7FFFFFFF)   # free-slot / empty-stack key sentinel
SEQ_BITS = 18                 # seqno field width inside the pop key
SEQ_CAP = 1 << SEQ_BITS
SCORE_CAP = (SENT >> SEQ_BITS) - 1  # scores >= this overflow the key

# stk_m fields
F_I, F_MM, F_GO, F_GE, F_INS, F_DEL, F_ST, F_LDP = range(8)
NF = 8

GAP_KEYS = ("phase", "keys", "stk_m", "stk_kl", "n_stk", "seqc",
            "wk", "wl", "wi", "wmeta",
            "best_score", "mdc", "best_cnt",
            "wb", "aln_m", "aln_kl", "n_aln",
            "ovf", "steps", "done_step")


def gap_state_init(B: int, L: int, cap: int, cap_a: int, cdt):
    i32 = jnp.int32
    st = dict(
        phase=jnp.full(B, P_RUN, i32),
        keys=jnp.full((B, cap), SENT, i32),
        stk_m=jnp.zeros((B, cap, NF), i32),
        stk_kl=jnp.zeros((B, cap, 2), cdt),
        n_stk=jnp.zeros(B, i32),
        seqc=jnp.zeros(B, i32),
        # exact-match walk (bwt_match_exact_alt) sub-phase state
        wk=jnp.zeros(B, cdt),
        wl=jnp.zeros(B, cdt),
        wi=jnp.zeros(B, i32),
        wmeta=jnp.zeros((B, 7), i32),   # score, mm, go, ge, ins, del, ldp
        best_score=jnp.zeros(B, i32),
        mdc=jnp.zeros(B, i32),          # the narrowing max_diff local
        best_cnt=jnp.zeros(B, cdt),
        wb=jnp.zeros((B, L, 2), cdt),   # width (w, bid) — gap_shadow mutates
        aln_m=jnp.zeros((B, cap_a, 6), i32),  # mm, go, ge, score, ins, del
        aln_kl=jnp.zeros((B, cap_a, 2), cdt),
        n_aln=jnp.zeros(B, i32),
        ovf=jnp.zeros(B, bool),
        steps=jnp.zeros((), i32),
        done_step=jnp.zeros(B, i32),
    )
    return tuple(st[k] for k in GAP_KEYS)


@partial(jax.jit, static_argnames=())
def cal_width_device(idx, q, qlen):
    """bwt_cal_width (bwtaln.c:57-81) batched: per-position (w, bid)
    lower bounds over the ORIGINAL read codes.  Returns [B, L, 2] cdt;
    rows at t >= qlen[b] are garbage (the search never reads them — the
    spec's extra width[len] entry is write-only)."""
    cdt = idx["ckpt"].dtype
    B, L = q.shape
    k0 = jnp.zeros(B, cdt)
    l0 = jnp.zeros(B, cdt) + idx["seq_len"]
    bid0 = jnp.zeros(B, jnp.int32)

    def step(carry, c_t):
        k, l, bid = carry
        c_t = c_t.astype(jnp.int32)
        okv = _occ4(idx, k - 1)
        olv = _occ4(idx, l)
        cc = jnp.clip(c_t, 0, 3)
        ok = _col4(okv, cc)
        ol = _col4(olv, cc)
        l2c = _col4(jnp.broadcast_to(idx["L2"][:4][None, :].astype(cdt),
                                     (B, 4)), cc)
        good = c_t < 4
        k2 = jnp.where(good, l2c + ok + 1, k)
        l2 = jnp.where(good, l2c + ol, l)
        reset = (k2 > l2) | ~good
        bid2 = bid + reset.astype(jnp.int32)
        k3 = jnp.where(reset, 0, k2).astype(cdt)
        l3 = jnp.where(reset, jnp.zeros_like(l2) + idx["seq_len"],
                       l2).astype(cdt)
        out = jnp.stack([l3 - k3 + 1, bid2.astype(cdt)], axis=-1)
        return (k3, l3, bid2), out

    _, ys = lax.scan(step, (k0, l0, bid0), jnp.transpose(q, (1, 0)))
    return jnp.transpose(ys, (1, 0, 2))


def _read2(wb, p0, p1):
    """(w,bid) rows of wb [B, L, 2] at positions p0 and p1 — one stacked
    one-hot contraction (one reduce kernel instead of four)."""
    L = wb.shape[1]
    ar = jnp.arange(L, dtype=p0.dtype)[None, None, :]
    oh = ar == jnp.stack([p0, p1], axis=1)[:, :, None]      # [B, 2, L]
    vals = jnp.sum(jnp.where(oh[:, :, :, None], wb[:, None, :, :], 0),
                   axis=2, dtype=wb.dtype)                  # [B, 2, 2]
    return vals


def _ilog2(v):
    """aln_score's int_log2 (bwtgap.c:99-107), elementwise."""
    c = jnp.zeros_like(v)
    m = v
    # 0xFFFF0000 wrapped to int32: identical mask for the nonnegative
    # gap counts this sees
    for sh, bits in ((16, np.int32(-65536)), (8, 0xFF00), (4, 0xF0),
                     (2, 0xC)):
        t = (m & bits) != 0
        m = jnp.where(t, m >> sh, m)
        c = c | jnp.where(t, sh, 0)
    c = c | jnp.where((m & 0x2) != 0, 1, 0)
    return c


@partial(jax.jit, static_argnames=("cap", "cap_a", "use_seed", "f_gape",
                                   "f_nonstop", "f_loggap"))
def gap_machine(state, idx, q, qlen, md, mg, seed_en, sb,
                s_mm, s_gapo, s_gape, max_gape, max_seed_diff,
                max_entries, max_del_occ, ies, max_top2, seed_len,
                max_steps, cap: int, cap_a: int, use_seed: bool,
                f_gape: bool, f_nonstop: bool, f_loggap: bool):
    """Run every lane's bwt_match_gap to completion.

    q: [B, L] int32 complemented read codes (bwtaln.c:116-117 — the spec
    consumes q[i-1], q[i-2], ... going backward).  md/mg: per-read
    max_diff / (sticky) max_gapo.  sb: [B, SL, 2] seed-region width
    table (cal_width over the last seed_len original chars), or a [B,1,2]
    dummy when use_seed is False.  Scalars are traced so option changes
    don't recompile.  State must be initialized by the driver (initial
    stack entry, best_score, mdc, width table)."""
    cdt = idx["ckpt"].dtype
    i32 = jnp.int32
    B, L = q.shape
    keys_l = list(GAP_KEYS)

    def asc(mm, go, ge):
        return mm * s_mm + go * s_gapo + ge * s_gape

    def cond(st):
        d = dict(zip(keys_l, st))
        return jnp.any(d["phase"] != P_DONE) & (d["steps"] < max_steps)

    def body(st):
        d = dict(zip(keys_l, st))
        phase = d["phase"]
        run = phase == P_RUN
        wstep = phase == P_WALK

        # ---- stack-size stop (bwtgap.c:143: checked before the pop) ----
        brk0 = run & (d["n_stk"] > max_entries)
        run = run & ~brk0

        # ---- pop: lowest score, most recent (score-indexed LIFO) ----
        pk = jnp.min(d["keys"], axis=1)
        empty = pk == SENT
        do_pop = run & ~empty
        done_empty = run & empty
        sel = do_pop[:, None] & (d["keys"] == pk[:, None])
        d["keys"] = jnp.where(sel, SENT, d["keys"])
        d["n_stk"] = d["n_stk"] - do_pop.astype(i32)
        ent_m = jnp.sum(jnp.where(sel[:, :, None], d["stk_m"], 0), axis=1,
                        dtype=i32)
        ent_kl = jnp.sum(jnp.where(sel[:, :, None], d["stk_kl"], 0), axis=1,
                         dtype=cdt)
        e_i = ent_m[:, F_I]
        e_mm, e_go, e_ge = ent_m[:, F_MM], ent_m[:, F_GO], ent_m[:, F_GE]
        e_ins, e_del = ent_m[:, F_INS], ent_m[:, F_DEL]
        e_st, e_ldp = ent_m[:, F_ST], ent_m[:, F_LDP]
        e_k, e_l = ent_kl[:, 0], ent_kl[:, 1]
        score = asc(e_mm, e_go, e_ge)

        # ---- best-first stop (bwtgap.c:146) ----
        brk1 = do_pop & (score > d["best_score"] + s_mm)
        if f_nonstop:
            brk1 = jnp.zeros_like(brk1)
        alive = do_pop & ~brk1

        m = d["mdc"] - (e_mm + e_go) - (e_ge if f_gape else 0)
        cont1 = m < 0
        m_seed = max_seed_diff - (e_mm + e_go) - (e_ge if f_gape else 0)

        # width rows at i-2 and i-1 (post-decrement i2-1 and i2)
        p1 = jnp.clip(e_i - 1, 0, L - 1).astype(i32)
        p0 = jnp.clip(e_i - 2, 0, L - 1).astype(i32)
        wv = _read2(d["wb"], p0, p1)                  # [B, 2, (w,bid)]
        ww0, wbid0 = wv[:, 0, 0], wv[:, 0, 1].astype(i32)
        ww1, wbid1 = wv[:, 1, 0], wv[:, 1, 1].astype(i32)
        cont2 = alive & ~cont1 & (e_i > 0) & (m < wbid1)
        live = alive & ~cont1 & ~cont2

        hit0 = live & (e_i == 0)
        exact_c = live & ~hit0 & (m == 0) & \
            ((e_st == STATE_M) | (e_ge == max_gape))
        if f_gape:
            exact_c = live & ~hit0 & (m == 0)
        exp = live & ~hit0 & ~exact_c

        # start the exact-match walk next step (bwt.c:241-256)
        d["wk"] = jnp.where(exact_c, e_k, d["wk"])
        d["wl"] = jnp.where(exact_c, e_l, d["wl"])
        d["wi"] = jnp.where(exact_c, e_i, d["wi"])
        wmeta_new = jnp.stack([score, e_mm, e_go, e_ge, e_ins, e_del,
                               e_ldp], axis=1)
        d["wmeta"] = jnp.where(exact_c[:, None], wmeta_new, d["wmeta"])

        # ---- the step's one occ4 pair (expansion OR walk char) ----
        a = jnp.where(wstep, d["wk"], e_k)
        b = jnp.where(wstep, d["wl"], e_l)
        cnt_k = _occ4(idx, a - 1)                     # [B, 4]
        cnt_l = _occ4(idx, b)
        l2v = idx["L2"][:4][None, :].astype(cdt)
        kk4 = l2v + cnt_k.astype(cdt) + 1             # [B, 4] per char
        ll4 = l2v + cnt_l.astype(cdt)

        # ---- walk micro-op: one character of bwt_match_exact_alt ----
        j = d["wi"] - 1
        i2 = e_i - 1
        qpos = jnp.where(wstep, jnp.clip(j, 0, L - 1),
                         jnp.clip(i2, 0, L - 1)).astype(i32)
        qc = _vec_read(q, qpos)                       # shared q read
        wamb = wstep & (qc > 3)
        qcc = jnp.clip(qc, 0, 3)
        wkn = _col4(kk4, qcc)
        wln = _col4(ll4, qcc)
        wfail = wstep & ~wamb & (wkn > wln)
        wok = wstep & ~wamb & ~wfail
        d["wk"] = jnp.where(wok, wkn, d["wk"])
        d["wl"] = jnp.where(wok, wln, d["wl"])
        d["wi"] = jnp.where(wok, j, d["wi"])
        walk_done = wok & (j == 0)
        walk_back = wamb | wfail | walk_done          # -> P_RUN

        # ---- hit processing (same step; one event per lane) ----
        hit = hit0 | walk_done
        hsc = jnp.where(walk_done, d["wmeta"][:, 0], score)
        hmm = jnp.where(walk_done, d["wmeta"][:, 1], e_mm)
        hgo = jnp.where(walk_done, d["wmeta"][:, 2], e_go)
        hge = jnp.where(walk_done, d["wmeta"][:, 3], e_ge)
        hins = jnp.where(walk_done, d["wmeta"][:, 4], e_ins)
        hdel = jnp.where(walk_done, d["wmeta"][:, 5], e_del)
        hldp = jnp.where(walk_done, d["wmeta"][:, 6], e_ldp)
        hk = jnp.where(walk_done, d["wk"], e_k)
        hl = jnp.where(walk_done, d["wl"], e_l)

        first = hit & (d["n_aln"] == 0)
        d["best_score"] = jnp.where(first, hsc, d["best_score"])
        bd = hmm + hgo + (hge if f_gape else 0)
        if not f_nonstop:
            d["mdc"] = jnp.where(first, jnp.minimum(md, bd + 1), d["mdc"])
        same_best = hsc == d["best_score"]
        brk2 = hit & ~same_best & (d["best_cnt"] > max_top2)
        d["best_cnt"] = d["best_cnt"] + \
            jnp.where(hit & same_best, hl - hk + 1, 0).astype(cdt)
        # tandem-repeat duplicate (bwtgap.c:166-169)
        aslot = jnp.arange(cap_a, dtype=i32)[None, :] < d["n_aln"][:, None]
        dup = (hgo > 0) & jnp.any(
            aslot & (d["aln_kl"][:, :, 0] == hk[:, None])
            & (d["aln_kl"][:, :, 1] == hl[:, None]), axis=1)
        add = hit & ~brk2 & ~dup
        # gap_shadow (bwtgap.c:86-96) over width[0:ldp]
        x = (hl - hk + 1).astype(cdt)
        tmask = jnp.arange(L, dtype=i32)[None, :] < hldp[:, None]
        weq = tmask & (d["wb"][:, :, 0] == x[:, None])
        wgt = tmask & (d["wb"][:, :, 0] > x[:, None])
        jj = jnp.cumsum(weq.astype(cdt), axis=1)
        w_new = jnp.where(wgt, d["wb"][:, :, 0] - x[:, None],
                          jnp.where(weq,
                                    jnp.zeros_like(jj) + idx["seq_len"] - jj,
                                    d["wb"][:, :, 0]))
        bid_new = jnp.where(weq, jnp.ones_like(jj), d["wb"][:, :, 1])
        wb_new = jnp.stack([w_new, bid_new], axis=-1)
        d["wb"] = jnp.where(add[:, None, None], wb_new, d["wb"])
        arow_m = jnp.stack([hmm, hgo, hge, hsc, hins, hdel], axis=1)
        d["aln_m"], _, _ = _push_row(d["aln_m"], d["n_aln"], add, arow_m,
                                     cap_a)
        d["aln_kl"], n_aln2, ovf_a = _push_row(
            d["aln_kl"], d["n_aln"], add, jnp.stack([hk, hl], axis=1), cap_a)
        d["n_aln"] = n_aln2
        d["ovf"] = d["ovf"] | ovf_a

        # ---- expansion: allow gates (bwtgap.c:186-199) ----
        occv = e_l - e_k + 1
        ii = i2 - (qlen - seed_len)
        in_band = i2 > 0
        w_block = in_band & (wbid0 > m - 1)
        allow_diff = ~w_block
        allow_M = ~(in_band & ~w_block & (wbid0 == m - 1)
                    & (wbid1 == m - 1) & (ww0 == ww1))
        if use_seed:
            sv = _read2(sb, jnp.clip(ii - 1, 0, sb.shape[1] - 1).astype(i32),
                        jnp.clip(ii, 0, sb.shape[1] - 1).astype(i32))
            sw0, sbid0 = sv[:, 0, 0], sv[:, 0, 1].astype(i32)
            sw1, sbid1 = sv[:, 1, 0], sv[:, 1, 1].astype(i32)
            sgate = seed_en & in_band & (ii > 0)
            s_block = sgate & (sbid0 > m_seed - 1)
            allow_diff = allow_diff & ~s_block
            allow_M = allow_M & ~(sgate & ~s_block & (sbid0 == m_seed - 1)
                                  & (sbid1 == m_seed - 1) & (sw0 == sw1))

        tmp = _ilog2(e_ge + e_go) // 2 + 1 if f_loggap else e_go + e_ge
        ggate = exp & allow_diff & (i2 >= ies + tmp) & \
            (qlen - i2 >= ies + tmp)

        # ---- the 9 push candidates, in the reference's push order ----
        stM = e_st == STATE_M
        stI = e_st == STATE_I
        stD = e_st == STATE_D
        zi = jnp.zeros_like(e_i)

        cv, cm, ckl, cs = [], [], [], []

        def cand(valid, i_, k_, l_, mm_, go_, ge_, ins_, del_, st_, ldp_):
            cv.append(valid)
            cm.append(jnp.stack(
                [i_, mm_, go_, ge_, ins_, del_,
                 jnp.zeros_like(i_) + st_, ldp_], axis=1))
            ckl.append(jnp.stack([k_, l_], axis=1))
            cs.append(asc(mm_, go_, ge_))

        # slot 0: M-state gap open (insertion) OR I-state gap extension
        v0 = ggate & ((stM & (e_go < mg)) | (stI & (e_ge < max_gape)))
        cand(v0, i2, e_k, e_l, e_mm, e_go + stM.astype(i32),
             e_ge + stI.astype(i32), e_ins + 1, e_del, STATE_I, i2)
        # slots 1-4: deletions (M-state open / D-state extension)
        dM = stM & (e_go < mg)
        dD = stD & (e_ge < max_gape) & \
            ((e_ge + e_go < d["mdc"]) | (occv < max_del_occ))
        for c4 in range(4):
            vd = ggate & (dM | dD) & (kk4[:, c4] <= ll4[:, c4])
            cand(vd, e_i, kk4[:, c4], ll4[:, c4], e_mm,
                 e_go + dM.astype(i32), e_ge + dD.astype(i32),
                 e_ins, e_del + 1, STATE_D, e_i)
        # slots 5-8: substitutions j=1..4 (bwtgap.c:232-246); when
        # allow_M is off but the exact char exists, only the j=4
        # match push happens (the elif at bwtgap.c:247-253)
        both = allow_diff & allow_M
        for jv in (1, 2, 3, 4):
            cj = (qc + jv) & 3
            is_mm = (qc > 3) if jv == 4 else jnp.ones_like(qc, bool)
            kkj = _col4(kk4, cj)
            llj = _col4(ll4, cj)
            gate = exp & (kkj <= llj) & \
                (both | ((~both & (qc < 4)) if jv == 4
                         else jnp.zeros_like(both)))
            cand(gate, i2, kkj, llj, e_mm + is_mm.astype(i32),
                 e_go, e_ge, e_ins, e_del, STATE_M,
                 jnp.where(is_mm, i2, zi))

        valid = jnp.stack(cv, axis=1)                     # [B, 9]
        rows_m = jnp.stack(cm, axis=1)                    # [B, 9, NF]
        rows_kl = jnp.stack(ckl, axis=1).astype(cdt)      # [B, 9, 2]
        scs = jnp.stack(cs, axis=1)                       # [B, 9]

        vi = valid.astype(i32)
        rank = jnp.cumsum(vi, axis=1) - vi                # exclusive
        seqno = d["seqc"][:, None] + rank
        keys_p = scs * SEQ_CAP + (SEQ_CAP - 1 - seqno)
        n_push = jnp.sum(vi, axis=1, dtype=i32)
        d["ovf"] = d["ovf"] | (exp & ((jnp.max(scs * valid, axis=1)
                                       >= SCORE_CAP)
                                      | (d["seqc"] + n_push >= SEQ_CAP)))
        d["seqc"] = d["seqc"] + n_push

        # free-slot targets: candidate with valid-rank r -> the (r+1)-th
        # free slot; fused where-chain (scatters are the measured cliff)
        free = d["keys"] == SENT
        cumfree = jnp.cumsum(free.astype(i32), axis=1)    # [B, cap]
        nfree = cumfree[:, -1]
        d["ovf"] = d["ovf"] | (n_push > nfree)
        for p in range(9):
            ohp = valid[:, p, None] & free & \
                (cumfree == rank[:, p, None] + 1)
            d["keys"] = jnp.where(ohp, keys_p[:, p, None], d["keys"])
            d["stk_m"] = jnp.where(ohp[:, :, None],
                                   rows_m[:, p, None, :], d["stk_m"])
            d["stk_kl"] = jnp.where(ohp[:, :, None],
                                    rows_kl[:, p, None, :], d["stk_kl"])
        d["n_stk"] = d["n_stk"] + jnp.minimum(n_push, nfree)

        # ---- phase transitions ----
        done = brk0 | done_empty | brk1 | brk2 | d["ovf"]
        d["phase"] = jnp.where(done, P_DONE,
                               jnp.where(exact_c, P_WALK,
                                         jnp.where(walk_back, P_RUN,
                                                   d["phase"])))
        newly = done & (d["done_step"] == 0)
        d["done_step"] = jnp.where(newly, d["steps"] + 1, d["done_step"])
        d["steps"] = d["steps"] + 1
        return tuple(d[k] for k in keys_l)

    out = lax.while_loop(cond, body, state)
    d = dict(zip(keys_l, out))
    # lanes stopped by max_steps: results incomplete -> host fallback
    d["ovf"] = d["ovf"] | (d["phase"] != P_DONE)
    return tuple(d[k] for k in keys_l)
