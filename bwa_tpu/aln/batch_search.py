"""Device-batched `bwa aln` search driver (BWA_TPU_ALN=device).

Feeds chunks of reads through ops/gap_machine.gap_machine — the TPU
reformulation of bwt_match_gap (/root/reference/bwtgap.c:109-264) — and
returns the exact per-read alignment records the .sai writer needs, in
the reference's order.  Lanes whose stack/result buffers overflow the
device caps climb a retry ladder (cap 64 -> 128 -> 256) and finally
fall back to the host executable spec (aln/search.py), so every read's
result is exact regardless of how pathological its search tree is —
the same overflow discipline the seeding path uses (PERF.md §10).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from bwa_tpu.aln.opts import (BWA_AVG_ERR, BWA_MODE_GAPE, BWA_MODE_LOGGAP,
                              BWA_MODE_NONSTOP, GapOpt, cal_maxdiff)
from bwa_tpu.ops import gap_machine as gm


def _pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _prep_chunk(pk, opt: GapOpt):
    """Per-read parameter arrays, replicating bwtaln.c:88-117: fnr-derived
    max_diff, the STICKY max_gapo clamp (local_opt lives outside the read
    loop), complemented search codes, and the seed-region window."""
    n = pk.n
    lens = pk.lens.astype(np.int64)
    L = _pow2(int(lens.max()) if n else 32, 32)
    if opt.fnr > 0.0:
        uniq, inv = np.unique(pk.lens, return_inverse=True)
        md = np.array([cal_maxdiff(int(x), BWA_AVG_ERR, opt.fnr)
                       for x in uniq], np.int32)[inv]
    else:
        md = np.full(n, opt.max_diff, np.int32)
    mg = np.minimum(np.minimum.accumulate(md) if n else md,
                    np.int32(opt.max_gapo)).astype(np.int32)
    # p->seq is the REVERSED trimmed read (seqio.BtSeq; bwtaln.c stores
    # reads reversed): gather codes_flat back-to-front per read
    orig = np.full((n, L), 4, np.uint8)
    pos = np.arange(L)[None, :]
    valid = pos < lens[:, None]
    flat_idx = np.where(valid,
                        pk.codes_off[:-1, None] + lens[:, None] - 1 - pos,
                        0)
    orig[valid] = pk.codes_flat[flat_idx[valid]]
    qc = np.where(orig > 3, 4, 3 - orig.astype(np.int32)).astype(np.int32)
    SL = int(opt.seed_len)
    seed_en = pk.lens.astype(np.int64) > SL
    use_seed = bool(seed_en.any()) and SL < L
    if use_seed:
        swin = np.full((n, SL), 4, np.uint8)
        spos = np.arange(SL)[None, :]
        src = np.clip(lens[:, None] - SL + spos, 0, None)
        rows = np.broadcast_to(np.arange(n)[:, None], (n, SL))
        sel = seed_en[:, None] & (src < lens[:, None])
        swin[sel] = orig[rows[sel], src[sel]]
    else:
        swin = np.zeros((n, 1), np.uint8)
    if n:
        n_amb = (orig > 3).sum(axis=1, where=valid).astype(np.int32)
    else:
        n_amb = np.zeros(0, np.int32)
    skip = n_amb > md          # bwtgap.c:131-135: too many Ns -> no alns
    return L, md, mg, orig, qc, seed_en, use_seed, swin, skip


def _init_state(idx, cdt, opt: GapOpt, lens, md, mg, wb0, cap, cap_a,
                active):
    """Initial machine state: one (i=len, k=0, l=seq_len, STATE_M) stack
    entry per active lane (bwtgap.c:136), local-opt best_score bound."""
    B = lens.shape[0]
    L = wb0.shape[1]
    st = dict(zip(gm.GAP_KEYS, gm.gap_state_init(B, L, cap, cap_a, cdt)))
    i32 = np.int32
    keys0 = np.full((B, cap), gm.SENT, i32)
    keys0[:, 0] = np.where(active, i32(gm.SEQ_CAP - 1), gm.SENT)
    stk_m0 = np.zeros((B, cap, gm.NF), i32)
    stk_m0[:, 0, gm.F_I] = lens
    stk_kl0 = np.zeros((B, cap, 2), cdt)
    stk_kl0[:, 0, 1] = np.asarray(idx["seq_len"])
    st["keys"] = jnp.asarray(keys0)
    st["stk_m"] = jnp.asarray(stk_m0)
    st["stk_kl"] = jnp.asarray(stk_kl0)
    st["n_stk"] = jnp.asarray(active.astype(i32))
    st["seqc"] = jnp.asarray(np.full(B, 1, i32))
    best0 = ((md + 1) * opt.s_mm + (mg + 1) * opt.s_gapo
             + (opt.max_gape + 1) * opt.s_gape).astype(i32)
    st["best_score"] = jnp.asarray(best0)
    st["mdc"] = jnp.asarray(md)
    st["wb"] = wb0
    st["phase"] = jnp.asarray(
        np.where(active, gm.P_RUN, gm.P_DONE).astype(i32))
    return tuple(st[k] for k in gm.GAP_KEYS)


def _run_bucket(engine, idx, cdt, opt: GapOpt, qc, lens, md, mg,
                seed_en, use_seed, wb0, sb, active, cap, cap_a,
                max_steps, mesh=None):
    """One gap_machine invocation over a [B, L] lane bucket; returns
    (packed [B, cap_a, 8], n_aln, ovf) as host arrays.  mesh: run the
    machine under shard_map with reads data-parallel over the "dp" axis
    (parallel/mesh.gap_machine_sharded) — the multi-chip analog of
    bwtaln.c:102's static pthread read partition."""
    i32 = np.int32
    state = _init_state(idx, cdt, opt, lens, md, mg, wb0, cap, cap_a,
                        active)
    scalars = (i32(opt.s_mm), i32(opt.s_gapo), i32(opt.s_gape),
               i32(opt.max_gape), i32(opt.max_seed_diff),
               i32(opt.max_entries), i32(opt.max_del_occ),
               i32(opt.indel_end_skip), i32(opt.max_top2),
               i32(opt.seed_len), i32(max_steps))
    kw = dict(cap=cap, cap_a=cap_a, use_seed=use_seed,
              f_gape=bool(opt.mode & BWA_MODE_GAPE),
              f_nonstop=bool(opt.mode & BWA_MODE_NONSTOP),
              f_loggap=bool(opt.mode & BWA_MODE_LOGGAP))
    if mesh is not None:
        from bwa_tpu.parallel.mesh import gap_machine_sharded

        key = ("gap", qc.shape, cap, cap_a) + tuple(sorted(kw.items()))
        cache = getattr(engine, "_mesh_gap", None)
        if cache is None:
            cache = engine._mesh_gap = {}
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = gap_machine_sharded(mesh, **kw)
        out = fn(idx, state, jnp.asarray(qc), jnp.asarray(lens),
                 jnp.asarray(md), jnp.asarray(mg), jnp.asarray(seed_en),
                 sb, scalars)
    else:
        out = gm.gap_machine(
            state, idx, jnp.asarray(qc), jnp.asarray(lens),
            jnp.asarray(md), jnp.asarray(mg), jnp.asarray(seed_en),
            sb, *scalars, **kw)
    d = dict(zip(gm.GAP_KEYS, out))
    packed = jnp.concatenate(
        [d["aln_m"].astype(cdt), d["aln_kl"]], axis=2)
    packed = np.asarray(jax.device_get(packed))
    n_aln = np.asarray(jax.device_get(d["n_aln"]))
    ovf = np.asarray(jax.device_get(d["ovf"]))
    engine.last_steps = (int(jax.device_get(d["steps"])),)
    engine.last_done = (np.asarray(jax.device_get(d["done_step"])),)
    return packed, n_aln, ovf


def _host_fallback(engine, opt: GapOpt, orig_row, qlen, md_i, mg_i):
    """Exactness fallback: the executable spec (aln/search.py) on one
    read, with the chunk-precomputed local opt values."""
    from bwa_tpu.aln.search import cal_width, match_gap

    local = GapOpt(**{k: getattr(opt, k)
                      for k in opt.__dataclass_fields__})
    local.max_diff = int(md_i)
    local.max_gapo = int(mg_i)
    seq = orig_row[:qlen]
    local.seed_len = opt.seed_len if opt.seed_len < qlen else 0x7FFFFFFF
    host = engine.host if hasattr(engine, "host") else engine
    w = cal_width(host, seq)
    seed_w = None
    if qlen > opt.seed_len:
        seed_w = cal_width(host, seq[qlen - opt.seed_len:])
    q = np.where(seq > 3, 4, 3 - seq.astype(np.int32)).astype(np.uint8)
    return match_gap(host, q, w, seed_w, local)


def aln_batch_device(fm, engine, pk, opt: GapOpt):
    """bt_aln_batch's device twin: (out_n, rows) for SaiWriter.
    rows: [tot, 8] int64 = (n_mm, n_gapo, n_gape, score, n_ins, n_del,
    k, l) per alignment, reference order."""
    n = pk.n
    idx = engine.idx
    cdt = fm.coord_dtype
    L, md, mg, orig, qc, seed_en, use_seed, swin, skip = \
        _prep_chunk(pk, opt)
    B = int(os.environ.get("BWA_TPU_ALN_LANES", "4096"))
    cap_a0 = int(os.environ.get("BWA_TPU_ALN_CAPA", "32"))
    caps = [int(c) for c in
            os.environ.get("BWA_TPU_ALN_CAPS", "64,128,256").split(",")]
    max_steps = int(os.environ.get("BWA_TPU_ALN_MAX_STEPS", "200000"))
    lens32 = pk.lens.astype(np.int32)
    results: list = [None] * n
    for lo in range(0, n, B):
        nb = min(B, n - lo)
        Bb = min(B, _pow2(nb, 256))
        pad = Bb - nb
        sl_ = slice(lo, lo + nb)

        def padi(a, fill=0):
            if pad == 0:
                return np.ascontiguousarray(a[sl_])
            return np.concatenate(
                [a[sl_], np.full((pad,) + a.shape[1:], fill, a.dtype)])

        active = padi(~skip).astype(bool)
        active[nb:] = False
        b_qc, b_orig = padi(qc, 4), padi(orig, 4)
        b_lens, b_md, b_mg = padi(lens32, 1), padi(md), padi(mg, 1)
        b_sen = padi(seed_en).astype(bool)
        b_swin = padi(swin, 4)
        wb0 = gm.cal_width_device(idx, jnp.asarray(b_orig.astype(np.int32)),
                                  jnp.asarray(b_lens))
        if use_seed:
            sb = gm.cal_width_device(
                idx, jnp.asarray(b_swin.astype(np.int32)),
                jnp.asarray(np.full(Bb, b_swin.shape[1], np.int32)))
        else:
            sb = jnp.zeros((Bb, 1, 2), cdt)
        todo = active.copy()
        # multi-chip: lanes data-parallel over the engine's dp mesh
        # (lane buckets are pow2-padded, so they divide the mesh)
        mesh = getattr(engine, "mesh", None)
        if mesh is not None and Bb % mesh.devices.size != 0:
            mesh = None
        for ci, cap in enumerate(caps):
            if not todo.any():
                break
            packed, n_aln, ovf = _run_bucket(
                engine, idx, cdt, opt, b_qc, b_lens, b_md, b_mg,
                b_sen, use_seed, wb0, sb, todo, cap,
                cap_a0 * (1 << ci), max_steps, mesh=mesh)
            good = todo & ~ovf
            for bi in np.flatnonzero(good[:nb]):
                cnt = int(n_aln[bi])
                results[lo + bi] = packed[bi, :cnt].astype(np.int64)
            todo = todo & ovf
        for bi in np.flatnonzero(todo[:nb]):
            alns = _host_fallback(engine, opt, b_orig[bi],
                                  int(b_lens[bi]), b_md[bi], b_mg[bi])
            results[lo + bi] = np.array(
                [[a.n_mm, a.n_gapo, a.n_gape, a.score, a.n_ins, a.n_del,
                  a.k, a.l] for a in alns], np.int64).reshape(-1, 8)
    out_n = np.zeros(n, np.int32)
    rows_l = []
    for i in range(n):
        r = results[i]
        if r is None:
            r = np.zeros((0, 8), np.int64)
        out_n[i] = r.shape[0]
        rows_l.append(r)
    rows = np.concatenate(rows_l, axis=0) if rows_l \
        else np.zeros((0, 8), np.int64)
    return out_n, rows
