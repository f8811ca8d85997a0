"""Batch seeding driver: mem_collect_intv (bwamem.c:140-188) over a whole
read batch, with the SMEM/SA state machines on device.

Host drives the pass structure (the lock-step while loops live inside the
jitted kernels in ops/fm.py); numpy handles filtering/appending between
device calls; occurrence SA lookups are batched flat across the batch.
"""

from __future__ import annotations

import os

import numpy as np

from bwa_tpu.mem.ksort import ks_introsort


def _pad_reads(codes_list, L: int) -> tuple[np.ndarray, np.ndarray]:
    B = len(codes_list)
    q = np.full((B, L), 4, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, c in enumerate(codes_list):
        q[i, : len(c)] = c
        lens[i] = len(c)
    return q, lens


# Device programs recompile per shape (and compiles are expensive on this
# backend), so batches are chunked/padded to fixed buckets.  12288 lanes
# measured ~7% faster than 8192 on the 24576-read headline (fewer machine
# dispatches, same seeding/finalize overlap; 24576-in-one was slightly
# worse — straggler lanes).  Sub-bucket batches shrink to the next pow2,
# so smaller workloads are unaffected by the larger default.
BATCH_BUCKET = int(os.environ.get("BWA_TPU_BATCH_BUCKET", "12288"))


def _lane_bucket(L: int, nb: int | None = None) -> int:
    """Lanes per machine call: long reads carry many more steps per lane
    and wider q streams, so shrink the lane count with read length; a
    sub-bucket batch also shrinks to the next power of two (shapes stay
    bounded: one executable per pow2 level per length bucket)."""
    if L <= 256:
        b = BATCH_BUCKET
    elif L <= 512:
        b = BATCH_BUCKET // 2
    elif L <= 1024:
        b = BATCH_BUCKET // 4
    else:
        b = BATCH_BUCKET // 8
    if nb is not None and nb < b:
        b = max(256, 1 << (nb - 1).bit_length())
    return b


def _len_bucket(L: int) -> int:
    return max(64, -(-L // 64) * 64)


def collect_intv_batch(opt, engine, codes_list, cap_s: int = 96) -> list[list[tuple]]:
    """Batched seeding via the fused on-device 3-pass program (one transfer).
    Reads whose seed count overflows cap_s are redone with the scalar host
    spec (exactness fallback).  Returns per-read [(x0, x1, x2, info)]."""
    B = len(codes_list)
    if B == 0:
        return []
    mems: list[list[tuple]] = []
    bucket0 = _lane_bucket(_len_bucket(max(len(c) for c in codes_list)))
    for lo in range(0, B, bucket0):
        chunk = codes_list[lo:lo + bucket0]
        nb = len(chunk)
        L = _len_bucket(max(len(c) for c in chunk))
        bucket = _lane_bucket(L, nb)
        q, lens = _pad_reads(chunk, L)
        if nb < bucket:  # pad the tail chunk to the bucket size
            q = np.concatenate(
                [q, np.full((bucket - nb, L), 4, np.uint8)])
            lens = np.concatenate(
                [lens, np.zeros(bucket - nb, np.int32)])
        s0, s1, s2, ss, se, seed_n = engine.collect_seeds(q, lens, opt, cap_s)
        for b in range(nb):
            n = int(seed_n[b])
            if n > cap_s:  # overflow: redo this read exactly on the host
                from bwa_tpu.mem.seeding import collect_intv

                mems.append(collect_intv(opt, engine.host, chunk[b]))
                continue
            mems.append([
                (int(s0[b, j]), int(s1[b, j]), int(s2[b, j]),
                 (int(ss[b, j]) << 32) | int(se[b, j]))
                for j in range(n)
            ])
    return mems


def _pack_bucket(opt, chunk, cap_s: int):
    """Pack a bucket's reads pack_k per machine lane, separated by an
    ambiguous base: the state machine treats N as a hard boundary in
    every pass, so a packed lane behaves exactly like pack_k independent
    reads while per-lane step totals average out (the tail-utilization
    remedy that keeps ONE executable shape — PERF.md).

    Long reads invert the packing: one read SHARDED over n_shard lanes,
    each covering a slice of the start-cursor range (exact — see
    seed_machine_seg's lane-sharding note); the per-lane serial SMEM
    walk over a 2 kb read was the pacbio seeding floor (91% utilization,
    work-bound).  Returns (q, lens, L, B2, pack_k, cs, shard, n_shard);
    shard is None when unsharded."""
    nb = len(chunk)
    L = _len_bucket(max(len(c) for c in chunk))
    pack_k = int(os.environ.get("BWA_TPU_PACK_K", "2"))
    n_shard = 1
    if L > 256:
        pack_k = 1  # long reads carry enough work per lane already
        max_s = int(os.environ.get("BWA_TPU_SEED_SHARD", "8"))
        n_shard = max(1, min(max_s, _lane_bucket(L) // max(nb, 1)))
    bucket = _lane_bucket(L, nb * n_shard)
    if nb < bucket // (2 * n_shard):
        pack_k = 1
    if n_shard > 1:
        B2 = bucket
        q = np.full((B2, L), 4, np.uint8)
        lens = np.zeros(B2, np.int32)
        job_lo = np.zeros(B2, np.int32)
        hi1 = np.zeros(B2, np.int32)
        hi3 = np.zeros(B2, np.int32)
        for r, c in enumerate(chunk):
            ln = len(c)
            step = -(-ln // n_shard)
            for s in range(n_shard):
                lane = r * n_shard + s
                q[lane, :ln] = c
                lens[lane] = ln
                job_lo[lane] = min(s * step, ln)
                hi1[lane] = min((s + 1) * step, ln) if s < n_shard - 1 \
                    else ln
                hi3[lane] = ln if s == 0 else 0
        return q, lens, L, B2, pack_k, cap_s, (job_lo, hi1, hi3), n_shard
    B2 = bucket // pack_k
    Lp = pack_k * (L + 1)
    q = np.full((B2, Lp), 4, np.uint8)
    lens = np.zeros(B2, np.int32)
    for r in range(pack_k):
        for i in range(B2):
            ridx = r * B2 + i
            if ridx < nb:
                c = chunk[ridx]
                q[i, r * (L + 1):r * (L + 1) + len(c)] = c
                lens[i] = r * (L + 1) + len(c)
    return q, lens, L, B2, pack_k, cap_s * pack_k, None, 1


def _demux_refill(opt, fm, seeds_out, nb):
    """Demux retire-and-refill lanes: the provenance column carries the
    read id, so a global stable lexsort by (read, start, end) restores
    exactly the static path's per-read order (a read lives in one lane;
    its rows leave the device already (start, end, emission)-sorted, and
    np.lexsort's stability preserves that tiebreak)."""
    max_occ = opt.max_occ
    s0, s1, s2, ss, se, sn, tg = seeds_out
    sn_l = sn.astype(np.int64)
    lmask = np.arange(s0.shape[1])[None, :] < sn_l[:, None]
    rid_all = tg[lmask].astype(np.int64)
    start_a = ss[lmask].astype(np.int64)
    end_a = se[lmask].astype(np.int64)
    order = np.lexsort((end_a, start_a, rid_all))
    rid_sorted = rid_all[order]
    k0 = s0[lmask][order].astype(np.int64)
    x2 = s2[lmask][order].astype(np.int64)
    start = start_a[order].astype(np.int32)
    end = end_a[order].astype(np.int32)
    sn_v = np.bincount(rid_sorted, minlength=nb)[:nb]
    counts = np.where(x2 > max_occ, max_occ, x2)
    step = np.where(x2 > max_occ, x2 // max_occ, 1)
    tot = int(counts.sum())
    csum = np.cumsum(counts)
    grp = np.repeat(np.arange(len(counts)), counts)
    within = np.arange(tot, dtype=np.int64) - np.repeat(csum - counts, counts)
    ranks = k0[grp] + step[grp] * within
    rbegs = fm.sa_lookup(ranks)
    iv_off = np.zeros(nb + 1, np.int32)
    iv_off[1:] = np.cumsum(sn_v)
    rb_off = np.zeros(len(counts) + 1, np.int32)
    rb_off[1:] = csum
    return (iv_off, x2, start, end, rbegs, rb_off)


def _se_flat_refill(opt, engine, fm, codes_list, cap_s):
    """se_flat_buckets' retire-and-refill variant (BWA_TPU_SEED_REFILL):
    big read chunks feed a fixed lane pool that draws from a shared
    queue (ops/fm.py collect_seeds_refill); the cap ladder doubles the
    per-lane seed buffer on overflow OR when lanes filled up before the
    queue drained (n_drawn < n)."""
    B = len(codes_list)
    RB = int(os.environ.get("BWA_TPU_REFILL_BUCKET", str(4 * BATCH_BUCKET)))
    los = list(range(0, B, RB))
    pend = {}

    def _dispatch(i):
        lo = los[i]
        chunk = codes_list[lo:lo + RB]
        n = len(chunk)
        L = _len_bucket(max(len(c) for c in chunk))
        lanes = _lane_bucket(L, n)
        if os.environ.get("BWA_TPU_REFILL_LANES"):
            lanes = min(lanes, int(os.environ["BWA_TPU_REFILL_LANES"]))
        q, lens = _pad_reads(chunk, L)
        per_lane = -(-n // lanes)
        cs_tot = max(4 * cap_s, (per_lane + 1) * cap_s)
        h = engine.collect_seeds_refill_dispatch(q, lens, opt, cs_tot,
                                                 cap_s, lanes)
        pend[i] = (h, n, q, lens, lanes, cs_tot)

    _dispatch(0)
    for i, lo in enumerate(los):
        if i + 1 < len(los):
            _dispatch(i + 1)
        h, n, q, lens, lanes, cs_tot = pend.pop(i)
        out, n_drawn = engine.collect_seeds_refill_wait(h)
        if (out[5] > cs_tot).any() or n_drawn < n:
            for mul, sc2 in ((2, 32), (4, 64)):
                cs2 = cs_tot * mul
                out, n_drawn = engine.collect_seeds_refill(
                    q, lens, opt, cs2, cap_s, lanes, stack_cap=sc2)
                cs_tot = cs2
                if not (out[5] > cs2).any() and n_drawn == n:
                    break
            else:
                yield lo, n, None  # exactness fallback (tuple path)
                continue
        yield lo, n, _demux_refill(opt, fm, out, n)


def _demux_bucket(opt, fm, seeds_out, nb, L, B2, cs, n_shard=1):
    """Demux packed lanes back to per-read flat arrays (bucket-local
    offsets).  Rows are sorted by start within a lane, so a stable sort
    by read id keeps order.  SA lookups go through fm.sa_lookup (dense
    sidecar on small genomes, native batch walker at scale).

    Sharded long-read lanes (n_shard > 1) instead re-sort per read by
    (start, end, tag) and drop the cross-lane duplicates: rows equal in
    (read, start, end, provenance tag) are the same SMEM found from two
    shards' ranges; duplicates the reference itself produces differ in
    tag and are kept (ties of (start, end) denote the same interval, so
    any tie order is output-equivalent — ks_introsort on .info is
    unstable too)."""
    max_occ = opt.max_occ
    if n_shard > 1:
        s0, s1, s2, ss, se, sn, tg = seeds_out
        sn_l = sn.astype(np.int64)
        lmask = np.arange(s0.shape[1])[None, :] < sn_l[:, None]
        lane_id = np.broadcast_to(np.arange(B2)[:, None], lmask.shape)[lmask]
        rid_all = lane_id // n_shard
        start_a = ss[lmask].astype(np.int64)
        end_a = se[lmask].astype(np.int64)
        tag_a = tg[lmask].astype(np.int64)
        order = np.lexsort((tag_a, end_a, start_a, rid_all))
        order = order[rid_all[order] < nb]
        key = np.stack([rid_all[order], start_a[order], end_a[order],
                        tag_a[order]], axis=1)
        dup = np.zeros(len(order), bool)
        if len(order) > 1:
            dup[1:] = (key[1:] == key[:-1]).all(axis=1)
        order = order[~dup]
        rid_sorted = rid_all[order]
        k0 = s0[lmask][order].astype(np.int64)
        x2 = s2[lmask][order].astype(np.int64)
        start = start_a[order].astype(np.int32)
        end = end_a[order].astype(np.int32)
        sn_v = np.bincount(rid_sorted, minlength=nb)[:nb]
    else:
        s0, s1, s2, ss, se, sn = seeds_out
        sn_l = sn.astype(np.int64)
        # the seed arrays may come back narrower than cs (D2H width diet
        # slices to a bucketed max(sn)); mask by the actual width
        lmask = np.arange(s0.shape[1])[None, :] < sn_l[:, None]
        lane_id = np.broadcast_to(np.arange(B2)[:, None], lmask.shape)[lmask]
        start_p = ss[lmask].astype(np.int64)
        rslot = start_p // (L + 1)
        read_id = rslot * B2 + lane_id
        order = np.argsort(read_id, kind="stable")
        keep = read_id[order] < nb  # drop pad-lane rows
        order = order[keep]
        rid_sorted = read_id[order]
        k0 = s0[lmask][order].astype(np.int64)
        x2 = s2[lmask][order].astype(np.int64)
        off_p = (rslot * (L + 1))[order].astype(np.int64)
        start = (start_p[order] - off_p).astype(np.int32)
        end = (se[lmask].astype(np.int64)[order] - off_p).astype(np.int32)
        sn_v = np.bincount(rid_sorted, minlength=nb)[:nb]
    counts = np.where(x2 > max_occ, max_occ, x2)
    step = np.where(x2 > max_occ, x2 // max_occ, 1)
    tot = int(counts.sum())
    csum = np.cumsum(counts)
    grp = np.repeat(np.arange(len(counts)), counts)
    within = np.arange(tot, dtype=np.int64) - np.repeat(csum - counts, counts)
    ranks = k0[grp] + step[grp] * within
    rbegs = fm.sa_lookup(ranks)
    iv_off = np.zeros(nb + 1, np.int32)       # per READ
    iv_off[1:] = np.cumsum(sn_v)
    rb_off = np.zeros(len(counts) + 1, np.int32)  # per SEED
    rb_off[1:] = csum
    return (iv_off, x2, start, end, rbegs, rb_off)


def trip_order(opt, engine, codes_list):
    """Trip-sorted antithetic bucket packing (the kt_for work-stealing
    analog, kthread.c:25-61): the seeding machine runs every lane to the
    bucket's slowest lane, and file-order packing measures 36-40% lane
    utilization.  Order reads by the device probe's predicted trip count
    (ops/fm.py probe_breaks, corr 0.97) and arrange each bucket so
    _pack_bucket's lane pairing (slot 0 = chunk[i], slot 1 = chunk[B2+i])
    pairs rank j with rank nb-1-j — lane sums equalize and the bucket's
    max step count drops ~38% (measured: 3505 -> 2184 machine steps on
    the 24576-read headline vs 2169 for oracle trip counts).

    Returns a [B] permutation (position -> original read index) or None
    when gated off.  Byte-identity is order-independent per read; the
    caller must feed ORIGINAL read ids to the finalize for hash_64."""
    mode = os.environ.get("BWA_TPU_TRIP_SORT", "auto")
    if mode == "off" or not hasattr(engine, "probe_trips"):
        return None
    if getattr(engine, "mesh", None) is not None:
        return None  # mesh shards reads over chips; ordering is per-shard
    B = len(codes_list)
    if mode != "force" and B < 4096:
        return None  # probe cost doesn't amortize on small batches
    if mode == "auto" and getattr(engine, "fm", None) is not None \
            and engine.fm.l_pac < 200_000_000:
        # The probe is a SERIAL device pass (~0.1 s/batch) before any
        # bucket can seed.  On small genomes trips/read are few, seeding
        # overlaps host finalize anyway, and the probe is a net LOSS
        # (measured quiet-window 24576-read headline A/B: off 28.6k vs
        # on 25.2k reads/s).  At GRCh38 scale trips/read are ~10x and
        # seeding dominates: on wins both same-window 100k-stream pairs
        # (steady 1263 vs 1111 clean, 979 vs 914 contended).  Gate auto
        # on big genomes only.
        return None
    L = _len_bucket(max(len(c) for c in codes_list))
    if L > 256:
        return None  # long reads are lane-sharded (91% utilization)
    pred = engine.probe_trips(codes_list)
    perm = np.argsort(pred, kind="stable").astype(np.int64)
    pack_k = int(os.environ.get("BWA_TPU_PACK_K", "2"))
    bucket0 = _lane_bucket(L)
    nbk = (B + bucket0 - 1) // bucket0
    if nbk > 1:
        # deal sorted ranks round-robin across buckets: consecutive-rank
        # chunks concentrate ALL the hard reads in the last bucket, which
        # skews the per-bucket host-finalize cost and the seeding/finalize
        # overlap; dealing keeps every bucket an even difficulty mix while
        # the antithetic pairing below still equalizes lane sums (total
        # machine steps are ~unchanged either way — lane sums ~ 2x mean)
        sizes = [min(bucket0, B - b * bucket0) for b in range(nbk)]
        assign = [[] for _ in range(nbk)]
        bi = 0
        for r in range(B):
            while len(assign[bi]) >= sizes[bi]:
                bi = (bi + 1) % nbk
            assign[bi].append(perm[r])
            bi = (bi + 1) % nbk
        perm = np.concatenate([np.asarray(a, np.int64) for a in assign])
    out = np.empty(B, np.int64)
    for lo in range(0, B, bucket0):
        s = perm[lo:lo + bucket0]
        nb = len(s)
        bucket = _lane_bucket(L, nb)
        k = 1 if nb < bucket // 2 else pack_k
        if k == 2:
            B2 = bucket // 2
            n1 = min(B2, nb)
            out[lo:lo + n1] = s[:n1]
            if nb > B2:
                # slot-1 positions B2..nb-1 get ranks nb-1 down to B2
                out[lo + B2:lo + nb] = s[nb - 1:B2 - 1:-1]
        else:
            out[lo:lo + nb] = s
    return out


def se_flat_buckets(opt, engine, fm, codes_list, cap_s: int = 24,
                    row_ids=None):
    """Generator yielding (lo, nb, flat | None) per bucket, with the NEXT
    bucket's device seeding dispatched before this bucket's host demux —
    the kt_pipeline analog (kthread.c:119-147): the chip seeds bucket k+1
    while the host demuxes/finalizes bucket k.  flat arrays use
    bucket-local offsets; None = exactness fallback (seed-cap overflow
    even at the roomy retry cap) — redo that bucket via the tuple path.

    row_ids: original-batch row index per entry of codes_list (set by the
    trip_order caller).  When the engine still holds the probe's
    device-resident batch matrix, buckets pack their lanes by DEVICE
    gather (collect_seeds_dispatch_gather) instead of re-uploading q."""
    B = len(codes_list)
    if B == 0:
        return
    Lg = _len_bucket(max(len(c) for c in codes_list))
    if (os.environ.get("BWA_TPU_SEED_REFILL")
            and Lg <= 256
            and hasattr(engine, "collect_seeds_refill_dispatch")
            and getattr(engine, "mesh", None) is None):
        yield from _se_flat_refill(opt, engine, fm, codes_list, cap_s)
        return
    can_async = hasattr(engine, "collect_seeds_dispatch") and \
        os.environ.get("BWA_TPU_SEED_MACHINE", "unified") != "split" and \
        not os.environ.get("BWA_TPU_SEED_COMPACT")
    use_gather = (row_ids is not None and can_async and Lg <= 256
                  and hasattr(engine, "collect_seeds_dispatch_gather")
                  and engine.qdev_batch() == B
                  and int(os.environ.get("BWA_TPU_PACK_K", "2")) == 2)
    bucket0 = _lane_bucket(Lg)
    los = list(range(0, B, bucket0))
    packed = {}

    def _dispatch(idx):
        lo = los[idx]
        chunk = codes_list[lo:lo + bucket0]
        nb = len(chunk)
        if use_gather:
            bucket = _lane_bucket(Lg, nb)
            B2 = bucket // 2
            if nb >= B2:  # the k=2 regime _pack_bucket would pick
                rid = np.asarray(row_ids[lo:lo + nb], np.int32)
                pa = rid[:B2]
                pb = np.full(B2, -1, np.int32)
                pb[:nb - B2] = rid[B2:nb]
                la = np.array([len(c) for c in chunk[:B2]], np.int32)
                qlen = la.copy()
                lb = np.array([len(c) for c in chunk[B2:nb]], np.int32)
                qlen[:nb - B2] = (Lg + 1) + lb
                h = engine.collect_seeds_dispatch_gather(
                    pa, pb, qlen, opt, 2 * cap_s)
                # host q/lens deferred: only the (rare) retry ladder
                # needs them — rebuilt from chunk there
                packed[idx] = (None, None, Lg, B2, 2, 2 * cap_s, None, 1,
                               h, nb, chunk)
                return
        q, lens, L, B2, pack_k, cs, shard, ns = _pack_bucket(opt, chunk,
                                                             cap_s)
        h = engine.collect_seeds_dispatch(q, lens, opt, cs, shard=shard) \
            if can_async else None
        packed[idx] = (q, lens, L, B2, pack_k, cs, shard, ns, h, nb, None)

    _dispatch(0)
    for idx, lo in enumerate(los):
        if idx + 1 < len(los):
            _dispatch(idx + 1)  # next bucket's seeding in flight
        q, lens, L, B2, pack_k, cs, shard, ns, h, nb, chunk = \
            packed.pop(idx)
        out = engine.collect_seeds_wait(h) if h is not None \
            else engine.collect_seeds(q, lens, opt, cs, shard=shard)
        if (out[5] > cs).any():
            # seed-rich / deep-stack bucket (repeat regions): climb a
            # cap ladder on DEVICE before any host fallback — on a
            # GRCh38-scale repeat genome the host-spec redo was 90% of
            # the whole alignment wall time
            if q is None:  # gather-mode bucket: rebuild host lanes
                q, lens, L, B2, pack_k, cs0, shard, ns = _pack_bucket(
                    opt, chunk, cap_s)
            for cs2, sc2 in ((96 * pack_k, 32), (256 * pack_k, 64)):
                cs = cs2
                out = engine.collect_seeds(q, lens, opt, cs2,
                                           stack_cap=sc2, shard=shard)
                if not (out[5] > cs2).any():
                    break
            else:
                yield lo, nb, None  # exactness fallback (tuple path)
                continue
        yield lo, nb, _demux_bucket(opt, fm, out, nb, L, B2, cs, ns)


def _reorder_flat(flat, order):
    """Gather the per-read segments of permuted-order flat seed arrays
    back into ORIGINAL read order (trip-sorted seeding, original-order
    finalize — the PE pipeline consumes reads pairwise in file order)."""
    iv_off, x2, start, end, rbegs, rb_off = flat
    B = len(order)
    inv = np.empty(B, np.int64)
    inv[order] = np.arange(B)
    cnt_o = (iv_off[1:] - iv_off[:-1]).astype(np.int64)[inv]
    new_iv_off = np.zeros(B + 1, np.int32)
    new_iv_off[1:] = np.cumsum(cnt_o)
    tot = int(new_iv_off[-1])
    ramp = np.arange(tot, dtype=np.int64) - np.repeat(
        new_iv_off[:-1].astype(np.int64), cnt_o)
    g = np.repeat(iv_off[:-1].astype(np.int64)[inv], cnt_o) + ramp
    rb_cnt = (rb_off[1:] - rb_off[:-1]).astype(np.int64)[g]
    new_rb_off = np.zeros(tot + 1, np.int32)
    new_rb_off[1:] = np.cumsum(rb_cnt)
    rtot = int(new_rb_off[-1])
    rramp = np.arange(rtot, dtype=np.int64) - np.repeat(
        new_rb_off[:-1].astype(np.int64), rb_cnt)
    rg = np.repeat(rb_off[:-1].astype(np.int64)[g], rb_cnt) + rramp
    return (new_iv_off, x2[g], start[g], end[g], rbegs[rg], new_rb_off)


def collect_se_flat(opt, engine, fm, codes_list, cap_s: int = 24,
                    order=None):
    """Whole-batch flat seed arrays (batch-global offsets) — the PE path
    and callers that need one finalize over everything.  Returns None if
    any bucket overflows (caller uses the tuple path).

    order: optional trip_order permutation — seeding runs in permuted
    order (lane utilization), but the returned arrays are gathered back
    to ORIGINAL read order, so callers are order-agnostic."""
    B = len(codes_list)
    if B == 0:
        return None
    src = codes_list if order is None else [codes_list[j] for j in order]
    iv_off = [np.zeros(1, np.int32)]
    iv_x2, iv_start, iv_end, rbegs, rb_off = [], [], [], [], \
        [np.zeros(1, np.int32)]
    iv_base = 0
    rb_base = 0
    for lo, nb, flat in se_flat_buckets(opt, engine, fm, src, cap_s,
                                        row_ids=order):
        if flat is None:
            return None
        o_iv, x2, start, end, rb, o_rb = flat
        iv_x2.append(x2)
        iv_start.append(start)
        iv_end.append(end)
        rbegs.append(rb)
        iv_off.append((iv_base + o_iv[1:]).astype(np.int32))
        rb_off.append((rb_base + o_rb[1:]).astype(np.int32))
        iv_base += int(o_iv[-1])
        rb_base += int(o_rb[-1])
    out = (np.concatenate(iv_off),
           np.concatenate(iv_x2) if iv_x2 else np.zeros(0, np.int64),
           np.concatenate(iv_start) if iv_start else np.zeros(0, np.int32),
           np.concatenate(iv_end) if iv_end else np.zeros(0, np.int32),
           np.concatenate(rbegs) if rbegs else np.zeros(0, np.int64),
           np.concatenate(rb_off))
    return out if order is None else _reorder_flat(out, order)


def collect_intv_batch_unfused(opt, engine, codes_list) -> list[list[tuple]]:
    """Host-driven variant (one device call per pass step); kept as a
    cross-check for the fused program."""
    B = len(codes_list)
    if B == 0:
        return []
    L = max(len(c) for c in codes_list)
    cap = L + 2
    q, lens = _pad_reads(codes_list, L)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    mems: list[list[tuple]] = [[] for _ in range(B)]

    # ---- pass 1: all SMEMs, advancing x per read ----
    x = np.zeros(B, dtype=np.int32)
    ones = np.ones(B, dtype=np.int64)
    while True:
        # skip ambiguous bases on host (cheap; matches the x+=1 branch)
        live = x < lens
        while True:
            amb = live & (q[np.arange(B), np.minimum(x, L - 1)] >= 4)
            if not amb.any():
                break
            x[amb] += 1
            live = x < lens
        active = x < lens
        if not active.any():
            break
        ret, m0, m1, m2, ms, me, mem_n = engine.smem_pass(
            q, lens, x, ones, 0, active, cap)
        for b in np.nonzero(active)[0]:
            n = int(mem_n[b])
            # reference reverses mems (sorted by start)
            for j in range(n - 1, -1, -1):
                slen = int(me[b, j]) - int(ms[b, j])
                if slen >= opt.min_seed_len:
                    info = (int(ms[b, j]) << 32) | int(me[b, j])
                    mems[b].append((int(m0[b, j]), int(m1[b, j]),
                                    int(m2[b, j]), info))
        x = np.where(active, ret, x).astype(np.int32)

    # ---- pass 2: re-seed long unique SMEMs from their midpoints ----
    jobs = []  # (read, x, min_intv)
    for b in range(B):
        for iv in list(mems[b]):
            start, end = iv[3] >> 32, iv[3] & 0xFFFFFFFF
            if end - start < split_len or iv[2] > opt.split_width:
                continue
            jobs.append((b, (start + end) >> 1, iv[2] + 1))
    if jobs:
        jb = np.array([j[0] for j in jobs], dtype=np.int32)
        jx = np.array([j[1] for j in jobs], dtype=np.int32)
        jm = np.array([j[2] for j in jobs], dtype=np.int64)
        qj = q[jb]
        lj = lens[jb]
        act = np.ones(len(jobs), dtype=bool)
        ret, m0, m1, m2, ms, me, mem_n = engine.smem_pass(
            qj, lj, jx, jm, 0, act, cap)
        for t, b in enumerate(jb):
            n = int(mem_n[t])
            for j in range(n - 1, -1, -1):
                if int(me[t, j]) - int(ms[t, j]) >= opt.min_seed_len:
                    info = (int(ms[t, j]) << 32) | int(me[t, j])
                    mems[b].append((int(m0[t, j]), int(m1[t, j]),
                                    int(m2[t, j]), info))

    # ---- pass 3: LAST-like seeding ----
    if opt.max_mem_intv > 0:
        x = np.zeros(B, dtype=np.int32)
        while True:
            live = x < lens
            while True:
                amb = live & (q[np.arange(B), np.minimum(x, L - 1)] >= 4)
                if not amb.any():
                    break
                x[amb] += 1
                live = x < lens
            active = x < lens
            if not active.any():
                break
            ret, found, r0, r1, r2, s0, s1 = engine.seed3_pass(
                q, lens, x, opt.min_seed_len, opt.max_mem_intv, active)
            for b in np.nonzero(active & found)[0]:
                if int(r2[b]) > 0:
                    info = (int(s0[b]) << 32) | int(s1[b])
                    mems[b].append((int(r0[b]), int(r1[b]), int(r2[b]), info))
            x = np.where(active, ret, x).astype(np.int32)

    for b in range(B):
        ks_introsort(mems[b], lambda a, c: a[3] < c[3])
    return mems


def occurrence_positions(opt, engine, mems_list):
    """For every read's intervals, the sampled occurrence SA rows and their
    reference positions (the bwt_sa calls of mem_chain, bwamem.c:304-309),
    batched flat across the batch.  Returns per-read {k: rbeg} dicts."""
    flat_ks = []
    owners = []
    for b, mems in enumerate(mems_list):
        for iv in mems:
            step = iv[2] // opt.max_occ if iv[2] > opt.max_occ else 1
            k = 0
            count = 0
            while k < iv[2] and count < opt.max_occ:
                flat_ks.append(iv[0] + k)
                owners.append(b)
                k += step
                count += 1
    if not flat_ks:
        return [dict() for _ in mems_list]
    ks = np.asarray(flat_ks, dtype=np.int64)
    pos = engine.sa_many(ks)
    caches = [dict() for _ in mems_list]
    for b, k, p in zip(owners, flat_ks, pos):
        caches[b][int(k)] = int(p)
    return caches


class CachedSeedEngine:
    """Per-read view consumed by the (host) chain stage: precomputed
    SA lookups + pass-through reference fetch."""

    def __init__(self, fm, sa_cache: dict):
        self.fm = fm
        self._sa = sa_cache

    def sa(self, k: int) -> int:
        return self._sa[int(k)]

    def fetch_seq(self, beg, mid, end):
        return self.fm.fetch_seq(beg, mid, end)
