"""The mem pipeline driver: mem_align1_core / worker1 / worker2 /
mem_process_seqs (bwamem.c:1081-1264).

Host orchestration; the seeding/SA/extension engines are pluggable
(scalar host spec or batched TPU).
"""

from __future__ import annotations

import logging

import numpy as np

from bwa_tpu.index.pack import NT4_TABLE
from bwa_tpu.mem import chain as chain_mod
from bwa_tpu.mem.extend import chain2aln
from bwa_tpu.mem.primary import mark_primary_se, reorder_primary5, sort_dedup_patch
from bwa_tpu.mem.sam import reg2sam
from bwa_tpu.mem.seeding import collect_intv
from bwa_tpu.mem.types import MemAlnReg, Read
from bwa_tpu.options import MEM_F_PE, MEM_F_PRIMARY5

log = logging.getLogger(__name__)


def align1_core(opt, engine, fm, seq_codes: np.ndarray,
                mems=None) -> list[MemAlnReg]:
    """mem_align1_core (bwamem.c:1081-1117): one read -> alignment regions.
    mems may be precomputed by the batch seeder; engine provides .sa and
    .fetch_seq."""
    q = seq_codes
    if mems is None:
        mems = collect_intv(opt, engine, q)
    chains = chain_mod.chain(opt, engine, fm.bnt, q, mems)
    chains = chain_mod.chain_flt(opt, chains)
    chain_mod.flt_chained_seeds(opt, fm, q, chains)
    regs: list[MemAlnReg] = []
    for c in chains:
        chain2aln(opt, fm, q, c, regs)
    regs = sort_dedup_patch(opt, fm, q, regs)
    for p in regs:
        if p.rid >= 0 and fm.bnt.contigs[p.rid].is_alt:
            p.is_alt = 1
    return regs


def to_codes(seq: bytes) -> np.ndarray:
    return NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)]


def to_codes_batch(reads) -> list[np.ndarray]:
    """One table lookup for the whole batch; returns per-read views."""
    if not reads:
        return []
    flat = NT4_TABLE[np.frombuffer(b"".join(r.seq for r in reads),
                                   dtype=np.uint8)]
    out = []
    pos = 0
    for r in reads:
        ln = len(r.seq)
        out.append(flat[pos:pos + ln])
        pos += ln
    return out


def _batch_align(opt, engine, fm, codes):
    """worker1 over the batch: seeds (device, batched) then per-read
    chaining/extension."""
    if hasattr(engine, "smem_pass"):
        from bwa_tpu.mem.batch_seed import (CachedSeedEngine,
                                            collect_intv_batch,
                                            occurrence_positions)

        mems_list = collect_intv_batch(opt, engine, codes)
        caches = occurrence_positions(opt, engine, mems_list)
        return [
            align1_core(opt, CachedSeedEngine(fm, caches[i]), fm, codes[i],
                        mems=mems_list[i])
            for i in range(len(codes))
        ]
    return [align1_core(opt, engine, fm, c) for c in codes]


def bseq_classify(reads: list[Read]):
    """bseq_classify (bwa.c:114-130): split a name-interleaved stream into
    unpaired reads and adjacent same-name pairs."""
    sep = [[], []]
    has_last = True
    i = 1
    n = len(reads)
    while i < n:
        if has_last:
            if reads[i].name == reads[i - 1].name:
                sep[1].append(reads[i - 1])
                sep[1].append(reads[i])
                has_last = False
            else:
                sep[0].append(reads[i - 1])
        else:
            has_last = True
        i += 1
    if has_last and n:
        sep[0].append(reads[n - 1])
    return sep


def process_seqs_smart(opt, engine, fm, reads, n_processed, pes0, rg_id):
    """The -p smart-pairing path (fastmap.c:90-109)."""
    import copy

    sep = bseq_classify(reads)
    if sep[0]:
        o = copy.copy(opt)
        o.flag = opt.flag & ~MEM_F_PE
        process_seqs(o, engine, fm, sep[0], n_processed, None, rg_id)
    if sep[1]:
        o = copy.copy(opt)
        o.flag = opt.flag | MEM_F_PE
        process_seqs(o, engine, fm, sep[1], n_processed + len(sep[0]),
                     pes0, rg_id)


def _collect_batch(opt, engine, fm, codes):
    """Batch seeding + occurrence positions (device when available)."""
    from bwa_tpu.mem.batch_seed import collect_intv_batch, occurrence_positions

    if hasattr(engine, "smem_pass"):
        mems_list = collect_intv_batch(opt, engine, codes)
    else:
        mems_list = [collect_intv(opt, engine, c) for c in codes]
    caches = occurrence_positions(opt, engine, mems_list)
    return mems_list, caches


def _flatten_tuple_seeds(opt, mems_list, caches):
    """Tuple-path seeds -> the flat arrays the C++ finalize consumes."""
    n = len(mems_list)
    iv_off = np.zeros(n + 1, np.int32)
    iv_x2, iv_start, iv_end, rbegs, rb_off = [], [], [], [], [0]
    for i, mems in enumerate(mems_list):
        iv_off[i + 1] = iv_off[i] + len(mems)
        for iv in mems:
            iv_x2.append(iv[2])
            iv_start.append(iv[3] >> 32)
            iv_end.append(iv[3] & 0xFFFFFFFF)
            step = iv[2] // opt.max_occ if iv[2] > opt.max_occ else 1
            k = 0
            count = 0
            cache = caches[i]
            while k < iv[2] and count < opt.max_occ:
                rbegs.append(cache[iv[0] + k])
                k += step
                count += 1
            rb_off.append(len(rbegs))
    return (iv_off, np.array(iv_x2, np.int64), np.array(iv_start, np.int32),
            np.array(iv_end, np.int32), np.array(rbegs, np.int64),
            np.array(rb_off, np.int32))


def _use_device_ext(engine, codes) -> bool:
    """Route chain2aln extensions through the banded Pallas kernel?
    Round-4 measured the device path losing everywhere (3.3x program-swap
    thrash on short reads; ~7x on pacbio from the speculative
    all-(chain,seed) job table computing ~20x the consumed extensions).
    Round 5 STAGED it — only the first-in-chain jobs run on device, the
    rare consumed miss falls back to the inline scalar DP (memfin.cpp) —
    and the staged fused program now BEATS host extension on the pacbio
    bench (2.73 vs 2.95 s same-window, byte-identical, PERF.md r5).
    Default "auto": device for long-read batches (>= 512 bp, where one
    extension program serves the whole batch), host for short reads
    (extension is ~4% of wall there and the swap cost is not).
    BWA_TPU_EXT=host|device force either path."""
    import os

    mode = os.environ.get("BWA_TPU_EXT", "auto")
    if mode == "host" or not codes or not hasattr(engine, "dev"):
        return False
    if mode == "device":
        return True
    # auto only engages on a real accelerator: on the CPU backend the
    # Pallas path is an exactness artifact at interpret-ish speed (the
    # explicit =device tests cover it)
    try:
        import jax

        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:
        return False
    return max(len(c) for c in codes) >= 512


def process_seqs(opt, engine, fm, reads: list[Read], n_processed: int = 0,
                 pes0=None, rg_id: str | None = None) -> None:
    """mem_process_seqs (bwamem.c:1235-1264): fills read.sam."""
    import os

    codes = to_codes_batch(reads)
    use_native = os.environ.get("BWA_TPU_FINALIZE", "native") == "native"
    dev_ext = _use_device_ext(engine, codes)
    if (opt.flag & MEM_F_PE) and use_native and reads:
        # PE fast path: rescue/pairing/SAM in the C++ extension
        from bwa_tpu.mem.native_fin import RefBlob, finalize_pe_arrays

        if not hasattr(fm, "_ref_blob"):
            fm._ref_blob = RefBlob(fm)
        flat = None
        if hasattr(engine, "collect_seeds"):
            from bwa_tpu.mem.batch_seed import collect_se_flat, trip_order

            flat = collect_se_flat(opt, engine, fm, codes,
                                   order=trip_order(opt, engine, codes))
        if flat is None:
            mems_list, caches = _collect_batch(opt, engine, fm, codes)
            flat = _flatten_tuple_seeds(opt, mems_list, caches)
        sams = finalize_pe_arrays(opt, fm, fm._ref_blob, reads, codes,
                                  *flat, n_processed, pes0, rg_id,
                                  device_ext=dev_ext)
        for r, s in zip(reads, sams):
            r.sam = s
        return
    if not (opt.flag & MEM_F_PE) and not (opt.flag & MEM_F_PRIMARY5) \
            and use_native:
        # SE fast path: post-seeding pipeline in the C++ extension, bucket
        # by bucket — bucket k's host finalize runs while bucket k+1 seeds
        # on the chip (the kt_pipeline read/align overlap analog,
        # kthread.c:119-147; SE output is per-read so bucketing is
        # output-invariant, hash_64 ids use the global read index)
        from bwa_tpu.mem.native_fin import (RefBlob, finalize_se_arrays,
                                            finalize_se_batch)

        if not hasattr(fm, "_ref_blob"):
            fm._ref_blob = RefBlob(fm)
        if hasattr(engine, "collect_seeds"):
            from bwa_tpu.mem.batch_seed import se_flat_buckets, trip_order

            # trip-sorted bucket packing (batch_seed.trip_order): reads
            # flow through seeding in predicted-trip order so packed
            # lanes finish together; SAM scatters back to file order and
            # hash_64 ids stay the ORIGINAL read indices — output is
            # byte-identical to the unsorted path.
            order = trip_order(opt, engine, codes)
            src = codes if order is None else [codes[j] for j in order]
            for lo, nb, flat in se_flat_buckets(opt, engine, fm, src,
                                                row_ids=order):
                ix = (np.arange(lo, lo + nb, dtype=np.int64)
                      if order is None else order[lo:lo + nb])
                rd = [reads[j] for j in ix]
                cd = [codes[j] for j in ix]
                ids = n_processed + ix
                if flat is not None:
                    sams = finalize_se_arrays(
                        opt, fm, fm._ref_blob, rd, cd, *flat,
                        0, rg_id, device_ext=dev_ext, ids=ids)
                else:  # exactness fallback for an overflowing bucket
                    mems_list, caches = _collect_batch(opt, engine, fm, cd)
                    sams = finalize_se_batch(
                        opt, fm, fm._ref_blob, rd, cd,
                        mems_list, caches, 0, rg_id,
                        device_ext=dev_ext, ids=ids)
                for j, s in zip(ix, sams):
                    reads[j].sam = s
        else:
            mems_list, caches = _collect_batch(opt, engine, fm, codes)
            sams = finalize_se_batch(opt, fm, fm._ref_blob, reads, codes,
                                     mems_list, caches, n_processed, rg_id)
            for r, s in zip(reads, sams):
                r.sam = s
        return
    regs = _batch_align(opt, engine, fm, codes)
    if opt.flag & MEM_F_PE:
        from bwa_tpu.mem.pairing import sam_pe, pestat

        pes = pes0 if pes0 is not None else pestat(opt, fm.l_pac, regs)
        for i in range(len(reads) >> 1):
            sam_pe(opt, fm, pes, (n_processed >> 1) + i,
                   reads[i * 2:i * 2 + 2], codes[i * 2:i * 2 + 2],
                   regs[i * 2:i * 2 + 2], rg_id)
    else:
        for i, r in enumerate(reads):
            mark_primary_se(opt, regs[i], n_processed + i)
            if opt.flag & MEM_F_PRIMARY5:
                reorder_primary5(opt.T, regs[i])
            r.sam = reg2sam(opt, fm, r, codes[i], regs[i], 0, None, rg_id)
