"""Drivers for aln/samse (bwtaln.c:159-228, bwase.c:507-577)."""

from __future__ import annotations

import sys

import numpy as np

from bwa_tpu.aln import samse as se
from bwa_tpu.aln.opts import BWA_AVG_ERR, GapOpt, cal_maxdiff
from bwa_tpu.aln.sai import SaiReader, SaiWriter
from bwa_tpu.aln.search import Aln1, cal_width, match_gap
from bwa_tpu.aln.seqio import open_reads, read_bt_seqs
from bwa_tpu.index.fmindex import FMIndex
from bwa_tpu.utils.rand48 import Rand48

CHUNK = 0x40000


def _aln_batch_native(fm, seqs, opt: GapOpt):
    """Batch bt_aln_batch (native/btgap.cpp) call; returns per-read
    list[Aln1] — same results as the Python spec below."""
    import ctypes

    import numpy as np

    from bwa_tpu.native.build import get_lib
    from bwa_tpu.sw2.core import Sw2Index

    lib = get_lib()
    if not getattr(lib, "_btgap_sig", False):
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        c = ctypes.c_int32
        lib.bt_aln_batch.restype = ctypes.c_int64
        lib.bt_aln_batch.argtypes = [
            i64p, u32p, ctypes.c_int64, ctypes.c_int64, i64p,
            u8p, i64p, c, i32p, i32p, i32p,
            c, c, c, c, c, c, c, c, c, c,
            i32p, i64p, ctypes.c_int64]
        lib._btgap_sig = True
    if not hasattr(fm, "_sw2idx"):
        fm._sw2idx = Sw2Index(fm)
    idx = fm._sw2idx
    n = len(seqs)
    seq_off = np.zeros(n + 1, np.int64)
    for i, p in enumerate(seqs):
        seq_off[i + 1] = seq_off[i] + p.len
    flat = np.concatenate([np.asarray(p.seq[:p.len], np.uint8)
                           for p in seqs]) if n else np.zeros(0, np.uint8)
    flat = np.ascontiguousarray(flat, np.uint8)
    md = np.zeros(n, np.int32)
    mg = np.zeros(n, np.int32)
    sl = np.zeros(n, np.int32)
    # local_opt lives OUTSIDE the read loop in the reference
    # (bwtaln.c:88-101), so the max_gapo clamp is sticky across the batch
    mg_run = opt.max_gapo
    for i, p in enumerate(seqs):
        d = (cal_maxdiff(p.len, BWA_AVG_ERR, opt.fnr)
             if opt.fnr > 0.0 else opt.max_diff)
        md[i] = d
        if d < mg_run:
            mg_run = d
        mg[i] = mg_run
        sl[i] = opt.seed_len if opt.seed_len < p.len else 0x7FFFFFFF
    out_n = np.zeros(n, np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    cap = max(1 << 16, 64 * n)
    while True:
        rec = np.zeros(cap, np.int64)
        tot = lib.bt_aln_batch(
            idx.ckpt64.ctypes.data_as(i64p),
            idx.words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int64(fm.seq_len), ctypes.c_int64(fm.primary),
            idx.L2.ctypes.data_as(i64p),
            flat.ctypes.data_as(u8p), seq_off.ctypes.data_as(i64p), n,
            md.ctypes.data_as(i32p), mg.ctypes.data_as(i32p),
            sl.ctypes.data_as(i32p),
            opt.s_mm, opt.s_gapo, opt.s_gape, opt.max_gape,
            opt.max_seed_diff, opt.max_entries, opt.max_del_occ,
            opt.indel_end_skip, opt.max_top2, opt.mode,
            out_n.ctypes.data_as(i32p), rec.ctypes.data_as(i64p), cap)
        if tot <= cap:
            break
        cap = int(tot)
    out = []
    pos = 0
    for i in range(n):
        cnt = int(out_n[i])
        rows = rec[pos:pos + cnt * 8].reshape(cnt, 8)
        out.append([Aln1(n_mm=int(r[0]), n_gapo=int(r[1]), n_gape=int(r[2]),
                         score=int(r[3]), n_ins=int(r[4]), n_del=int(r[5]),
                         k=int(r[6]), l=int(r[7])) for r in rows])
        pos += cnt * 8
    return out


def aln_core(prefix, fn_fa, opt: GapOpt, out_fp) -> None:
    """bwa aln: compute SA intervals, write .sai."""
    import os

    fm = FMIndex.load(prefix)
    from bwa_tpu.engine import make_engine

    engine = make_engine(fm, "host")  # exactness fallback / cross-check
    use_native = os.environ.get("BWA_TPU_ALN", "native") == "native"
    reader = open_reads(opt.mode, fn_fa)
    writer = SaiWriter(out_fp, opt)
    tot = 0
    while True:
        seqs = read_bt_seqs(reader, CHUNK, opt.mode, opt.trim_qual)
        if not seqs:
            break
        if use_native:
            for alns in _aln_batch_native(fm, seqs, opt):
                writer.write_read(alns)
            tot += len(seqs)
            print(f"[bwa_aln_core] {tot} sequences have been processed.",
                  file=sys.stderr)
            continue
        local = GapOpt(**{k: getattr(opt, k) for k in opt.__dataclass_fields__})
        for p in seqs:
            if opt.fnr > 0.0:
                local.max_diff = cal_maxdiff(p.len, BWA_AVG_ERR, opt.fnr)
            if local.max_diff < local.max_gapo:
                local.max_gapo = local.max_diff
            local.seed_len = opt.seed_len if opt.seed_len < p.len else 0x7FFFFFFF
            w = cal_width(engine, p.seq)
            seed_w = None
            if p.len > opt.seed_len:
                seed_w = cal_width(engine, p.seq[p.len - opt.seed_len:])
            # complement in place (bwtaln.c:116-117): seq becomes revcomp
            q = np.where(p.seq > 3, 4, 3 - p.seq).astype(np.uint8)
            alns = match_gap(engine, q, w,
                             None if p.len <= opt.seed_len else seed_w, local)
            writer.write_read(alns)
        tot += len(seqs)
        print(f"[bwa_aln_core] {tot} sequences have been processed.",
              file=sys.stderr)


def samse_core(prefix, fn_sa, fn_fa, n_occ, rg_id, rg_line, out) -> None:
    """bwa samse (bwase.c:507-577)."""
    from bwa_tpu.cli import _hdr_lines
    from bwa_tpu.engine import make_engine
    from bwa_tpu import __version__

    se.initialize()
    fm = FMIndex.load(prefix)
    engine = make_engine(fm, "host")
    rng = Rand48(fm.bnt.seed)
    with open(fn_sa, "rb") as fp_sa:
        sai = SaiReader(fp_sa)
        opt = sai.opt
        pg = f"@PG\tID:bwa\tPN:bwa-tpu\tVN:{__version__}\tCL:bwa-tpu samse"
        out.write(_hdr_lines(fm.bnt, rg_line, pg))
        reader = open_reads(opt.mode, fn_fa)
        while True:
            seqs = read_bt_seqs(reader, CHUNK, opt.mode, opt.trim_qual)
            if not seqs:
                break
            for p in seqs:
                alns = sai.read_read()
                se.aln2seq_core(alns, p, rng, True, n_occ)
            se.cal_pac_pos(fm, engine, seqs, opt.max_diff, opt.fnr)
            se.refine_gapped(fm, seqs)
            for p in seqs:
                se.print_sam1(fm, p, None, opt.mode, opt.max_top2, rg_id, out)
