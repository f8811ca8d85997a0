"""Drivers for aln/samse (bwtaln.c:159-228, bwase.c:507-577)."""

from __future__ import annotations

import sys

import numpy as np

from bwa_tpu.aln import samse as se
from bwa_tpu.aln.opts import BWA_AVG_ERR, GapOpt, cal_maxdiff
from bwa_tpu.aln.sai import SaiReader, SaiWriter
from bwa_tpu.aln.search import cal_width, match_gap
from bwa_tpu.aln.seqio import open_reads, read_bt_seqs
from bwa_tpu.index.fmindex import FMIndex
from bwa_tpu.io.fastq import SeqReader
from bwa_tpu.utils.rand48 import Rand48

CHUNK = 0x40000


def aln_core(prefix, fn_fa, opt: GapOpt, out_fp) -> None:
    """bwa aln: compute SA intervals, write .sai."""
    fm = FMIndex.load(prefix)
    from bwa_tpu.engine import make_engine

    engine = make_engine(fm, "host")  # scalar spec; device frontier later
    reader = open_reads(opt.mode, fn_fa)
    writer = SaiWriter(out_fp, opt)
    tot = 0
    while True:
        seqs = read_bt_seqs(reader, CHUNK, opt.mode, opt.trim_qual)
        if not seqs:
            break
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
