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


def align1_core(opt, engine, fm, seq_codes: np.ndarray) -> list[MemAlnReg]:
    """mem_align1_core (bwamem.c:1081-1117): one read -> alignment regions."""
    q = seq_codes
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


def process_seqs(opt, engine, fm, reads: list[Read], n_processed: int = 0,
                 pes0=None, rg_id: str | None = None) -> None:
    """mem_process_seqs (bwamem.c:1235-1264): fills read.sam."""
    if opt.flag & MEM_F_PE:
        from bwa_tpu.mem.pairing import sam_pe, pestat

        codes = [to_codes(r.seq) for r in reads]
        regs = [align1_core(opt, engine, fm, c) for c in codes]
        pes = pes0 if pes0 is not None else pestat(opt, fm.l_pac, regs)
        for i in range(len(reads) >> 1):
            sam_pe(opt, fm, pes, (n_processed >> 1) + i,
                   reads[i * 2:i * 2 + 2], codes[i * 2:i * 2 + 2],
                   regs[i * 2:i * 2 + 2], rg_id)
    else:
        for i, r in enumerate(reads):
            codes = to_codes(r.seq)
            regs = align1_core(opt, engine, fm, codes)
            mark_primary_se(opt, regs, n_processed + i)
            if opt.flag & MEM_F_PRIMARY5:
                reorder_primary5(opt.T, regs)
            r.sam = reg2sam(opt, fm, r, codes, regs, 0, None, rg_id)
