"""Library API: the equivalent of example.c + mem_align1 (bwamem_extra.c:102).

>>> from bwa_tpu.api import Aligner
>>> a = Aligner("ref.fa")
>>> for hit in a.align(b"ACGT..."):
...     print(hit.rid, hit.pos, hit.cigar_str, hit.mapq, hit.NM)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from bwa_tpu.engine import make_engine
from bwa_tpu.index.fmindex import FMIndex
from bwa_tpu.mem.cigar import reg2aln
from bwa_tpu.mem.pipeline import align1_core, to_codes
from bwa_tpu.mem.primary import mark_primary_se
from bwa_tpu.options import MemOptions
from bwa_tpu.utils.rand48 import Rand48

_CIG = "MIDSH"


@dataclass
class Hit:
    rid: int
    ref_name: str
    pos: int
    is_rev: bool
    mapq: int
    score: int
    NM: int
    cigar: list
    secondary: bool

    @property
    def cigar_str(self) -> str:
        return "".join(f"{ln}{_CIG[op]}" for op, ln in self.cigar)


class Aligner:
    def __init__(self, index_prefix, opt: MemOptions | None = None,
                 engine: str = "host"):
        self.fm = FMIndex.load(index_prefix)
        self.opt = opt or MemOptions()
        self.engine = make_engine(self.fm, engine)
        self._rng = Rand48(0)  # mem_align1 uses lrand48() for the hash id

    def align(self, seq: bytes) -> list[Hit]:
        """Align one read; returns its hits (primary first)."""
        codes = to_codes(seq)
        regs = align1_core(self.opt, self.engine, self.fm, codes)
        mark_primary_se(self.opt, regs, self._rng.lrand48())
        hits = []
        for reg in regs:
            if reg.score < self.opt.T:
                continue
            a = reg2aln(self.opt, self.fm, len(codes), codes, reg)
            hits.append(Hit(rid=a.rid,
                            ref_name=self.fm.bnt.contigs[a.rid].name,
                            pos=a.pos, is_rev=bool(a.is_rev), mapq=a.mapq,
                            score=a.score, NM=a.NM, cigar=a.cigar,
                            secondary=reg.secondary >= 0))
        return hits
