"""`fastmap` — SMEM dumper, line-compatible with the reference
(main_fastmap, fastmap.c:408-483).  The minimal end-to-end slice of the
FM-index service: SMEM generation + SA lookup + coordinate mapping.
"""

from __future__ import annotations

import numpy as np

from bwa_tpu.index.fmindex import FMIndex
from bwa_tpu.index.pack import NT4_TABLE


def smem_iter(engine, q: np.ndarray, min_intv: int = 1, max_intv: int = 0,
              max_len: int = 2**31 - 1):
    """Yield SMEM batches like smem_next (bwamem_extra.c:86-96).

    engine: an object with .smem1a(q, x, min_intv, max_intv) — HostFM or the
    batched device engine's single-read adapter.
    """
    start, length = 0, len(q)
    while True:
        while start < length and q[start] > 3:
            start += 1
        if start >= length:
            return
        start, mems = engine.smem1a(q, start, min_intv, max_intv)
        yield mems


def fastmap_lines(fm: FMIndex, engine, name: str, seq: bytes,
                  min_iwidth: int = 20, min_len: int = 17, print_seq: bool = False,
                  min_intv: int = 1, max_intv: int = 0) -> list[str]:
    out = []
    if print_seq:
        out.append(f"SQ\t{name}\t{len(seq)}\t{seq.decode()}")
    else:
        out.append(f"SQ\t{name}\t{len(seq)}")
    q = NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)]
    for mems in smem_iter(engine, q, min_intv, max_intv):
        for (x0, x1, x2, info) in mems:
            start, end = info >> 32, info & 0xFFFFFFFF
            if end - start < min_len:
                continue
            line = f"EM\t{start}\t{end}\t{x2}"
            if x2 <= min_iwidth:
                for k in range(x2):
                    length = end - start
                    pos = engine.sa(x0 + k)
                    pos_f, is_rev = fm.bnt.depos(pos)
                    if is_rev:
                        pos_f -= length - 1
                    rid = fm.bnt.pos2rid(pos_f)
                    strand = "-" if is_rev else "+"
                    line += (f"\t{fm.bnt.contigs[rid].name}:{strand}"
                             f"{pos_f - fm.bnt.contigs[rid].offset + 1}")
            else:
                line += "\t*"
            out.append(line)
    out.append("//")
    return out
