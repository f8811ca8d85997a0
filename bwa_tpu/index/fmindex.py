"""FM-index container: host (numpy) and device (jnp) views.

Device layout is re-tiled for TPU gathers instead of the reference's single
interleaved uint32 stream (bwt.h:73-80): checkpoints and 2-bit text words
become separate arrays

    ckpt  [n_ckpt, 4]   coord dtype (int32 when 2*l_pac < 2^31 else int64)
    words [n_blocks, 8] uint32      (128 bases per block, 16 per word)
    ssa   [n_sa]        coord dtype (sampled suffix array, interval 32)
    pac   [l_pac/4+1]   uint8       (packed forward reference)

One gather of (ckpt[j], words[j]) + SWAR popcounts reproduces bwt_occ4
exactly (bwt.c:169-186).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

from bwa_tpu.index.build import read_bwt_file, read_sa_file, index_build
from bwa_tpu.index.pack import Bnt, read_ann_amb, load_pac, unpack_pac


@dataclass
class FMIndex:
    primary: int
    L2: np.ndarray          # [5] int64 cumulative counts
    seq_len: int            # 2 * l_pac
    ckpt: np.ndarray        # [n_ckpt, 4] coord dtype
    words: np.ndarray       # [n_blocks, 8] uint32
    sa_intv: int
    ssa: np.ndarray         # [n_sa] coord dtype
    bnt: Bnt
    pac: np.ndarray         # packed forward ref, uint8
    prefix: str | None = None

    @property
    def l_pac(self) -> int:
        return self.bnt.l_pac

    @property
    def coord_dtype(self):
        return np.int32 if self.seq_len + 2 < 2**31 else np.int64

    @classmethod
    def load(cls, prefix) -> "FMIndex":
        """Attach from shared memory when staged (bwa shm analog,
        fastmap.c:362-366 probes shm first), else read the index files."""
        from bwa_tpu import shm as shm_mod

        fm = shm_mod.shm_attach(str(prefix))
        if fm is not None:
            import sys

            print("[M::bwa_idx_load_from_shm] load the bwa index from "
                  "shared memory", file=sys.stderr)
            return fm
        return cls.load_from_disk(prefix)

    @classmethod
    def load_from_disk(cls, prefix) -> "FMIndex":
        import os

        prefix = str(prefix)
        # bwa_idx_infer_prefix (bwa.c:245-269): prefer the .64 variant
        if os.path.exists(prefix + ".64.bwt"):
            prefix = prefix + ".64"
        primary, L2, seq_len, ckpt, words = read_bwt_file(prefix + ".bwt")
        bnt = read_ann_amb(prefix)
        assert seq_len == 2 * bnt.l_pac
        cdt = np.int32 if seq_len + 2 < 2**31 else np.int64
        sa_intv, ssa = read_sa_file(prefix + ".sa", primary, seq_len, cdt)
        pac = load_pac(prefix, bnt.l_pac)
        return cls(primary=primary, L2=L2.astype(np.int64), seq_len=seq_len,
                   ckpt=ckpt.astype(cdt), words=words, sa_intv=sa_intv,
                   ssa=ssa, bnt=bnt, pac=pac, prefix=prefix)

    @classmethod
    def build(cls, fasta_path, prefix=None) -> "FMIndex":
        return cls.load(index_build(fasta_path, prefix))

    @classmethod
    def build_in_memory(cls, fwd_codes: np.ndarray,
                        name: str = "ref") -> "FMIndex":
        """Construct a full index from forward 2-bit codes without file IO
        (used by the graft entry / benches)."""
        from bwa_tpu.index.build import (SA_INTV, bwt_from_sa,
                                         occ_checkpoints, pack_bwt_words)
        from bwa_tpu.index.pack import Contig, pack_codes
        from bwa_tpu.native.build import suffix_array

        fwd = np.ascontiguousarray(fwd_codes, dtype=np.uint8)
        code2 = np.concatenate([fwd, (3 - fwd)[::-1]])
        n = code2.shape[0]
        sa = suffix_array(code2)
        bwt_str, primary = bwt_from_sa(code2, sa)
        counts = np.bincount(code2, minlength=4).astype(np.int64)
        L2 = np.zeros(5, dtype=np.int64)
        np.cumsum(counts, out=L2[1:])
        words_flat = pack_bwt_words(bwt_str)
        n_blocks = (n + 127) // 128
        words = np.zeros((n_blocks, 8), dtype=np.uint32)
        words.reshape(-1)[: words_flat.shape[0]] = words_flat
        ckpt = occ_checkpoints(bwt_str)
        n_sa = (n + SA_INTV) // SA_INTV
        rows_sa = np.empty(n + 1, dtype=np.int64)
        rows_sa[0] = n
        rows_sa[1:] = sa
        ssa = rows_sa[np.arange(n_sa, dtype=np.int64) * SA_INTV].copy()
        ssa[0] = -1
        cdt = np.int32 if n + 2 < 2**31 else np.int64
        bnt = Bnt(l_pac=len(fwd), seed=11,
                  contigs=[Contig(name=name, anno="(null)", offset=0,
                                  length=len(fwd), n_ambs=0)],
                  holes=[])
        pac_full = pack_codes(fwd)
        pac = np.zeros(len(fwd) // 4 + 1, dtype=np.uint8)
        pac[: pac_full.shape[0]] = pac_full[: pac.shape[0]]
        fmi = cls(primary=primary, L2=L2, seq_len=n,
                  ckpt=ckpt.astype(cdt), words=words, sa_intv=SA_INTV,
                  ssa=ssa.astype(cdt), bnt=bnt, pac=pac)
        sad = rows_sa.astype(cdt, copy=True)
        sad[0] = -1
        fmi.__dict__["sad"] = sad
        return fmi

    @cached_property
    def sad(self):
        """Dense rank->position SA (the .sad.npy sidecar) or None; turns
        every bwt_sa batch into one fancy-index on the host."""
        if self.prefix:
            import os

            p = self.prefix + ".sad.npy"
            if os.path.exists(p):
                return np.load(p, mmap_mode="r")
        return None

    def sa_lookup(self, ranks: np.ndarray) -> np.ndarray:
        """Batched SA rank -> position (bwt_sa, bwt.c:86-96 semantics,
        incl. the rank-0 -1 poison).  Dense sidecar when present (small
        genomes: one fancy-index); otherwise the native C++ inverse-Psi
        walker (bsw2.cpp fm_sa_batch) — the GRCh38-scale path, where the
        dense rank table would be 50 GB."""
        ranks = np.asarray(ranks, dtype=np.int64)
        sad = self.sad
        if sad is not None:
            return np.asarray(sad[ranks], dtype=np.int64)
        if not hasattr(self, "_sw2idx"):
            from bwa_tpu.sw2.core import Sw2Index

            self._sw2idx = Sw2Index(self)
        return self._sw2idx.sa_batch(ranks)

    @cached_property
    def occ_inter(self) -> np.ndarray:
        """64-byte-aligned interleaved occ blocks for the native search
        engines: per 128 bases, 4 int64 counts + 8 uint32 text words =
        exactly one cache line (the reference's bwt.h:73-80 layout
        rationale — the split ckpt/words arrays cost two misses per occ
        and made the native searches memory-bound)."""
        n_blocks = self.words.shape[0]
        raw = np.zeros(n_blocks * 64 + 64, np.uint8)
        off = (-raw.ctypes.data) % 64
        buf = raw[off:off + n_blocks * 64].reshape(n_blocks, 64)
        buf[:, :32] = np.ascontiguousarray(
            self.ckpt[:n_blocks].astype(np.int64)).view(np.uint8).reshape(
                n_blocks, 32)
        buf[:, 32:] = np.ascontiguousarray(self.words).view(
            np.uint8).reshape(n_blocks, 32)
        return buf

    @cached_property
    def pac_codes(self) -> np.ndarray:
        """Unpacked forward reference codes (uint8, 0..3)."""
        return unpack_pac(self.pac, self.l_pac)

    def get_seq(self, beg: int, end: int) -> np.ndarray:
        """Reference subsequence on the doubled coordinate system, with
        on-the-fly reverse complement (bns_get_seq, bntseq.c:403-424)."""
        if end < beg:
            beg, end = end, beg
        end = min(end, self.seq_len)
        beg = max(beg, 0)
        if beg >= self.l_pac:  # reverse strand
            beg_f = self.seq_len - end
            end_f = self.seq_len - beg
            return (3 - self.pac_codes[beg_f:end_f])[::-1]
        if end <= self.l_pac:
            return self.pac_codes[beg:end]
        return np.zeros(0, dtype=np.uint8)  # bridges the fwd/rev boundary

    def fetch_seq(self, beg: int, mid: int, end: int):
        """bns_fetch_seq (bntseq.c:426-451): clamp [beg,end) to the contig
        containing mid; returns (seq, rb, re, rid)."""
        if end < beg:
            beg, end = end, beg
        pos_f, is_rev = self.bnt.depos(mid)
        rid = self.bnt.pos2rid(pos_f)
        c = self.bnt.contigs[rid]
        far_beg, far_end = c.offset, c.offset + c.length
        if is_rev:
            far_beg, far_end = (self.seq_len - (c.offset + c.length),
                                self.seq_len - c.offset)
        beg = max(beg, far_beg)
        end = min(end, far_end)
        seq = self.get_seq(beg, end)
        assert seq.shape[0] == end - beg
        return seq, beg, end, rid


class DeviceFMIndex:
    """jnp view of an FMIndex (created lazily; one per process).

    light=True uploads only what the seeding machine reads (the fused
    occtab + scalars + a 1-row ckpt/words stub for dtype plumbing): at
    GRCh38 scale the full set (ckpt 1.5 GB + words 1.5 GB + ssa 1.5 GB
    + pac 0.8 GB on top of the 1.65 GB occtab) costs ~100 s of H2D over
    the tunnel and none of it is touched by the production path (SA
    walks and extension run host-native)."""

    def __init__(self, fm: FMIndex, light: bool = False):
        import jax.numpy as jnp

        self.fm = fm
        cdt = fm.coord_dtype
        self.primary = int(fm.primary)
        self.seq_len = int(fm.seq_len)
        self.l_pac = int(fm.l_pac)
        self.sa_intv = int(fm.sa_intv)
        self.light = bool(light)
        self.L2 = jnp.asarray(fm.L2.astype(cdt))
        n_ck = 1 if light else fm.ckpt.shape[0]
        n_w = 1 if light else fm.words.shape[0]
        self.ckpt = jnp.asarray(fm.ckpt[:n_ck])
        self.words = jnp.asarray(fm.words[:n_w])
        self.ssa = None if light else jnp.asarray(fm.ssa)
        self.pac = None if light else jnp.asarray(fm.pac)
        self.coord_dtype = cdt

    def tree(self):
        """The pytree of device arrays consumed by jitted FM ops."""
        import jax.numpy as jnp

        cdt = self.coord_dtype
        t = dict(
            primary=jnp.asarray(self.primary, cdt),
            seq_len=jnp.asarray(self.seq_len, cdt),
            l_pac=jnp.asarray(self.l_pac, cdt),
            L2=self.L2,
            ckpt=self.ckpt,
            words=self.words,
            sa_intv=jnp.asarray(self.sa_intv, cdt),
        )
        if not self.light:
            t["ssa"] = self.ssa
            t["pac"] = self.pac
        occtab = self.occtab()
        if occtab is not None:
            t["occtab"] = occtab
        elif self.light:
            raise RuntimeError("light DeviceFMIndex requires the fused "
                               "occtab (counts exceed uint32?)")
        return t

    def occ_retile(self) -> int:
        """Device occ re-tile factor R: each occtab row covers R disk
        blocks (R*128 bases).  Fewer, fatter rows cut the dominant cost of
        the seeding while body at large genomes — the per-row gather from
        a big HBM table is latency-bound (~constant per ROW, PERF.md
        step-cost model), while the extra per-row popcount work is
        elementwise and fuses for free.  Auto by table size: keep small
        genomes at R=1 (their table gathers are already near the floor,
        and XLA can keep a small table in VMEM)."""
        import os

        env = os.environ.get("BWA_TPU_OCC_R")
        if env:
            return int(env)
        n_blocks = self.words.shape[0]
        if n_blocks <= (1 << 16):  # <= ~8 Mbp doubled text
            return 1
        return 4  # measured best at 64 Mbp: R=1 2.17s, R=4 1.61s, R=8 1.97s

    def occtab(self):
        """Fused [n_rows, 4 + 8R] uint32 (counts || 2-bit text words)
        device table: one gather per occ4 position fetches the checkpoint
        AND the text block (each separate dynamic gather inside the
        seeding while body costs ~40us/step — PERF.md).  Counts are
        stored uint32 even when coords are int64: per-base counts stay
        below 2^32 for any genome under ~8 Gbp, so GRCh38 (6.2e9 doubled)
        fits; _occ4 widens back to the coord dtype after the gather."""
        import numpy as np
        import jax.numpy as jnp

        fm = self.fm
        if int(fm.ckpt.max(initial=0)) >= 2**32:
            return None
        R = self.occ_retile()
        n_blocks = fm.words.shape[0]
        n_rows = (n_blocks + R - 1) // R
        words = np.zeros((n_rows * R, 8), np.uint32)
        words[:n_blocks] = fm.words
        words = words.reshape(n_rows, 8 * R)
        counts = fm.ckpt[: n_rows * R: R].astype(np.uint32)
        if counts.shape[0] < n_rows:  # ckpt has n_blocks+1 rows; pad safe
            counts = np.concatenate(
                [counts, fm.ckpt[-1:].astype(np.uint32)])
        return jnp.asarray(np.concatenate([counts, words], axis=1))
