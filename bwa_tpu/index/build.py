"""FM-index construction: FASTA -> .pac/.ann/.amb/.bwt/.sa.

Byte-compatible with `bwa index` output (bwtindex.c:255-323, bwt.c:385-407),
but built the modern way: one 64-bit SA-IS pass over the doubled text
(native/sais.cpp) replaces the reference's three construction algorithms
(is.c, bwt_gen.c/QSufSort.c blockwise, rope.c rb2) and the O(n) invPsi walk
of bwt_cal_sa (bwt.c:62-84) -- the suffix array is already in hand, so the
sampled SA is a strided gather.
"""

from __future__ import annotations

import logging

import numpy as np

from bwa_tpu.index.pack import fasta2bnt, write_pac, write_ann_amb
from bwa_tpu.native.build import suffix_array

log = logging.getLogger(__name__)

OCC_INTERVAL = 128  # bases per occ checkpoint (bwt.h:37-39)
SA_INTV = 32        # suffix-array sampling interval (bwtindex.c:316)


def bwt_from_sa(code2: np.ndarray, sa: np.ndarray) -> tuple[np.ndarray, int]:
    """BWT string (sentinel removed) + primary index, from the suffix array.

    Row model: row 0 is the empty suffix (SA value n); rows 1..n are the
    text suffixes in sorted order.  primary = rank of the row whose SA
    value is 0 (the $-row of the BWT); the BWT char of that row is the
    sentinel and is dropped (is.c:208-222 semantics).
    """
    n = code2.shape[0]
    primary = int(np.nonzero(sa == 0)[0][0]) + 1
    rows = np.empty(n + 1, dtype=sa.dtype)
    rows[0] = n
    rows[1:] = sa
    chars = code2[(rows - 1)[rows != 0]]  # T[row-1] for every non-$ row
    return chars.astype(np.uint8), primary


def pack_bwt_words(bwt_str: np.ndarray) -> np.ndarray:
    """Pack the BWT string 16 bases/uint32, base i at bits (15-(i&15))*2
    (bwtindex.c:121-123)."""
    n = bwt_str.shape[0]
    n_words = (n + 15) // 16
    padded = np.zeros(n_words * 16, dtype=np.uint32)
    padded[:n] = bwt_str
    q = padded.reshape(-1, 16)
    shifts = np.arange(15, -1, -1, dtype=np.uint32) * 2
    return (q << shifts[None, :]).sum(axis=1, dtype=np.uint32)


def occ_checkpoints(bwt_str: np.ndarray) -> np.ndarray:
    """Cumulative base counts at every OCC_INTERVAL boundary, plus the final
    total: shape [n_ckpt, 4] uint64, n_ckpt = ceil(n/128)+1
    (bwt_bwtupdate_core, bwtindex.c:150-172)."""
    n = bwt_str.shape[0]
    n_ckpt = (n + OCC_INTERVAL - 1) // OCC_INTERVAL + 1
    onehot = np.zeros((n, 4), dtype=np.uint64)
    onehot[np.arange(n), bwt_str] = 1
    csum = np.zeros((n + 1, 4), dtype=np.uint64)
    np.cumsum(onehot, axis=0, out=csum[1:])
    idx = np.minimum(np.arange(n_ckpt, dtype=np.int64) * OCC_INTERVAL, n)
    return csum[idx]


def interleave_bwt(bwt_words: np.ndarray, ckpt: np.ndarray, n: int) -> np.ndarray:
    """On-disk interleaved uint32 stream: per 128-base block, 4 uint64
    counts (8 words) then up to 8 bwt words; trailing checkpoint at the end
    (layout macros bwt.h:73-80)."""
    n_words = bwt_words.shape[0]
    n_ckpt = ckpt.shape[0]
    total = n_words + n_ckpt * 8
    out = np.empty(total, dtype=np.uint32)
    ckpt32 = ckpt.astype(np.uint64).view(np.uint32).reshape(n_ckpt, 8)
    pos = 0
    wpos = 0
    for j in range(n_ckpt - 1):
        out[pos:pos + 8] = ckpt32[j]
        pos += 8
        take = min(8, n_words - wpos)
        out[pos:pos + take] = bwt_words[wpos:wpos + take]
        pos += take
        wpos += take
    out[pos:pos + 8] = ckpt32[-1]
    pos += 8
    assert pos == total and wpos == n_words
    return out


def write_bwt_file(path, primary: int, L2: np.ndarray, interleaved: np.ndarray) -> None:
    with open(path, "wb") as f:
        np.uint64(primary).tofile(f)
        L2[1:5].astype(np.uint64).tofile(f)
        interleaved.tofile(f)


def write_sa_file(path, primary: int, L2: np.ndarray, sa_intv: int,
                  seq_len: int, sa_samples: np.ndarray) -> None:
    """.sa layout per bwt_dump_sa (bwt.c:396-407): header then samples[1:]."""
    with open(path, "wb") as f:
        np.uint64(primary).tofile(f)
        L2[1:5].astype(np.uint64).tofile(f)
        np.uint64(sa_intv).tofile(f)
        np.uint64(seq_len).tofile(f)
        sa_samples[1:].astype(np.uint64).tofile(f)


def index_build(fasta_path, prefix=None) -> str:
    """Equivalent of `bwa index <fasta>`: writes prefix.{pac,ann,amb,bwt,sa}."""
    prefix = str(prefix if prefix is not None else fasta_path)
    log.info("packing FASTA %s", fasta_path)
    bnt, fwd = fasta2bnt(fasta_path)
    write_pac(prefix + ".pac", fwd)
    write_ann_amb(prefix, bnt)

    # doubled text: forward + reverse complement (bntseq.c:306-312)
    code2 = np.concatenate([fwd, (3 - fwd)[::-1]])
    n = code2.shape[0]
    log.info("building suffix array over %d bases (SA-IS)", n)
    sa = suffix_array(code2)

    log.info("deriving BWT + occ checkpoints")
    bwt_str, primary = bwt_from_sa(code2, sa)
    counts = np.bincount(code2, minlength=4).astype(np.uint64)
    L2 = np.zeros(5, dtype=np.uint64)
    np.cumsum(counts, out=L2[1:])
    words = pack_bwt_words(bwt_str)
    ckpt = occ_checkpoints(bwt_str)
    interleaved = interleave_bwt(words, ckpt, n)
    write_bwt_file(prefix + ".bwt", primary, L2, interleaved)

    # sampled SA: value of row j*32 in the (n+1)-row model
    n_sa = (n + SA_INTV) // SA_INTV
    rows_sa = np.empty(n + 1, dtype=np.int64)
    rows_sa[0] = n
    rows_sa[1:] = sa
    samples = rows_sa[np.arange(n_sa, dtype=np.int64) * SA_INTV]
    write_sa_file(prefix + ".sa", primary, L2, SA_INTV, n, samples)
    write_sad_sidecar(prefix, rows_sa, n)
    log.info("index written to %s.*", prefix)
    return prefix


# genomes up to this doubled-text size get a dense rank->position sidecar
SAD_MAX_LEN = 1 << 28


def write_sad_sidecar(prefix: str, rows_sa: np.ndarray, n: int) -> None:
    """Dense SA sidecar `<prefix>.sad.npy` (our own acceleration file; the
    reference-format .sa stays byte-identical).  sad[k] is exactly what the
    bwt_sa walk returns for rank k — in particular sad[0] = -1, matching
    the reference's bwt->sa[0] = (bwtint_t)-1 (bwt.c:77-84) — so dense
    lookup and the 31-step inverse-Psi walk are interchangeable."""
    if n + 1 > SAD_MAX_LEN:
        return
    cdt = np.int32 if n + 2 < 2**31 else np.int64
    sad = rows_sa.astype(cdt, copy=True)
    sad[0] = -1
    np.save(prefix + ".sad.npy", sad)


def read_bwt_file(path):
    """Parse a .bwt file -> (primary, L2[5], seq_len, ckpt[n_ckpt,4] uint64,
    words[n_blocks,8] uint32 zero-padded)."""
    raw = np.fromfile(path, dtype=np.uint8)
    head = raw[:40].view(np.uint64)
    primary = int(head[0])
    L2 = np.zeros(5, dtype=np.uint64)
    L2[1:5] = head[1:5]
    seq_len = int(L2[4])
    data = raw[40:].view(np.uint32)
    n_ckpt = (seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL + 1
    n_words = (seq_len + 15) // 16
    assert data.shape[0] == n_words + n_ckpt * 8, "inconsistent bwt size"
    n_blocks = n_ckpt - 1
    ckpt = np.empty((n_ckpt, 4), dtype=np.uint64)
    words = np.zeros((max(n_blocks, 1), 8), dtype=np.uint32)
    pos = 0
    wpos = 0
    for j in range(n_blocks):
        ckpt[j] = data[pos:pos + 8].view(np.uint64)
        pos += 8
        take = min(8, n_words - wpos)
        words[j, :take] = data[pos:pos + take]
        pos += take
        wpos += take
    ckpt[-1] = data[pos:pos + 8].view(np.uint64)
    return primary, L2, seq_len, ckpt, words


def read_sa_file(path, primary: int, seq_len: int, coord_dtype=np.int64):
    raw = np.fromfile(path, dtype=np.uint64)
    assert int(raw[0]) == primary, "SA-BWT inconsistency: primary differs"
    sa_intv = int(raw[5])
    assert int(raw[6]) == seq_len, "SA-BWT inconsistency: seq_len differs"
    n_sa = (seq_len + sa_intv) // sa_intv
    samples = np.empty(n_sa, dtype=np.int64)
    samples[0] = -1  # bwt.c:437: sa[0] is poisoned; row 0 is never sampled at
    samples[1:] = raw[7:7 + n_sa - 1].astype(np.int64)
    return sa_intv, samples.astype(coord_dtype)
