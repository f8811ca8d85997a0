"""Deterministic synthetic genomes and reads for testing/benching.

The reference repo ships no test data (SURVEY.md §4); we synthesize genomes
with a fixed numpy seed and simulate reads by extraction + mutation, then
use the locally compiled reference bwa as the oracle.
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(n: int, seed: int = 7, n_contigs: int = 2,
                  with_ns: bool = True) -> list[tuple[str, bytes]]:
    rng = np.random.default_rng(seed)
    sizes = rng.multinomial(n, np.ones(n_contigs) / n_contigs)
    out = []
    for ci, size in enumerate(sizes):
        codes = rng.integers(0, 4, size=size)
        seq = BASES[codes].copy()
        if with_ns and size > 200:
            for _ in range(max(1, size // 5000)):
                start = int(rng.integers(0, size - 50))
                ln = int(rng.integers(1, 30))
                seq[start:start + ln] = ord("N")
        out.append((f"ctg{ci}", seq.tobytes()))
    return out


def write_fasta(path, contigs, width: int = 70):
    with open(path, "w") as f:
        for name, seq in contigs:
            f.write(f">{name}\n")
            s = seq.decode()
            for i in range(0, len(s), width):
                f.write(s[i:i + width] + "\n")


_COMP = dict(zip(b"ACGTN", b"TGCAN"))


def revcomp(seq: bytes) -> bytes:
    return bytes(_COMP[c] for c in reversed(seq))


def simulate_reads(contigs, n_reads: int, read_len: int = 150, seed: int = 13,
                   err_rate: float = 0.005, indel_rate: float = 0.0002,
                   paired: bool = False, insert_mean: int = 350,
                   insert_std: int = 40):
    """Extract reads with substitutions and occasional indels.

    Returns a list of (name, seq_bytes, qual_bytes); paired mode yields
    interleaved-ready two-file lists (r1, r2).
    """
    rng = np.random.default_rng(seed)
    genome = b"".join(s for _, s in contigs)
    glen = len(genome)

    def mutate(seq: np.ndarray) -> np.ndarray:
        seq = seq.copy()
        sub = rng.random(seq.shape[0]) < err_rate
        if sub.any():
            repl = BASES[rng.integers(0, 4, size=int(sub.sum()))]
            seq[sub] = repl
        if indel_rate > 0 and rng.random() < indel_rate * seq.shape[0]:
            pos = int(rng.integers(1, seq.shape[0] - 1))
            if rng.random() < 0.5:
                seq = np.delete(seq, pos)
                seq = np.append(seq, BASES[rng.integers(0, 4)])
            else:
                seq = np.insert(seq, pos, BASES[rng.integers(0, 4)])[:-1]
        return seq

    quals = b"I" * read_len
    if not paired:
        reads = []
        for i in range(n_reads):
            start = int(rng.integers(0, glen - read_len))
            frag = np.frombuffer(genome[start:start + read_len], dtype=np.uint8)
            frag = mutate(frag)[:read_len]
            seq = frag.tobytes()
            if rng.random() < 0.5:
                seq = revcomp(seq)
            reads.append((f"r{i}", seq, quals[:len(seq)]))
        return reads

    r1s, r2s = [], []
    for i in range(n_reads):
        isize = max(read_len + 10, int(rng.normal(insert_mean, insert_std)))
        start = int(rng.integers(0, max(1, glen - isize)))
        frag = genome[start:start + isize]
        left = np.frombuffer(frag[:read_len], dtype=np.uint8)
        right = np.frombuffer(revcomp(frag[-read_len:]), dtype=np.uint8)
        s1 = mutate(left)[:read_len].tobytes()
        s2 = mutate(right)[:read_len].tobytes()
        if rng.random() < 0.5:
            s1, s2 = s2, s1
        r1s.append((f"p{i}", s1, quals[:len(s1)]))
        r2s.append((f"p{i}", s2, quals[:len(s2)]))
    return r1s, r2s


def write_fastq(path, reads):
    with open(path, "w") as f:
        for name, seq, qual in reads:
            f.write(f"@{name}\n{seq.decode()}\n+\n{qual.decode()}\n")


# ---------------------------------------------------------------------------
# GRCh38-scale synthetic genome (streamed writer: never holds the genome)
# ---------------------------------------------------------------------------

def write_big_fasta(path, total_bp: int, n_chrom: int = 24, n_alt: int = 2,
                    seed: int = 31, line: int = 70):
    """Streamed GRCh38-scale genome: n_chrom main contigs sized like a
    karyotype, a shared repeat library pasted throughout (exercises
    max_occ/repeat truncation), N holes every few Mbp, and n_alt ALT
    contigs that are mutated copies of chr1's head.  Writes <path> and
    <path>.alt (ALT contig names, bntseq.c:178-209 format).  Returns
    [(name, length, is_alt)]."""
    rng = np.random.default_rng(seed)
    # repeat library: ~40 elements, 300..20k bp (alpha-satellite-ish mix)
    lib = [rng.integers(0, 4, int(l), dtype=np.uint8)
           for l in np.exp(rng.uniform(np.log(300), np.log(20000), 40))]
    # chromosome sizes ~ linear ramp like a karyotype
    w = np.linspace(2.0, 0.5, n_chrom)
    sizes = (w / w.sum() * total_bp).astype(np.int64)
    chunk_bp = (1 << 23) // line * line  # ~8 Mbp, whole lines
    spec = []
    alt_src = None
    with open(path, "wb") as f:
        for ci in range(n_chrom):
            name = f"chr{ci + 1}"
            size = int(sizes[ci])
            f.write(f">{name}\n".encode())
            left = size
            first = True
            while left > 0:
                m = min(chunk_bp, left)
                codes = rng.integers(0, 4, m, dtype=np.uint8)
                # paste repeats: ~1 element per 50 kbp
                for _ in range(max(1, m // 50_000)):
                    el = lib[int(rng.integers(0, len(lib)))]
                    if el.shape[0] < m:
                        off = int(rng.integers(0, m - el.shape[0]))
                        codes[off:off + el.shape[0]] = el
                # one N hole per ~4 Mbp
                for _ in range(max(0, m // 4_000_000)):
                    hl = int(rng.integers(50, 2000))
                    off = int(rng.integers(0, max(1, m - hl)))
                    codes[off:off + hl] = 4
                if first and ci == 0 and alt_src is None:
                    alt_src = codes[:2_000_000].copy()
                first = False
                _write_wrapped(f, codes, line, final=(m == left))
                left -= m
            spec.append((name, size, False))
        for ai in range(n_alt):
            name = f"chr1_alt{ai + 1}"
            alt = alt_src.copy()
            sub = rng.random(alt.shape[0]) < 0.015
            alt[sub] = ((alt[sub] + rng.integers(1, 4, int(sub.sum()),
                                                 dtype=np.uint8)) % 4)
            f.write(f">{name}\n".encode())
            _write_wrapped(f, alt, line, final=True)
            spec.append((name, int(alt.shape[0]), True))
    with open(str(path) + ".alt", "w") as f:
        for name, ln, is_alt in spec:
            if is_alt:
                f.write(f"{name}\t0\t*\t0\t0\n")
    return spec


_B5 = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _write_wrapped(f, codes: np.ndarray, line: int, final: bool):
    """ASCII-ify codes (0..4 -> ACGTN) and write line-wrapped.  Non-final
    chunks must be whole lines."""
    ascii_ = _B5[codes]
    n = ascii_.shape[0]
    full = n // line * line
    if full:
        block = np.empty((full // line, line + 1), np.uint8)
        block[:, :line] = ascii_[:full].reshape(-1, line)
        block[:, line] = ord("\n")
        f.write(block.tobytes())
    rem = ascii_[full:]
    if rem.shape[0]:
        assert final, "non-final chunk must be whole lines"
        f.write(rem.tobytes() + b"\n")


def simulate_reads_stream(fa_path, n_reads: int, read_len: int = 150,
                          seed: int = 13, err_rate: float = 0.005,
                          paired: bool = False, insert_mean: int = 350,
                          insert_std: int = 40):
    """Read simulation against a genome too big to join in memory:
    streams contigs (one at a time) and samples reads proportional to
    contig length.  Returns [(name, seq, qual)] in deterministic order;
    paired mode returns (r1_list, r2_list) like simulate_reads."""
    from bwa_tpu.index.pack import read_fasta

    rng = np.random.default_rng(seed)
    # first pass: contig lengths
    lens = [(name, len(seq)) for name, _, seq in read_fasta(fa_path)]
    total = sum(l for _, l in lens)
    counts = rng.multinomial(n_reads, [l / total for _, l in lens])
    quals = b"I" * read_len
    ri = 0
    if paired:
        r1, r2 = [], []
        for (name, _, seq), cnt in zip(read_fasta(fa_path), counts):
            arr = np.frombuffer(seq, dtype=np.uint8)
            glen = arr.shape[0]
            for _ in range(int(cnt)):
                isize = max(read_len + 10,
                            int(rng.normal(insert_mean, insert_std)))
                isize = min(isize, glen - 1)
                start = int(rng.integers(0, glen - isize))

                def grab(s):
                    frag = arr[s:s + read_len].copy()
                    sub = rng.random(read_len) < err_rate
                    if sub.any():
                        frag[sub] = BASES[rng.integers(0, 4,
                                                       size=int(sub.sum()))]
                    return frag.tobytes()

                a = grab(start)
                b = revcomp(grab(start + isize - read_len))
                if rng.random() < 0.5:
                    a, b = b, a
                r1.append((f"r{ri}", a, quals))
                r2.append((f"r{ri}", b, quals))
                ri += 1
        return r1, r2
    reads = []
    for (name, _, seq), cnt in zip(read_fasta(fa_path), counts):
        arr = np.frombuffer(seq, dtype=np.uint8)
        glen = arr.shape[0]
        for _ in range(int(cnt)):
            start = int(rng.integers(0, glen - read_len))
            frag = arr[start:start + read_len].copy()
            sub = rng.random(read_len) < err_rate
            if sub.any():
                frag[sub] = BASES[rng.integers(0, 4, size=int(sub.sum()))]
            seq_b = frag.tobytes()
            if rng.random() < 0.5:
                seq_b = revcomp(seq_b)
            reads.append((f"r{ri}", seq_b, quals))
            ri += 1
    return reads
