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
