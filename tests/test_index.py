"""Index construction: byte-equality of every index file vs `bwa index`."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from bwa_tpu.index.build import index_build, read_bwt_file, read_sa_file
from bwa_tpu.index.pack import read_ann_amb
from bwa_tpu.utils.rand48 import Rand48

DATA_DIR = Path("/tmp/bwa_tpu_testdata")


def test_rand48_sequence():
    # golden values from glibc semantics: X0 = (11<<16)|0x330E
    r = Rand48(11)
    vals = [r.lrand48() for _ in range(4)]
    x = (11 << 16) | 0x330E
    expect = []
    for _ in range(4):
        x = (0x5DEECE66D * x + 0xB) & ((1 << 48) - 1)
        expect.append(x >> 17)
    assert vals == expect


@pytest.mark.parametrize("ext", [".pac", ".ann", ".amb", ".bwt", ".sa"])
def test_index_bytes_match_oracle(small_genome, ext, tmp_path):
    ours = tmp_path / "idx"
    prefix = index_build(small_genome, prefix=ours)
    theirs = Path(str(small_genome) + ext).read_bytes()
    mine = Path(prefix + ext).read_bytes()
    assert mine == theirs, f"{ext}: {len(mine)} vs {len(theirs)} bytes"


@pytest.mark.parametrize("ext", [".pac", ".ann", ".amb", ".bwt", ".sa"])
def test_index_bounded_bytes_match_oracle(small_genome, ext, tmp_path):
    """`-a bwtsw` path (bounded-memory incremental BWT, native/bwtinc.cpp)
    produces the same bytes as the oracle — with an odd block size so the
    merge rounds hit ragged boundaries."""
    ours = tmp_path / "idx"
    prefix = index_build(small_genome, prefix=ours, algo="bwtsw",
                         block_size=777)
    theirs = Path(str(small_genome) + ext).read_bytes()
    mine = Path(prefix + ext).read_bytes()
    assert mine == theirs, f"{ext}: {len(mine)} vs {len(theirs)} bytes"


@pytest.mark.parametrize("ext", [".pac", ".ann", ".amb", ".bwt", ".sa"])
def test_index_rb2_oracle_bytes(oracle_bwa, small_genome, ext, tmp_path):
    """`index -a rb2` parity: the reference's rb2 is the ropebwt2
    char-at-a-time dynamic-BWT insertion (bwtindex.c:95-120, rope.c); ours
    routes rb2 to the incremental dynamic-BWT builder (native/bwtinc.cpp)
    — the same algorithm class, blockwise — and the BWT of a text is
    unique, so every index file byte-matches the oracle's OWN `-a rb2`
    output (not just its default-algo output)."""
    subprocess.run([str(oracle_bwa), "index", "-a", "rb2", "-p",
                    str(tmp_path / "oracle_rb2"), str(small_genome)],
                   check=True, capture_output=True)
    prefix = index_build(small_genome, prefix=tmp_path / "ours_rb2",
                         algo="rb2")
    theirs = (tmp_path / ("oracle_rb2" + ext)).read_bytes()
    mine = Path(prefix + ext).read_bytes()
    assert mine == theirs, f"{ext}: {len(mine)} vs {len(theirs)} bytes"


def test_index_bounded_sad_sidecar(small_genome, tmp_path):
    """The bounded path's inverse-Psi-walk .sad sidecar matches SA-IS's."""
    a = tmp_path / "a"
    b = tmp_path / "b"
    index_build(small_genome, prefix=a)
    index_build(small_genome, prefix=b, algo="bwtsw", block_size=1000)
    sa = np.load(str(a) + ".sad.npy")
    sb = np.load(str(b) + ".sad.npy")
    assert sa.dtype == sb.dtype and np.array_equal(sa, sb)


def test_load_oracle_index(small_genome):
    # we can parse the oracle-built index
    primary, L2, seq_len, ckpt, words = read_bwt_file(str(small_genome) + ".bwt")
    assert seq_len == 2 * read_ann_amb(small_genome).l_pac
    assert (ckpt[-1] == (L2[1:5] - L2[0:4])).all()
    sa_intv, samples = read_sa_file(str(small_genome) + ".sa", primary, seq_len)
    assert sa_intv == 32
    assert samples[0] == -1
    assert (samples[1:] <= seq_len).all()


def test_index_roundtrip_cross(oracle_bwa, tmp_path):
    """Strongest check: an index WE build is readable by the ORACLE mem."""
    from datagen import random_genome, simulate_reads, write_fasta, write_fastq

    fa = tmp_path / "g.fa"
    contigs = random_genome(60_000, seed=21, n_contigs=1)
    write_fasta(fa, contigs)
    index_build(fa)
    reads = simulate_reads(contigs, 50, read_len=120, seed=3)
    fq = tmp_path / "r.fq"
    write_fastq(fq, reads)
    out = subprocess.run([str(oracle_bwa), "mem", str(fa), str(fq)],
                         check=True, capture_output=True)
    lines = [l for l in out.stdout.decode().splitlines() if not l.startswith("@")]
    assert len(lines) >= 50
    mapped = sum(1 for l in lines if not (int(l.split("\t")[1]) & 4))
    assert mapped >= 45


@pytest.mark.parametrize("nbases", [300_000, 150_001])
def test_pac2bwtgen_bytes_match_oracle(oracle_bwa, tmp_path, nbases):
    """`pac2bwtgen` (bwt_bwtgen_main, bwt_gen.c:1606-1615) via the bounded
    builder == oracle bytes.  nbases=300_000 makes the doubled pac length
    divisible by 4 — the trailer-byte==0 case of bwa_seq_len
    (bwtindex.c:51-62) that the old length formula got wrong."""
    import sys

    from datagen import random_genome, write_fasta

    from bwa_tpu import tools

    fa = tmp_path / "g.fa"
    write_fasta(fa, random_genome(nbases, seed=7, n_contigs=2, with_ns=True))
    subprocess.run([str(oracle_bwa), "fa2pac", str(fa), str(tmp_path / "p")],
                   check=True, capture_output=True)
    subprocess.run([str(oracle_bwa), "pac2bwtgen", str(tmp_path / "p.pac"),
                    str(tmp_path / "o.bwt")], check=True, capture_output=True)
    assert tools.main_pac2bwtgen([str(tmp_path / "p.pac"),
                                  str(tmp_path / "u.bwt")]) == 0
    assert (tmp_path / "u.bwt").read_bytes() == (tmp_path / "o.bwt").read_bytes()


def test_bwtsw2_alias_dispatch(capsys):
    """`bwtsw2`/`dbwtsw` dispatch to bwasw (main.c:107-109)."""
    from bwa_tpu.cli import main

    for cmd in ("bwtsw2", "dbwtsw"):
        rc = main([cmd])  # no args -> usage, rc 1, but NOT "unrecognized"
        assert rc == 1
        err = capsys.readouterr().err
        assert "unrecognized" not in err
