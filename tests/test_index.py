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
