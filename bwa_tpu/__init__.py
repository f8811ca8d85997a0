"""bwa_tpu — a TPU-native read-alignment framework with the capabilities of lh3/bwa.

Built from scratch for JAX/XLA/Pallas on TPU:
  * the FM-index (BWT + occ checkpoints + sampled SA) lives HBM-resident as
    gather-friendly int32/uint32 arrays,
  * seeding (SMEM), suffix-array lookup and the banded affine-gap extension DP
    run as batched device programs over thousands of reads at a time,
  * the host side (Python + a small C++ native extension) handles FASTQ/SAM
    text, index construction (SA-IS) and the low-volume bookkeeping stages.

Index files (.pac/.ann/.amb/.bwt/.sa) are byte-compatible with the reference
bwa (>=0.7.x) so either tool can consume the other's index.
"""

__version__ = "0.1.0"

from bwa_tpu.options import MemOptions  # noqa: F401
