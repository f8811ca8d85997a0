from bwa_tpu.index.pack import fasta2bnt, Bnt, Contig  # noqa: F401
from bwa_tpu.index.build import index_build  # noqa: F401
from bwa_tpu.index.fmindex import FMIndex  # noqa: F401
