"""Engine selection: which backend executes the FM-index/DP inner loops.

- "host": the scalar executable-spec (ops/fm_host.py) — always available.
- "tpu": batched JAX engine (ops/fm.py + ops/ksw_batch.py) — used when a
  device is present or forced via BWA_TPU_ENGINE=tpu.
"""

from __future__ import annotations

import os


def make_engine(fm, kind: str | None = None):
    kind = kind or os.environ.get("BWA_TPU_ENGINE", "host")
    if kind == "host":
        from bwa_tpu.ops.fm_host import HostFM

        return HostFM(fm)
    if kind == "tpu":
        from bwa_tpu.ops.fm import BatchedFMEngine

        return BatchedFMEngine(fm)
    raise ValueError(f"unknown engine '{kind}'")
