"""Engine selection: which backend executes the FM-index/DP inner loops.

- "host": the scalar executable-spec (ops/fm_host.py) — always available.
- "tpu": batched JAX engine (ops/fm.py + ops/ksw_batch.py) — used when a
  device is present or forced via BWA_TPU_ENGINE=tpu.
"""

from __future__ import annotations

import os


def make_engine(fm, kind: str | None = None):
    kind = kind or os.environ.get("BWA_TPU_ENGINE", "auto")
    if kind == "auto":
        # device present -> batched engine; CPU-only -> scalar host spec.
        # JAX_PLATFORMS=cpu in the env wins even though the axon
        # sitecustomize ignores it (the oracle-diff suite relies on its
        # CLI subprocesses NOT compiling device programs over the
        # tunnel); pin BWA_TPU_ENGINE=tpu to override.
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            kind = "host"
        else:
            try:
                import jax

                kind = "tpu" if jax.default_backend() != "cpu" else "host"
            except Exception:  # pragma: no cover - jax always present
                kind = "host"
    if kind == "host":
        from bwa_tpu.ops.fm_host import HostFM

        return HostFM(fm)
    if kind == "tpu":
        from bwa_tpu.ops.fm import BatchedFMEngine

        return BatchedFMEngine(fm)
    raise ValueError(f"unknown engine '{kind}'")
