"""Multi-chip sharding of the alignment step.

The reference's parallelism is pthread data-parallelism over reads plus a
POSIX-shm shared index (kthread.c, bwashm.c; SURVEY.md §1-L6).  The
TPU-native equivalent:

  * mesh axis "dp": read batches sharded across chips,
  * the FM-index replicated into every chip's HBM (it fits: ~5GB for
    GRCh38 at the reference sampling rates),
  * one cross-chip collective per batch: the all-reduce of insert-size
    statistics feeding mem_pestat (the only batch-global sync in the
    reference pipeline, bwamem.c:1256-1259), expressed as a psum.

`sharded_seed_step` is the jittable multi-chip step: per-shard SMEM
seeding + SA lookup of the best seed + a psum'd histogram of candidate
insert positions.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from bwa_tpu.ops import fm as fm_ops


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"need {n} devices, have {len(devs)} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n} "
            f"JAX_PLATFORMS=cpu for a virtual mesh)")
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_seed_step(idx, mesh: Mesh, cap: int):
    """Returns a jitted fn(q, qlen, x) running the seeding state machine
    data-parallel over the "dp" axis with a replicated index and a psum'd
    batch statistic (the pestat all-reduce)."""

    def step(idx, q, qlen, x):
        B = q.shape[0]
        minv = jnp.ones((B,), idx["ckpt"].dtype)
        active = x < qlen
        ret, m0, m1, m2, ms, me, mem_n = fm_ops.smem1a_batch(
            idx, q, qlen, x, minv, idx["ckpt"].dtype.type(0), active, cap)
        # SA position of the first occurrence of the longest SMEM per read
        has = mem_n > 0
        k0 = jnp.where(has, m0[:, 0], 1).astype(idx["ckpt"].dtype)
        pos = fm_ops.sa_batch(idx, k0)
        # batch-global statistic (pestat-style): psum over the dp axis
        n_seeded = jax.lax.psum(has.sum(), "dp")
        mean_pos = jax.lax.psum(jnp.where(has, pos, 0).sum(), "dp")
        return ret, pos, mem_n, n_seeded, mean_pos

    spec_b = P("dp")
    smapped = shard_map(
        step, mesh=mesh,
        in_specs=(P(), spec_b, spec_b, spec_b),
        out_specs=(spec_b, spec_b, spec_b, P(), P()),
        check_rep=False)
    return jax.jit(partial(smapped, idx))


def sharded_seed_machine(idx, mesh: Mesh, opt, cap: int, cap_s: int):
    """The PRODUCTION seeding engine (the unified 3-pass per-lane state
    machine, ops/fm_machine.py) jitted data-parallel over the "dp" mesh
    axis with the FM-index replicated — the real multi-chip worker1 step.
    Returns fn(q, qlen) -> (sorted seeds [B,cap_s,5], seed_n, ovf)."""
    from bwa_tpu.ops import fm_machine
    from bwa_tpu.ops.fm import _next_valid_device

    cdt = idx["ckpt"].dtype
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    use_p3 = bool(opt.max_mem_intv > 0)

    def step(idx, q, qlen):
        nv = _next_valid_device(q, qlen)
        seeds, seed_n, steps, ovf, done = fm_machine.seed_machine(
            idx, q, qlen, nv, jnp.int32(opt.min_seed_len),
            jnp.int32(split_len), cdt.type(opt.split_width),
            cdt.type(opt.max_mem_intv), cap=16, cap_s=cap_s, use_p3=use_p3)
        seeds = fm_machine.sort_seeds(seeds, seed_n,
                                      key64=bool(q.shape[1] >= 32768))
        return seeds, seed_n, ovf

    b = P("dp")
    smapped = shard_map(step, mesh=mesh, in_specs=(P(), b, b),
                        out_specs=(b, b, b), check_rep=False)
    return jax.jit(partial(smapped, idx))


def machine_sharded(idx, mesh: Mesh, min_seed_len, split_len, split_width,
                    max_intv3, cap: int, cap_s: int, use_p3: bool,
                    tagged: bool):
    """The production collect_seeds_dispatch machine step under shard_map:
    per-shard unified 3-pass seeding + per-lane sort, index replicated,
    reads sharded over "dp".  This is what `bwa-tpu mem` runs per batch
    when more than one chip is visible (engine.py wires it up), so the
    N-chip CLI saturates the mesh the way the reference saturates cores
    with kt_for (kthread.c:49-61, bwamem.c:1252).

    Returns fn(q, qlen[, job_lo, hi1, hi3]) -> (sorted seeds, seed_n,
    ovf, done_step, steps); the lane-sharding inputs are per-lane arrays,
    so they shard like q (omit them when tagged=False)."""
    from bwa_tpu.ops import fm_machine
    from bwa_tpu.ops.fm import _next_valid_device

    cdt = idx["ckpt"].dtype

    def step(idx, q, qlen, *lane_shard):
        nv = _next_valid_device(q, qlen)
        shard = lane_shard if lane_shard else None
        seeds, seed_n, steps, ovf, done = fm_machine.seed_machine(
            idx, q, qlen, nv, jnp.int32(min_seed_len), jnp.int32(split_len),
            cdt.type(split_width), cdt.type(max_intv3), cap=cap,
            cap_s=cap_s, use_p3=use_p3, shard=shard)
        seeds = fm_machine.sort_seeds(seeds, seed_n,
                                      key64=bool(q.shape[1] >= 32768))
        steps = jax.lax.pmax(steps, "dp")
        return seeds, seed_n, ovf, done, steps

    b = P("dp")
    n_lane_in = 3 if tagged else 0
    smapped = shard_map(step, mesh=mesh,
                        in_specs=(P(),) + (b,) * (2 + n_lane_in),
                        out_specs=(b, b, b, b, P()), check_rep=False)
    return jax.jit(partial(smapped, idx))


def gap_machine_sharded(mesh: Mesh, cap: int, cap_a: int, use_seed: bool,
                        f_gape: bool, f_nonstop: bool, f_loggap: bool):
    """The device backtrack search (ops/gap_machine.py, the TPU
    reformulation of bwt_match_gap, bwtgap.c:109-264) under shard_map:
    reads data-parallel over the "dp" axis with the index replicated —
    the mesh analog of bwtaln.c:102's static pthread read partition.
    Every per-lane state array shards with the batch; the scalar step
    counter is pmax'd so the host sees the slowest shard's trip count.

    fn(idx, state, q, qlen, md, mg, seed_en, sb, scalars) -> state'."""
    from bwa_tpu.ops import gap_machine as gm

    def step(idx, state, q, qlen, md, mg, seed_en, sb, scal):
        out = gm.gap_machine(
            state, idx, q, qlen, md, mg, seed_en, sb, *scal,
            cap=cap, cap_a=cap_a, use_seed=use_seed, f_gape=f_gape,
            f_nonstop=f_nonstop, f_loggap=f_loggap)
        d = dict(zip(gm.GAP_KEYS, out))
        d["steps"] = jax.lax.pmax(d["steps"], "dp")
        return tuple(d[k] for k in gm.GAP_KEYS)

    b = P("dp")
    st_spec = tuple(P() if k == "steps" else b for k in gm.GAP_KEYS)
    smapped = shard_map(step, mesh=mesh,
                        in_specs=(P(), st_spec, b, b, b, b, b, b, P()),
                        out_specs=st_spec, check_rep=False)
    return jax.jit(smapped)


def pestat_allgather(mesh: Mesh):
    """The one batch-global collective of the PE pipeline: every shard
    contributes its padded (dir, isize) candidate rows and receives the
    full set — the mem_pestat sync point (bwamem.c:1256-1259) as an
    all_gather riding the mesh interconnect.  fn(cands [B, 2], counts
    [n_dev]) with cands sharded by dp; returns the replicated global
    array in shard order."""

    def step(cands):
        return jax.lax.all_gather(cands, "dp", tiled=True)

    smapped = shard_map(step, mesh=mesh, in_specs=(P("dp"),),
                        out_specs=P(), check_rep=False)
    return jax.jit(smapped)
