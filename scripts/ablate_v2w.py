"""Where do the v5 2D forward milliseconds go?  Stage ablations on TPU.

VERDICT r2 item 3: the tuned q_block=128 forward measures 45% of bf16
MXU peak while q_block=512 measures 74%, and the sb sweep (summed
fwd+bwd) could not attribute the gap.  This script times, with the bin
plan precomputed so deltas isolate kernel stages:

  copy    : window DMA chain + per-block fixed cost (+ grid overhead)
  panels  : + the 9 (K, Qb) one-hot hit-panel builds (VPU)
  mxu     : + the 9x{passes} one-hot contractions (no 5-row blend)
  mxu_pre : same contractions, but the hit panel LOADED from HBM
            (one (K, Qb) bf16 block per grid step) instead of built —
            isolates whether the VPU build serializes with the MXU
  full    : the shipped kernel (pallas_fused2w_blend_padded, planned)
  bwd     : the shipped backward (pallas_fused2w_bwd_padded, planned)

and sweeps q_block in {128, 256, 512} for full fwd and bwd SEPARATELY
(the tune_sb.py sweep timed them summed, hiding which pass prefers
which block).  The copy/panels/mxu kernels produce garbage values on
purpose — they exist only to attribute time.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.coords import multicell_offsets
from cosinesampler_tpu.ops.pallas import fused2w, mxu
from cosinesampler_tpu.ops.pallas.fused2w import (
    _geom2, _pad_grid, _plan_or_bin2, _windows2, make_plan,
    pallas_fused2w_blend_padded, pallas_fused2w_bwd_padded)
from cosinesampler_tpu.ops.pallas.fused3w import _win_geom, _x_prep, _y_prep
from cosinesampler_tpu.ops.pallas.prep import front_pad, n_shifts, npad

compile_cache.enable()

INTERPRET = bool(int(os.environ.get("ABLATE_INTERPRET", "0")))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

REPS = int(os.environ.get("ABLATE_REPS", "100"))
Q = int(os.environ.get("ABLATE_Q", "100000"))
N, C, S = 96, 4, 16          # the reference 2D workload
# ABLATE_QBS prunes the sweep (remote compiles cost minutes per program)
QBS = tuple(int(x) for x in
            os.environ.get("ABLATE_QBS", "128,256,512").split(","))


def _ablate_kernel(xyv_ref, meta_ref, off_ref, pan_ref, win_ref,
                   out_ref, scratch, sem, *, cfg, spatial, gy,
                   q_block, channels, n_cells, wp, stage):
    h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    rows = gy + front_pad(cfg)
    k_win = rows * wp
    iota = jax.lax.broadcasted_iota(jnp.int32, (k_win, q_block), 0)
    y0 = meta_ref[0, 0, 0]
    bbin = y0 // gy
    p = meta_ref[0, 0, 5]

    def win_dma(slot, b):
        return pltpu.make_async_copy(win_ref.at[pl.ds(b, 1)],
                                     scratch.at[pl.ds(slot, 1)], sem.at[slot])

    @pl.when(meta_ref[0, 0, 1] > 0)
    def _():
        @pl.when(meta_ref[0, 0, 3] > 0)
        def _():
            win_dma(p, bbin).start()
        win_dma(p, bbin).wait()

        @pl.when(meta_ref[0, 0, 4] > 0)
        def _():
            win_dma(1 - p, meta_ref[0, 0, 2]).start()

        if stage == "copy":
            # data-depend on the scratch; sublane-only broadcast (Mosaic
            # cannot broadcast in both sublanes and lanes at once)
            row = scratch[pl.ds(p, 1)][0][0:1, :].astype(jnp.float32)
            reps = -(-q_block // k_win)
            row = jnp.concatenate([row] * reps, axis=1)[:, :q_block]
            out_ref[:] = jnp.broadcast_to(row, out_ref.shape)
            return

        off_col = off_ref[:, 0:1]
        px, wx = _x_prep(xyv_ref[0, 0:1, :], w, cfg, off_col)
        ry, wy, ymask = _y_prep(xyv_ref[0, 1:2, :], h, cfg, off_col, y0, gy)

        if stage == "panels":
            acc = jnp.zeros((k_win, q_block), jnp.float32)
            for j in range(nsh):
                rb = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                    acc = acc + (iota == pos).astype(jnp.float32)
            out_ref[:] = acc[0:out_ref.shape[0]]
            return

        terms = mxu.data_terms(scratch[pl.ds(p, 1)][0],
                               mxu.passes_for(cfg))       # (C*N, K)
        acc = jnp.zeros((c * n, q_block), jnp.float32)
        if stage == "mxu_pre":
            hit0 = pan_ref[0].astype(jnp.float32)
            for k in range(nsh * nsh):
                # distinct per-pair scale: defeats CSE of the 9 dots (the
                # first run of this stage collapsed to ONE dot x9)
                hit = hit0 * (1.0 + 0.125 * k)
                acc = acc + mxu.onehot_dot_terms(
                    terms, hit, (((1,), (0,)), ((), ())))
        else:  # "mxu"
            for j in range(nsh):
                rb = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                    hit = (iota == pos).astype(jnp.float32)
                    acc = acc + mxu.onehot_dot_terms(
                        terms, hit, (((1,), (0,)), ((), ())))
        out_ref[:] = acc[0:out_ref.shape[0]]


def make_ablated(cells, cfg, stage, q_block):
    n, c, h, w = cells.shape
    np_ = npad(n)
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    nby, hp = _geom2(h, gy, fp)
    k_win = rows * wp

    @jax.jit
    def run(cells, points, plan):
        positions, occ, y0, hasv, pts_p, qp = _plan_or_bin2(
            points, h, cfg, q_block, gy, plan)
        nblocks = qp // q_block
        xyv = jnp.concatenate(
            [pts_p.T, occ[None].astype(jnp.float32)], axis=0
        ).reshape(3, nblocks, q_block).transpose(1, 0, 2)
        offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
        offsets = jnp.pad(offsets, ((0, np_ - n), (0, 0)))
        cells_p = jnp.pad(cells, ((0, np_ - n),) + ((0, 0),) * 3)
        wins = _windows2(_pad_grid(cells_p, h, w, hp, wp, fp, cfg), nby,
                         gy, rows)
        bi = jnp.arange(nblocks, dtype=jnp.int32)
        bb = y0 // gy
        bbn = jnp.roll(bb, -1).at[-1].set(bb[-1])
        first = (bi == 0).astype(jnp.int32)
        hn = jnp.roll(hasv, -1).at[-1].set(0)
        parity = (bi % 2).astype(jnp.int32)
        meta = jnp.stack([y0, hasv, bbn, first, hn, parity],
                         axis=1).astype(jnp.int32).reshape(nblocks, 1, 6)
        # prebuilt panel: one (K, Qb) bf16 0/1 panel per block (contents
        # arbitrary — MXU cost depends only on shape/dtype)
        pan = (jnp.tile(jnp.eye(q_block, dtype=jnp.bfloat16),
                        (k_win // q_block + 1, 1))[:k_win][None]
               if stage == "mxu_pre" else
               jnp.zeros((1, 8, 128), jnp.bfloat16))
        pan = jnp.broadcast_to(pan, (nblocks,) + pan.shape[1:])
        pan_spec = (pl.BlockSpec((1, k_win, q_block), lambda qi: (qi, 0, 0),
                                 memory_space=pltpu.VMEM)
                    if stage == "mxu_pre" else
                    pl.BlockSpec((1, 8, 128), lambda qi: (qi, 0, 0),
                                 memory_space=pltpu.VMEM))
        kernel = functools.partial(
            _ablate_kernel, cfg=cfg, spatial=(h, w), gy=gy,
            q_block=q_block, channels=c, n_cells=np_, wp=wp, stage=stage)
        out = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((1, 3, q_block), lambda qi: (qi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 6), lambda qi: (qi, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, 1), lambda qi: (0, 0),
                             memory_space=pltpu.VMEM),
                pan_spec,
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((5 * c, q_block), lambda qi: (0, qi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5 * c, qp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, c * np_, rows * wp), wins.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(xyv, meta, offsets, pan, wins)
        return out
    return run


def timed_scan(fn, cells, pts, plan, reps=REPS):
    """Scan over perturbed CELLS (the plan depends only on the points)."""
    @jax.jit
    def many(cells, pts, plan):
        def body(c, _):
            out = fn(c, pts, plan)
            return c * 1.0000001, out.ravel()[0]
        _, ticks = jax.lax.scan(body, cells, None, length=reps)
        return ticks.sum()

    jax.block_until_ready(many(cells, pts, plan))

    def one(i):
        t0 = time.perf_counter()
        r = many(cells * (0.999 - 1e-4 * i), pts, plan)
        jax.block_until_ready(r)
        float(r)
        return time.perf_counter() - t0

    return min(one(i) for i in range(3)) / reps


def timed_bwd(qb, cells, pts, plan, cfg, reps=REPS):
    bwd = jax.jit(functools.partial(
        pallas_fused2w_bwd_padded, in_spatial=(S, S), cfg=cfg,
        n_cells=N, q_block=qb, interpret=INTERPRET))
    qp = int(plan[1].shape[0])
    g_p = jnp.asarray(np.random.RandomState(7).rand(5, C, qp), jnp.float32)

    @jax.jit
    def many(scale, g_p, pts, plan):
        def body(s, _):
            out = bwd(g_p * s, pts, plan=plan)
            return s * 1.0000001, out.ravel()[0]
        _, ticks = jax.lax.scan(body, scale, None, length=reps)
        return ticks.sum()

    jax.block_until_ready(many(jnp.float32(1.0), g_p, pts, plan))

    def one(i):
        t0 = time.perf_counter()
        r = many(jnp.float32(1.0 - 1e-4 * i), g_p, pts, plan)
        jax.block_until_ready(r)
        float(r)
        return time.perf_counter() - t0

    return min(one(i) for i in range(3)) / reps


def main():
    # ABLATE_PREC=bf16 re-runs the stage table under the reduced-precision
    # MXU mode (VERDICT r3 #7: attribute the bf16 step's remaining floor);
    # f32 master cells either way — the kernels quantize internally.
    prec = os.environ.get("ABLATE_PREC", "exact")
    cfg = SamplerConfig(dim=2, precision=prec)
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(N, C, S, S), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 2)), jnp.float32)
    print(f"device: {jax.devices()[0]}  precision={prec}", flush=True)

    for qb in QBS:
        plan = jax.jit(functools.partial(make_plan, in_spatial=(S, S),
                                         cfg=cfg, q_block=qb))(pts)
        jax.block_until_ready(plan)
        full = functools.partial(pallas_fused2w_blend_padded, cfg=cfg,
                                 q_block=qb, interpret=INTERPRET)
        t = timed_scan(lambda c, p, pl_: full(c, p, plan=pl_)[0],
                       cells, pts, plan)
        print(f"qb={qb:3d} fwd full : {t * 1e3:6.2f} ms", flush=True)
        t = timed_bwd(qb, cells, pts, plan, cfg)
        print(f"qb={qb:3d} bwd full : {t * 1e3:6.2f} ms", flush=True)
        for stage in ("copy", "panels", "mxu", "mxu_pre"):
            fn = make_ablated(cells, cfg, stage, qb)
            t = timed_scan(fn, cells, pts, plan)
            print(f"qb={qb:3d} {stage:9s}: {t * 1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
