"""Where do the v5 3D forward milliseconds go?  Stage ablations on TPU.

Builds stripped variants of the fused3w forward pallas_call with the SAME
grid / specs / scratch / DMA chain and times each with the bin plan
precomputed, so the deltas isolate:

  copy : window DMA chain + per-block fixed cost (+ grid overhead)
  mxu  : + hit-panel build + the 9 one-hot contractions (panel sum out)
  full : + the factored z/y/x weight blend (the shipped kernel)
  bin  : the plan build (binning) alone
  fullu: shipped kernel, plan built inside (the dispatcher's unplanned path)

The copy/mxu kernels produce garbage values on purpose — they exist only
to attribute time; nothing here is dispatched outside this script.
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
from cosinesampler_tpu.ops.pallas import fused3w, mxu
from cosinesampler_tpu.ops.pallas.fused3b import _geom, _pad_volume
from cosinesampler_tpu.ops.pallas.fused3w import (
    _win_geom, _windows, _x_prep, _y_prep, plan_or_bin)
from cosinesampler_tpu.ops.pallas.fused3s import _z_weights
from cosinesampler_tpu.ops.pallas.prep import front_pad, n_shifts, npad

compile_cache.enable()

INTERPRET = bool(int(os.environ.get("ABLATE_INTERPRET", "0")))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

REPS = int(os.environ.get("ABLATE_REPS", "100"))
Q = int(os.environ.get("ABLATE_Q", "100000"))
N, C, S = 50, 4, 16          # the reference 3D workload
QB = 128


def _ablate_kernel(x_ref, y_ref, z_ref, valid_ref, z0_ref, y0_ref,
                   hasv_ref, bbn_ref, first_ref, hn_ref, par_ref,
                   off_ref, win_ref, out_ref, scratch, sem,
                   *, cfg, spatial, gy, q_block, channels, n_cells,
                   wp, nby, stage):
    d, h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    rows = gy + front_pad(cfg)
    k_win = rows * wp
    z0 = z0_ref[0, 0, 0]
    y0 = y0_ref[0, 0, 0]
    bbin = z0 * nby + y0 // gy
    p = par_ref[0, 0, 0]

    def win_dma(slot, b):
        return pltpu.make_async_copy(win_ref.at[pl.ds(b, 1)],
                                     scratch.at[pl.ds(slot, 1)], sem.at[slot])

    @pl.when(hasv_ref[0, 0, 0] > 0)
    def _():
        @pl.when(first_ref[0, 0, 0] > 0)
        def _():
            win_dma(p, bbin).start()
        win_dma(p, bbin).wait()

        @pl.when(hn_ref[0, 0, 0] > 0)
        def _():
            win_dma(1 - p, bbn_ref[0, 0, 0]).start()

        if stage == "copy":
            # data-depend on the scratch so nothing is elided
            out_ref[:] = jnp.broadcast_to(
                scratch[pl.ds(p, 1)][0][0:1, 0:q_block], out_ref.shape)
            return

        valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)
        off_col = off_ref[:, 0:1]
        px, wx = _x_prep(x_ref[0], w, cfg, off_col)
        ry, wy, ymask = _y_prep(y_ref[0], h, cfg, off_col, y0, gy)
        wz, zmask = _z_weights(z_ref[0], d, cfg, off_col, z0 - 2)
        mask = valid * ymask * zmask
        terms = mxu.split_bf16(scratch[pl.ds(p, 1)][0],
                               mxu.passes_for(cfg))
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_win, q_block), 0)
        if stage == "mxu_cat":
            hits = []
            for j in range(nsh):
                rb = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                    hits.append((iota == pos).astype(jnp.float32))
            hit_cat = jnp.concatenate(hits, axis=1)
            wide = mxu.onehot_dot_terms(
                terms, hit_cat, (((1,), (0,)), ((), ())))
            acc = sum(wide[:, k * q_block:(k + 1) * q_block]
                      for k in range(nsh * nsh))
        else:
            acc = jnp.zeros((nsh * c * n, q_block), jnp.float32)
            for j in range(nsh):
                rb = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb + px[i], -1)
                    hit = (iota == pos).astype(jnp.float32)
                    acc = acc + mxu.onehot_dot_terms(
                        terms, hit, (((1,), (0,)), ((), ())))
        out_ref[:] = acc[0:out_ref.shape[0]] * mask


def make_ablated(cells, points, cfg, stage, plan):
    n, c, d, h, w = cells.shape
    np_ = npad(n)
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    nby, nbz, nbins, hp = _geom(d, h, gy, fp)

    @jax.jit
    def run(cells, points, plan):
        positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
            points, d, h, cfg, QB, gy, plan)
        nblocks = qp // QB
        axes = [pts_p[:, i].reshape(nblocks, 1, QB) for i in range(3)]
        validf = occ.reshape(nblocks, 1, QB)
        offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
        offsets = jnp.pad(offsets, ((0, np_ - n), (0, 0)))
        cells_p = jnp.pad(cells, ((0, np_ - n),) + ((0, 0),) * 4)
        vol = _pad_volume(cells_p, d, h, w, hp, wp, fp)
        wins = _windows(vol, nbins, nby, gy, rows, nsh)
        bi = jnp.arange(nblocks, dtype=jnp.int32)
        bb = z0 * nby + y0 // gy
        bbn = jnp.roll(bb, -1).at[-1].set(bb[-1])
        first = (bi == 0).astype(jnp.int32)
        hn = jnp.roll(hasv, -1).at[-1].set(0)
        parity = (bi % 2).astype(jnp.int32)
        coord_spec = pl.BlockSpec((1, 1, QB), lambda qi: (qi, 0, 0),
                                  memory_space=pltpu.VMEM)
        meta_spec = pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                                 memory_space=pltpu.SMEM)
        kernel = functools.partial(
            _ablate_kernel, cfg=cfg, spatial=(d, h, w), gy=gy,
            q_block=QB, channels=c, n_cells=np_, wp=wp, nby=nby,
            stage=stage)
        out = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                coord_spec, coord_spec, coord_spec,
                pl.BlockSpec((1, 1, QB), lambda qi: (qi, 0, 0),
                             memory_space=pltpu.VMEM),
                meta_spec, meta_spec, meta_spec,
                meta_spec, meta_spec, meta_spec, meta_spec,
                pl.BlockSpec((np_, 1), lambda qi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((7 * c, QB), lambda qi: (0, qi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((7 * c, qp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, nsh * c * np_, rows * wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(*axes, validf,
          z0.reshape(nblocks, 1, 1), y0.reshape(nblocks, 1, 1),
          hasv.reshape(nblocks, 1, 1),
          bbn.reshape(nblocks, 1, 1), first.reshape(nblocks, 1, 1),
          hn.reshape(nblocks, 1, 1), parity.reshape(nblocks, 1, 1),
          offsets, wins)
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


def main():
    cfg = SamplerConfig(dim=3)
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(N, C, S, S, S), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 3)), jnp.float32)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    plan = jax.jit(lambda p: fused3w.make_plan(p, (S, S, S), cfg, QB))(pts)
    jax.block_until_ready(plan)

    # plan build alone
    planfn = jax.jit(lambda p: fused3w.make_plan(p, (S, S, S), cfg, QB))

    @jax.jit
    def plan_many(p):
        def body(p, _):
            pl_ = planfn(p)
            return p * 1.0000001, pl_[1].sum()
        _, t = jax.lax.scan(body, p, None, length=REPS)
        return t.sum()
    jax.block_until_ready(plan_many(pts))
    t0 = time.perf_counter()
    jax.block_until_ready(plan_many(pts * 0.999))
    tbin = (time.perf_counter() - t0) / REPS
    print(f"bin (plan build): {tbin * 1e3:6.2f} ms", flush=True)

    full = jax.jit(functools.partial(
        fused3w.pallas_fused3w_blend_padded, cfg=cfg, q_block=QB,
        interpret=INTERPRET))
    t = timed_scan(lambda c, p, pl_: full(c, p, plan=pl_)[0],
                   cells, pts, plan)
    print(f"full (planned)  : {t * 1e3:6.2f} ms", flush=True)

    for stage in ("copy", "mxu", "mxu_cat"):
        fn = make_ablated(cells, pts, cfg, stage, plan)
        t = timed_scan(fn, cells, pts, plan)
        print(f"{stage:16s}: {t * 1e3:6.2f} ms", flush=True)

    bwd = jax.jit(functools.partial(
        fused3w.pallas_fused3w_bwd_padded, in_spatial=(S, S, S), cfg=cfg,
        n_cells=N, q_block=QB, interpret=INTERPRET))
    g_p = jnp.asarray(np.random.RandomState(7).rand(
        7, C, int(plan[1].shape[0])), jnp.float32)

    @jax.jit
    def bwd_many(scale, g_p, pts, plan):
        def body(s, _):
            out = bwd(g_p * s, pts, plan=plan)
            return s * 1.0000001, out.ravel()[0]
        _, ticks = jax.lax.scan(body, scale, None, length=REPS)
        return ticks.sum()

    jax.block_until_ready(bwd_many(jnp.float32(1.0), g_p, pts, plan))

    def one_b(i):
        t0 = time.perf_counter()
        r = bwd_many(jnp.float32(1.0 - 1e-4 * i), g_p, pts, plan)
        jax.block_until_ready(r)
        float(r)
        return time.perf_counter() - t0

    t = min(one_b(i) for i in range(3)) / REPS
    print(f"bwd full        : {t * 1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
