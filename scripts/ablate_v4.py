"""Where do the v4 128^3 forward milliseconds go?  Stage ablations on TPU.

Same idea as ablate_v5.py, for the bricked fused3b forward at the large
sweep (16 cells x 4ch x 128^3, 1M points): stripped pallas_call variants
with the identical grid / specs / scratch / DMA chain isolate

  copy : brick DMA chain + per-block fixed cost
  mxu  : + x one-hot build + the nsh stage-1 contractions (panel sum out)
  full : + stage-2 row blend + factored z/y/x blend (the shipped kernel)
  bin  : the plan build (binning) alone
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
from cosinesampler_tpu.ops.pallas import fused3b, mxu
from cosinesampler_tpu.ops.pallas.fused3b import (
    _axis_prep_window, _axis_prep_wp, _geom, _pad_volume_yzc, _wpad,
    plan_or_bin)
from cosinesampler_tpu.ops.pallas.fused3s import _z_weights
from cosinesampler_tpu.ops.pallas.prep import front_pad, n_shifts, npad

compile_cache.enable()

INTERPRET = bool(int(os.environ.get("ABLATE_INTERPRET", "0")))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

REPS = int(os.environ.get("ABLATE_REPS", "20"))
Q = int(os.environ.get("ABLATE_Q", "1000000"))
N, C, S = 16, 4, int(os.environ.get("ABLATE_S", "128"))
QB = 128
GY = 2


def _ablate_kernel(x_ref, y_ref, z_ref, valid_ref, z0_ref, y0_ref,
                   hasv_ref, z0n_ref, y0n_ref, first_ref, hn_ref,
                   par_ref, off_ref, vol_ref, out_ref, scratch, sem,
                   *, cfg, spatial, gy, q_block, channels, n_cells, wpad,
                   stage):
    d, h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    wy_rows = gy + front_pad(cfg)
    z0 = z0_ref[0, 0, 0]
    y0 = y0_ref[0, 0, 0]
    p = par_ref[0, 0, 0]
    cn3 = nsh * c * n

    def brick_dma(slot, zz, yy):
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(yy, wy_rows), pl.ds(zz, nsh)],
            scratch.at[pl.ds(wy_rows * slot, wy_rows)], sem.at[slot])

    @pl.when(hasv_ref[0, 0, 0] > 0)
    def _():
        @pl.when(first_ref[0, 0, 0] > 0)
        def _():
            brick_dma(p, z0, y0).start()
        brick_dma(p, z0, y0).wait()

        @pl.when(hn_ref[0, 0, 0] > 0)
        def _():
            brick_dma(1 - p, z0n_ref[0, 0, 0], y0n_ref[0, 0, 0]).start()

        if stage == "copy":
            out_ref[:] = jnp.broadcast_to(
                scratch[wy_rows * p, 0, 0:1, 0:q_block], out_ref.shape)
            return

        valid = (valid_ref[0, 0] > 0.5).astype(jnp.float32)
        off_col = off_ref[:, 0:1]
        hx, wx = _axis_prep_wp(x_ref[0], w, wpad, cfg, off_col, q_block)
        hyl, wyw, ymask = _axis_prep_window(y_ref[0], h, cfg, off_col,
                                            q_block, y0, gy)
        wz, zmask = _z_weights(z_ref[0], d, cfg, off_col, z0 - 2)
        mask = valid * ymask * zmask
        rows = scratch[pl.ds(wy_rows * p, wy_rows)].reshape(
            wy_rows * cn3, wpad)
        terms = mxu.split_bf16(rows, mxu.passes_for(cfg))
        if stage == "mxu_cat":
            # one (M, wpad) x (wpad, nsh*Qb) contraction per bf16 pass
            # instead of nsh narrow ones: same MACs, fewer pipeline fills
            hx_cat = jnp.concatenate(hx, axis=1)
            wide = mxu.onehot_dot_terms(
                terms, hx_cat, (((1,), (0,)), ((), ())))
            acc = sum(wide[:, i * q_block:(i + 1) * q_block]
                      for i in range(nsh))
        else:
            acc = jnp.zeros((wy_rows * cn3, q_block), jnp.float32)
            for i in range(nsh):
                acc = acc + mxu.onehot_dot_terms(
                    terms, hx[i], (((1,), (0,)), ((), ())))
        out_ref[:] = acc[0:out_ref.shape[0]] * mask


def make_ablated(cells, points, cfg, stage, plan):
    n, c, d, h, w = cells.shape
    np_ = npad(n)
    fp = front_pad(cfg)
    nsh = n_shifts(cfg)
    nby, _, _, hp = _geom(d, h, GY, fp)
    wp = _wpad(w)

    @jax.jit
    def run(cells, points, plan):
        positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
            points, d, h, cfg, QB, GY, plan)
        nblocks = qp // QB
        axes = [pts_p[:, i].reshape(nblocks, 1, QB) for i in range(3)]
        validf = occ.reshape(nblocks, 1, QB)
        offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
        offsets = jnp.pad(offsets, ((0, np_ - n), (0, 0)))
        cells_p = jnp.pad(cells, ((0, np_ - n),) + ((0, 0),) * 4)
        vol = _pad_volume_yzc(cells_p, d, h, w, hp, wp, fp)
        bi = jnp.arange(nblocks, dtype=jnp.int32)
        z0n = jnp.roll(z0, -1).at[-1].set(z0[-1])
        y0n = jnp.roll(y0, -1).at[-1].set(y0[-1])
        first = (bi == 0).astype(jnp.int32)
        hn = jnp.roll(hasv, -1).at[-1].set(0)
        parity = (bi % 2).astype(jnp.int32)
        coord_spec = pl.BlockSpec((1, 1, QB), lambda qi: (qi, 0, 0),
                                  memory_space=pltpu.VMEM)
        meta_spec = pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                                 memory_space=pltpu.SMEM)
        kernel = functools.partial(
            _ablate_kernel, cfg=cfg, spatial=(d, h, w), gy=GY,
            q_block=QB, channels=c, n_cells=np_, wpad=wp, stage=stage)
        out = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                coord_spec, coord_spec, coord_spec,
                pl.BlockSpec((1, 1, QB), lambda qi: (qi, 0, 0),
                             memory_space=pltpu.VMEM),
                meta_spec, meta_spec, meta_spec,
                meta_spec, meta_spec, meta_spec, meta_spec, meta_spec,
                pl.BlockSpec((np_, 1), lambda qi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((7 * c, QB), lambda qi: (0, qi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((7 * c, qp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2 * (GY + fp), nsh, c * np_, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(*axes, validf,
          z0.reshape(nblocks, 1, 1), y0.reshape(nblocks, 1, 1),
          hasv.reshape(nblocks, 1, 1),
          z0n.reshape(nblocks, 1, 1), y0n.reshape(nblocks, 1, 1),
          first.reshape(nblocks, 1, 1), hn.reshape(nblocks, 1, 1),
          parity.reshape(nblocks, 1, 1), offsets, vol)
        return out
    return run


def timed_scan(fn, cells, pts, plan, reps=REPS):
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
    # ABLATE_PREC=bf16 re-runs the stage table under the reduced-precision
    # MXU mode (VERDICT r3 #3: attribute what remains of the bf16 128^3
    # step after the geometry sweep); f32 master cells either way.
    prec = os.environ.get("ABLATE_PREC", "exact")
    cfg = SamplerConfig(dim=3, precision=prec)
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(N, C, S, S, S), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (Q, 3)), jnp.float32)
    print(f"device: {jax.devices()[0]}  precision={prec}", flush=True)

    planfn = jax.jit(lambda p: fused3b.make_plan(p, (S, S, S), cfg, QB, GY))
    plan = planfn(pts)
    jax.block_until_ready(plan)
    print(f"padded slots: {plan[1].shape[0]}", flush=True)

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
        fused3b.pallas_fused3b_blend_padded, cfg=cfg, q_block=QB, gy=GY,
        interpret=INTERPRET))
    t = timed_scan(lambda c, p, pl_: full(c, p, plan=pl_)[0],
                   cells, pts, plan)
    print(f"full (planned)  : {t * 1e3:6.2f} ms", flush=True)

    for stage in ("copy", "mxu", "mxu_cat"):
        fn = make_ablated(cells, pts, cfg, stage, plan)
        t = timed_scan(fn, cells, pts, plan)
        print(f"{stage:16s}: {t * 1e3:6.2f} ms", flush=True)

    # backward: full vs RMW-chain-only (trivial accumulate).  The delta
    # between bwd_full and bwd_rmw attributes compute; bwd_rmw itself is
    # the serialized read-accumulate-writeback DMA chain the same-bin
    # elision cannot hide across DIFFERENT (overlapping) bins.
    g_p = jnp.asarray(rng.rand(7, C, int(plan[1].shape[0])), jnp.float32)
    bwd = jax.jit(functools.partial(
        fused3b.pallas_fused3b_bwd_padded, in_spatial=(S, S, S), cfg=cfg,
        n_cells=N, q_block=QB, gy=GY, interpret=INTERPRET))

    @jax.jit
    def bwd_many(cells_scale, g_p, pts, plan):
        def body(s, _):
            out = bwd(g_p * s, pts, plan=plan)
            return s * 1.0000001, out.ravel()[0]
        _, ticks = jax.lax.scan(body, cells_scale, None, length=REPS)
        return ticks.sum()

    jax.block_until_ready(bwd_many(jnp.float32(1.0), g_p, pts, plan))
    t = min(_t(bwd_many, jnp.float32(1.0 - 1e-4 * i), g_p, pts, plan)
            for i in range(3)) / REPS
    print(f"bwd full        : {t * 1e3:6.2f} ms", flush=True)

    fn = make_bwd_rmw(cells, pts, cfg, plan)

    @jax.jit
    def rmw_many(scale, g_p, pts, plan):
        def body(s, _):
            out = fn(g_p * s, pts, plan)
            return s * 1.0000001, out.ravel()[0]
        _, ticks = jax.lax.scan(body, scale, None, length=REPS)
        return ticks.sum()

    jax.block_until_ready(rmw_many(jnp.float32(1.0), g_p, pts, plan))
    t = min(_t(rmw_many, jnp.float32(1.0 - 1e-4 * i), g_p, pts, plan)
            for i in range(3)) / REPS
    print(f"bwd rmw-only    : {t * 1e3:6.2f} ms", flush=True)


def _t(fn, *args):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    float(r)
    return time.perf_counter() - t0


def _rmw_kernel(x_ref, y_ref, z_ref, valid_ref, z0_ref, y0_ref,
                hasv_ref, sp_ref, sn_ref, off_ref, g_ref, vol0_ref,
                out_ref, scratch, sem_in, sem_out, *, cfg, spatial, gy,
                q_block, channels, n_cells, wpad):
    del vol0_ref
    nsh = n_shifts(cfg)
    wy_rows = gy + front_pad(cfg)
    z0 = z0_ref[0, 0, 0]
    y0 = y0_ref[0, 0, 0]

    @pl.when(hasv_ref[0, 0, 0] > 0)
    def _():
        cp = pltpu.make_async_copy(
            out_ref.at[pl.ds(y0, wy_rows), pl.ds(z0, nsh)],
            scratch, sem_in)

        @pl.when(sp_ref[0, 0, 0] == 0)
        def _():
            cp.start()
            cp.wait()
        scratch[...] = scratch[...] + 1e-30 * g_ref[0, 0]

        @pl.when(sn_ref[0, 0, 0] == 0)
        def _():
            cp2 = pltpu.make_async_copy(
                scratch,
                out_ref.at[pl.ds(y0, wy_rows), pl.ds(z0, nsh)],
                sem_out)
            cp2.start()
            cp2.wait()


def make_bwd_rmw(cells, points, cfg, plan):
    """The bwd pallas_call with compute replaced by a trivial accumulate:
    isolates the read-modify-write DMA chain over the bin sequence."""
    n, c, d, h, w = cells.shape
    np_ = npad(n)
    fp = front_pad(cfg)
    nsh = n_shifts(cfg)
    nby, _, _, hp = _geom(d, h, GY, fp)
    wp = _wpad(w)

    @jax.jit
    def run(g_p, points, plan):
        positions, occ, z0, y0, hasv, pts_p, qp = plan_or_bin(
            points, d, h, cfg, QB, GY, plan)
        gq = g_p.reshape(7 * c, qp)
        nblocks = qp // QB
        axes = [pts_p[:, i].reshape(nblocks, 1, QB) for i in range(3)]
        validf = occ.reshape(nblocks, 1, QB)
        offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
        offsets = jnp.pad(offsets, ((0, np_ - n), (0, 0)))
        vol0 = jnp.zeros((hp, d + fp + 2, c * np_, wp), jnp.float32)
        bi = jnp.arange(nblocks, dtype=jnp.int32)
        hasv_next = jnp.roll(hasv, -1).at[-1].set(0)
        same = (z0 == jnp.roll(z0, -1)) & (y0 == jnp.roll(y0, -1))
        sn = (same & (hasv_next > 0) & (bi < nblocks - 1)).astype(jnp.int32)
        sp = jnp.roll(sn, 1).at[0].set(0)
        coord_spec = pl.BlockSpec((1, 1, QB), lambda qi: (qi, 0, 0),
                                  memory_space=pltpu.VMEM)
        meta_spec = pl.BlockSpec((1, 1, 1), lambda qi: (qi, 0, 0),
                                 memory_space=pltpu.SMEM)
        kernel = functools.partial(
            _rmw_kernel, cfg=cfg, spatial=(d, h, w), gy=GY,
            q_block=QB, channels=c, n_cells=np_, wpad=wp)
        acc = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                coord_spec, coord_spec, coord_spec,
                pl.BlockSpec((1, 1, QB), lambda qi: (qi, 0, 0),
                             memory_space=pltpu.VMEM),
                meta_spec, meta_spec, meta_spec, meta_spec, meta_spec,
                pl.BlockSpec((np_, 1), lambda qi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7 * c, QB), lambda qi: (0, qi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((hp, d + fp + 2, c * np_, wp),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((GY + fp, nsh, c * np_, wp), jnp.float32),
                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={11: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(*axes, validf,
          z0.reshape(nblocks, 1, 1), y0.reshape(nblocks, 1, 1),
          hasv.reshape(nblocks, 1, 1),
          sp.reshape(nblocks, 1, 1), sn.reshape(nblocks, 1, 1),
          offsets, gq, vol0)
        return acc
    return run


if __name__ == "__main__":
    main()
