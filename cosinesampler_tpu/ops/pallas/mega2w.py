"""v6 residual megakernel: the WHOLE 2D PINN train-step gradient in one pass.

The flagship 2D training step (models/pinn.py loss_fused_slots) runs two
Pallas kernels per step — the fused blend (fused2w blend: window gather +
derivative blend) and its transpose (fused2w bwd: cotangent blend + window
splat) — with the tiny MLP / PDE residual / cotangent seed computed by XLA
between them.  Both kernels pay the same per-pass fixed/IO floor (~0.7 ms
of a 1.9 ms bf16 pass each, BENCHMARKS.md stage ablation) and round-trip
the (5C, QP) feature block through HBM.  The MXU work itself is
irreducible (gather and scatter are distinct contractions), but the floor
and the round trip are shared state: this kernel pays them ONCE.

Per query block, in one grid step:

1. window gather + derivative blend -> feats (5, C, Qb)   [fused2w fwd]
2. MLP + PDE residual + masked loss contribution, and its EXACT gradient
   via in-kernel ``jax.vjp`` (the kernel body is traced JAX, so reverse
   mode over the per-block closed scalar loss is available inside the
   kernel — no hand-derived MLP backward to get wrong)
3. the feats cotangent splats back into the per-bin window accumulator
   using the same coordinate prep / weight tables      [fused2w bwd]
4. MLP parameter gradients + the loss accumulate into a per-grid-step
   (rows, 128) stats tile; XLA sums the tiles.

The result IS the train-step gradient: (loss, d/dcells, d/dMLP) — there is
no outer jax.grad; the consumer (pinn.make_train_step(megakernel=True))
applies the optimizer directly.  Everything the two-kernel path computes
per step is reproduced exactly (same blend, same vjp'd residual as
pinn._mlp_derivs' jvp ladder — reverse of forward equals the same linear
map), pinned by tests/test_mega2w.py against
jax.value_and_grad(loss_fused_slots).

Scope: dim=2, any padding mode, the pinn MLP architecture (one tanh
hidden layer, channels-first), allen_cahn / helmholtz residuals, shared
query points, no points gradient (collocation points are not trained —
the reference's own pattern, test_2d.py:23-26).

Reference bar: this replaces the reference's per-step kernel chain
fwd + bwd + bwd^2 (+ the bwd^3 recursion inside autograd) of
cosine_sampler_2d_kernel.cu:265-891 — four CUDA launches plus the
autograd-engine traversal — with ONE deterministic TPU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SamplerConfig
from ..coords import multicell_offsets
from . import mxu
from .fused2d import _ROWS_2D
from .fused2w import (_geom2, _pad_grid, _pad_super, _plan_or_bin2,
                      _resolve_qb, _scatter_windows2, _vmem_ok, _windows2,
                      pick_q_block)
from .fused3w import _win_geom, _x_prep, _y_prep
from .prep import FUSED_PADDING_MODES_WIDE, VMEM_BUDGET, front_pad, n_shifts
from .prep import npad as _npad

MEGA_MIN_Q = 2048
_PDES = ("allen_cahn", "helmholtz")

# SMEM metadata vector, one per sub-block: the union of the fused2w blend
# meta (window prefetch chain) and bwd meta (RMW elision chain).
(_MG_Y0, _MG_HASV, _MG_BBN, _MG_FIRST, _MG_HN, _MG_PAR, _MG_SP,
 _MG_SN) = range(8)


def _tile_rows(hidden: int) -> int:
    return max(8, -(-hidden // 8) * 8)


def pack_mlp(w1, b1, w2, b2):
    """Pack the pinn MLP params into one (rows, 128) f32 VMEM tile.

    Column-major placement — w1^T in cols [0, C), b1 in col C, w2 in col
    C+1, b2 at [0, C+2] — so the kernel slices every operand COLUMN-wise
    and the hidden dimension lands on sublanes: no in-kernel transposes.
    The gradient tile (stats output) uses the same layout, with the loss
    contribution at [0, C+3].
    """
    c, hidden = w1.shape
    tile = jnp.zeros((_tile_rows(hidden), 128), jnp.float32)
    tile = tile.at[0:hidden, 0:c].set(w1.T.astype(jnp.float32))
    tile = tile.at[0:hidden, c].set(b1.astype(jnp.float32))
    tile = tile.at[0:hidden, c + 1].set(w2[:, 0].astype(jnp.float32))
    tile = tile.at[0, c + 2].set(b2[0].astype(jnp.float32))
    return tile


def supports(cfg: SamplerConfig, cells_shape, vmem_budget: int,
             n_queries: int | None = None, hidden: int = 16,
             pde: str = "allen_cahn", q_block: int | None = None,
             sb: int = 1) -> bool:
    """True when the megakernel can serve this train step.

    Gates = fused2w's (same window geometry, plan format and VMEM model)
    plus the extra RMW scratch buffer and the MLP tile layout bounds."""
    if cfg.dim != 2 or cfg.padding_mode not in FUSED_PADDING_MODES_WIDE:
        return False
    if pde not in _PDES:
        return False
    n, c, h, w = cells_shape
    if hidden > 128 or c + 4 > 128 or _tile_rows(hidden) > 32:
        return False
    q_block = q_block or pick_q_block(cfg, cells_shape, vmem_budget)
    if q_block is None or not _vmem_ok(cfg, cells_shape, vmem_budget,
                                       q_block, sb):
        return False
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    k = rows * wp
    cn = _npad(n) * c
    if cn * k * 4 > vmem_budget:        # the f32 RMW accumulator scratch
        return False
    from .fused2w import supports as _sup2w

    if not _sup2w(cfg, cells_shape, vmem_budget, n_queries, q_block, sb):
        return False
    return n_queries is None or n_queries >= MEGA_MIN_Q


def _tanh_precise(x):
    """f32-accurate tanh for the in-kernel MLP.

    Mosaic's native tanh measures ~3.4e-5 absolute error on v5e
    (scripts/probe_mega.py) — the ops/interpolants precise-trig lesson
    again — and the PINN residual squares it through the tanh' chain into
    a ~2e-3 relative loss deviation vs the XLA two-kernel path.  Mosaic's
    exp is ~4.5e-6 relative, so the rational form (1 - e)/(1 + e) with
    e = exp(-2x) lands ~2e-6 absolute; the clip keeps e finite in f32
    (exp(40) ~ 2.4e17) and AD through the composition gives the
    derivative 4e/(1+e)^2 at the same accuracy.

    The exponent must be the NEGATIVE magnitude: with e = exp(-2|x|) in
    (0, 1] every (1+e)^k power in the order-3 AD chain (two nested jvp's
    + the vjp over them) stays in [1, 2^k] — a clipped two-sided exp
    (e up to exp(40)) overflowed f32 in exactly those powers and NaN'd
    the whole step on TPU.  ``s`` is a piecewise-CONSTANT sign (AD
    derivative 0), so d/dx tanh = 4e/(1+e)^2 * s^2 comes out right,
    including tanh'(0) = 1 at exactly x = 0 (an |x|/sign formulation
    breaks there)."""
    s = jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)
    e = jnp.exp(-2.0 * s * x)
    return s * (1.0 - e) / (1.0 + e)


def _residual(pde: str, u, u_d, u_dd):
    """The PDE residual on (1, Qb) fields (pinn._residual_from_fields)."""
    if pde == "allen_cahn":
        return 2.0 * u_d[1] + 5.0 * u**3 - 5.0 * u - 1e-4 * u_dd[0]
    if pde == "helmholtz":
        return u_dd[0] + u_dd[1] + u
    raise ValueError(f"unknown pde {pde!r}")


def _mega2w_kernel(xyv_ref, meta_ref, off_ref, mlp_ref, win_ref, wins0_ref,
                   acc_ref, stats_ref, fwd_scr, rmw_scr, sem_fwd, sem_in,
                   sem_out, *, cfg, spatial, gy, q_block, sb, channels,
                   n_cells, wp, hidden, pde, inv_q):
    del wins0_ref  # aliased to acc_ref; zero-initialized by XLA
    h, w = spatial
    c = channels
    n = n_cells
    nsh = n_shifts(cfg)
    rows = gy + front_pad(cfg)
    k_win = rows * wp
    iota = jax.lax.broadcasted_iota(jnp.int32, (k_win, q_block), 0)

    # column-sliced MLP operands (pack_mlp layout): hidden on sublanes
    w1t = mlp_ref[0:hidden, 0:c]            # (hidden, C)
    b1c = mlp_ref[0:hidden, c:c + 1]        # (hidden, 1)
    w2c = mlp_ref[0:hidden, c + 1:c + 2]    # (hidden, 1)
    b2v = mlp_ref[0:1, c + 2:c + 3]         # (1, 1)

    stats_ref[0] = jnp.zeros_like(stats_ref[0])

    def win_dma(slot, b):
        return pltpu.make_async_copy(win_ref.at[pl.ds(b, 1)],
                                     fwd_scr.at[pl.ds(slot, 1)],
                                     sem_fwd.at[slot])

    for s in range(sb):
        sl = slice(s * q_block, (s + 1) * q_block)
        y0 = meta_ref[0, s, _MG_Y0]
        bbin = y0 // gy
        p = meta_ref[0, s, _MG_PAR]

        @pl.when(meta_ref[0, s, _MG_HASV] > 0)
        def _():
            # forward-window double-buffered prefetch chain (fused2w blend)
            @pl.when(meta_ref[0, s, _MG_FIRST] > 0)
            def _():
                win_dma(p, bbin).start()

            win_dma(p, bbin).wait()

            @pl.when(meta_ref[0, s, _MG_HN] > 0)
            def _():
                win_dma(1 - p, meta_ref[0, s, _MG_BBN]).start()

            # gradient-accumulator read, same-bin RMW elision (fused2w bwd)
            cp = pltpu.make_async_copy(acc_ref.at[pl.ds(bbin, 1)], rmw_scr,
                                       sem_in)

            @pl.when(meta_ref[0, s, _MG_SP] == 0)
            def _():
                cp.start()

            valid = (xyv_ref[0, 2, sl] > 0.5).astype(jnp.float32)
            off_col = off_ref[:, 0:1]
            px, wx = _x_prep(xyv_ref[0, 0:1, sl], w, cfg, off_col)
            ry, wy, ymask = _y_prep(xyv_ref[0, 1:2, sl], h, cfg, off_col,
                                    y0, gy)
            mask = valid * ymask                           # (1, Qb)

            # ---- stage 1: fused blend (fused2w fwd, unmasked rows) ----
            terms = mxu.data_terms(fwd_scr[pl.ds(p, 1)][0],
                                   mxu.passes_for(cfg))    # (C*N, K)
            rows_acc = [jnp.zeros((c, n, q_block), jnp.float32)
                        for _ in _ROWS_2D]
            for j in range(nsh):
                rb_ = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb_ + px[i], -1)
                    hit = (iota == pos).astype(jnp.float32)
                    v = mxu.onehot_dot_terms(
                        terms, hit, (((1,), (0,)), ((), ())))
                    v = v.reshape(c, n, q_block)
                    for r, (kx, ky) in enumerate(_ROWS_2D):
                        rows_acc[r] = rows_acc[r] + (
                            wy[ky][j] * wx[kx][i])[None] * v
            feats = jnp.stack([jnp.sum(a, axis=1) for a in rows_acc])

            # ---- stage 2: MLP + residual + loss, exact grads via vjp ----
            # The per-block loss contribution sum(res^2 * mask) / Q is a
            # closed scalar function of (MLP params, feats); in-kernel
            # reverse mode gives its exact cotangents — including the
            # 2*res/Q seed, the jvp-ladder transpose of pinn._mlp_derivs
            # and the occupancy mask — with zero host round trips.
            def blk(w1t_, b1c_, w2c_, b2v_, f5):
                def net(z):                                # (C,Qb)->(1,Qb)
                    # Unrolled VPU broadcast-FMAs, NOT dot_general: a f32
                    # dot defaults to one bf16 MXU pass (CLAUDE.md rule
                    # #1, ~1e-3 error on u that the residual squares) and
                    # HIGHEST would cost 6 tiny MXU passes per dot per
                    # derivative order.  At K = C (4) and hidden = 16 the
                    # contractions are vector work.
                    pre = b1c_
                    for ci in range(c):
                        pre = pre + w1t_[:, ci:ci + 1] * z[ci:ci + 1, :]
                    hdn = _tanh_precise(pre)
                    return (w2c_ * hdn).sum(axis=0, keepdims=True) + b2v_

                f = f5[0]
                u = net(f)
                u_d, u_dd = [], []
                for ax in range(2):
                    def first(fv, fxv):
                        return jax.jvp(net, (fv,), (fxv,))

                    (_, ux), (_, uxx) = jax.jvp(
                        first, (f, f5[1 + ax]), (f5[1 + ax], f5[3 + ax]))
                    u_d.append(ux)
                    u_dd.append(uxx)
                res = _residual(pde, u, u_d, u_dd)
                return jnp.sum(res * res * mask) * inv_q

            lb, vjp = jax.vjp(blk, w1t, b1c, w2c, b2v, feats)
            gw1t, gb1c, gw2c, gb2v, gfeats = vjp(jnp.float32(1.0))

            # Mosaic-safe tile assembly: .at[].set lowers to lax.scatter
            # and value-level dynamic_update_slice has no TPU lowering, so
            # every piece is placed with broadcast column/element masks —
            # pure VPU, exact.
            t_rows = stats_ref.shape[1]
            rpad = t_rows - hidden
            ri = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 128), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 128), 1)

            def _rowpad(x):
                if rpad == 0:
                    return x
                return jnp.concatenate(
                    [x, jnp.zeros((rpad, x.shape[1]), jnp.float32)], axis=0)

            def col(j):
                return (ci == j).astype(jnp.float32)

            tile = gb2v[0, 0] * ((ri == 0) & (ci == c + 2)
                                 ).astype(jnp.float32)
            tile = tile + lb * ((ri == 0) & (ci == c + 3)
                                ).astype(jnp.float32)
            for cj in range(c):
                tile = tile + _rowpad(gw1t[:, cj:cj + 1]) * col(cj)
            tile = tile + _rowpad(gb1c) * col(c)
            tile = tile + _rowpad(gw2c) * col(c + 1)
            stats_ref[0] = stats_ref[0] + tile

            # ---- stage 3: cotangent splat (fused2w bwd; gfeats already
            # carries the occupancy mask through the vjp) ----
            contrib = jnp.zeros((c * n, k_win), jnp.float32)
            for j in range(nsh):
                rb_ = ry[j] * wp
                for i in range(nsh):
                    pos = jnp.where(px[i] >= 0, rb_ + px[i], -1)
                    hit = (iota == pos).astype(jnp.float32)
                    pmat = jnp.zeros((c, n, q_block), jnp.float32)
                    for r, (kx, ky) in enumerate(_ROWS_2D):
                        pmat = pmat + (wy[ky][j] * wx[kx][i])[None] * \
                            gfeats[r][:, None, :]
                    contrib = contrib + mxu.onehot_dot(
                        pmat.reshape(c * n, q_block), hit,
                        (((1,), (1,)), ((), ())),
                        passes=mxu.passes_for(cfg))        # (C*N, K)

            @pl.when(meta_ref[0, s, _MG_SP] == 0)
            def _():
                cp.wait()

            rmw_scr[...] = rmw_scr[...] + contrib[None]

            @pl.when(meta_ref[0, s, _MG_SN] == 0)
            def _():
                cp2 = pltpu.make_async_copy(rmw_scr,
                                            acc_ref.at[pl.ds(bbin, 1)],
                                            sem_out)
                cp2.start()
                cp2.wait()


@functools.partial(jax.jit, static_argnames=("cfg", "pde", "hidden",
                                             "q_block", "sb", "interpret"))
def pallas_mega2w_step(cells, mlp_tile, points, cfg: SamplerConfig,
                       pde: str, hidden: int, q_block: int | None = None,
                       sb: int = 1, interpret: bool = False, plan=None):
    """One-pass train-step gradient: (loss, grads) with grads the pytree
    {"cells", "w1", "b1", "w2", "b2"} matching pinn.init_params.

    ``mlp_tile`` from pack_mlp; ``plan`` (fused2w.make_plan via
    ops.fused.make_sample_plan) hoists the per-step binning exactly like
    the two-kernel planned path — the slot layout is fused2w's, so v2w
    plans are valid here verbatim.
    """
    q_block = _resolve_qb(cfg, cells.shape, q_block)
    n, c, h, w = cells.shape
    q = points.shape[0]
    npad = _npad(n)
    wp, rows, gy, nsh, fp = _win_geom(w, cfg)
    nby, hp = _geom2(h, gy, fp)
    k_win = rows * wp
    positions, occ, y0, hasv, pts_p, qp = _plan_or_bin2(
        points, h, cfg, q_block, gy, plan)
    occ, y0, hasv, pts_p, qp = _pad_super(occ, y0, hasv, pts_p, qp,
                                          q_block, sb)
    nblocks = qp // q_block
    nsuper = nblocks // sb

    xyv = jnp.concatenate(
        [pts_p.T, occ[None].astype(jnp.float32)], axis=0
    ).reshape(3, nsuper, sb * q_block).transpose(1, 0, 2)
    offsets = multicell_offsets(n, cfg.multicell, jnp.float32)[:, None]
    offsets = jnp.pad(offsets, ((0, npad - n), (0, 0)))
    cells_p = jnp.pad(cells, ((0, npad - n),) + ((0, 0),) * 3)
    wins = _windows2(_pad_grid(cells_p, h, w, hp, wp, fp, cfg), nby, gy,
                     rows)
    wins0 = jnp.zeros((nby, c * npad, k_win), jnp.float32)

    bi = jnp.arange(nblocks, dtype=jnp.int32)
    bb = y0 // gy
    bbn = jnp.roll(bb, -1).at[-1].set(bb[-1])
    first = (bi == 0).astype(jnp.int32)
    hn = jnp.roll(hasv, -1).at[-1].set(0)
    parity = (bi % 2).astype(jnp.int32)
    same = (y0 == jnp.roll(y0, -1))
    sn = (same & (hn > 0) & (bi < nblocks - 1)).astype(jnp.int32)
    sp = jnp.roll(sn, 1).at[0].set(0)
    meta = jnp.stack([y0, hasv, bbn, first, hn, parity, sp, sn],
                     axis=1).astype(jnp.int32).reshape(nsuper, sb, 8)

    t_rows = _tile_rows(hidden)
    kernel = functools.partial(
        _mega2w_kernel, cfg=cfg, spatial=(h, w), gy=gy, q_block=q_block,
        sb=sb, channels=c, n_cells=npad, wp=wp, hidden=hidden, pde=pde,
        inv_q=1.0 / q)
    acc, stats = pl.pallas_call(
        kernel,
        grid=(nsuper,),
        in_specs=[
            pl.BlockSpec((1, 3, sb * q_block), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, 8), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, 1), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_rows, 128), lambda qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, t_rows, 128), lambda qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nby, c * npad, k_win), jnp.float32),
            jax.ShapeDtypeStruct((nsuper, t_rows, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c * npad, k_win), wins.dtype),
            pltpu.VMEM((1, c * npad, k_win), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xyv, meta, offsets, mlp_tile, wins, wins0)

    # epilogue: overlap-add the window cotangents, crop to API layout
    cacc = _scatter_windows2(acc, nby, gy, rows, c * npad, hp, wp, fp)
    cacc = cacc.reshape(c, npad, hp, wp)[:, :n, fp:fp + h, :w]
    cells_bar = cacc.transpose(1, 0, 2, 3).astype(cells.dtype)

    st = stats.sum(axis=0)
    grads = {
        "cells": cells_bar,
        "w1": st[0:hidden, 0:c].T,
        "b1": st[0:hidden, c],
        "w2": st[0:hidden, c + 1:c + 2],
        "b2": st[0:1, c + 2],
    }
    return st[0, c + 3], grads
