"""Benchmark: the reference's 2D PINN training workload on TPU.

Workload = test/test_2d.py:20-26,221-230 of the reference: 96 cells x 4ch x
16x16 grids, 100k collocation points, cosine+multicell, Allen-Cahn residual
(needs u, u_y, u_xx), full gradient to the cells, Adam step.

Prints ONE JSON line:
  value       = PINN training iterations/sec on the FUSED flagship path
                (single-pass value/jac/diag-Hessian Pallas kernel +
                forward-over-forward MLP propagation, ops/fused.py)
  vs_baseline = speedup over "naive JAX": identical pipeline with the
                derivatives re-derived by nested jax.grad tracing through a
                plain XLA gather/scatter sampler — the baseline the
                reference's custom CUDA chain was built to beat
                (README.md:3); BASELINE.md targets >= 10x.

Guaranteed-output design (round-3 postmortem: the driver killed the run at
its timeout with NOTHING on stdout, BENCH_r03.json rc=124/parsed=null):

* results accumulate in a module dict; whatever has been measured when the
  process ends — normally, or via the watchdog — is what prints;
* a tiny-op tunnel probe runs first under a short timer, so a wedged TPU
  tunnel yields an honest-failure JSON in ~3 min, not a driver kill;
* the 2D flagship (exact, then bf16) is measured FIRST; every later stage
  is budget-gated on remaining wall clock and individually best-effort;
* the watchdog fires WELL under the driver's timeout and emits the
  best-so-far dict (exit 0 if the flagship landed, 2 otherwise);
* the program count is pruned to the flagship surface — per-cell, isolated
  fwd/bwd passes, fast-precision modes and the 3D roofline live in
  scripts/ (bench_percell.py, bench_large.py, bench_fast.py,
  bench_kernels.py) with their numbers recorded in BENCHMARKS.md.

Progress lines go to stderr so the driver still gets exactly one stdout line.
"""

import dataclasses
import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosinesampler_tpu.utils import compile_cache
from cosinesampler_tpu.models import pinn
from cosinesampler_tpu.ops import generic
from cosinesampler_tpu.ops.config import SamplerConfig

N_POINTS = 100_000
# 50+ iterations per timed scan: the axon tunnel charges a FIXED ~60 ms
# per jitted call (dispatch round trip, measured scripts/time_floor.py),
# so short scans inflate every per-step number by fixed/reps ms.
N_ITERS = 50

# The driver's budget is not published; round 2's successful run (~17
# programs + 2 min backend init, warm cache) bounds it at >= ~12 min, so
# an 11-min watchdog fires safely under it while leaving room for a
# cold-cache run to land the flagship stages (~3 min in) plus several
# more.  Warm-cache full coverage takes 2.5-6 min (BENCHMARKS.md).
WATCHDOG_S = int(os.environ.get("BENCH_WATCHDOG_S", "660"))
# Optional stages start only while this much of the watchdog is unspent;
# a stage that then overruns is still bounded by the watchdog itself.
BUDGET_S = max(60, WATCHDOG_S - 180)
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_S", "240"))

# last TPU-measured naive-XLA baseline (BENCHMARKS.md), used (and flagged
# in extras) when the budget runs out before re-measuring it this run
RECORDED_NAIVE_PPS = 74_500.0

_START = time.monotonic()

RESULTS = {
    "metric": "2D multicell PINN train iters/sec "
              "(96x4x16x16 cells, 100k pts, Allen-Cahn 2nd-order; "
              "fastest exact pipeline — extras['headline_pipeline'] says "
              "which; vs_baseline = points/sec speedup over naive "
              "nested-grad XLA, which OOMs above 25k pts)",
    "value": 0.0,
    "unit": "iters/sec",
    "vs_baseline": 0.0,
    "extra": {},
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def log(msg):
    print(f"[bench] {msg} (t={time.monotonic() - _START:.0f}s)",
          file=sys.stderr, flush=True)


def elapsed():
    return time.monotonic() - _START


def emit():
    """Print the one-line JSON contract exactly once (main path or timer)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(RESULTS), flush=True)


def _arm_timer(seconds, reason):
    """After ``seconds``: emit best-so-far and exit (0 iff flagship landed).

    The remote-TPU tunnel can wedge in ways that block compiles forever
    (observed after device faults); without this the driver would time the
    whole process out and record NOTHING (BENCH_r03.json).
    """
    def fire():
        RESULTS["extra"]["aborted"] = (
            f"{reason} after {seconds}s; results above are best-so-far "
            "(see BENCHMARKS.md for full session-measured tables)")
        log(f"WATCHDOG: {reason}; emitting best-so-far")
        emit()
        os._exit(0 if RESULTS["value"] > 0 else 2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _naive_field(params, pts, cfg: pinn.PINNConfig):
    """Same model, raw XLA sampler, all derivatives traced by JAX."""
    cells = params["cells"]
    n = cells.shape[0]
    q = pts.shape[0]
    grid = jnp.broadcast_to(pts[None, None], (n, 1, q, 2))
    scfg = SamplerConfig(dim=2, kernel=cfg.kernel, padding_mode="zeros",
                         multicell=True, backend="xla")
    out = generic.blend(cells, grid, scfg, (0, 0))
    feats = out.reshape(n, cfg.cell_dim, q).sum(0)
    return pinn._mlp(params, feats.T)


def _make_naive_loss(cfg):
    def u(params, pts):
        return _naive_field(params, pts, cfg)

    def u_d(params, pts, ax):
        return jax.grad(lambda p: u(params, p).sum())(pts)[:, ax]

    def u_dd(params, pts, ax):
        return jax.grad(lambda p: u_d(params, p, ax).sum())(pts)[:, ax]

    def loss(params, pts):
        uv = u(params, pts)
        f = (2.0 * u_d(params, pts, 1) + 5.0 * uv**3 - 5.0 * uv
             - 1e-4 * u_dd(params, pts, 0))
        return jnp.mean(f**2)

    return loss


def _timed(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    # Force a device->host VALUE fetch: through the axon tunnel,
    # block_until_ready alone can resolve against a replayed future and
    # report microsecond-scale times for multi-ms programs.
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return time.perf_counter() - t0


def _bench(step, params, opt_state, pts, name, n_iters=N_ITERS):
    """Time n_iters steps inside ONE jitted lax.scan.

    Looping a jitted call from Python is untrustworthy on this stack: the
    remote-TPU tunnel pipelines dispatches and short-circuits repeats, so
    wall-clock around a Python loop measures dispatch, not device time.  A
    scan with the carried training state is a single device program (the
    tunnel additionally charges a fixed ~60 ms per call, hence N_ITERS=50
    for the fast pipelines; slow pipelines can amortize with fewer).
    """

    @jax.jit
    def run(params, opt_state, pts):
        def body(carry, _):
            p, s = carry
            p, s, lval = step(p, s, pts)
            return (p, s), lval
        (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=n_iters)
        return losses

    t0 = time.perf_counter()
    losses = run(params, opt_state, pts)
    jax.block_until_ready(losses)
    log(f"{name}: compile+first-run {time.perf_counter() - t0:.1f}s "
        f"(loss {float(losses[0]):.5f} -> {float(losses[-1]):.5f})")
    # The shared-tunnel device shows +-4x run-to-run throughput swings;
    # best-of-3 on fresh inputs is the closest observable to device
    # capability (worst runs reflect tunnel contention, not the kernels).
    dt = min(_timed(run, params, opt_state, pts * (0.999 - 1e-4 * i))
             for i in range(3))
    ips = n_iters / dt
    log(f"{name}: {ips:.3f} iters/sec ({1e3 / ips:.2f} ms/step)")
    return ips


def _kernel_roofline(params, pts, cfg, generation, reps=50):
    """Time the fused fwd kernel alone; report HBM% and MXU utilization.

    The kernel is iterated inside ONE jitted scan (with a serializing data
    dependency) so per-dispatch tunnel latency doesn't pollute the number.
    The binning/slot prep is hoisted out of the measured loop: the plan is
    precomputed (make_sample_plan) and the serializing dependency runs
    through the CELLS, so the scan body is the Pallas kernel pass and
    nothing else — the occupancy number is the kernel's, not the prep's.
    The one-hot-contraction kernels are MXU-bound, not HBM-bound, so the
    meaningful occupancy number is achieved MACs vs the bf16 MXU peak
    (utils/profiling.mxu_roofline).
    """
    from cosinesampler_tpu.ops.fused import (make_sample_plan,
                                             sample_features_padded)
    from cosinesampler_tpu.utils.profiling import (V5E_HBM_GBPS,
                                                   fused_gather_macs,
                                                   mxu_roofline)

    plan = make_sample_plan(pts, params["cells"].shape, cfg.sampler)

    @jax.jit
    def many(c, p):
        def body(carry, _):
            # slot API: the kernel pass the train step runs, without the
            # query-order output gather polluting the occupancy number
            out, _, _ = sample_features_padded(carry, p, cfg.sampler,
                                               plan=plan)
            # serialize: next cells depend (non-foldably) on this output
            carry = carry + 1e-30 * out[0, 0, 0]
            return carry, out[0, 0, 0]
        carry, vals = jax.lax.scan(body, c, None, length=reps)
        return vals.sum() + carry.sum()

    r = many(params["cells"], pts)
    jax.block_until_ready(r)
    # perturb the CELLS between invocations (the plan is point-set-specific)
    sec = min(_timed(many, params["cells"] * (0.999 - 1e-4 * i), pts)
              for i in range(3)) / reps
    n, c = params["cells"].shape[:2]
    spatial = params["cells"].shape[2:]
    q = pts.shape[0]
    k_rows = 1 + 2 * cfg.dim
    bytes_moved = (params["cells"].size + q * cfg.dim + k_rows * c * q) * 4
    gbps = bytes_moved / sec / 1e9
    macs = fused_gather_macs(generation, n, c, spatial, q)
    mxu = mxu_roofline(sec, macs)
    log(f"fused fwd kernel ({generation}): {sec * 1e6:.0f}us, {gbps:.0f} "
        f"GB/s ({100 * gbps / V5E_HBM_GBPS:.1f}% HBM), "
        f"{mxu['achieved_tmacs_per_sec']:.1f} TMAC/s "
        f"({mxu['mxu_pct']:.0f}% of v5e bf16 MXU peak)")
    return sec, 100 * gbps / V5E_HBM_GBPS, mxu["mxu_pct"]


def _bench_3d(optimizer, precision="exact"):
    """3D Helmholtz step at the reference's 3D workload (test_3d.py:14-19)."""
    rng = np.random.RandomState(1)
    cfg = pinn.PINNConfig(dim=3, n_cells=50, cell_dim=4, cell_size=16,
                          kernel="cosine", pde="helmholtz", backend="auto",
                          precision=precision)
    params = pinn.init_params(jax.random.PRNGKey(1), cfg)
    opt_state = optimizer.init(params)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, size=(N_POINTS, 3)),
                      dtype=jnp.float32)
    step = jax.jit(pinn.make_train_step(cfg, optimizer, slot_resident=True))
    return _bench(step, params, opt_state, pts,
                  f"fused3d@100k[{precision}]")


def _stage(name, est_seconds, fn):
    """Run one best-effort stage iff the wall-clock budget allows it.

    Every stage updates RESULTS itself as soon as its number exists, so the
    watchdog path always emits whatever has been measured.
    """
    if elapsed() + est_seconds > BUDGET_S:
        log(f"SKIP {name}: {est_seconds}s estimated, "
            f"{BUDGET_S - elapsed():.0f}s of budget left")
        RESULTS["extra"].setdefault("skipped_for_budget", []).append(name)
        return
    try:
        fn()
    except Exception as e:  # pragma: no cover - infra dependent
        log(f"{name} failed ({type(e).__name__}: {e})")
        RESULTS["extra"].setdefault("failed_stages", []).append(name)


def _probe_tunnel():
    """A trivial op under a short timer: fail fast if the tunnel is wedged.

    The timer is armed BEFORE the first backend-touching call: even
    ``jax.default_backend()`` blocks on remote backend init through the
    tunnel (observed ~1-2 min cold), so nothing jax may run outside the
    protected region.
    """
    log(f"probing TPU tunnel (timeout {PROBE_TIMEOUT_S}s)")
    t = _arm_timer(PROBE_TIMEOUT_S, "TPU tunnel unresponsive to a tiny op")
    x = float(jnp.ones((8, 128)).sum())
    t.cancel()
    log(f"tunnel ok (platform={jax.default_backend()}, tiny op = {x:.0f})")


def _large_sweep_flagship(rng):
    """BASELINE config 5 (16 x 4 x 128^3, 1M pts): the flagship 128^3
    train-step configurations only — vol-resident exact, vol-resident bf16
    and (API-layout) planned.  Isolated fwd/bwd passes and the plain/slot
    variants live in scripts/bench_large.py / scripts/bench_fast.py.
    """
    from cosinesampler_tpu.ops.fused import make_sample_plan

    cells = jnp.asarray(rng.rand(16, 4, 128, 128, 128), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (1_000_000, 3)), jnp.float32)
    reps = 10
    pcfg = pinn.PINNConfig(dim=3, n_cells=16, cell_dim=4, cell_size=128,
                           pde="helmholtz", backend="auto")
    params = {"cells": cells, **{k: v for k, v in pinn.init_params(
        jax.random.PRNGKey(3), pcfg).items() if k != "cells"}}
    optimizer = optax.adam(1e-3)

    def scan_step(step):
        @jax.jit
        def many(params, opt_state, p, plan):
            def body(carry, _):
                pp, ss = carry
                pp, ss, lval = step(pp, ss, p, plan)
                return (pp, ss), lval
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=reps)
            return losses
        return many

    def time_planned(many, params_x, opt_state_x, plan_of):
        # fresh perturbed points per trial (tunnel-replay defense); the
        # plan for them is built OUTSIDE the timed region — that is the
        # whole point of planning over a fixed point set
        def one_trial(i):
            p = pts * (0.999 - 1e-4 * i)
            plan = plan_of(p)
            jax.block_until_ready(plan)
            return _timed(many, params_x, opt_state_x, p, plan)

        t0 = time.perf_counter()
        jax.block_until_ready(many(params_x, opt_state_x, pts, plan_of(pts)))
        log(f"  compile+first-run {time.perf_counter() - t0:.1f}s")
        return min(one_trial(i) for i in range(3)) / reps

    def vol_variant(precision, key_ms):
        # vol-resident planned step: the cells live in the v4 KERNEL layout
        # across steps (ops.fused.make_fused_vol), deleting the per-step
        # ~0.6 GB volume pad+transpose (fwd) and gradient crop+transpose
        # (bwd).  Under precision="bf16" the KERNEL-layout volume itself is
        # bf16 (params_to_vol quantizes via mxu.data_cast): half the HBM
        # for master+optimizer state and half the bytes per brick DMA —
        # the TPU-native analog of running the reference end-to-end in
        # half (cosine_sampler_2d_kernel.cu:905).
        cfg_p = dataclasses.replace(pcfg, precision=precision)
        step = jax.jit(pinn.make_train_step(cfg_p, optimizer,
                                            vol_resident=True))
        params_v = pinn.params_to_vol(params, cfg_p, pts.shape[0])
        opt_state_v = optimizer.init(params_v)
        # the autotune signature includes the precision, so each route may
        # tune a different slot geometry — build ITS plan
        plan_of = lambda p: make_sample_plan(p, (16, 4, 128, 128, 128),
                                             cfg_p.sampler)
        sec = time_planned(scan_step(step), params_v, opt_state_v, plan_of)
        RESULTS["extra"][key_ms] = round(sec * 1e3, 1)
        log(f"128^3 train step (vol-resident {precision}): "
            f"{sec * 1e3:.0f} ms = {1.0 / sec:.1f} Mpts/s")

    # est 150 s: warm-cache variants run in ~30 s each (measured, round-4
    # rehearsals); 150 covers one fresh compile without starving the rest
    _stage("128^3 vol-resident exact", 150,
           lambda: vol_variant("exact",
                               "large_sweep_16x4x128c_1M_train_step_vol_ms"))
    _stage("128^3 vol-resident bf16", 150,
           lambda: vol_variant(
               "bf16", "large_sweep_16x4x128c_1M_train_step_vol_bf16_ms"))

    def planned_variant():
        # planned (API-layout) step: the portable configuration users who
        # keep cells in the public (N, C, D, H, W) layout get
        step = jax.jit(pinn.make_train_step(pcfg, optimizer, planned=True))
        opt_state = optimizer.init(params)
        plan_of = lambda p: make_sample_plan(p, (16, 4, 128, 128, 128),
                                             pcfg.sampler)
        sec = time_planned(scan_step(step), params, opt_state, plan_of)
        RESULTS["extra"]["large_sweep_16x4x128c_1M_train_step_planned_ms"] = \
            round(sec * 1e3, 1)
        log(f"128^3 train step (planned): {sec * 1e3:.0f} ms")

    _stage("128^3 planned", 150, planned_variant)

    def attribution():
        # VERDICT r4 #7: the 128^3 step's fwd-kernel / bwd-kernel split +
        # the HBM-BW% of the backward's RMW accumulator traffic, captured
        # in the driver record each round (BASELINE "HBM-BW-bound, report
        # HBM BW %").  Isolated vol-layout kernel scans at bf16, plan
        # prebuilt, tuned kwargs (incl. the round-5 sb).
        from cosinesampler_tpu.ops.pallas import _tuned, fused3b
        from cosinesampler_tpu.utils.profiling import V5E_HBM_GBPS

        shape = (16, 4, 128, 128, 128)
        cfg_b = dataclasses.replace(pcfg, precision="bf16")
        scfg = cfg_b.sampler
        kw = _tuned(fused3b, scfg, shape, pts.shape[0])
        plan = make_sample_plan(pts, shape, scfg)
        qp = plan[1].shape[0]
        vol = fused3b.cells_to_vol(cells.astype(jnp.bfloat16), scfg,
                                   gy=kw.get("gy", fused3b.V3B_GY),
                                   rb=kw.get("rb"))
        gp = jnp.ones((7, 4, qp), jnp.float32)
        reps_k = 10

        def scan_kernel(fn, x):
            # pts/plan ride as ARGUMENTS, never closure constants: a 1M
            # closure constant embeds in the HLO and blows the remote
            # compile service's request-size limit (HTTP 413) — and
            # poisons trace time (CLAUDE.md big-closure lesson)
            @jax.jit
            def many(v, p, pl):
                def body(carry, _):
                    out = fn(carry, p, pl)
                    bump = (1e-30 * out).astype(carry.dtype)
                    return carry + bump, out
                carry, vals = jax.lax.scan(body, v, None, length=reps_k)
                return vals.sum() + carry.ravel()[0].astype(jnp.float32)
            r = many(x, pts, plan)
            jax.block_until_ready(r)
            return min(_timed(many, x * (0.999 - 1e-4 * i), pts, plan)
                       for i in range(3)) / reps_k

        sf = scan_kernel(
            lambda v, p, pl: fused3b.pallas_fused3b_blend_vol(
                v, p, scfg, 16, 4, (128, 128, 128), plan=pl,
                **kw)[0][0, 0, 0], vol)
        sg = scan_kernel(
            lambda g, p, pl: fused3b.pallas_fused3b_bwd_vol(
                g, p, (128, 128, 128), scfg, 16, plan=pl,
                **kw)[0, 0, 0, 0], gp)
        # RMW accumulator traffic: one read + one write of every visited
        # super-brick region (transitions ~= super-brick count)
        d_, h_ = 128, 128
        fp = 2
        gyv = kw.get("gy", fused3b.V3B_GY)
        rbv = kw.get("rb") or fused3b.V3B_RB
        nby = -(-(h_ + 2) // gyv)
        nsb = (d_ + 2) * (-(-nby // rbv))
        brick_bytes = (rbv * gyv + fp) * 2 * 4 * 16 * 128 * 4
        rmw_gb = 2 * nsb * brick_bytes / 1e9
        rmw_pct = 100 * (rmw_gb / sg) / V5E_HBM_GBPS
        RESULTS["extra"]["large_sweep_fwd_kernel_bf16_ms"] = \
            round(sf * 1e3, 1)
        RESULTS["extra"]["large_sweep_bwd_kernel_bf16_ms"] = \
            round(sg * 1e3, 1)
        RESULTS["extra"]["large_sweep_bwd_rmw_traffic_hbm_pct"] = \
            round(rmw_pct, 1)
        log(f"128^3 kernels (bf16): fwd {sf * 1e3:.1f} ms, bwd "
            f"{sg * 1e3:.1f} ms; RMW traffic {rmw_gb:.2f} GB = "
            f"{rmw_pct:.1f}% of HBM peak over the bwd")

    _stage("128^3 attribution", 120, attribution)


def main():
    compile_cache.enable()
    watchdog = _arm_timer(WATCHDOG_S, "bench watchdog")
    log(f"watchdog {WATCHDOG_S}s, stage budget {BUDGET_S}s")
    _probe_tunnel()

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, size=(N_POINTS, 2)),
                      dtype=jnp.float32)
    optimizer = optax.adam(1e-3)
    cfg = pinn.PINNConfig(dim=2, n_cells=96, cell_dim=4, cell_size=16,
                          kernel="cosine", pde="allen_cahn", backend="auto")
    params = pinn.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)

    # ---- flagship FIRST: 2D exact train step (the headline number) ----
    # slot-resident: the residual stays in the sampler's bin-slot layout,
    # skipping the per-step output gather + cotangent scatter
    fused_step = jax.jit(pinn.make_train_step(cfg, optimizer,
                                              slot_resident=True))
    ours_ips = _bench(fused_step, params, opt_state, pts, "fused@100k")
    RESULTS["value"] = round(ours_ips, 3)
    # until/unless the naive baseline is re-measured below, the ratio uses
    # the last TPU-measured baseline and says so
    RESULTS["vs_baseline"] = round(ours_ips * N_POINTS / RECORDED_NAIVE_PPS,
                                   3)
    RESULTS["extra"]["naive_baseline"] = "recorded"

    def two_d_precision(prec):
        # reduced-precision MXU modes ("fast": 2-pass bf16 split ~4e-6 rel
        # err; "bf16": single pass on bf16-quantized cells, ~2e-3 — see
        # ops/pallas/mxu.py and BENCHMARKS.md); f32 master params either way
        cfg_p = dataclasses.replace(cfg, precision=prec)
        step_p = jax.jit(pinn.make_train_step(cfg_p, optimizer,
                                              slot_resident=True))
        ips = _bench(step_p, params, opt_state, pts, f"fused@100k[{prec}]")
        RESULTS["extra"][f"pinn2d_{prec}_precision_iters_per_sec"] = \
            round(ips, 3)

    _stage("2D bf16", 180, lambda: two_d_precision("bf16"))

    def megakernel(prec):
        # v6 one-pass train-step gradient (ops/pallas/mega2w.py): blend +
        # in-kernel MLP/residual vjp + cotangent splat in ONE Pallas
        # kernel — faster AND more accurate than the two-kernel step
        # (BENCHMARKS.md round-5 section).  plan=None: the scan hoists
        # the point-invariant binning, matching the flagship methodology.
        cfg_p = dataclasses.replace(cfg, precision=prec)
        if not pinn.mega_available(cfg_p, N_POINTS):
            log(f"megakernel[{prec}]: not routed for this shape")
            return
        step4 = pinn.make_train_step(cfg_p, optimizer, megakernel=True)
        step_p = jax.jit(lambda p, s, x: step4(p, s, x, None))
        ips = _bench(step_p, params, opt_state, pts, f"mega@100k[{prec}]")
        RESULTS["extra"][f"pinn2d_mega_{prec}_iters_per_sec"] = \
            round(ips, 3)
        if prec == "exact" and ips > RESULTS["value"]:
            # promote: the megakernel is the flagship when it wins (the
            # two-kernel number stays in extras for continuity)
            RESULTS["extra"]["pinn2d_twokernel_iters_per_sec"] = \
                RESULTS["value"]
            RESULTS["extra"]["headline_pipeline"] = "megakernel"
            naive_pps = (RESULTS["value"] * N_POINTS
                         / max(RESULTS["vs_baseline"], 1e-9))
            RESULTS["value"] = round(ips, 3)
            RESULTS["vs_baseline"] = round(ips * N_POINTS / naive_pps, 3)

    _stage("2D megakernel exact", 120, lambda: megakernel("exact"))
    _stage("2D megakernel bf16", 120, lambda: megakernel("bf16"))

    def naive_baseline():
        # The naive nested-grad graph cannot even fit the reference's
        # 100k-point workload on one v5e (XLA OOM: 19.2G of 15.75G HBM) —
        # run it at the largest feasible size and compare points/sec.
        naive_q = 25_000
        naive_loss = _make_naive_loss(cfg)

        @jax.jit
        def naive_step(params, opt_state, pts):
            lval, grads = jax.value_and_grad(naive_loss)(params, pts)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, g: p + g, params,
                                            updates)
            return params, opt_state, lval

        naive_ips = _bench(naive_step, params, opt_state, pts[:naive_q],
                           f"naive@{naive_q}", n_iters=10)
        naive_pps = naive_ips * naive_q
        RESULTS["vs_baseline"] = round(
            RESULTS["value"] * N_POINTS / naive_pps, 3)
        RESULTS["extra"]["naive_baseline"] = "measured"
        log(f"fused {RESULTS['value'] * N_POINTS:.0f} pts/s vs naive "
            f"{naive_pps:.0f} pts/s")

    _stage("naive baseline", 180, naive_baseline)

    def three_d(prec):
        ips = _bench_3d(optimizer, precision=prec)
        k = ("pinn3d_helmholtz_50x4x16c_100k_iters_per_sec" if prec == "exact"
             else f"pinn3d_{prec}_precision_iters_per_sec")
        RESULTS["extra"][k] = round(ips, 3)

    _stage("3D exact", 180, lambda: three_d("exact"))
    _stage("3D bf16", 180, lambda: three_d("bf16"))

    def roofline_2d():
        sec, hbm, mxu = _kernel_roofline(params, pts, cfg, "v5_2d")
        RESULTS["extra"]["fused_fwd_kernel_us"] = round(sec * 1e6, 1)
        RESULTS["extra"]["fused_fwd_hbm_pct_of_v5e_peak"] = round(hbm, 1)
        RESULTS["extra"]["fused_fwd_mxu_pct_of_v5e_bf16_peak"] = \
            round(mxu, 1)

    _stage("2D kernel roofline", 120, roofline_2d)

    if elapsed() + 150 <= BUDGET_S:
        _large_sweep_flagship(np.random.RandomState(7))
    else:
        log("SKIP 128^3 large sweep: budget")
        RESULTS["extra"].setdefault("skipped_for_budget", []).append(
            "128^3 large sweep")

    # autotune coverage: which signatures ran WITHOUT a tuned entry this
    # process (VERDICT r3 #8) — off-table shapes ride pick_q_block
    # heuristics, typically a few % to ~15% off tuned
    from cosinesampler_tpu.utils import autotune
    RESULTS["extra"]["autotune_missed_signatures"] = \
        autotune.missed_signatures()

    watchdog.cancel()
    emit()


if __name__ == "__main__":
    main()
