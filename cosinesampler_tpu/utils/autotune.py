"""Measured block-size selection for the binned kernel generations.

The binned Pallas kernels take a static query-block size (``q_block``; the
v4 bricked kernels additionally a y-group size ``gy``) whose best value
depends on the workload shape: per-query MXU work is block-size-invariant,
so smaller blocks cut per-bin padding slots, but each block pays fixed
window-DMA and grid overhead (measured sweeps in BENCHMARKS.md).  The
shipped defaults (fused2w.V2W_Q_BLOCK, fused3w.V3W_Q_BLOCK,
fused3b.V3B_Q_BLOCK) were hand-picked from those sweeps at the reference
workload shapes; this module turns that into a subsystem:

* ``tune(...)`` measures the candidate grid for a (generation, shape,
  config, query-count) signature on the live device — fwd + bwd of the
  slot-resident kernel pass, binning hoisted via a precomputed plan, timed
  inside one jitted ``lax.scan`` (per-dispatch tunnel latency would
  otherwise dominate; see bench.py) — and persists the winner.
* ``lookup(...)`` is consulted by the pallas dispatcher at trace time
  (ops/pallas/__init__), so the plan builder and the kernels always agree
  on the block size.  A tuned value is re-validated against the
  generation's ``supports()`` VMEM gates before use; an empty cache leaves
  routing byte-identical to the hand-picked defaults.

Two cache layers: a table shipped with the package
(``cosinesampler_tpu/data/autotune.json``, measured on TPU v5e) and a
user-writable overlay (``$COSINESAMPLER_TUNE_CACHE`` or
``~/.cache/cosinesampler_tpu/autotune.json``); the overlay wins.  Set
``COSINESAMPLER_AUTOTUNE=0`` to disable lookups entirely.

No reference analog: the CUDA reference hardcodes its launch shapes
(512/256 threads per block, cosine_sampler_2d_kernel.cu:266,360) because a
grid-stride loop is shape-oblivious; the TPU kernels' bin padding makes the
block size a real, shape-dependent throughput knob.
"""

from __future__ import annotations

import json
import math
import os
import time
from pathlib import Path
from typing import Dict, Optional

_SHIPPED = Path(__file__).resolve().parent.parent / "data" / "autotune.json"

# process-lifetime snapshot: lookups must be deterministic within a process
# so a plan built early and a kernel traced later agree on q_block.
_cache: Optional[Dict[str, dict]] = None


def user_cache_path() -> Path:
    env = os.environ.get("COSINESAMPLER_TUNE_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "cosinesampler_tpu" / "autotune.json"


def _load_file(path: Path) -> Dict[str, dict]:
    try:
        with open(path) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def _load() -> Dict[str, dict]:
    global _cache
    if _cache is None:
        merged = _load_file(_SHIPPED)
        merged.update(_load_file(user_cache_path()))
        _cache = merged
    return _cache


def reset_cache() -> None:
    """Drop the in-process snapshot (tests; after an external tune run)."""
    global _cache
    _cache = None


def _device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # pragma: no cover - no backend at all
        return "unknown"


def _qbucket(n_queries: int) -> int:
    """Query counts bucketed to the next power of two: the best block size
    moves with the queries-per-bin ratio, not the exact count."""
    return 1 << max(10, math.ceil(math.log2(max(1, n_queries))))


def key(generation: str, cells_shape, cfg, n_queries: int,
        device_kind: Optional[str] = None) -> str:
    shp = "x".join(str(int(s)) for s in cells_shape)
    return "|".join((
        device_kind or _device_kind(), generation, shp,
        cfg.padding_mode, f"mc={int(cfg.multicell)}",
        f"prec={cfg.precision}", f"q={_qbucket(n_queries)}"))


_missed: set = set()


def missed_signatures():
    """Signatures looked up WITHOUT a tuned entry this process (sorted).

    Off-table shapes fall back to the adaptive ``pick_q_block`` heuristics
    — correct, but typically a few % to ~15% off the tuned optimum
    (BENCHMARKS.md autotune section).  Tune them on the target device with
    ``python -m cosinesampler_tpu.utils.autotune`` or ``tune(...)``.
    """
    return sorted(_missed)


def lookup(generation: str, cells_shape, cfg,
           n_queries: int) -> Optional[dict]:
    """Tuned ``{"q_block": int[, "gy": int, "rb": int]}`` for this
    signature, or None (module defaults).  Disabled by
    COSINESAMPLER_AUTOTUNE=0."""
    if os.environ.get("COSINESAMPLER_AUTOTUNE", "1") == "0":
        return None
    k = key(generation, cells_shape, cfg, n_queries)
    entry = _load().get(k)
    if not entry:
        # Surface the gap once per process, only on real TPU devices (the
        # heuristics are measured-good there but not optimal; CPU/interpret
        # runs would warn on every test).  Further misses accumulate in
        # missed_signatures() for tooling.
        if not _missed and k.lower().startswith("tpu"):
            import warnings

            warnings.warn(
                f"cosinesampler_tpu: no autotune entry for {k}; using the "
                "pick_q_block heuristics (usually within ~15% of tuned). "
                "Tune this shape once with `python -m "
                "cosinesampler_tpu.utils.autotune` on the target device; "
                "see utils.autotune.missed_signatures() for all misses.",
                stacklevel=3)
        _missed.add(k)
        return None
    return {k_: int(v) for k_, v in entry.items()
            if k_ in ("q_block", "gy", "rb", "sb")} or None


def record(generation: str, cells_shape, cfg, n_queries: int, params: dict,
           *, measurements: Optional[dict] = None,
           path: Optional[Path] = None) -> Path:
    """Persist a tuned entry to the user overlay (creates parents)."""
    path = path or user_cache_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    data = _load_file(path)
    entry = dict(params)
    if measurements:
        entry["measured_us"] = {str(k): round(float(v), 1)
                                for k, v in measurements.items()}
    data[key(generation, cells_shape, cfg, n_queries)] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    reset_cache()
    return path


# ---------------------------------------------------------------- tuning

_GENERATIONS = ("v2w", "v3w", "v3b")


def _modules():
    from ..ops.pallas import fused2w, fused3b, fused3w

    return {"v2w": fused2w, "v3w": fused3w, "v3b": fused3b}


def _candidates(generation: str):
    """(q_block[, gy, rb]) grid per generation.  v4's gy widens the bin
    (fewer bins -> fewer padding-tail blocks, but a taller per-query MXU
    window) and rb widens the super-brick DMA — two real knobs there.

    The v2w kernels also take ``sb`` (sub-blocks per grid step,
    fused2w._pad_super) and lookup() honors recorded entries carrying it,
    but it is not in the default sweep: measured a wash on the flagship
    workload (scripts/tune_sb.py: 4.86/4.91/4.87 ms at sb=1/4/8 — the
    per-grid-step cost of the windowed kernels is already overlapped,
    unlike the v4 bricked 16k-block grids where it was first measured)."""
    # COSINESAMPLER_TUNE_QB restricts the q_block axis of a sweep (comma
    # list) — remote compiles cost minutes each, so pruning a knob that a
    # previous sweep already settled (e.g. q_block=256 lost every exact
    # v3b measurement) cuts sweep wall-clock ~2x.
    qb_env = os.environ.get("COSINESAMPLER_TUNE_QB")
    qb_filter = (tuple(int(x) for x in qb_env.split(",")) if qb_env
                 else None)

    def qbs(default):
        return qb_filter or default

    if generation == "v3b":
        # gy=8 / rb=16 join the grid for the reduced-precision modes
        # (VERDICT r3 #3): bf16 halves the brick bytes and the split-copy
        # VMEM, so fatter bricks (fewer, larger blocks — the 128^3 fwd is
        # per-block fixed-cost-bound) become feasible; supports() prunes
        # infeasible combos per precision.
        # sb (sub-blocks per grid step) joined the grid in round 5: ~2%
        # measured at 128^3/sb=8 (scripts/time_sb.py); {1, 8} keeps the
        # sweep bounded.
        return [{"q_block": qb, "gy": gy, "rb": rb, "sb": sbv}
                for qb in qbs((128, 256))
                for gy in (2, 4, 8) for rb in (4, 8, 16)
                for sbv in (1, 8)]
    return [{"q_block": qb} for qb in qbs((128, 256, 512, 1024))]


def _entry_fns(generation: str):
    mod = _modules()[generation]
    if generation == "v2w":
        return mod, mod.pallas_fused2w_blend_padded, mod.pallas_fused2w_bwd_padded
    if generation == "v3w":
        return mod, mod.pallas_fused3w_blend_padded, mod.pallas_fused3w_bwd_padded
    return mod, mod.pallas_fused3b_blend_padded, mod.pallas_fused3b_bwd_padded


def _time_scan(fn, cells, reps: int) -> float:
    """Best-of-3 of a jitted ``reps``-long scan of ``fn`` (seconds/rep).

    fn: cells -> scalar output, which serializes the next rep's input (the
    tunnel replays unperturbed repeats; see bench.py._timed).  The cells
    are perturbed between invocations so each timing is fresh work."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(c):
        def body(carry, _):
            s = fn(carry)
            return carry + 1e-30 * s, s
        carry, vals = jax.lax.scan(body, c, None, length=reps)
        return vals.sum() + carry.sum()

    def run(c):
        t0 = time.perf_counter()
        out = many(c)
        jax.block_until_ready(out)
        float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    run(cells)  # compile + first run, untimed
    return min(run(cells * (0.999 - 1e-4 * i)) for i in range(3)) / reps


def tune(generation: str, cells, points, cfg, *, reps: int = 30,
         vmem_budget: Optional[int] = None, save: bool = True,
         interpret: bool = False, log=print) -> dict:
    """Measure the candidate grid for this workload; persist the winner.

    Objective: slot-resident fwd + bwd time per step (plan precomputed, so
    the binning — q_block-invariant under a jitted scan — is excluded).
    Returns {"params": ..., "us": {label: microseconds}}.
    """
    import jax.numpy as jnp
    import numpy as np

    from ..ops.pallas import _VMEM_BUDGET

    budget = vmem_budget or _VMEM_BUDGET
    mod, fwd_fn, bwd_fn = _entry_fns(generation)
    n, c = cells.shape[:2]
    spatial = tuple(cells.shape[2:])
    q = points.shape[0]
    k_rows = 1 + 2 * cfg.dim
    results = {}
    ordered0 = None
    for cand in _candidates(generation):
        if not mod.supports(cfg, cells.shape, budget, q, **cand):
            continue
        label = ",".join(f"{k}={v}" for k, v in sorted(cand.items()))
        # trim like the production planned path (ops.fused.make_sample_plan)
        # does: the padded slot count is plan-dependent, so candidates are
        # judged on the slot layout they would actually run with.
        from ..ops.fused import trim_plan
        plan = trim_plan(mod.make_plan(points, spatial, cfg, **cand))

        # parity gate: every candidate must reproduce the first candidate's
        # query-ordered output — a fast-but-wrong block geometry must never
        # win the table.
        out_p, _, pos = fwd_fn(cells, points, cfg, plan=plan,
                               interpret=interpret, **cand)
        qp = out_p.shape[-1]   # >= the plan's slot count (sub-block padding)
        ordered = np.asarray(
            out_p.reshape(k_rows * c, qp)[:, pos])
        if ordered0 is None:
            ordered0 = ordered
        elif not np.allclose(ordered, ordered0, rtol=1e-5, atol=1e-6):
            log(f"[autotune] {generation} {label}: PARITY FAIL — skipped")
            continue

        def fwd(cl, _cand=cand, _plan=plan):
            out_p, occ, _ = fwd_fn(cl, points, cfg, plan=_plan,
                                   interpret=interpret, **_cand)
            return out_p[0, 0, 0]

        gp = jnp.ones((k_rows, c, qp), jnp.float32)

        def bwd(cl, _cand=cand, _plan=plan):
            g = bwd_fn(gp + 1e-30 * cl[0, 0].ravel()[0], points, spatial,
                       cfg, n, plan=_plan, interpret=interpret, **_cand)
            return g[0, 0].ravel()[0]

        try:
            sec = _time_scan(fwd, cells, reps) + _time_scan(bwd, cells, reps)
        except Exception as e:  # pragma: no cover - device-side failure
            log(f"[autotune] {generation} {label}: failed "
                f"({type(e).__name__})")
            continue
        results[label] = sec * 1e6
        log(f"[autotune] {generation} {label}: {sec * 1e3:.2f} ms/step "
            f"(qp={qp})")
    if not results:
        raise RuntimeError(
            f"no candidate of {generation} supports this workload")
    best_label = min(results, key=results.get)
    best = dict(kv.split("=") for kv in best_label.split(","))
    best = {k: int(v) for k, v in best.items()}
    log(f"[autotune] {generation} best: {best_label} "
        f"({results[best_label] / 1e3:.2f} ms/step)")
    if save:
        path = record(generation, cells.shape, cfg, q, best,
                      measurements=results)
        log(f"[autotune] saved to {path}")
    return {"params": best, "us": results}


def tune_workload(cells, points, cfg, *, reps: int = 30, save: bool = True,
                  log=print) -> Optional[dict]:
    """On-device autotune for ONE workload signature (the trainer's
    ``--autotune`` flag): resolve which binned generation the dispatcher
    routes this (cells, points, cfg) to, and if its signature has no tuned
    entry yet, run the measured sweep into the user overlay cache.

    Returns the tune() result dict, ``None`` when there is nothing to do:
    the config routes to an unbinned generation (no block-size knob), the
    signature is already tuned (shipped table or overlay), or the backend
    is not a real TPU (the sweep times device kernels; CPU/interpret
    numbers would poison the cache — the shipped heuristics apply there
    anyway).  Closes the VERDICT r4 portability gap: the shipped table is
    keyed to the device kind it was measured on (TPU v5e), so on any other
    TPU generation this is the one-command path from silent heuristics to
    measured entries.
    """
    import jax

    if jax.default_backend() != "tpu":
        log("[autotune] skipped: backend is not TPU (heuristics apply)")
        return None
    from ..ops import pallas as _pallas_backend  # ensure routes registered

    route = _pallas_backend._padded_route(cfg, tuple(cells.shape),
                                          points.shape[0])
    gen = _pallas_backend._GEN_NAMES.get(route)
    if gen is None:
        log("[autotune] skipped: config routes to an unbinned generation")
        return None
    k = key(gen, cells.shape, cfg, points.shape[0])
    if _load().get(k):
        log(f"[autotune] entry already present for {k}")
        return None
    log(f"[autotune] tuning {k} (one-time; persists to "
        f"{user_cache_path()})")
    return tune(gen, cells, points, cfg, reps=reps, save=save, log=log)


def _main(argv=None) -> None:  # pragma: no cover - TPU-side CLI
    import argparse

    import numpy as np

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--preset", choices=("2d-ref", "3d-ref", "3d-large",
                                             "all"), default="all")
    parser.add_argument("--reps", type=int, default=30)
    parser.add_argument("--padding", default="zeros")
    parser.add_argument("--precision", default="exact")
    parser.add_argument("--q", type=int, default=None,
                        help="override the preset's query count (entries are "
                             "bucketed by next-power-of-two, so tune one "
                             "representative q per bucket, e.g. 8192 for "
                             "small inference batches)")
    args = parser.parse_args(argv)

    from . import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp

    from ..ops.config import SamplerConfig

    rng = np.random.RandomState(0)

    def run(gen, shape, q, dim):
        q = args.q or q
        cfg = SamplerConfig(dim=dim, padding_mode=args.padding,
                            precision=args.precision, backend="pallas")
        cells = jnp.asarray(rng.rand(*shape), jnp.float32)
        pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, dim)), jnp.float32)
        tune(gen, cells, pts, cfg, reps=args.reps)

    if args.preset in ("2d-ref", "all"):
        run("v2w", (96, 4, 16, 16), 100_000, 2)
    if args.preset in ("3d-ref", "all"):
        run("v3w", (50, 4, 16, 16, 16), 100_000, 3)
    if args.preset in ("3d-large", "all"):
        run("v3b", (16, 4, 128, 128, 128), 1_000_000, 3)


if __name__ == "__main__":  # pragma: no cover
    _main()
