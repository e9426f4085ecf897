"""utils/autotune: measured q_block/gy selection for the binned kernels.

The reference hardcodes its CUDA launch shapes (512/256 threads per block,
cosine_sampler_2d_kernel.cu:266,360); the TPU kernels' block size is a
real shape-dependent knob, so the tuned table must (a) round-trip through
the persistent cache, (b) be consulted consistently by the plan builder
and the kernels (slot layouts must agree), and (c) never route a value
the VMEM gates reject.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import cosinesampler_tpu.ops.pallas as pb
from cosinesampler_tpu.ops import fused
from cosinesampler_tpu.ops.config import SamplerConfig
from cosinesampler_tpu.ops.pallas import _VMEM_BUDGET, fused3b, fused3w
from cosinesampler_tpu.utils import autotune


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("COSINESAMPLER_TUNE_CACHE",
                       str(tmp_path / "autotune.json"))
    autotune.reset_cache()
    yield
    autotune.reset_cache()


def _cfg3(**kw):
    return SamplerConfig(dim=3, backend="pallas", **kw)


def _data3(q=4096, shape=(8, 4, 16, 16, 16)):
    rng = np.random.RandomState(0)
    cells = jnp.asarray(rng.rand(*shape), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (q, 3)), jnp.float32)
    return cells, pts


def test_key_is_stable_and_query_bucketed():
    cfg = _cfg3()
    k1 = autotune.key("v3w", (8, 4, 16, 16, 16), cfg, 100_000, "cpu")
    k2 = autotune.key("v3w", (8, 4, 16, 16, 16), cfg, 99_000, "cpu")
    k3 = autotune.key("v3w", (8, 4, 16, 16, 16), cfg, 200_000, "cpu")
    assert k1 == k2          # same power-of-two bucket
    assert k1 != k3
    assert "v3w" in k1 and "8x4x16x16x16" in k1


def test_record_lookup_roundtrip():
    cfg = _cfg3()
    shape = (8, 4, 16, 16, 16)
    assert autotune.lookup("v3w", shape, cfg, 4096) is None
    path = autotune.record("v3w", shape, cfg, 4096, {"q_block": 256},
                           measurements={"q_block=256": 123.4})
    got = autotune.lookup("v3w", shape, cfg, 4096)
    assert got == {"q_block": 256}
    # provenance is persisted but not returned
    data = json.loads(path.read_text())
    (entry,) = data.values()
    assert entry["measured_us"] == {"q_block=256": 123.4}
    # a different padding mode is a different signature
    assert autotune.lookup("v3w", shape, _cfg3(padding_mode="border"),
                           4096) is None


def test_lookup_miss_is_tracked_not_warned_on_cpu(recwarn):
    """Off-table signatures accumulate in missed_signatures() for tooling;
    the one-time user warning fires only on real TPU device kinds (CPU
    test runs stay silent)."""
    cfg = _cfg3()
    shape = (8, 4, 16, 16, 32)        # not in any table
    assert autotune.lookup("v3w", shape, cfg, 8192) is None
    k = autotune.key("v3w", shape, cfg, 8192)
    assert k in autotune.missed_signatures()
    assert not [w for w in recwarn.list
                if "autotune" in str(w.message)]


def test_lookup_disabled_by_env(monkeypatch):
    cfg = _cfg3()
    shape = (8, 4, 16, 16, 16)
    autotune.record("v3w", shape, cfg, 4096, {"q_block": 256})
    monkeypatch.setenv("COSINESAMPLER_AUTOTUNE", "0")
    assert autotune.lookup("v3w", shape, cfg, 4096) is None


def test_supports_rejects_oversized_q_block():
    cfg = _cfg3()
    shape = (8, 4, 16, 16, 16)
    assert fused3w.supports(cfg, shape, _VMEM_BUDGET, 4096)
    assert not fused3w.supports(cfg, shape, _VMEM_BUDGET, 4096,
                                q_block=1 << 20)
    big = (16, 4, 128, 128, 128)
    assert fused3b.supports(cfg, big, _VMEM_BUDGET, 1_000_000)
    assert not fused3b.supports(cfg, big, _VMEM_BUDGET, 1_000_000,
                                q_block=1 << 20)


def test_dispatcher_honors_tuned_q_block():
    """A recorded q_block changes the slot layout consistently: the plan,
    the padded kernel, and the query-ordered result all agree."""
    cfg = _cfg3()
    cells, pts = _data3()
    plan_default = fused.make_sample_plan(pts, cells.shape, cfg)
    qp_default = plan_default[1].shape[0]

    autotune.record("v3w", cells.shape, cfg, pts.shape[0], {"q_block": 256},
                    path=autotune.user_cache_path())
    plan_tuned = fused.make_sample_plan(pts, cells.shape, cfg)
    qp_tuned = plan_tuned[1].shape[0]
    assert qp_tuned != qp_default       # layout reflects the tuned block
    assert qp_tuned % 256 == 0

    prev = pb.INTERPRET
    pb.INTERPRET = True
    try:
        out_p, occ, positions = fused.sample_features_padded(
            cells, pts, cfg, plan=plan_tuned)
        assert out_p.shape[-1] == qp_tuned
        want = fused.sample_features_with_derivs(cells, pts, cfg)
        got = out_p.reshape(-1, qp_tuned)[:, positions].reshape(want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    finally:
        pb.INTERPRET = prev


def test_invalid_cached_value_falls_back_to_defaults():
    """A cache entry the VMEM gates reject must not change routing."""
    cfg = _cfg3()
    cells, pts = _data3()
    plan_default = fused.make_sample_plan(pts, cells.shape, cfg)
    autotune.record("v3w", cells.shape, cfg, pts.shape[0],
                    {"q_block": 1 << 20})
    plan = fused.make_sample_plan(pts, cells.shape, cfg)
    assert plan[1].shape[0] == plan_default[1].shape[0]


def test_tune_measures_and_persists(monkeypatch):
    """End-to-end tune() in interpret mode: parity gate runs, a winner is
    recorded, and the dispatcher picks it up."""
    monkeypatch.setattr(autotune, "_candidates",
                        lambda gen: [{"q_block": 128}, {"q_block": 256}])
    cfg = _cfg3()
    cells, pts = _data3(q=2048, shape=(8, 4, 8, 8, 16))
    res = autotune.tune("v3w", cells, pts, cfg, reps=1, interpret=True,
                        log=lambda *_: None)
    assert set(res["params"]) == {"q_block"}
    assert len(res["us"]) == 2          # both candidates measured
    got = autotune.lookup("v3w", cells.shape, cfg, pts.shape[0])
    assert got == res["params"]


def test_tune_gy_candidates_for_v3b():
    cands = autotune._candidates("v3b")
    assert {"q_block": 256, "gy": 4, "rb": 4, "sb": 1} in cands
    assert {"q_block": 128, "gy": 2, "rb": 8, "sb": 8} in cands
    assert all(set(c) == {"q_block", "gy", "rb", "sb"} for c in cands)


def test_tune_workload_skips_off_tpu():
    """tune_workload must never run (or poison the cache with) a CPU
    sweep — off-TPU it returns None and records nothing."""
    cfg = _cfg3()
    cells, pts = _data3(q=2048, shape=(8, 4, 8, 8, 16))
    logs = []
    res = autotune.tune_workload(cells, pts, cfg, log=logs.append)
    assert res is None
    assert any("not TPU" in m for m in logs)


def test_tune_workload_routes_and_mocks_sweep(monkeypatch):
    """On a (mocked) TPU backend, tune_workload resolves the dispatcher's
    route for the workload and invokes the measured sweep exactly once for
    an untuned signature, then skips once an entry exists (the trainer
    --autotune contract, VERDICT r4 #5)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []

    def fake_tune(gen, cells, points, cfg, *, reps=30, save=True, log=print,
                  **kw):
        calls.append((gen, tuple(cells.shape), points.shape[0], reps))
        autotune.record(gen, cells.shape, cfg, points.shape[0],
                        {"q_block": 128})
        return {"params": {"q_block": 128}, "us": {"q_block=128": 1.0}}

    monkeypatch.setattr(autotune, "tune", fake_tune)
    cfg = _cfg3()
    cells, pts = _data3(q=4096, shape=(8, 4, 8, 8, 16))
    res = autotune.tune_workload(cells, pts, cfg, reps=3,
                                 log=lambda *_: None)
    assert res is not None and calls == [("v3w", (8, 4, 8, 8, 16), 4096, 3)]
    # second call: entry present -> no sweep
    assert autotune.tune_workload(cells, pts, cfg,
                                  log=lambda *_: None) is None
    assert len(calls) == 1
