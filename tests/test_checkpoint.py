"""Direct orbax checkpoint helper round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from cosinesampler_tpu.utils import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    state = {"cells": jnp.arange(12.0).reshape(3, 4), "step_scale": jnp.ones(2)}
    ckpt.save_state(str(tmp_path / "ck"), 7, state)
    step, restored = ckpt.restore_state(str(tmp_path / "ck"), state)
    assert step == 7
    np.testing.assert_array_equal(restored["cells"], state["cells"])
    np.testing.assert_array_equal(restored["step_scale"], state["step_scale"])


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ckpt.restore_state(str(tmp_path / "nope"), {"a": jnp.zeros(1)})


def test_max_to_keep(tmp_path):
    d = str(tmp_path / "ck")
    state = {"a": jnp.zeros(2)}
    for s in (1, 2, 3, 4):
        ckpt.save_state(d, s, state, max_to_keep=2)
    step, _ = ckpt.restore_state(d, state)
    assert step == 4
