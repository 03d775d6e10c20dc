"""Checkpoint round-trip, auto-resume, and the driver entry points."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.engine import checkpoint as ck


def _state():
    k = jax.random.PRNGKey(0)
    return {
        "params": {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros((4,))},
        "step": jnp.int32(7),
    }


def test_checkpoint_roundtrip(tmp_path):
    s = _state()
    path = str(tmp_path / "ar-ckpt-last")
    ck.save_checkpoint(path, s, meta={"epoch": 3, "iter": 11})
    restored = ck.load_checkpoint(path, jax.tree.map(jnp.zeros_like, s))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.asarray(s["params"]["w"]))
    assert int(restored["step"]) == 7
    assert ck.load_meta(path)["epoch"] == 3


def test_checkpoint_overwrite_and_auto_resume(tmp_path):
    s = _state()
    p1 = str(tmp_path / "ar-ckpt-last")
    ck.save_checkpoint(p1, s, meta={"epoch": 1})
    s2 = jax.tree.map(lambda x: x + 1, s)
    ck.save_checkpoint(p1, s2, meta={"epoch": 2})  # overwrite path
    newest, meta = ck.auto_resume(str(tmp_path))
    assert newest == p1 and meta["epoch"] == 2
    restored = ck.load_checkpoint(newest, jax.tree.map(jnp.zeros_like, s))
    assert int(restored["step"]) == 8


def test_auto_resume_empty(tmp_path):
    assert ck.auto_resume(str(tmp_path)) == (None, {})


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally


@pytest.mark.slow
def test_entry_traces():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 680, 4096)
