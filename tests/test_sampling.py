"""Parity tests for top-k/top-p filtering masks vs the reference semantics.

The *mask* must match bit-for-bit (which vocab entries survive); the random
draw itself is distribution-equivalent but stream-divergent (SURVEY.md §7).
Reference semantics: ``models/helpers.py:6-19``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from var_tpu.ops.sampling import sample_with_top_k_top_p, top_k_top_p_mask


def _torch_mask(logits: np.ndarray, top_k: int, top_p: float) -> np.ndarray:
    """Independent torch re-derivation of helpers.py:6-15 mask semantics."""
    t = torch.from_numpy(logits.copy())
    if top_k > 0:
        thresh = t.topk(top_k, largest=True, sorted=False, dim=-1)[0].amin(dim=-1, keepdim=True)
        t.masked_fill_(t < thresh, -torch.inf)
    if top_p > 0:
        sorted_logits, sorted_idx = t.sort(dim=-1, descending=False)
        rm = sorted_logits.softmax(dim=-1).cumsum_(dim=-1) <= (1 - top_p)
        rm[..., -1:] = False
        t.masked_fill_(rm.scatter(sorted_idx.ndim - 1, sorted_idx, rm), -torch.inf)
    return t.numpy()


def test_topk_mask_matches():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 7, 64)).astype(np.float32)
    got = np.asarray(top_k_top_p_mask(jnp.asarray(logits), top_k=10))
    want = _torch_mask(logits, 10, 0.0)
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(want))
    np.testing.assert_allclose(got[~np.isneginf(got)], want[~np.isneginf(want)])


def test_topp_mask_matches():
    rng = np.random.default_rng(1)
    logits = (rng.standard_normal((3, 5, 128)) * 3).astype(np.float32)
    got = np.asarray(top_k_top_p_mask(jnp.asarray(logits), top_p=0.95))
    want = _torch_mask(logits, 0, 0.95)
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(want))


def test_topk_topp_combined_reference_recipe():
    """cfg-sampling recipe: top_k=900, top_p=0.96 over V=4096 (README.md:153)."""
    rng = np.random.default_rng(2)
    logits = (rng.standard_normal((2, 3, 4096)) * 5).astype(np.float32)
    got = np.asarray(top_k_top_p_mask(jnp.asarray(logits), top_k=900, top_p=0.96))
    want = _torch_mask(logits, 900, 0.96)
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(want))


def test_topk_keeps_threshold_ties():
    logits = jnp.asarray([[1.0, 2.0, 2.0, 0.5]])
    got = np.asarray(top_k_top_p_mask(logits, top_k=2))
    # both 2.0s survive (strict < comparison), 1.0 and 0.5 are removed
    assert np.isneginf(got[0, 0]) and np.isneginf(got[0, 3])
    assert got[0, 1] == 2.0 and got[0, 2] == 2.0


def test_sampling_respects_mask():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.default_rng(3).standard_normal((8, 16, 256)), jnp.float32)
    idx = sample_with_top_k_top_p(key, logits, top_k=5)
    # every sampled index must be inside the top-5 set of its row
    masked = np.asarray(top_k_top_p_mask(logits, top_k=5))
    flat_idx = np.asarray(idx)
    picked = np.take_along_axis(masked, flat_idx[..., None], axis=-1)
    assert np.isfinite(picked).all()


def test_greedy_via_topk1():
    logits = jnp.asarray(np.random.default_rng(4).standard_normal((4, 9, 32)), jnp.float32)
    idx = sample_with_top_k_top_p(jax.random.PRNGKey(1), logits, top_k=1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(jnp.argmax(logits, -1)))
