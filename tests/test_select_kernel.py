"""Sort-free top-k/top-p threshold kernel vs the reference-exact mask.

``top_k_top_p_mask`` reproduces the reference's sorted-space filtering
verbatim (``models/helpers.py:6-36``); the Pallas threshold kernel must
produce the IDENTICAL candidate set — including keeping ties at the k-th
logit, which a plain ``lax.top_k`` truncates. (Exact fp32 ties at the
top-p mass boundary are excluded: there the sorted formulation cuts inside
a tied group by sort position, which no value-threshold can express; such
ties have zero probability for real logits.)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.ops.pallas.select import float_key, topk_topp_bound
from var_tpu.ops.sampling import sample_with_top_k_top_p, top_k_top_p_mask


def _kept_from_bound(logits, bound):
    return np.asarray(float_key(logits) >= bound[..., None])


@pytest.mark.parametrize("k,p", [(10, 0.0), (50, 0.9), (0, 0.8), (900, 0.96)])
def test_threshold_matches_reference_mask(k, p):
    rng = np.random.default_rng(k + int(p * 10))
    logits = jnp.asarray(rng.standard_normal((3, 7, 1024)) * 4, jnp.float32)
    want = np.isfinite(np.asarray(top_k_top_p_mask(logits, top_k=k, top_p=p)))
    got = _kept_from_bound(logits, topk_topp_bound(logits, k, p))
    np.testing.assert_array_equal(got, want)


def test_threshold_keeps_ties_at_kth():
    """fp16-rounded logits produce real ties at the k-th value; the
    reference mask keeps the whole tied group (helpers.py:9) and so must
    the threshold kernel — candidate count may exceed k."""
    rng = np.random.default_rng(3)
    # coarse quantization grid -> guaranteed ties at the k-th value
    logits = jnp.asarray(
        np.round(rng.standard_normal((4, 512)) * 2.0) / 2.0, jnp.float32)
    k = 100
    want = np.isfinite(np.asarray(top_k_top_p_mask(logits, top_k=k)))
    got = _kept_from_bound(logits, topk_topp_bound(logits, k, 0.0))
    np.testing.assert_array_equal(got, want)
    assert want.sum(-1).max() > k  # the tie case actually triggered


def test_threshold_negative_and_extreme_values():
    """Sign-flip key order: all-negative rows, mixed magnitudes, subnormal
    gaps — integer key comparisons must order exactly like floats."""
    logits = jnp.asarray([
        [-5.0, -1.0, -1.0000001, -0.5, -7.25, -0.5000001, -2.0, -0.75],
        [3.0, -3.0, 0.0, -0.0, 1e-30, -1e-30, 2.99999, 3.0000002],
    ], jnp.float32)
    for k in (1, 2, 3, 5):
        want = np.isfinite(np.asarray(top_k_top_p_mask(logits, top_k=k)))
        got = _kept_from_bound(logits, topk_topp_bound(logits, k, 0.0))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_threshold_multi_block_rows():
    """Row count above rows_per_block exercises the grid dimension."""
    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.standard_normal((40, 256)) * 3, jnp.float32)
    want = np.isfinite(np.asarray(top_k_top_p_mask(logits, top_k=17, top_p=0.85)))
    got = _kept_from_bound(
        logits, topk_topp_bound(logits, 17, 0.85, rows_per_block=16))
    np.testing.assert_array_equal(got, want)


def test_pallas_sampler_support_and_greedy():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 8, 512)) * 4, jnp.float32)
    masked = np.asarray(top_k_top_p_mask(logits, top_k=50, top_p=0.9))
    for seed in range(10):
        idx = np.asarray(sample_with_top_k_top_p(
            jax.random.PRNGKey(seed), logits, top_k=50, top_p=0.9, impl="pallas"))
        picked = np.take_along_axis(masked, idx[..., None], axis=-1)
        assert np.isfinite(picked).all()
    greedy = sample_with_top_k_top_p(jax.random.PRNGKey(0), logits, top_k=1,
                                     impl="pallas")
    np.testing.assert_array_equal(np.asarray(greedy),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_pallas_sampler_distribution():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, -1.0, 0.5, 2.5, -2.0]], jnp.float32)
    masked = np.asarray(top_k_top_p_mask(logits, top_k=4, top_p=0.95))[0]
    want = np.exp(masked - masked.max())
    want = want / np.nansum(np.where(np.isfinite(want), want, 0.0))
    want = np.where(np.isfinite(masked), want, 0.0)
    draws = np.asarray(sample_with_top_k_top_p(
        jax.random.PRNGKey(0), jnp.tile(logits, (20000, 1)),
        top_k=4, top_p=0.95, impl="pallas"))
    got = np.bincount(draws, minlength=8) / draws.size
    np.testing.assert_allclose(got, want, atol=0.015)
