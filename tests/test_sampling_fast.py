"""Fast-path sampler vs the reference-exact mask semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from var_tpu.ops.sampling import sample_with_top_k_top_p, top_k_top_p_mask


def test_fast_sampler_support_subset_of_mask():
    """Every token the fast path can emit must be allowed by the exact mask."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 8, 512)) * 4, jnp.float32)
    masked = np.asarray(top_k_top_p_mask(logits, top_k=50, top_p=0.9))
    for seed in range(20):
        idx = np.asarray(sample_with_top_k_top_p(jax.random.PRNGKey(seed), logits,
                                                 top_k=50, top_p=0.9))
        picked = np.take_along_axis(masked, idx[..., None], axis=-1)
        assert np.isfinite(picked).all()


def test_fast_sampler_distribution_matches_mask():
    """Empirical distribution of the fast path ~= softmax of the exact mask."""
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, -1.0, 0.5, 2.5, -2.0]], jnp.float32)
    masked = np.asarray(top_k_top_p_mask(logits, top_k=4, top_p=0.95))[0]
    want = np.exp(masked - masked.max())
    want = want / want.sum()
    draws = np.asarray(sample_with_top_k_top_p(
        jax.random.PRNGKey(0), jnp.tile(logits, (20000, 1)), top_k=4, top_p=0.95))
    got = np.bincount(draws, minlength=8) / draws.size
    np.testing.assert_allclose(got, want, atol=0.015)


def test_fast_greedy():
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((3, 5, 64)), jnp.float32)
    idx = sample_with_top_k_top_p(jax.random.PRNGKey(0), logits, top_k=1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(jnp.argmax(logits, -1)))


def test_fast_no_filters():
    """top_k=0, top_p=0: plain categorical over the full vocabulary."""
    logits = jnp.log(jnp.asarray([[0.5, 0.25, 0.125, 0.125]]))
    draws = np.asarray(sample_with_top_k_top_p(
        jax.random.PRNGKey(1), jnp.tile(logits, (20000, 1))))
    got = np.bincount(draws, minlength=4) / draws.size
    np.testing.assert_allclose(got, [0.5, 0.25, 0.125, 0.125], atol=0.015)
