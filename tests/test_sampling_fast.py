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


def test_cast_block_matmul_params_bitwise_identical_decode():
    """bf16-casting block matmul weights changes nothing: they are cast to
    the compute dtype at every use anyway (big-preset memory helper)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from var_tpu.config import VAEConfig, VARConfig
    from var_tpu.engine.sampler import decode_cfg
    from var_tpu.models import vae as vae_mod
    from var_tpu.models import var as var_mod

    pns = (1, 2, 3)
    vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=10, depth=2, embed_dim=64, num_heads=4,
                        patch_nums=pns, vocab_size=64, z_channels=8,
                        attn_l2_norm=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    cast = var_mod.cast_block_matmul_params(var_params)
    labels = jnp.arange(4, dtype=jnp.int32) % 10
    a = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                   jax.random.PRNGKey(1), labels, top_k=8, dtype=jnp.bfloat16)
    b = decode_cfg(cast, vae_params, var_cfg, vae_cfg,
                   jax.random.PRNGKey(1), labels, top_k=8, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
