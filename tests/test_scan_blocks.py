"""Stacked/scan block path must match the unrolled path exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import VARConfig
from var_tpu.models import var as var_mod


def _setup(shared_aln=False):
    cfg = VARConfig(num_classes=6, depth=4, embed_dim=32, num_heads=2,
                    patch_nums=(1, 2, 3), vocab_size=32, z_channels=8,
                    attn_l2_norm=not shared_aln, shared_aln=shared_aln,
                    cond_drop_rate=0.0)
    params = var_mod.init_var_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.slow
def test_forward_scan_matches_unrolled():
    for shared in (False, True):
        cfg, params = _setup(shared)
        stacked = var_mod.stack_block_params(params)
        label = jnp.array([1, 3])
        x_in = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.seq_len - 1, 8))
        a = var_mod.var_forward(params, cfg, label, x_in, dtype=jnp.float32)
        b = var_mod.var_forward(stacked, cfg, label, x_in, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_decode_stage_scan_matches_unrolled():
    cfg, params = _setup()
    stacked = var_mod.stack_block_params(params)
    cond = jnp.take(params["class_emb"], jnp.array([0, 1, 6, 6]), axis=0)
    ctx = var_mod.cond_context(params, cfg, cond)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (4, 1, cfg.embed_dim))
    x1 = jax.random.normal(jax.random.PRNGKey(3), (4, 4, cfg.embed_dim))

    xa, ca = var_mod.transformer_stage(params, cfg, x0, ctx, None, dtype=jnp.float32)
    xb, cb = var_mod.transformer_stage(stacked, cfg, x0, ctx, None, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ca[0]), np.asarray(cb[0]), rtol=1e-5, atol=1e-5)

    xa2, ca = var_mod.transformer_stage(params, cfg, x1, ctx, ca, dtype=jnp.float32)
    xb2, cb = var_mod.transformer_stage(stacked, cfg, x1, ctx, cb, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(xa2), np.asarray(xb2), rtol=1e-5, atol=1e-5)
    # heads stay merged in cache storage (TPU 128-lane tile padding)
    assert ca[0].shape == (cfg.depth, 4, 5, cfg.embed_dim)


def test_stack_unstack_roundtrip():
    cfg, params = _setup()
    stacked = var_mod.stack_block_params(params)
    back = var_mod.unstack_block_params(stacked, cfg.depth)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert all(np.array_equal(a, b) for a, b in zip(flat_a, flat_b))


@pytest.mark.slow
def test_train_step_with_stacked_params():
    """Training (grad + AdamW + wd mask) works on the stacked layout."""
    from var_tpu.config import TrainArgs, VAEConfig
    from var_tpu.engine import trainer as tr
    from var_tpu.models import vae as vae_mod

    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=(1, 2, 3))
    cfg, params = _setup()
    stacked = var_mod.stack_block_params(params)
    vae_params = vae_mod.init_vae_params(jax.random.PRNGKey(4), vae_cfg)
    args = TrainArgs(depth=4, bs=2, ac=1, ep=2, pn="1_2_3").finalize(world_size=1)
    init_state, step = tr.make_train_step(cfg, vae_cfg, args, iters_per_ep=2,
                                          dtype=jnp.float32)
    mask = tr.weight_decay_mask(stacked)
    assert mask["blocks"]["attn"]["qkv"]["kernel"] is True
    assert mask["blocks"]["attn"]["q_bias"] is False  # stacked bias is 2-D!
    assert mask["blocks"]["attn"]["scale_mul"] is False
    state = init_state(stacked)
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (1, 2, 6, 6, 3)) * 2 - 1
    state, m = step(state, vae_params, imgs, jnp.array([[0, 1]]),
                    jax.random.PRNGKey(6), jnp.int32(0), jnp.float32(1.0))
    assert np.isfinite(float(m.loss))


@pytest.mark.slow
def test_remat_matches_no_remat():
    """jax.checkpoint path: same logits and same gradients."""
    cfg, params = _setup()
    stacked = var_mod.stack_block_params(params)
    label = jnp.array([1, 3])
    x_in = jax.random.normal(jax.random.PRNGKey(7), (2, cfg.seq_len - 1, 8))

    def loss(p, remat):
        lg = var_mod.var_forward(p, cfg, label, x_in, dtype=jnp.float32, remat=remat)
        return (lg ** 2).mean()

    a = loss(stacked, False)
    b = loss(stacked, True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
    ga = jax.grad(lambda p: loss(p, False))(stacked)
    gb = jax.grad(lambda p: loss(p, True))(stacked)
    for x, y in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7)
