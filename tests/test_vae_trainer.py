"""VQVAE training step: loss decreases, EMA usage tracked."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import VAEConfig
from var_tpu.engine.vae_trainer import make_vae_train_step, vocab_usage_percent
from var_tpu.models import vae as vae_mod


@pytest.mark.slow
def test_vae_train_two_steps():
    cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                    v_patch_nums=(1, 2, 3))
    params = vae_mod.init_vae_params(jax.random.PRNGKey(0), cfg)
    init_state, step = make_vae_train_step(cfg, lr=1e-3)
    state = init_state(params)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 6, 6, 3)) * 2 - 1
    losses = []
    for _ in range(3):
        state, m = step(state, img)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses  # overfits a fixed batch
    assert int(state.record_hit) == 3
    assert float(state.ema_hits.sum()) > 0
    usage = vocab_usage_percent(state, cfg, world_size=1, batch=2)
    assert usage.shape == (3,) and (np.asarray(usage) >= 0).all()


@pytest.mark.slow
def test_vae_train_gradients_reach_encoder_and_codebook():
    cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                    v_patch_nums=(1, 2, 3))
    params = vae_mod.init_vae_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 6, 6, 3)) * 2 - 1

    def loss(p):
        out = vae_mod.vae_train_forward(p, cfg, img)
        return jnp.mean((out.recon - img) ** 2) + out.vq_loss

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["encoder"]["conv_in"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["decoder"]["conv_out"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["quantize"]["embedding"]).sum()) > 0
    assert float(jnp.abs(g["quantize"]["phi"][0]["kernel"]).sum()) > 0
