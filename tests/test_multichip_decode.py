"""Sharded inference: CFG decode with the batch split over the 8-device mesh
produces exactly the single-device result (greedy, so no RNG dependence)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.engine.sampler import decode_cfg
from var_tpu.models import vae as vae_mod
from var_tpu.models import var as var_mod
from var_tpu.parallel import mesh as pm


@pytest.mark.slow
def test_decode_batch_sharded_matches_single():
    pns = (1, 2, 3)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=6, depth=2, embed_dim=32, num_heads=2,
                        patch_nums=pns, vocab_size=32, z_channels=8,
                        attn_l2_norm=True, cond_drop_rate=0.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))

    labels = jnp.arange(8, dtype=jnp.int32) % 6
    fn = jax.jit(lambda vp, ve, rng, lab: decode_cfg(
        vp, ve, var_cfg, vae_cfg, rng, lab, cfg_scale=2.0, top_k=1,
        dtype=jnp.float32))

    single = fn(var_params, vae_params, jax.random.PRNGKey(1), labels)

    mesh = pm.make_mesh()
    vp = jax.device_put(var_params, pm.replicated(mesh))
    ve = jax.device_put(vae_params, pm.replicated(mesh))
    lab_sh = pm.shard_batch(mesh, labels)
    sharded = fn(vp, ve, jax.random.PRNGKey(1), lab_sh)

    np.testing.assert_array_equal(np.asarray(single.tokens), np.asarray(sharded.tokens))
    np.testing.assert_allclose(np.asarray(single.image), np.asarray(sharded.image),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_decode_tensor_parallel_matches_single():
    """CFG decode with params TENSOR-sharded over the model axis of a
    (data=4, model=2) mesh == the single-device decode. The decode loop's
    matmuls run on sharded weights and XLA inserts the collectives — serving
    headroom for variants whose weights outgrow one chip (SURVEY.md §2c)."""
    pns = (1, 2, 3)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=6, depth=2, embed_dim=32, num_heads=2,
                        patch_nums=pns, vocab_size=32, z_channels=8,
                        attn_l2_norm=True, cond_drop_rate=0.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))

    labels = jnp.arange(8, dtype=jnp.int32) % 6
    fn = jax.jit(lambda vp, ve, rng, lab: decode_cfg(
        vp, ve, var_cfg, vae_cfg, rng, lab, cfg_scale=2.0, top_k=1,
        dtype=jnp.float32))
    single = fn(var_params, vae_params, jax.random.PRNGKey(3), labels)

    mesh = pm.make_mesh(model_parallel=2)
    vp = pm.shard_var_params(mesh, var_params)
    ve = jax.device_put(vae_params, pm.replicated(mesh))
    lab_sh = pm.shard_batch(mesh, labels)
    sharded = fn(vp, ve, jax.random.PRNGKey(3), lab_sh)

    np.testing.assert_array_equal(np.asarray(single.tokens), np.asarray(sharded.tokens))
    np.testing.assert_allclose(np.asarray(single.image), np.asarray(sharded.image),
                               rtol=1e-5, atol=1e-5)
