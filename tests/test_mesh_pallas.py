"""The Pallas kernels under the mesh (shard_map bridges).

Round-4 verdict: the TPU fast path (paired kernels, the `auto` default) and
the multi-chip path had never met — every mesh proof ran XLA attention.
These tests run the REAL kernels (interpret mode on CPU) through
``parallel/shard_attn`` over (data, model) meshes and assert equality with
the single-device kernel path: batch shards over 'data', heads over 'model'.

Reference anchor: the DDP training path ``train.py:102`` / ``dist.py:20-49``
(data parallelism); tensor parallelism has no reference analogue
(SURVEY.md §2c) but is the serving path for d30/d36.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import TrainArgs, VAEConfig, VARConfig
from var_tpu.engine import trainer as tr
from var_tpu.engine.sampler import decode_cfg
from var_tpu.models import vae as vae_mod
from var_tpu.models import var as var_mod
from var_tpu.parallel import mesh as pm
from var_tpu.parallel import shard_attn as sa

PNS = (1, 2, 3, 4)  # stages 3/4 (9 and 16 queries) hit the paired kernels


def _paired_cfgs(depth=2, heads=4, pns=PNS):
    """Smallest geometry the paired kernels accept: head_dim 64."""
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=6, depth=depth, embed_dim=64 * heads,
                        num_heads=heads, patch_nums=pns, vocab_size=32,
                        z_channels=8, attn_l2_norm=True, cond_drop_rate=0.0)
    return vae_cfg, var_cfg


def test_paired_mesh_ok_rules():
    mesh = pm.make_mesh(model_parallel=2)  # (4, 2)
    assert sa.paired_mesh_ok(mesh, num_heads=4, batch=8)
    assert not sa.paired_mesh_ok(mesh, num_heads=2, batch=8)  # 1 head/dev: odd
    assert not sa.paired_mesh_ok(mesh, num_heads=4, batch=6)  # 6 % dp=4 != 0
    assert sa.flash_mesh_ok(mesh, num_heads=2, batch=8)  # BLHD takes 1 head/dev
    assert sa.mesh_is_trivial(None)
    assert not sa.mesh_is_trivial(mesh)


@pytest.mark.slow
@pytest.mark.parametrize("mp", [2, 4])
def test_paired_train_step_mesh_matches_single(mp):
    """Full train step (tokenize + paired-kernel fwd/bwd + AdamW) under a
    (data, model) mesh == the single-device step running the SAME kernels."""
    vae_cfg, var_cfg = _paired_cfgs()
    glb = 8
    args = TrainArgs(depth=2, bs=glb, ac=1, ep=2, pn="1_2_3_4").finalize(world_size=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.init_var_params(k2, var_cfg)

    reso = PNS[-1] * vae_cfg.downsample
    imgs = np.random.default_rng(0).uniform(-1, 1, (1, glb, reso, reso, 3)).astype(np.float32)
    labels = (np.arange(glb, dtype=np.int32) % 6).reshape(1, -1)
    step_args = (jax.random.PRNGKey(1), jnp.int32(0), jnp.float32(1.0))

    init_state, step1 = tr.make_train_step(var_cfg, vae_cfg, args, iters_per_ep=4,
                                           dtype=jnp.float32, attn_impl="paired")
    s_ref, m_ref = step1(init_state(jax.tree.map(jnp.copy, var_params)), vae_params,
                         jnp.asarray(imgs), jnp.asarray(labels), *step_args)
    loss_ref = float(m_ref.loss)
    assert np.isfinite(loss_ref)

    mesh = pm.make_mesh(model_parallel=mp)
    _, stepm = tr.make_train_step(var_cfg, vae_cfg, args, iters_per_ep=4,
                                  dtype=jnp.float32, attn_impl="paired", mesh=mesh)
    with mesh:
        state = init_state(jax.tree.map(jnp.copy, var_params))
        state = tr.TrainState(pm.shard_var_params(mesh, state.params),
                              jax.device_put(state.opt_state, pm.replicated(mesh)),
                              jax.device_put(state.step, pm.replicated(mesh)))
        bsp = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, pm.DATA_AXIS))
        new_state, metrics = stepm(state, jax.device_put(vae_params, pm.replicated(mesh)),
                                   jax.device_put(imgs, bsp), jax.device_put(labels, bsp),
                                   *step_args)
        loss = float(metrics.loss)
    assert abs(loss - loss_ref) <= 1e-5 * max(1.0, abs(loss_ref))
    dmax = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_ref.params, new_state.params)))
    assert dmax < 1e-5, f"params diverged: {dmax}"


@pytest.mark.slow
@pytest.mark.parametrize("mp", [1, 2])
def test_pallas_decode_mesh_matches_single(mp):
    """Greedy CFG decode through the paired chunked-cache kernels under the
    mesh == single-device (token-exact; fp32)."""
    vae_cfg, var_cfg = _paired_cfgs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    labels = jnp.arange(8, dtype=jnp.int32) % 6

    ref_fn = jax.jit(lambda vp, ve, lab: decode_cfg(
        vp, ve, var_cfg, vae_cfg, jax.random.PRNGKey(5), lab, cfg_scale=2.0,
        top_k=1, dtype=jnp.float32, attn_impl="pallas"))
    single = ref_fn(var_params, vae_params, labels)

    mesh = pm.make_mesh(model_parallel=mp)
    mesh_fn = jax.jit(lambda vp, ve, lab: decode_cfg(
        vp, ve, var_cfg, vae_cfg, jax.random.PRNGKey(5), lab, cfg_scale=2.0,
        top_k=1, dtype=jnp.float32, attn_impl="pallas", mesh=mesh))
    with mesh:
        vp = (pm.shard_var_params(mesh, var_params) if mp > 1
              else jax.device_put(var_params, pm.replicated(mesh)))
        ve = jax.device_put(vae_params, pm.replicated(mesh))
        sharded = mesh_fn(vp, ve, pm.shard_batch(mesh, labels))

    np.testing.assert_array_equal(np.asarray(single.tokens), np.asarray(sharded.tokens))
    np.testing.assert_allclose(np.asarray(single.image), np.asarray(sharded.image),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_paired_unshardable_geometry_falls_back():
    """mp=4 over 4 heads -> 1 head/device (odd): 'pallas' must NOT die on a
    pod — it falls back to the partitionable XLA path and stays exact."""
    vae_cfg, var_cfg = _paired_cfgs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    labels = jnp.arange(8, dtype=jnp.int32) % 6

    ref_fn = jax.jit(lambda vp, ve, lab: decode_cfg(
        vp, ve, var_cfg, vae_cfg, jax.random.PRNGKey(7), lab, cfg_scale=2.0,
        top_k=1, dtype=jnp.float32, attn_impl="xla"))
    single = ref_fn(var_params, vae_params, labels)

    mesh = pm.make_mesh(model_parallel=4)  # (2, 4): 4 heads / 4 = 1 (odd)
    mesh_fn = jax.jit(lambda vp, ve, lab: decode_cfg(
        vp, ve, var_cfg, vae_cfg, jax.random.PRNGKey(7), lab, cfg_scale=2.0,
        top_k=1, dtype=jnp.float32, attn_impl="pallas", mesh=mesh))
    with mesh:
        vp = pm.shard_var_params(mesh, var_params)
        ve = jax.device_put(vae_params, pm.replicated(mesh))
        sharded = mesh_fn(vp, ve, pm.shard_batch(mesh, labels))
    np.testing.assert_array_equal(np.asarray(single.tokens), np.asarray(sharded.tokens))


@pytest.mark.slow
def test_flash_blhd_mesh_matches_single():
    """The streaming BLHD kernel (long-preset train/eval path) under the mesh:
    var_forward(attn_impl='pallas') logits equal to single-device."""
    vae_cfg, var_cfg = _paired_cfgs(heads=2)  # 1 head/device on mp=2 is fine
    k2 = jax.random.PRNGKey(8)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    b = 8
    label = jnp.arange(b, dtype=jnp.int32) % 6
    x_in = jax.random.normal(jax.random.PRNGKey(9),
                             (b, var_cfg.seq_len - var_cfg.first_l, var_cfg.z_channels))

    ref = jax.jit(lambda p, l, x: var_mod.var_forward(
        p, var_cfg, l, x, train=False, dtype=jnp.float32, attn_impl="pallas"))(
        var_params, label, x_in)

    mesh = pm.make_mesh(model_parallel=2)
    fn = jax.jit(lambda p, l, x: var_mod.var_forward(
        p, var_cfg, l, x, train=False, dtype=jnp.float32, attn_impl="pallas",
        mesh=mesh))
    with mesh:
        vp = pm.shard_var_params(mesh, var_params)
        out = fn(vp, pm.shard_batch(mesh, label), pm.shard_batch(mesh, x_in))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5)
