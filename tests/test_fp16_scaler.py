"""fp16 dynamic loss-scaling parity mode (reference ``utils/amp_sc.py``).

GradScaler semantics: loss is scaled before backward, grads unscaled before
clip/step; on non-finite grads the optimizer step is SKIPPED and the scale
halves; after growth_interval consecutive finite steps it doubles (capped
at 32768, reference amp_sc.py:27,56-66).
"""

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.config import TrainArgs, VAEConfig, VARConfig
from var_tpu.engine import trainer as tr

PNS = (1, 2, 3)


def _setup(dscale=1):
    from var_tpu.models import vae as vae_mod
    from var_tpu.models import var as var_mod

    vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=PNS)
    var_cfg = VARConfig(num_classes=10, depth=2, embed_dim=64, num_heads=4,
                        patch_nums=PNS, vocab_size=64, z_channels=8)
    args = TrainArgs(depth=2, bs=2, ac=1, ep=2, pn="1_2_3", fp16=1,
                     dscale=dscale).finalize(world_size=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.init_var_params(k2, var_cfg)
    init_state, step = tr.make_train_step(var_cfg, vae_cfg, args, iters_per_ep=4,
                                          dtype=jnp.float32)
    return init_state(var_params), vae_params, step, vae_cfg


def _imgs(vae_cfg, fill=None):
    reso = PNS[-1] * vae_cfg.downsample
    x = np.random.default_rng(0).uniform(-1, 1, (1, 2, reso, reso, 3)).astype(np.float32)
    if fill is not None:
        x[:] = fill
    return jnp.asarray(x), jnp.zeros((1, 2), jnp.int32)


def test_scaler_state_machine():
    init, update = tr.make_grad_scaler(init_scale=2048.0, growth_interval=3)
    s = init()
    assert float(s["scale"]) == 2048.0
    # overflow: halve + reset
    s = update(s, jnp.bool_(False))
    assert float(s["scale"]) == 1024.0 and int(s["growth_count"]) == 0
    # growth_interval consecutive finite steps: double
    for i in range(3):
        s = update(s, jnp.bool_(True))
    assert float(s["scale"]) == 2048.0 and int(s["growth_count"]) == 0
    # cap at 32768
    s = dict(scale=jnp.float32(32768.0), growth_count=jnp.int32(2))
    s = update(s, jnp.bool_(True))
    assert float(s["scale"]) == 32768.0
    # floor at 1
    s = dict(scale=jnp.float32(1.0), growth_count=jnp.int32(0))
    s = update(s, jnp.bool_(False))
    assert float(s["scale"]) == 1.0


def test_inf_grad_skips_step_and_halves_scale():
    state, vae_params, step, vae_cfg = _setup(dscale=1)
    assert float(state.opt_state["scaler"]["scale"]) == 2048.0

    # poison one parameter so the backward produces non-finite grads
    # (image values cannot: tokenization is discrete/no-grad)
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    target = jax.tree_util.keystr(flat[0][0])
    poisoned = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.full_like(x, jnp.inf)
        if jax.tree_util.keystr(p) == target else x, state.params)
    state = state._replace(params=poisoned)
    p0 = jax.tree.map(np.asarray, state.params)

    imgs, labels = _imgs(vae_cfg)
    state1, m = step(state, vae_params, imgs, labels, jax.random.PRNGKey(1),
                     jnp.int32(0), jnp.float32(1.0))
    assert not np.isfinite(float(m.grad_norm))
    assert float(state1.opt_state["scaler"]["scale"]) == 1024.0
    assert int(state1.opt_state["scaler"]["growth_count"]) == 0
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(a, np.asarray(b))  # step skipped


def test_scaled_grads_match_unscaled_step():
    """With finite grads, dscale=1 must produce the same update as dscale=0."""
    state_a, vae_params, step_a, vae_cfg = _setup(dscale=1)
    state_b, _, step_b, _ = _setup(dscale=0)
    imgs, labels = _imgs(vae_cfg)
    sa, ma = step_a(state_a, vae_params, imgs, labels, jax.random.PRNGKey(1),
                    jnp.int32(0), jnp.float32(1.0))
    sb, mb = step_b(state_b, vae_params, imgs, labels, jax.random.PRNGKey(1),
                    jnp.int32(0), jnp.float32(1.0))
    np.testing.assert_allclose(float(ma.loss), float(mb.loss), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
