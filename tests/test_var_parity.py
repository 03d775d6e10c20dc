"""VAR transformer parity vs captured reference outputs (var_tiny.npz).

Two model variants are checked (both present in published checkpoints):
* ``l2``  — attn_l2_norm=True, per-block AdaLN (d16-d30 style)
* ``saln`` — shared_aln=True (d36-512 style)

Checks: teacher-forced logits over the full block-causal sequence
(``var.py:192-234``) and the greedy (top_k=1) CFG decode image
(``var.py:126-190``) — greedy is RNG-free so any token divergence anywhere
in the 4-stage pipeline would blow up the output image.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.engine.convert import convert_vae, convert_var
from var_tpu.engine.sampler import decode_cfg
from var_tpu.models import var as var_mod

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "var_tiny.npz")


def _load(tag):
    data = np.load(FIXTURE)
    pns = tuple(data["patch_nums"].tolist())
    vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, v_patch_nums=pns)
    var_cfg = VARConfig(
        num_classes=10, depth=3, embed_dim=64, num_heads=4,
        drop_path_rate=0.1, shared_aln=(tag == "saln"), attn_l2_norm=(tag == "l2"),
        cond_drop_rate=0.0, patch_nums=pns, vocab_size=64, z_channels=8,
    )
    vae_sd = {k[len("vae_sd/"):]: data[k].astype(np.float32) for k in data.files if k.startswith("vae_sd/")}
    var_sd = {k[len(f"{tag}/var_sd/"):]: data[k].astype(np.float32)
              for k in data.files if k.startswith(f"{tag}/var_sd/")}
    vae_params = convert_vae(vae_sd, vae_cfg)
    var_params = convert_var(var_sd, var_cfg)
    return data, tag, vae_cfg, var_cfg, vae_params, var_params


@pytest.mark.parametrize("tag", ["l2", "saln"])
def test_teacher_forced_logits_match(tag):
    data, tag, vae_cfg, var_cfg, vae_params, var_params = _load(tag)
    label = jnp.asarray(data[f"{tag}/label"])
    x_in = jnp.asarray(data[f"{tag}/var_input"])
    logits = var_mod.var_forward(
        var_params, var_cfg, label, x_in, train=False, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(logits), data[f"{tag}/logits"], rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("tag", ["l2", "saln"])
def test_greedy_cfg_decode_matches(tag):
    import jax

    data, tag, vae_cfg, var_cfg, vae_params, var_params = _load(tag)
    label = jnp.asarray(data[f"{tag}/label"])
    res = decode_cfg(
        var_params, vae_params, var_cfg, vae_cfg,
        jax.random.PRNGKey(0), label, cfg_scale=1.5, top_k=1, top_p=0.0,
        dtype=jnp.float32,
    )
    got = np.transpose(np.asarray(res.image), (0, 3, 1, 2))
    np.testing.assert_allclose(got, data[f"{tag}/dec_img"], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("tag", ["l2"])
def test_init_shapes_match_converted(tag):
    import jax

    data, tag, vae_cfg, var_cfg, vae_params, var_params = _load(tag)
    fresh = var_mod.init_var_params(jax.random.PRNGKey(0), var_cfg)
    ref_shapes = jax.tree.map(lambda a: jnp.asarray(a).shape, var_params)
    new_shapes = jax.tree.map(lambda a: a.shape, fresh)
    assert ref_shapes == new_shapes


def test_teacher_forced_loss_reasonable():
    """Freshly-initialized model: CE should be ~ln(V) (sanity of init scaling)."""
    import jax

    data, tag, vae_cfg, var_cfg, vae_params, var_params = _load("l2")
    fresh = var_mod.init_var_params(jax.random.PRNGKey(0), var_cfg)
    label = jnp.asarray(data["l2/label"])
    x_in = jnp.asarray(data["l2/var_input"])
    logits = var_mod.var_forward(fresh, var_cfg, label, x_in, dtype=jnp.float32)
    gt = jnp.asarray(data["l2/gt_BL"])
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, gt[..., None], axis=-1).mean()
    assert abs(float(ce) - np.log(var_cfg.vocab_size)) < 0.5


def test_from_pretrained_dict_hub_constructor():
    """VARHF-equivalent (reference ``models/var.py:633-653``): hub config
    dict + bundled state dict -> identical params to the explicit path."""
    from var_tpu.models import from_pretrained_dict

    data = np.load(FIXTURE)
    pns = tuple(data["patch_nums"].tolist())
    vae_sd = {"vae_local." + k[len("vae_sd/"):]: data[k].astype(np.float32)
              for k in data.files if k.startswith("vae_sd/")}
    var_sd = {k[len("l2/var_sd/"):]: data[k].astype(np.float32)
              for k in data.files if k.startswith("l2/var_sd/")}
    config = dict(
        vae_kwargs=dict(vocab_size=64, z_channels=8, ch=32, v_patch_nums=pns),
        num_classes=10, depth=3, embed_dim=64, num_heads=4,
        drop_path_rate=0.1, attn_l2_norm=True, shared_aln=False,
        cond_drop_rate=0.0, patch_nums=list(pns),
    )
    vae_cfg, var_cfg, vae_params, var_params = from_pretrained_dict(
        config, {**vae_sd, **var_sd}, stack_blocks=False)
    assert vae_cfg.vocab_size == 64 and var_cfg.embed_dim == 64
    assert var_cfg.patch_nums == pns and vae_params is not None

    _, _, _, var_cfg_ref, vae_ref, var_ref = _load("l2")
    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(var_params),
                   key=lambda kv: jax.tree_util.keystr(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(var_ref),
                   key=lambda kv: jax.tree_util.keystr(kv[0]))):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
