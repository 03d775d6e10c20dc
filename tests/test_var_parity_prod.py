"""PRODUCTION-GEOMETRY VAR transformer parity vs the torch reference.

d16 geometry — C=1024, 16 heads (head_dim 64), attn_l2_norm, V=4096, full
10-scale 256px pyramid (L=680) — at depth 2, with deterministically
synthesized weights regenerated on both sides (tests/synth_weights.py; the
torch side ran in scripts/gen_var_fixture_prod.py). This is the geometry
where the merged-head KV caches, the paired-head Pallas decode kernel and
``get_logits_cfg`` pre-head CFG mixing actually operate; the tiny fixture
(C=64, head_dim 16) never reaches them.

Checks (reference hot path ``models/var.py:126-234``):
* teacher-forced logits over the full 680-token block-causal sequence,
* greedy (top_k=1) CFG decode: token-for-token equality over all 10 stages
  plus the final accumulated f_hat — through BOTH the XLA decode path and
  the paired-head Pallas kernel (interpret mode).
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.engine.convert import convert_vae, convert_var
from var_tpu.models import var as var_mod
from tests.synth_weights import synth_state_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "var_prod.npz")
F32 = jnp.float32


def _manifest(data, key):
    return json.loads(bytes(data[key]).decode())


def _load():
    data = np.load(FIXTURE)
    pns = tuple(data["patch_nums"].tolist())
    depth, width, heads, ncls = data["depth_width_heads_ncls"].tolist()
    vae_cfg = VAEConfig(vocab_size=4096, z_channels=32, ch=160, v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=ncls, depth=depth, embed_dim=width,
                        num_heads=heads, attn_l2_norm=True, shared_aln=False,
                        cond_drop_rate=0.0, patch_nums=pns,
                        vocab_size=4096, z_channels=32)
    var_sd = {k[len("var/"):]: v for k, v in
              synth_state_dict(_manifest(data, "var_keys_shapes_json")).items()}
    var_params = convert_var(var_sd, var_cfg)
    return data, vae_cfg, var_cfg, var_params


def _vae_params(data, vae_cfg):
    return convert_vae(synth_state_dict(_manifest(data, "vae_keys_shapes_json")),
                       vae_cfg)


def test_teacher_forced_logits_prod_geometry():
    data, vae_cfg, var_cfg, var_params = _load()
    label = jnp.asarray(data["label"])
    x_in = jnp.asarray(data["var_input"])
    logits = var_mod.var_forward(var_params, var_cfg, label, x_in,
                                 train=False, dtype=F32)
    want = data["logits_f16"].astype(np.float32)
    # fixture logits are fp16-rounded (max |l| ~ 8 -> quantum ~ 0.008)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-2)
    # and the argmax tokens agree everywhere fp16 rounding permits a check
    pred = np.asarray(jnp.argmax(logits, -1))
    agree = (pred == want.argmax(-1)).mean()
    assert agree > 0.99, f"teacher-forced argmax agreement {agree}"


def _greedy_tokens(data, vae_cfg, var_cfg, var_params, attn_impl):
    from var_tpu.engine.sampler import decode_tokens_cfg

    vae_params = _vae_params(data, vae_cfg)
    label = jnp.asarray(data["dec_label"])
    tokens, f_hat = decode_tokens_cfg(
        var_params, vae_params, var_cfg, vae_cfg, jax.random.PRNGKey(0),
        label, cfg_scale=1.5, top_k=1, top_p=0.0, dtype=F32,
        attn_impl=attn_impl)
    return np.asarray(tokens), np.asarray(f_hat)


@pytest.mark.slow
def test_greedy_decode_prod_geometry_xla():
    data, vae_cfg, var_cfg, var_params = _load()
    tokens, f_hat = _greedy_tokens(data, vae_cfg, var_cfg, var_params, "xla")
    np.testing.assert_array_equal(tokens, data["dec_tokens"])
    want_fhat = np.transpose(data["dec_fhat"], (0, 2, 3, 1))  # NCHW -> NHWC
    np.testing.assert_allclose(f_hat, want_fhat, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_greedy_decode_prod_geometry_pallas():
    """Same trajectory through the paired-head decode kernel — pins the
    production kernel to the torch reference, token for token."""
    data, vae_cfg, var_cfg, var_params = _load()
    tokens, _ = _greedy_tokens(data, vae_cfg, var_cfg, var_params, "pallas")
    np.testing.assert_array_equal(tokens, data["dec_tokens"])
