"""PRODUCTION-SHAPE VQVAE parity: full 10-scale 256px pyramid, V=4096,
Cvae=32, ch=160 (tests/fixtures/vae_prod.npz).

Closes the compounding-resize risk at real ratios: non-integer area
downsamples (16->13, 16->10, ...) and bicubic upsamples (13->16, ...)
inside the residual loop must match the reference token-for-token
(``models/quant.py:135-166``). Weights are regenerated from the committed
name/shape manifest via tests/synth_weights.py — see
scripts/gen_vae_fixture_prod.py.
"""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from var_tpu.config import VAEConfig
from var_tpu.engine.convert import convert_vae
from var_tpu.models import quantizer as q
from var_tpu.models import vae

from .synth_weights import synth_state_dict

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "vae_prod.npz")


@pytest.fixture(scope="module")
def fx():
    data = np.load(FIXTURE)
    pns = tuple(data["patch_nums"].tolist())
    cfg = VAEConfig(v_patch_nums=pns)  # production defaults: 4096/32/160
    keys_shapes = json.loads(bytes(data["keys_shapes_json"]).decode())
    params = convert_vae(synth_state_dict(keys_shapes), cfg)
    img = jnp.asarray(np.transpose(data["img"], (0, 2, 3, 1)))  # NCHW -> NHWC
    return data, cfg, params, img


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_encoder_features_match(fx):
    data, cfg, params, img = fx
    f = vae.img_to_f(params, cfg, img)
    np.testing.assert_allclose(_nchw(f), data["f"], rtol=1e-4, atol=1e-4)


def test_tokenize_matches_token_for_token(fx):
    data, cfg, params, img = fx
    idx_bl = vae.img_to_idxBl(params, cfg, img)
    for si in range(len(cfg.v_patch_nums)):
        np.testing.assert_array_equal(np.asarray(idx_bl[si]), data[f"idx_{si}"],
                                      err_msg=f"token mismatch at scale {si}")


def test_fhat_final_matches(fx):
    data, cfg, params, img = fx
    fhats = vae.img_to_fhat(params, cfg, img)
    np.testing.assert_allclose(_nchw(fhats[-1]), data["f_hat_final"],
                               rtol=1e-4, atol=1e-4)


def test_var_teacher_input_matches(fx):
    data, cfg, params, img = fx
    idx_bl = [jnp.asarray(data[f"idx_{si}"]) for si in range(len(cfg.v_patch_nums))]
    got = q.idxBl_to_var_input(params["quantize"], cfg, idx_bl)
    np.testing.assert_allclose(np.asarray(got), data["var_input"],
                               rtol=1e-4, atol=1e-4)


def test_decode_loop_steps_match(fx):
    data, cfg, params, img = fx
    pns = cfg.v_patch_nums
    b = data["img"].shape[0]
    f_hat = jnp.zeros((b, pns[-1], pns[-1], cfg.z_channels), jnp.float32)
    for si, pn in enumerate(pns):
        idx = jnp.asarray(data[f"idx_{si}"])
        h = q.embed(params["quantize"], idx).reshape(b, pn, pn, cfg.z_channels)
        f_hat, nxt = q.get_next_autoregressive_input(params["quantize"], cfg, si, f_hat, h)
        np.testing.assert_allclose(_nchw(f_hat), data[f"step_fhat_{si}"],
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"step f_hat mismatch at scale {si}")
        np.testing.assert_allclose(_nchw(nxt), data[f"step_next_{si}"],
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"step next-input mismatch at scale {si}")


def test_recon_matches(fx):
    data, cfg, params, img = fx
    recon = vae.img_to_reconstructed_img(params, cfg, img)
    np.testing.assert_allclose(_nchw(recon), data["recon"], rtol=1e-3, atol=2e-3)
