"""Converter schema pinned against the REAL reference classes.

Instantiates the actual reference torch modules (``models/vqvae.py``,
``models/var.py`` — the classes whose ``state_dict()`` defines the published
``.pth`` schema: README.md:96, train.py:93-98) at the production d16 /
ch160-v4096 geometry, then asserts:

* ``convert_vae`` / ``convert_var`` read EVERY parameter key the reference
  module exposes (a tracking dict records access) — no silently-dropped
  weight can hide in a renamed or newly-added key;
* the converted pytrees match ``init_vae_params`` / ``init_var_params``
  structure and leaf shapes exactly — so what the converter emits is what
  the models consume;
* ``export_var_to_torch_names`` emits exactly the reference parameter-name
  set (plus the constant ``zero_k_bias`` buffer) and round-trips every
  array bit-exactly.

This is the zero-egress substitute for loading a published checkpoint: the
schema comes from the reference *code*, not from hand-built manifests.
"""

import importlib
import os
import sys
import types
import typing

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402

from var_tpu.config import VAEConfig, VARConfig  # noqa: E402
from var_tpu.engine.convert import (  # noqa: E402
    convert_var,
    convert_vae,
    export_var_to_torch_names,
    to_numpy_state_dict,
)
from var_tpu.models import vae as vae_mod  # noqa: E402
from var_tpu.models import var as var_mod  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/models"), reason="reference source not present"
)

# stat/derived buffers the converter intentionally ignores: EMA vocab-usage
# stats (quant.py:35), the level-id table and causal mask (var.py:110-112)
# and the constant zero k-bias (basic_var.py:76) are all reconstructed, not
# loaded
DERIVED_BUFFERS = ("ema_vocab_hit_SV", "lvl_1L", "attn_bias_for_masking", "zero_k_bias")


class _TrackingSD(dict):
    """State dict that records which keys the converter consumed."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _load_reference():
    torch.Optional = typing.Optional  # reference var.py annotates with torch.Optional
    pkg = types.ModuleType("models")
    pkg.__path__ = ["/root/reference/models"]
    sys.modules.setdefault("models", pkg)
    vqvae_mod = importlib.import_module("models.vqvae")
    ref_var = importlib.import_module("models.var")
    return vqvae_mod.VQVAE, ref_var.VAR


def _shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


@pytest.fixture(scope="module")
def ref_models():
    VQVAE, VAR = _load_reference()
    torch.manual_seed(0)
    vae = VQVAE(vocab_size=4096, z_channels=32, ch=160, test_mode=True,
                share_quant_resi=4,
                v_patch_nums=(1, 2, 3, 4, 5, 6, 8, 10, 13, 16)).eval()
    var = VAR(vae_local=vae, num_classes=1000, depth=16, embed_dim=1024,
              num_heads=16, drop_rate=0.0, attn_drop_rate=0.0,
              drop_path_rate=0.0, norm_eps=1e-6, shared_aln=False,
              cond_drop_rate=0.1, attn_l2_norm=True,
              patch_nums=(1, 2, 3, 4, 5, 6, 8, 10, 13, 16),
              flash_if_available=False, fused_if_available=False).eval()
    return vae, var


@pytest.mark.slow
def test_convert_vae_consumes_every_reference_key(ref_models):
    vae, _ = ref_models
    cfg = VAEConfig()
    sd = _TrackingSD(to_numpy_state_dict(vae.state_dict()))
    params = convert_vae(sd, cfg)
    expected = {k for k in sd if not any(b in k for b in DERIVED_BUFFERS)}
    missed = expected - sd.read
    assert not missed, f"converter never read {sorted(missed)[:10]} (+{len(missed)})"

    # converted pytree == what the model-side init produces (struct + shapes)
    ref_struct = jax.eval_shape(lambda k: vae_mod.init_vae_params(k, cfg),
                                jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref_struct))
    assert _shapes(params) == _shapes(ref_struct)


@pytest.mark.slow
def test_convert_var_consumes_every_reference_key(ref_models):
    _, var = ref_models
    cfg = VARConfig.from_depth(16, attn_l2_norm=True)
    param_names = {k for k, _ in var.named_parameters()}
    sd = _TrackingSD({k: v.detach().numpy() for k, v in var.state_dict().items()})
    params = convert_var(sd, cfg)
    missed = param_names - sd.read
    assert not missed, f"converter never read {sorted(missed)[:10]} (+{len(missed)})"

    ref_struct = jax.eval_shape(lambda k: var_mod.init_var_params(k, cfg),
                                jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref_struct))
    assert _shapes(params) == _shapes(ref_struct)


@pytest.mark.slow
def test_export_var_matches_reference_name_set_and_roundtrips(ref_models):
    _, var = ref_models
    cfg = VARConfig.from_depth(16, attn_l2_norm=True)
    ref_sd = {k: v.detach().numpy() for k, v in var.state_dict().items()}
    params = convert_var(ref_sd, cfg)
    out = export_var_to_torch_names(params, cfg)

    param_names = {k for k, _ in var.named_parameters()}
    buffer_names = {k for k, _ in var.named_buffers() if "zero_k_bias" in k}
    assert set(out) == param_names | buffer_names, (
        f"extra={sorted(set(out) - (param_names | buffer_names))[:10]} "
        f"missing={sorted((param_names | buffer_names) - set(out))[:10]}")

    # bit-exact round-trip reference -> jax -> reference names
    for k in param_names:
        np.testing.assert_array_equal(
            out[k].reshape(ref_sd[k].shape), ref_sd[k], err_msg=k)

    # torch must accept the exported dict for the same architecture
    missing, unexpected = var.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v).reshape(var.state_dict()[k].shape)
                             if k in var.state_dict() else v)
         for k, v in out.items()}, strict=False)
    assert not unexpected, unexpected
    assert all(any(b in m for b in DERIVED_BUFFERS) for m in missing), missing
