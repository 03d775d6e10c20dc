"""Converter round-trip (jax -> torch names -> jax) and preset configs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import PATCH_NUM_PRESETS, VARConfig
from var_tpu.engine.convert import convert_var, export_var_to_torch_names
from var_tpu.models import var as var_mod


@pytest.mark.slow
def test_export_import_roundtrip_list_and_stacked():
    cfg = VARConfig(num_classes=6, depth=3, embed_dim=32, num_heads=2,
                    patch_nums=(1, 2, 3), vocab_size=16, z_channels=8,
                    attn_l2_norm=True)
    params = var_mod.init_var_params(jax.random.PRNGKey(0), cfg)
    for p in (params, var_mod.stack_block_params(params)):
        sd = export_var_to_torch_names(p, cfg)
        back = convert_var(sd, cfg)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_export_shared_aln_roundtrip():
    cfg = VARConfig(num_classes=6, depth=2, embed_dim=32, num_heads=2,
                    patch_nums=(1, 2, 3), vocab_size=16, z_channels=8,
                    shared_aln=True, attn_l2_norm=False)
    params = var_mod.init_var_params(jax.random.PRNGKey(1), cfg)
    back = convert_var(export_var_to_torch_names(params, cfg), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_512_and_1024_presets():
    cfg512 = VARConfig.from_depth(36, shared_aln=True,
                                  patch_nums=PATCH_NUM_PRESETS["512"])
    assert cfg512.seq_len == 2240 and cfg512.embed_dim == 2304
    cfg1024 = VARConfig.from_depth(16, patch_nums=PATCH_NUM_PRESETS["1024"])
    assert cfg1024.seq_len == 9451

    # forward shape-checks via abstract eval (no FLOPs)
    params_shape = jax.eval_shape(
        lambda k: var_mod.init_var_params(k, cfg512), jax.random.PRNGKey(0))
    lvl = var_mod.level_ids(cfg512)
    assert lvl.shape == (2240,) and lvl[-1] == len(cfg512.patch_nums) - 1

    def fwd(params, label, x_in):
        return var_mod.var_forward(params, cfg512, label, x_in, dtype=jnp.bfloat16)

    out = jax.eval_shape(
        fwd, params_shape,
        jax.ShapeDtypeStruct((2,), jnp.int32),
        jax.ShapeDtypeStruct((2, 2239, 32), jnp.float32))
    assert out.shape == (2, 2240, 4096)
