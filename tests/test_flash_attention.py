"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import VARConfig
from var_tpu.models import var as var_mod
from var_tpu.ops.attention import attention
from var_tpu.ops.pallas.flash_attention import flash_attention

PNS = (1, 2, 3, 4)


def _qkv(b=2, lq=30, lk=30, h=2, d=16, seed=0):
    r = jax.random.PRNGKey(seed)
    rq, rk, rv = jax.random.split(r, 3)
    return (jax.random.normal(rq, (b, lq, h, d)),
            jax.random.normal(rk, (b, lk, h, d)),
            jax.random.normal(rv, (b, lk, h, d)))


def test_dense_matches_xla():
    q, k, v = _qkv()
    want = attention(q, k, v, scale=0.25, impl="xla")
    got = flash_attention(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_block_causal_matches_xla_bias():
    cfg = VARConfig(patch_nums=PNS, depth=2, embed_dim=32, num_heads=2,
                    vocab_size=16, z_channels=8)
    L = cfg.seq_len
    ends = tuple(e for _, e in cfg.begin_ends)
    bias = jnp.asarray(var_mod.block_causal_bias(cfg))
    q, k, v = _qkv(lq=L, lk=L)
    want = attention(q, k, v, scale=0.3, bias=bias, impl="xla")
    got = flash_attention(q, k, v, scale=0.3, scale_ends=ends)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_block_sizes_smaller_than_seq():
    cfg = VARConfig(patch_nums=(1, 2, 3, 4, 5, 6), depth=2, embed_dim=32,
                    num_heads=2, vocab_size=16, z_channels=8)
    L = cfg.seq_len  # 91 -> multiple KV blocks with block 32
    ends = tuple(e for _, e in cfg.begin_ends)
    bias = jnp.asarray(var_mod.block_causal_bias(cfg))
    q, k, v = _qkv(lq=L, lk=L, seed=3)
    want = attention(q, k, v, scale=0.25, bias=bias, impl="xla")
    got = flash_attention(q, k, v, scale=0.25, scale_ends=ends,
                          block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    cfg = VARConfig(patch_nums=PNS, depth=2, embed_dim=32, num_heads=2,
                    vocab_size=16, z_channels=8)
    L = cfg.seq_len
    ends = tuple(e for _, e in cfg.begin_ends)
    bias = jnp.asarray(var_mod.block_causal_bias(cfg))
    q, k, v = _qkv(lq=L, lk=L, seed=5)

    def loss_xla(q, k, v):
        o = attention(q, k, v, scale=0.25, bias=bias, impl="xla")
        return jnp.sum(jnp.sin(o))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale=0.25, scale_ends=ends)
        return jnp.sum(jnp.sin(o))

    ga = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5)


def test_var_forward_pallas_matches_xla():
    cfg = VARConfig(num_classes=6, depth=2, embed_dim=32, num_heads=2,
                    patch_nums=PNS, vocab_size=16, z_channels=8,
                    attn_l2_norm=True, cond_drop_rate=0.0)
    params = var_mod.init_var_params(jax.random.PRNGKey(0), cfg)
    label = jnp.array([1, 3])
    x_in = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.seq_len - 1, 8))
    a = var_mod.var_forward(params, cfg, label, x_in, dtype=jnp.float32, attn_impl="xla")
    b = var_mod.var_forward(params, cfg, label, x_in, dtype=jnp.float32, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_decode_stage_pallas_matches_xla():
    """Dense (no-mask) kernel over a growing KV cache — the decode case."""
    cfg = VARConfig(num_classes=6, depth=2, embed_dim=32, num_heads=2,
                    patch_nums=PNS, vocab_size=16, z_channels=8, cond_drop_rate=0.0)
    params = var_mod.init_var_params(jax.random.PRNGKey(0), cfg)
    cond = jnp.take(params["class_emb"], jnp.array([0, 6]), axis=0)
    ctx = var_mod.cond_context(params, cfg, cond)
    xs = [jax.random.normal(jax.random.PRNGKey(i), (2, pn * pn, cfg.embed_dim))
          for i, pn in enumerate(PNS)]
    ca = cb = None
    for x in xs:
        xa, ca = var_mod.transformer_stage(params, cfg, x, ctx, ca,
                                           dtype=jnp.float32, attn_impl="xla")
        xb, cb = var_mod.transformer_stage(params, cfg, x, ctx, cb,
                                           dtype=jnp.float32, attn_impl="pallas")
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa), rtol=1e-4, atol=1e-4)


def test_fused_modulated_layernorm_matches_xla():
    """Pallas fused LN+AdaLN (decode path) == the XLA _ln formulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from var_tpu.ops.pallas.fused_ln import modulated_layernorm
    from var_tpu.models.var import _ln

    for (b, l, c) in [(4, 9, 256), (2, 169, 512), (2, 1, 128)]:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(l), 3)
        x = jax.random.normal(k1, (b, l, c), jnp.float32) * 3
        s = jax.random.normal(k2, (b, c), jnp.float32)
        sh = jax.random.normal(k3, (b, c), jnp.float32)
        want = _ln(x, 1e-6) * (s[:, None] + 1.0) + sh[:, None]
        got = modulated_layernorm(x, s, sh, eps=1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


def test_paired_train_matches_xla_values_and_grads():
    """Merged-lane paired-head training attention (values + all three
    gradients) == the XLA dense path with the same block-causal mask, at
    head_dim-64 geometry with multiple head pairs and block sizes that
    stream and straddle the sequence."""
    from var_tpu.ops.pallas.flash_attention import flash_attention_paired_train

    ends = (1, 5, 14, 30, 55, 91)
    B, L, H = 2, 91, 4
    C = 64 * H
    r = jax.random.split(jax.random.PRNGKey(7), 4)
    qm = jax.random.normal(r[0], (B, L, C), jnp.float32)
    km = jax.random.normal(r[1], (B, L, C), jnp.float32)
    vm = jax.random.normal(r[2], (B, L, C), jnp.float32)
    do = jax.random.normal(r[3], (B, L, C), jnp.float32)
    scale = 0.125

    def ref(q, k, v):
        out = attention(q.reshape(B, L, H, 64), k.reshape(B, L, H, 64),
                        v.reshape(B, L, H, 64), scale, impl="xla",
                        scale_ends=ends)
        return jnp.sum(out.reshape(B, L, C) * do)

    def new(q, k, v):
        return jnp.sum(flash_attention_paired_train(
            q, k, v, H, scale, ends, block_q=32, block_k=48) * do)

    lr, gr = jax.value_and_grad(ref, argnums=(0, 1, 2))(qm, km, vm)
    ln, gn = jax.value_and_grad(new, argnums=(0, 1, 2))(qm, km, vm)
    assert abs(float(lr - ln)) < 1e-3
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_paired_train_var_forward_matches_xla():
    """attn_impl='paired' through var_forward: teacher-forced logits and
    parameter gradients equal the XLA path at head_dim-64 geometry, with
    and without attention-core remat."""
    cfg = VARConfig(depth=2, embed_dim=256, num_heads=4,
                    patch_nums=(1, 2, 3, 4, 5), vocab_size=32, z_channels=8,
                    attn_l2_norm=True, cond_drop_rate=0.0)
    params = var_mod.stack_block_params(
        var_mod.init_var_params(jax.random.PRNGKey(0), cfg))
    label = jnp.array([1, 3])
    x_in = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.seq_len - 1, 8))
    do = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.seq_len, cfg.vocab_size))

    def loss(p, impl, remat):
        lg = var_mod.var_forward(p, cfg, label, x_in, dtype=jnp.float32,
                                 attn_impl=impl, remat=remat)
        return jnp.sum(lg * do)

    for remat in (0, 2):
        lx, gx = jax.value_and_grad(lambda p: loss(p, "xla", remat))(params)
        lp, gp = jax.value_and_grad(lambda p: loss(p, "paired", remat))(params)
        assert abs(float(lx - lp)) < 1e-3
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=5e-4)


def test_paired_train_bf16_matches_xla():
    """bf16 inputs (the production training dtype): paired kernel fwd + all
    grads track the XLA dense path within bf16 tolerance."""
    from var_tpu.ops.pallas.flash_attention import flash_attention_paired_train

    ends = (1, 5, 14, 30)
    B, L, H = 2, 30, 2
    C = 64 * H
    r = jax.random.split(jax.random.PRNGKey(3), 4)
    qm = jax.random.normal(r[0], (B, L, C), jnp.float32).astype(jnp.bfloat16)
    km = jax.random.normal(r[1], (B, L, C), jnp.float32).astype(jnp.bfloat16)
    vm = jax.random.normal(r[2], (B, L, C), jnp.float32).astype(jnp.bfloat16)
    do = jax.random.normal(r[3], (B, L, C), jnp.float32).astype(jnp.bfloat16)
    scale = 0.125

    def ref(q, k, v):
        out = attention(q.reshape(B, L, H, 64), k.reshape(B, L, H, 64),
                        v.reshape(B, L, H, 64), scale, impl="xla",
                        scale_ends=ends)
        return jnp.sum(out.reshape(B, L, C).astype(jnp.float32) * do.astype(jnp.float32))

    def new(q, k, v):
        out = flash_attention_paired_train(q, k, v, H, scale, ends,
                                           block_q=16, block_k=16)
        return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))

    lr, gr = jax.value_and_grad(ref, argnums=(0, 1, 2))(qm, km, vm)
    ln, gn = jax.value_and_grad(new, argnums=(0, 1, 2))(qm, km, vm)
    assert abs(float(lr - ln)) < 0.5
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=0.1, atol=0.15)


def test_paired_train_segmented_matches_monolithic():
    """The mask-structure decomposition (per-scale unmasked prefix calls,
    ``segment=True``) is value- and gradient-identical to the single masked
    L x L kernel it replaces, at a pyramid whose tail scales exceed
    block_q so every branch (shared masked head + per-scale tail) fires."""
    from var_tpu.ops.pallas.flash_attention import flash_attention_paired_train

    ends = (1, 5, 14, 30, 55, 91, 155)
    B, L, H = 2, 155, 4
    C = 64 * H
    r = jax.random.split(jax.random.PRNGKey(11), 4)
    qm = jax.random.normal(r[0], (B, L, C), jnp.float32)
    km = jax.random.normal(r[1], (B, L, C), jnp.float32)
    vm = jax.random.normal(r[2], (B, L, C), jnp.float32)
    do = jax.random.normal(r[3], (B, L, C), jnp.float32)

    def run(seg):
        def f(q, k, v):
            out = flash_attention_paired_train(q, k, v, H, 0.125, ends,
                                               block_q=32, block_k=64,
                                               segment=seg)
            return jnp.sum(out * do)
        return jax.value_and_grad(f, argnums=(0, 1, 2))(qm, km, vm)

    lm, gm = run(False)
    ls, gs = run(True)
    assert abs(float(lm - ls)) < 1e-3
    for a, b in zip(gm, gs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_paired_train_fused_bwd_matches_split():
    """The one-pass fused backward (dq/dk/dv from a single s/p/ds build)
    equals the split dq + dkv kernels on every gradient, across segment
    shapes (Lq != Lk) and the masked head call."""
    import os
    from var_tpu.ops.pallas import flash_attention as fa

    ends = (1, 5, 14, 30, 55, 91)
    B, L, H = 2, 91, 4
    C = 64 * H
    r = jax.random.split(jax.random.PRNGKey(21), 4)
    qm = jax.random.normal(r[0], (B, L, C), jnp.float32)
    km = jax.random.normal(r[1], (B, L, C), jnp.float32)
    vm = jax.random.normal(r[2], (B, L, C), jnp.float32)
    do = jax.random.normal(r[3], (B, L, C), jnp.float32)

    def grads():
        def f(q, k, v):
            out = fa.flash_attention_paired_train(q, k, v, H, 0.125, ends,
                                                  block_q=32, block_k=48)
            return jnp.sum(out * do)
        return jax.grad(f, argnums=(0, 1, 2))(qm, km, vm)

    os.environ["VAR_TPU_PTRAIN_FUSED_BWD"] = "0"
    try:
        g_split = grads()
    finally:
        os.environ.pop("VAR_TPU_PTRAIN_FUSED_BWD", None)
    g_fused = grads()
    for a, b in zip(g_split, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_ptrain_q_block_choice_satisfies_mosaic_constraint():
    """Regression (round 5, verified crash on real TPU): the paired-train
    kernels' lse output block has trailing dim = bq, which Mosaic requires
    to be a multiple of 128 or the full array dim. The non-segmented
    fall-through used to pick multiple-of-8 blocks (bq=16 at the
    local-debug pn=1_2_3, L=14; bq=160 at pn=1..8, L=155) and failed
    lowering for ANY pyramid whose total L <= block_q. Hardware mode must
    round every q block to a multiple of 128; interpret mode keeps the
    tests' tiny multiple-of-8 blocks."""
    from var_tpu.ops.pallas.flash_attention import _pick_block_q_ptrain

    for target in (128, 256, 512):
        for n in list(range(1, 300)) + [680, 1216, 2240, 9451]:
            bq = _pick_block_q_ptrain(n, target, interpret=False)
            assert bq % 128 == 0, (n, target, bq)
            assert bq >= min(n, target)  # block covers n (or is the cap)
            bq_i = _pick_block_q_ptrain(n, target, interpret=True)
            assert bq_i % 8 == 0 and bq_i >= min(n, target)
