"""Pin the paired-head Pallas decode kernel at PRODUCTION geometry.

``flash_decode_paired`` is the TPU decode hot path (``models/var.py``
``attn_apply``: impl="pallas" + head_dim 64) and the source of the headline
img/s number — these tests run it in interpret mode on CPU at the real
head_dim-64 envelope (every other test config uses head_dim 16, which
bypasses it entirely):

* direct kernel vs the XLA dot-general pair across Lq from 1 token to
  multi-q-block, Lk at non-multiples of 8 (tail-block masking), b > 1,
  non-trivial scale;
* the attn_apply envelope seam: shrink ``var.PAIRED_VMEM_BUDGET`` so a
  mid-pyramid stage crosses from the paired kernel to the XLA fallback and
  assert both halves agree;
* end-to-end greedy ``decode_cfg`` equality pallas-vs-xla at a head_dim-64
  config — the kernel that ships cannot silently produce wrong tokens.

Reference behavior matched: attention backends are interchangeable
(``models/basic_var.py:96-117``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.models import var as var_mod
from var_tpu.ops.pallas.flash_attention import flash_decode_paired

F32 = jnp.float32


def _ref_decode_attn(q_m, k_m, v_m, h, scale):
    """Plain fp32 einsum attention over merged-head tensors."""
    b, lq, c = q_m.shape
    lk = k_m.shape[1]
    d = c // h
    q = q_m.reshape(b, lq, h, d).astype(F32)
    k = k_m.reshape(b, lk, h, d).astype(F32)
    v = v_m.reshape(b, lk, h, d).astype(F32)
    lg = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale
    p = jax.nn.softmax(lg, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p, v).reshape(b, lq, c)


@pytest.mark.parametrize("h,lq,lk", [
    (2, 1, 9),      # single-token stage, tiny non-multiple-of-8 cache
    (2, 9, 100),    # 3x3 stage, cache not a multiple of 8
    (2, 100, 341),  # 10x10 stage, odd cache length
    (4, 256, 680),  # full final 256px stage length at 4 heads
    (2, 300, 651),  # Lq straddles two q-blocks (block_q=256); odd Lk
    (16, 36, 91),   # d16 head count at C=1024
])
def test_paired_kernel_matches_reference(h, lq, lk):
    c = 64 * h  # head_dim 64 — the production envelope
    r = jax.random.PRNGKey(lq * 1000 + lk)
    rq, rk, rv = jax.random.split(r, 3)
    q = jax.random.normal(rq, (2, lq, c), F32)
    k = jax.random.normal(rk, (2, lk, c), F32)
    v = jax.random.normal(rv, (2, lk, c), F32)
    scale = 0.17
    want = _ref_decode_attn(q, k, v, h, scale)
    got = flash_decode_paired(q, k, v, h, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paired_kernel_bf16_inputs():
    """bf16 q/k/v (the decode cache dtype): fp32 softmax inside, bf16 out."""
    h, lq, lk = 2, 36, 119
    c = 64 * h
    r = jax.random.PRNGKey(0)
    rq, rk, rv = jax.random.split(r, 3)
    q = jax.random.normal(rq, (2, lq, c), F32).astype(jnp.bfloat16)
    k = jax.random.normal(rk, (2, lk, c), F32).astype(jnp.bfloat16)
    v = jax.random.normal(rv, (2, lk, c), F32).astype(jnp.bfloat16)
    want = _ref_decode_attn(q, k, v, h, 0.125)
    got = flash_decode_paired(q, k, v, h, 0.125)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.05)


PNS = (1, 2, 3, 4, 5, 6)  # ends 1, 5, 14, 30, 55, 91


def _stage_cfg(h=2):
    return VARConfig(num_classes=6, depth=2, embed_dim=64 * h, num_heads=h,
                     patch_nums=PNS, vocab_size=32, z_channels=8,
                     attn_l2_norm=True, cond_drop_rate=0.0)


def _run_stages(cfg, params, attn_impl):
    cond = jnp.take(params["class_emb"], jnp.array([0, 3]), axis=0)
    ctx = var_mod.cond_context(params, cfg, cond)
    outs, caches = [], None
    for i, pn in enumerate(cfg.patch_nums):
        x = jax.random.normal(jax.random.PRNGKey(i), (2, pn * pn, cfg.embed_dim))
        x, caches = var_mod.transformer_stage(params, cfg, x, ctx, caches,
                                              dtype=F32, attn_impl=attn_impl)
        outs.append(x)
    return outs


def test_attn_apply_paired_envelope_seam(monkeypatch):
    """Stages inside the VMEM envelope take the paired kernel, stages beyond
    it take XLA — both must agree with the pure-XLA decode. Budget shrunk so
    the seam lands mid-pyramid (Lk <= 30 paired, Lk > 30 XLA)."""
    cfg = _stage_cfg(h=2)
    monkeypatch.setattr(var_mod, "PAIRED_VMEM_BUDGET", 30 * 4 * cfg.embed_dim)
    params = var_mod.init_var_params(jax.random.PRNGKey(0), cfg)
    want = _run_stages(cfg, params, "xla")
    got = _run_stages(cfg, params, "pallas")
    for si, (a, b) in enumerate(zip(want, got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"stage {si} diverged")


def test_attn_apply_paired_full_pyramid():
    """All eligible stages through the paired kernel (default envelope)."""
    cfg = _stage_cfg(h=4)
    params = var_mod.init_var_params(jax.random.PRNGKey(1), cfg)
    want = _run_stages(cfg, params, "xla")
    got = _run_stages(cfg, params, "pallas")
    for si, (a, b) in enumerate(zip(want, got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"stage {si} diverged")


@pytest.mark.slow
def test_greedy_decode_cfg_pallas_matches_xla():
    """End-to-end greedy decode at head_dim-64 geometry: token-for-token and
    image equality between the paired-kernel path and the XLA path."""
    from var_tpu.engine.sampler import decode_cfg

    h = 2
    var_cfg = _stage_cfg(h=h)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=PNS)
    from var_tpu.models import vae as vae_mod

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.init_var_params(k2, var_cfg)
    label = jnp.array([1, 4])
    res_x = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(0), label, cfg_scale=1.5,
                       top_k=1, top_p=0.0, dtype=F32, attn_impl="xla")
    res_p = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(0), label, cfg_scale=1.5,
                       top_k=1, top_p=0.0, dtype=F32, attn_impl="pallas")
    np.testing.assert_array_equal(np.asarray(res_p.tokens), np.asarray(res_x.tokens))
    np.testing.assert_allclose(np.asarray(res_p.image), np.asarray(res_x.image),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("w", [1, 2, 4])
def test_kv_window_keeps_chunked_cache(w):
    """kv_window pruning on the CHUNKED cache (a compile-time tuple slice)
    must be token-exact against the windowed grow-by-concat reference path —
    the window no longer forfeits the fast layout (round-4 verdict item 8).
    Greedy, fp32, head_dim-64 so the paired kernel actually serves it."""
    from var_tpu.engine.sampler import decode_cfg
    from var_tpu.models import vae as vae_mod

    var_cfg = _stage_cfg(h=2)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=PNS)
    assert var_mod.window_chunks_viable(var_cfg, w, "pallas")
    assert not var_mod.window_chunks_viable(var_cfg, w, "xla")
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.init_var_params(k2, var_cfg)
    label = jnp.array([1, 4])
    ref = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                     jax.random.PRNGKey(0), label, cfg_scale=1.5, top_k=1,
                     top_p=0.0, dtype=F32, attn_impl="xla", kv_window=w,
                     cache_impl="concat")
    got = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                     jax.random.PRNGKey(0), label, cfg_scale=1.5, top_k=1,
                     top_p=0.0, dtype=F32, attn_impl="pallas", kv_window=w,
                     cache_impl="chunked")
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(ref.image),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h,lens,lcur,layer_depth", [
    (2, (1, 4, 9, 16), 25, (1, 3)),    # mid-pyramid, small heads
    (4, (1, 4, 9), 16, (0, 2)),        # >1 head-pair tile (lane slicing)
    (16, (1, 4, 9, 16, 25, 36), 64, (2, 4)),  # d16 head count at C=1024
])
def test_chunked_kernel_matches_single_buffer(h, lens, lcur, layer_depth):
    """``flash_decode_paired_chunks`` over stacked (depth, B, l_i, C) chunks
    selected at a scalar-prefetched layer index == the single-buffer kernel
    on the concatenation. Decoy rows at other layers ensure the index map
    actually picks row ``layer`` (a wrong row would read decoy values)."""
    from var_tpu.ops.pallas.flash_attention import flash_decode_paired_chunks

    layer, depth = layer_depth
    c = 64 * h
    b = 2
    lk = sum(lens) + lcur
    r = jax.random.split(jax.random.PRNGKey(h * 100 + lk), 3)
    q = jax.random.normal(r[0], (b, lcur, c), F32)
    k_full = jax.random.normal(r[1], (b, lk, c), F32)
    v_full = jax.random.normal(r[2], (b, lk, c), F32)
    want = flash_decode_paired(q, k_full, v_full, h, scale=0.21)
    ks, vs, off = [], [], 0
    for i, ln in enumerate(lens):
        rr = jax.random.split(jax.random.PRNGKey(1000 + i), 2)
        kc = jax.random.normal(rr[0], (depth, b, ln, c), F32)
        vc = jax.random.normal(rr[1], (depth, b, ln, c), F32)
        ks.append(kc.at[layer].set(k_full[:, off:off + ln]))
        vs.append(vc.at[layer].set(v_full[:, off:off + ln]))
        off += ln
    ks.append(k_full[:, off:])  # live (B, lcur, C) chunk
    vs.append(v_full[:, off:])
    # traced layer index = what the depth-scan passes in production
    got = jax.jit(lambda i: flash_decode_paired_chunks(q, ks, vs, i, h, 0.21))(
        jnp.int32(layer))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_chunked_switchover_fires_at_512px_stage_lengths():
    """At the 512px preset (pn 1..32, L=2240, reference arg_util.py:244-249)
    with d16 geometry (C=1024, head_dim 64), the chunked cache must stay
    chunked through stage 8 (Lk 1216 <= the paired kernel's VMEM envelope,
    6e6/(4*1024) = 1464 keys) and leave for the concat representation
    exactly when stage 9's Lk = 2240 crosses it — the mid-pyramid
    switchover the long presets rely on (models/var.py maybe_concat_chunks)."""
    pns = (1, 2, 3, 4, 6, 9, 13, 18, 24, 32)
    cfg = VARConfig(num_classes=1000, depth=16, embed_dim=1024, num_heads=16,
                    patch_nums=pns, vocab_size=4096, z_channels=32)
    caches = ("chunks", (), ())
    switched_at = None
    for si, pn in enumerate(pns):
        seg = pn * pn
        out = var_mod.maybe_concat_chunks(caches, seg, cfg, "pallas")
        if not isinstance(out[0], str):
            switched_at = si
            break
        # simulate the depth-scan's per-stage chunk append (shapes only:
        # the budget check reads k.shape[-2], never the values)
        chunk = jnp.zeros((1, 1, seg, 4))
        caches = ("chunks", out[1] + (chunk,), out[2] + (chunk,))
    assert switched_at == 9, f"switchover fired at stage {switched_at}, want 9"
    # the materialized concat cache holds exactly the 1216 previous keys
    assert out[0].shape[2] == 1216
    # at 256px (L=680) the whole pyramid stays inside the envelope
    cfg256 = VARConfig(num_classes=1000, depth=16, embed_dim=1024,
                       num_heads=16, vocab_size=4096, z_channels=32)
    caches = ("chunks", (jnp.zeros((1, 1, 424, 4)),), (jnp.zeros((1, 1, 424, 4)),))
    assert isinstance(
        var_mod.maybe_concat_chunks(caches, 256, cfg256, "pallas")[0], str)


def test_chunked_switchover_fires_at_1024px_stage_lengths():
    """The 1024px preset (pn 1..64, L=9451, reference arg_util.py:244-249)
    at d16 geometry: chunked through stage 9 (Lk 1026 <= 1464-key envelope),
    concat from stage 10 (Lk 1755) — the 4096-token tail stage then runs the
    XLA path on the materialized cache."""
    pns = (1, 2, 3, 4, 5, 7, 9, 12, 16, 21, 27, 36, 48, 64)
    cfg = VARConfig(num_classes=1000, depth=16, embed_dim=1024, num_heads=16,
                    patch_nums=pns, vocab_size=4096, z_channels=32)
    caches = ("chunks", (), ())
    switched_at = None
    for si, pn in enumerate(pns):
        seg = pn * pn
        out = var_mod.maybe_concat_chunks(caches, seg, cfg, "pallas")
        if not isinstance(out[0], str):
            switched_at = si
            break
        chunk = jnp.zeros((1, 1, seg, 4))
        caches = ("chunks", out[1] + (chunk,), out[2] + (chunk,))
    assert switched_at == 10, f"switchover fired at stage {switched_at}, want 10"
    assert out[0].shape[2] == 1026  # materialized keys = stages 0-9
    # under TP (model=2) the per-device lane width halves -> the envelope
    # doubles to 2928 keys and the switchover moves one stage later
    from var_tpu.parallel import mesh as pm

    mesh = pm.make_mesh(model_parallel=2)
    caches = ("chunks", (), ())
    switched_at = None
    for si, pn in enumerate(pns):
        seg = pn * pn
        out = var_mod.maybe_concat_chunks(caches, seg, cfg, "pallas",
                                          mesh=mesh, batch=8)
        if not isinstance(out[0], str):
            switched_at = si
            break
        chunk = jnp.zeros((1, 1, seg, 4))
        caches = ("chunks", out[1] + (chunk,), out[2] + (chunk,))
    assert switched_at == 11, f"TP switchover fired at stage {switched_at}, want 11"


def test_decode_with_midpyramid_switchover_matches_concat(monkeypatch):
    """End-to-end greedy decode where the chunked->concat switchover fires
    MID-pyramid (budget shrunk so stage 4's Lk crosses the envelope): tokens
    and image must equal the pure concat/XLA decode — the seam the 512px
    preset hits for real (VERDICT r3 #6)."""
    from var_tpu.engine.sampler import decode_cfg
    from var_tpu.models import vae as vae_mod

    var_cfg = _stage_cfg(h=2)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=PNS)
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    label = jnp.array([1, 3])
    kw = dict(cfg_scale=1.5, top_k=1, top_p=0.0, dtype=F32)
    want = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                      jax.random.PRNGKey(5), label, attn_impl="xla",
                      cache_impl="concat", **kw)
    # envelope = 30 keys: stages 0-3 (Lk ends 1, 5, 14, 30) stay chunked on
    # the paired kernel; stage 4 (Lk 55) materializes the concat cache
    monkeypatch.setattr(var_mod, "PAIRED_VMEM_BUDGET", 30 * 4 * var_cfg.embed_dim)
    got = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                     jax.random.PRNGKey(5), label, attn_impl="pallas",
                     cache_impl="chunked", **kw)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(want.image),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_decode_cache_chunked_matches_concat(attn_impl):
    """Chunked per-stage caches are a pure storage change: same rng + real
    top-k/top-p sampling -> identical tokens/images vs grow-by-concat.
    ``pallas`` runs the scalar-prefetch kernel (interpret mode) through the
    stacked-block scan — the exact production path; ``xla`` covers the
    chunked fallback seam (tiny stages + out-of-envelope)."""
    from var_tpu.engine.sampler import decode_cfg
    from var_tpu.models import vae as vae_mod

    var_cfg = _stage_cfg(h=2)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=PNS)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(
        var_mod.init_var_params(k2, var_cfg))
    label = jnp.array([2, 5])
    kw = dict(cfg_scale=1.5, top_k=8, top_p=0.9, dtype=F32, attn_impl=attn_impl)
    res_c = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(3), label, cache_impl="concat", **kw)
    res_k = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(3), label, cache_impl="chunked", **kw)
    np.testing.assert_array_equal(np.asarray(res_k.tokens), np.asarray(res_c.tokens))
    np.testing.assert_allclose(np.asarray(res_k.image), np.asarray(res_c.image),
                               rtol=1e-5, atol=1e-5)


def test_decode_chunked_envelope_switchover(monkeypatch):
    """When the cache outgrows the paired kernel's VMEM envelope mid-decode
    (the 512px presets' long tail stages), the sampler converts the chunked
    cache to the concat form ONCE — never the per-layer chunk re-join the
    XLA fallback would do inside the depth scan. Shrinking the budget forces
    the switchover mid-pyramid; tokens/images must still match concat."""
    from var_tpu.engine.sampler import decode_cfg
    from var_tpu.models import vae as vae_mod

    var_cfg = _stage_cfg(h=2)
    # envelope = budget / (4C) = 30 tokens: switchover entering stage 4
    monkeypatch.setattr(var_mod, "PAIRED_VMEM_BUDGET", 30 * 4 * var_cfg.embed_dim)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=PNS)
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    label = jnp.array([0, 3])
    kw = dict(cfg_scale=1.5, top_k=8, top_p=0.9, dtype=F32, attn_impl="pallas")
    res_c = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(5), label, cache_impl="concat", **kw)
    res_k = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(5), label, cache_impl="chunked", **kw)
    np.testing.assert_array_equal(np.asarray(res_k.tokens), np.asarray(res_c.tokens))
    np.testing.assert_allclose(np.asarray(res_k.image), np.asarray(res_c.image),
                               rtol=1e-5, atol=1e-5)


def test_decode_cache_prealloc_matches_concat():
    """Preallocated in-place KV caches (``var.init_prealloc_caches``) are a
    pure storage change: with the same rng, real top-k/top-p sampling must
    produce identical tokens and images to the grow-by-concat caches — the
    attention at every stage sees the same (B, Lk, C) values either way."""
    from var_tpu.engine.sampler import decode_cfg
    from var_tpu.models import vae as vae_mod

    var_cfg = _stage_cfg(h=2)
    vae_cfg = VAEConfig(vocab_size=32, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=PNS)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.init_var_params(k2, var_cfg)
    label = jnp.array([2, 5])
    kw = dict(cfg_scale=1.5, top_k=8, top_p=0.9, dtype=F32, attn_impl="xla")
    res_c = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(3), label, cache_impl="concat", **kw)
    res_p = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                       jax.random.PRNGKey(3), label, cache_impl="prealloc", **kw)
    np.testing.assert_array_equal(np.asarray(res_p.tokens), np.asarray(res_c.tokens))
    np.testing.assert_allclose(np.asarray(res_p.image), np.asarray(res_c.image),
                               rtol=1e-5, atol=1e-5)


def test_chunked_kernel_fused_qkv_and_inkernel_l2():
    """The chunked kernel reading q from a fused (B, L, 3C) buffer with the
    per-head L2 norm + learned scales applied IN-KERNEL == slicing and
    normalizing q externally then calling the single-buffer kernel."""
    from var_tpu.ops.pallas.flash_attention import flash_decode_paired_chunks

    h, depth, layer = 4, 3, 1
    c = 64 * h
    b, lcur = 2, 16
    lens = (9, 16)
    lk = sum(lens) + lcur
    r = jax.random.split(jax.random.PRNGKey(21), 4)
    qkv = jax.random.normal(r[0], (b, lcur, 3 * c), F32)
    k_full = jax.random.normal(r[1], (b, lk, c), F32)
    v_full = jax.random.normal(r[2], (b, lk, c), F32)
    sm = jnp.exp(jax.random.normal(r[3], (h,), F32) * 0.3)

    # external reference: slice q, per-head L2 norm * sm, dense attention
    q = qkv[..., :c].reshape(b, lcur, h, 64)
    qn = q / jnp.sqrt(jnp.sum(jnp.square(q), -1, keepdims=True) + 1e-24)
    qn = (qn * sm[None, None, :, None]).reshape(b, lcur, c)
    want = flash_decode_paired(qn, k_full, v_full, h, scale=1.0)

    ks, vs, off = [], [], 0
    for i, ln in enumerate(lens):
        rr = jax.random.split(jax.random.PRNGKey(100 + i), 2)
        kc = jax.random.normal(rr[0], (depth, b, ln, c), F32)
        vc = jax.random.normal(rr[1], (depth, b, ln, c), F32)
        ks.append(kc.at[layer].set(k_full[:, off:off + ln]))
        vs.append(vc.at[layer].set(v_full[:, off:off + ln]))
        off += ln
    ks.append(k_full[:, off:])
    vs.append(v_full[:, off:])
    got = flash_decode_paired_chunks(qkv, ks, vs, layer, h, scale=1.0,
                                     q_l2_scale_mul=sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
