"""Scale-by-scale CFG decoding (inference engine).

Reproduces ``VAR.autoregressive_infer_cfg`` (reference ``models/var.py:126-190``)
and ``VAR.inpainting`` (``var.py:236-364``) as single jittable programs:

* batch is doubled (cond | uncond) for classifier-free guidance; the guidance
  weight ramps with scale: t = cfg * si/(S-1), logits = (1+t)*cond - t*uncond
  (``var.py:172-173``).
* per scale: transformer step over the current token map with KV caching ->
  logits -> top-k/top-p sample -> codebook embed -> quantizer residual update
  -> next scale's input map (``quant.py:187-196``).

TPU-first: the 10-stage loop is unrolled inside ONE jit so the entire decode
(including the VQVAE decoder) is a single XLA program — no host round-trips
between scales, static shapes per stage. RNG is an explicit key.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.models import quantizer as q
from var_tpu.models import vae as vae_mod
from var_tpu.models import var as var_mod
from var_tpu.ops.sampling import gumbel_softmax, sample_with_top_k_top_p

F32 = jnp.float32


class DecodeResult(NamedTuple):
    image: jax.Array  # (B, H, W, 3) in [0, 1]
    tokens: jax.Array  # (B, L) int32 sampled (pre-mask for inpainting) ids
    f_hat: jax.Array  # (B, h, w, Cvae) final accumulated latent


def _cfg_logits(logits: jax.Array, b: int, t) -> jax.Array:
    return (1.0 + t) * logits[:b] - t * logits[b:]


def decode_cfg(
    var_params: dict,
    vae_params: dict,
    var_cfg: VARConfig,
    vae_cfg: VAEConfig,
    rng: jax.Array,
    label_b: jax.Array,
    cfg_scale: float = 1.5,
    top_k: int = 0,
    top_p: float = 0.0,
    more_smooth: bool = False,
    dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    gt_tokens: Optional[jax.Array] = None,
    keep_mask: Optional[jax.Array] = None,
) -> DecodeResult:
    """Class-conditional CFG decode; with ``gt_tokens``+``keep_mask`` it is
    token-mask inpainting (kept positions take ground-truth ids and steer all
    later scales through the shared f_hat, ``var.py:312-328``).

    ``label_b``: (B,) int32 class labels. ``keep_mask``: (B, L) bool, True =
    keep ground truth. Returns images in [0, 1].
    """
    b = label_b.shape[0]
    pns = var_cfg.patch_nums
    sn = len(pns)
    qp = vae_params["quantize"]

    labels2 = jnp.concatenate([label_b, jnp.full_like(label_b, var_cfg.num_classes)])
    cond_bd = jnp.take(var_params["class_emb"], labels2, axis=0)  # (2B, C)
    ctx = var_mod.cond_context(var_params, var_cfg, cond_bd)
    lvl_pos = var_mod.lvl_pos_embed(var_params, var_cfg)  # (1, L, C)

    sos = cond_bd[:, None, :] + var_params["pos_start"]
    ntm = sos + lvl_pos[:, : var_cfg.first_l]  # (2B, first_l, C)

    f_hat = jnp.zeros((b, pns[-1], pns[-1], vae_cfg.z_channels), F32)
    caches = None
    cur = 0
    token_segs = []
    for si, pn in enumerate(pns):
        ratio = si / var_cfg.num_stages_minus_1
        seg = pn * pn
        x, caches = var_mod.transformer_stage(
            var_params, var_cfg, ntm, ctx, caches, dtype=dtype, attn_impl=attn_impl
        )
        logits = var_mod.get_logits(var_params, var_cfg, x, cond_bd)  # (2B, seg, V)
        lg = _cfg_logits(logits, b, cfg_scale * ratio)
        rng, r_samp, r_gum = jax.random.split(rng, 3)
        idx = sample_with_top_k_top_p(r_samp, lg, top_k=top_k, top_p=top_p)
        if gt_tokens is not None:
            keep = keep_mask[:, cur : cur + seg]
            idx = jnp.where(keep, gt_tokens[:, cur : cur + seg], idx)
        token_segs.append(idx)
        if more_smooth:  # gumbel-softmax codebook mixing (var.py:178-180)
            gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
            soft = gumbel_softmax(r_gum, lg * (1.0 + ratio), tau=gum_t)
            h = soft @ qp["embedding"].astype(F32)
        else:
            h = q.embed(qp, idx)
        h = h.reshape(b, pn, pn, vae_cfg.z_channels)
        f_hat, nxt = q.get_next_autoregressive_input(qp, vae_cfg, si, f_hat, h, pns)
        cur += seg
        if si != sn - 1:
            nseg = pns[si + 1] ** 2
            ntm = var_mod._linear(var_params["word_embed"], nxt.reshape(b, nseg, -1).astype(F32))
            ntm = ntm + lvl_pos[:, cur : cur + nseg]
            ntm = jnp.tile(ntm, (2, 1, 1))  # CFG batch doubling (var.py:187)

    img = vae_mod.fhat_to_img(vae_params, vae_cfg, f_hat) * 0.5 + 0.5
    return DecodeResult(img, jnp.concatenate(token_segs, axis=1), f_hat)


def make_sampler(
    var_cfg: VARConfig,
    vae_cfg: VAEConfig,
    cfg_scale: float = 1.5,
    top_k: int = 0,
    top_p: float = 0.0,
    more_smooth: bool = False,
    dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    inpainting: bool = False,
):
    """jit-compiled sampler: (var_params, vae_params, rng, label_b[, gt, mask])
    -> DecodeResult. Sampling hyper-parameters are compile-time constants
    (they select the compiled graph, like reference CLI flags)."""
    fn = partial(
        decode_cfg,
        cfg_scale=cfg_scale,
        top_k=top_k,
        top_p=top_p,
        more_smooth=more_smooth,
        dtype=dtype,
        attn_impl=attn_impl,
    )

    if inpainting:
        return jax.jit(
            lambda var_params, vae_params, rng, label_b, gt, mask: fn(
                var_params, vae_params, var_cfg, vae_cfg, rng, label_b,
                gt_tokens=gt, keep_mask=mask,
            )
        )
    return jax.jit(
        lambda var_params, vae_params, rng, label_b: fn(
            var_params, vae_params, var_cfg, vae_cfg, rng, label_b
        )
    )
