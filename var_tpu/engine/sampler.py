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
from typing import NamedTuple, Optional, Tuple

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
    tokens: jax.Array  # (B, L) int32 FINAL ids (inpainting: kept positions already hold gt)
    f_hat: jax.Array  # (B, h, w, Cvae) final accumulated latent


def decode_tokens_cfg(
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
    attn_impl: str = "auto",
    gt_tokens: Optional[jax.Array] = None,
    keep_mask: Optional[jax.Array] = None,
    edit_mask: Optional[jax.Array] = None,
    kv_window: Optional[int] = None,
    cache_impl: str = "chunked",
    approx_topk: bool = False,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """Transformer half of :func:`decode_cfg` -> (tokens (B, L), f_hat),
    for callers that want the token decode and the VQVAE render as separate
    programs (e.g. classifier scoring that never renders). The shipped
    sampler keeps both in ONE jit — a split pair costs ~80 ms/batch of
    dispatch. Argument semantics are documented on :func:`decode_cfg`."""
    b = label_b.shape[0]
    pns = var_cfg.patch_nums
    sn = len(pns)
    qp = vae_params["quantize"]

    labels2 = jnp.concatenate([label_b, jnp.full_like(label_b, var_cfg.num_classes)])
    cond_bd = jnp.take(var_params["class_emb"], labels2, axis=0)  # (2B, C)
    ctx = var_mod.cond_context(var_params, var_cfg, cond_bd, decode=True)
    lvl_pos = var_mod.lvl_pos_embed(var_params, var_cfg)  # (1, L, C)

    sos = cond_bd[:, None, :] + var_params["pos_start"]
    ntm = sos + lvl_pos[:, : var_cfg.first_l]  # (2B, first_l, C)

    f_hat = jnp.zeros((b, pns[-1], pns[-1], vae_cfg.z_channels), F32)
    caches = None  # full (never-pruned) cache (kv_window bookkeeping only)
    # KV cache representation (d16 img/s/chip, one v5e): "chunked" (default)
    # keeps each stage's K/V as the (depth, 2B, l_i, C) stacks the depth-
    # scan produced and the paired kernel reads them in place — no concat
    # copies (~110 ms/batch at bs128) and no prealloc full-length carries.
    # It dominates both alternatives at every batch (bs64: 109.3 vs concat
    # 90.9 / prealloc 94.9; bs80: 110.1; bs128: 119.8 = the headline).
    # "concat" remains for kv_window pruning; "prealloc" (in-place
    # dynamic_update_slice buffers) remains as the serving-style layout.
    attend = None
    # kv_window pruning is scale-granular, so on the chunked layout it is a
    # compile-time tuple slice — the window keeps the chunked cache (and its
    # throughput) whenever the paired kernel can serve every pruned stage;
    # the decision is made once up front (window_chunks_viable) because the
    # windowed path never keeps the full history a mid-decode representation
    # switch would need
    windowed_chunks = (kv_window is not None and cache_impl == "chunked"
                       and var_mod.window_chunks_viable(
                           var_cfg, kv_window, attn_impl, mesh=mesh, batch=2 * b))
    if kv_window is None and cache_impl == "prealloc":
        attend = var_mod.init_prealloc_caches(var_cfg, 2 * b, dtype=dtype)
    elif (kv_window is None and cache_impl == "chunked") or windowed_chunks:
        # per-stage (depth, 2B, l_i, C) chunks exactly as the depth-scan
        # stacked them; the paired kernel reads them in place (scalar-
        # prefetched layer index), so the grow-by-concat cache copies and
        # the prealloc full-length carries both disappear
        attend = ("chunks", (), ())
    cur = 0
    token_segs = []
    first_l = var_cfg.first_l
    for si, pn in enumerate(pns):
        ratio = si / var_cfg.num_stages_minus_1
        seg = pn * pn
        if (attend is not None and isinstance(attend[0], str)
                and not windowed_chunks):
            attend = var_mod.maybe_concat_chunks(attend, ntm.shape[1],
                                                 var_cfg, attn_impl,
                                                 mesh=mesh, batch=2 * b)
        x, grown = var_mod.transformer_stage(
            var_params, var_cfg, ntm, ctx, attend, dtype=dtype,
            attn_impl=attn_impl, mesh=mesh
        )
        ntm_len = ntm.shape[1]
        if kv_window is None:
            caches = attend = grown
        elif windowed_chunks:
            # chunk 0 is exactly the first_l prefix the reference window
            # always keeps (var.py:510-517); beyond it keep the kv_window-1
            # most recent stage chunks + the stage just appended
            _, ks, vs = grown
            if len(ks) > kv_window:
                ks, vs = (ks[0],) + ks[2:], (vs[0],) + vs[2:]
            attend = ("chunks", ks, vs)
        else:
            knew = grown[0][:, :, -ntm_len:]
            vnew = grown[1][:, :, -ntm_len:]
            if caches is None:
                caches = (knew, vnew)
            else:
                caches = (jnp.concatenate([caches[0], knew], axis=2),
                          jnp.concatenate([caches[1], vnew], axis=2))
            nxt_si = si + 1
            if nxt_si - kv_window <= 0:
                attend = caches
            else:
                keep_from = var_cfg.begin_ends[nxt_si - kv_window][1]
                attend = tuple(
                    jnp.concatenate([c[:, :, :first_l], c[:, :, keep_from:]], axis=2)
                    for c in caches)
        # CFG-mixed logits with the head matmul on B rows (get_logits_cfg)
        lg = var_mod.get_logits_cfg(var_params, var_cfg, x, cond_bd, cfg_scale * ratio)
        rng, r_samp, r_gum = jax.random.split(rng, 3)
        idx = sample_with_top_k_top_p(r_samp, lg, top_k=top_k, top_p=top_p, approx=approx_topk)
        if gt_tokens is not None and keep_mask is not None:
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
        if edit_mask is not None and gt_tokens is not None:
            from var_tpu.ops.resize import resize_bilinear

            gt_h = q.embed(qp, gt_tokens[:, cur : cur + seg]).reshape(
                b, pn, pn, vae_cfg.z_channels
            )
            if seg <= 3:  # tiny scales: keep ground truth entirely
                force = jnp.ones((1, pn, pn, 1), F32)
            else:
                m = resize_bilinear(edit_mask[None, :, :, None], (pn, pn))
                force = (m > 0.5).astype(F32)
            h = gt_h * force + h * (1.0 - force)
        f_hat, nxt = q.get_next_autoregressive_input(qp, vae_cfg, si, f_hat, h, pns)
        cur += seg
        if si != sn - 1:
            nseg = pns[si + 1] ** 2
            ntm = var_mod._linear(var_params["word_embed"], nxt.reshape(b, nseg, -1).astype(F32))
            ntm = ntm + lvl_pos[:, cur : cur + nseg]
            ntm = jnp.tile(ntm, (2, 1, 1))  # CFG batch doubling (var.py:187)

    return jnp.concatenate(token_segs, axis=1), f_hat


def render_fhat(vae_params: dict, vae_cfg: VAEConfig, f_hat: jax.Array,
                dtype=jnp.bfloat16) -> jax.Array:
    """VQVAE render half: f_hat -> images in [0, 1]. Decoder runs at compute
    dtype (reference decodes under fp16 autocast, ``demo_sample.py:66``)."""
    img = vae_mod.fhat_to_img(vae_params, vae_cfg, f_hat.astype(dtype)).astype(F32)
    return img * 0.5 + 0.5


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
    attn_impl: str = "auto",
    gt_tokens: Optional[jax.Array] = None,
    keep_mask: Optional[jax.Array] = None,
    edit_mask: Optional[jax.Array] = None,
    kv_window: Optional[int] = None,
    cache_impl: str = "chunked",
    approx_topk: bool = False,
    mesh=None,
) -> DecodeResult:
    """Class-conditional CFG decode; with ``gt_tokens``+``keep_mask`` it is
    token-mask inpainting (kept positions take ground-truth ids and steer all
    later scales through the shared f_hat, ``var.py:312-328``); with
    ``gt_tokens``+``edit_mask`` it is the notebook's embedding-space box
    editing (``demo_zero_shot_edit.ipynb`` cell 2): per scale the spatial
    (ph, pw) mask is bilinearly downsampled, thresholded at 0.5, and blends
    ground-truth vs generated codebook embeddings; scales with <= 3 tokens
    are forced all-ground-truth (``replace_embedding``).

    ``label_b``: (B,) int32 class labels. ``keep_mask``: (B, L) bool, True =
    keep ground truth. ``edit_mask``: (ph, pw) float, 1 = keep ground truth.

    ``kv_window`` (opt-in, default off = exact reference semantics): at each
    stage attend only to the KV of the first scale plus the last
    ``kv_window`` scales — scale-windowed KV pruning in the spirit of the
    scale-aware KV-compression literature for VAR; trades a small output
    deviation for less attention work and cache memory at long presets.
    Returns images in [0, 1].
    """
    tokens, f_hat = decode_tokens_cfg(
        var_params, vae_params, var_cfg, vae_cfg, rng, label_b,
        cfg_scale=cfg_scale, top_k=top_k, top_p=top_p, more_smooth=more_smooth,
        dtype=dtype, attn_impl=attn_impl, gt_tokens=gt_tokens,
        keep_mask=keep_mask, edit_mask=edit_mask, kv_window=kv_window,
        cache_impl=cache_impl, approx_topk=approx_topk, mesh=mesh,
    )
    img = render_fhat(vae_params, vae_cfg, f_hat, dtype=dtype)
    return DecodeResult(img, tokens, f_hat)


def make_sampler(
    var_cfg: VARConfig,
    vae_cfg: VAEConfig,
    cfg_scale: float = 1.5,
    top_k: int = 0,
    top_p: float = 0.0,
    more_smooth: bool = False,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    inpainting: bool = False,
    kv_window: Optional[int] = None,
    cache_impl: str = "chunked",
    approx_topk: bool = False,
    mesh=None,
):
    """Compiled sampler: (var_params, vae_params, rng, label_b[, gt, mask])
    -> DecodeResult. Sampling hyper-parameters are compile-time constants
    (they select the compiled graph, like reference CLI flags).

    One XLA program: a split token-decode | render pair was tried for HBM
    headroom but costs ~80 ms/batch through the remote-dispatch path (73.1
    vs 80.3 img/s at bs64), and with the pallas decode attention the cache
    layouts no longer blow the single-program heap.
    :func:`decode_tokens_cfg` / :func:`render_fhat` remain available for
    callers that want the halves separately."""
    fn = partial(
        decode_cfg,
        cfg_scale=cfg_scale,
        top_k=top_k,
        top_p=top_p,
        more_smooth=more_smooth,
        dtype=dtype,
        attn_impl=attn_impl,
        kv_window=kv_window,
        cache_impl=cache_impl,
        approx_topk=approx_topk,
        mesh=mesh,
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


def make_scan_sampler(
    var_cfg: VARConfig,
    vae_cfg: VAEConfig,
    rounds: int,
    **sampler_kw,
):
    """Dispatch-batched sampler: ONE jitted program lax.scans ``rounds``
    independent decodes and returns stacked results.

    (var_params, vae_params, rng, labels (rounds, B)) ->
    DecodeResult with leading (rounds, B, ...) axes.

    Each round is bit-identical to ``make_sampler`` called with
    ``fold_in(rng, round)`` — this is purely a dispatch/cost change: host
    overhead (args/results round-trip, executable launch) is paid once per
    ``rounds`` batches. That overhead is what caps big-model wall throughput
    through a remote-dispatch path (measured d36@512: ~4.6 s/dispatch on a
    1.08 s/batch program — 0.7 img/s wall vs 3.7 on the device timeline), and
    it is dead time for bulk generation (the FID protocol's 50k images,
    reference README.md:151-157). Compile cost is one scan body — the same
    10-stage graph as the plain sampler."""
    assert rounds >= 1
    fn = partial(decode_cfg, **sampler_kw)

    def run(var_params, vae_params, rng, labels_rb):
        def body(_, xs):
            r, label_b = xs
            res = fn(var_params, vae_params, var_cfg, vae_cfg, r, label_b)
            return 0, res

        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(rounds))
        _, res = jax.lax.scan(body, 0, (keys, labels_rb))
        return res

    return jax.jit(run)


# ---------------------------------------------------------------------------
# neighbor-constrained "smooth sampling" (reference var.py:366-575)


class SmoothResult(NamedTuple):
    image: jax.Array  # (B, H, W, 3) in [0, 1]
    tokens: jax.Array  # (B, L) selected token ids
    log_likelihood: jax.Array  # scalar: sum of selected model log-probs
    distance_log_likelihood: jax.Array  # scalar: sum of distance log-probs


def codebook_neighbor_tables(embedding: jax.Array, n: int):
    """(dists (V, V) L2, top-n neighbor ids (V, n), their dists (V, n)).

    Precomputed once per codebook (reference recomputes per call,
    var.py:459-462 — hoisting it out is free accuracy-neutral speedup)."""
    emb = embedding.astype(F32)
    sq = jnp.sum(emb * emb, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (emb @ emb.T)
    dists = jnp.sqrt(jnp.maximum(d2, 0.0))
    neg_top, idx_top = jax.lax.top_k(-dists, n)  # ascending distance
    return dists, idx_top, -neg_top


def smooth_sampling(
    var_params: dict,
    vae_params: dict,
    var_cfg: VARConfig,
    vae_cfg: VAEConfig,
    gt_tokens: jax.Array,
    n: int,
    label_b: jax.Array,
    cfg_scale: float = 1.5,
    neighbor_threshold: Optional[float] = None,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    mesh=None,
) -> SmoothResult:
    """Regenerate an image constrained to codebook-space neighbors of the
    ground-truth tokens (reference ``VAR.smooth_sampling``).

    Candidate-count mode (``neighbor_threshold is None``): at scale ratio r
    the candidate set is the 1 + int((n-1)*r) nearest neighbors of each GT
    token; pick the candidate with max model log-prob (var.py:498-502).
    Threshold mode: candidates within d_min + (thr - d_min)*r; all-masked
    positions fall back to the nearest neighbor (var.py:504-527).
    """
    b = gt_tokens.shape[0]
    pns = var_cfg.patch_nums
    sn = len(pns)
    qp = vae_params["quantize"]
    dists, top_n, top_n_dists = codebook_neighbor_tables(qp["embedding"], n)

    labels2 = jnp.concatenate([label_b, jnp.full_like(label_b, var_cfg.num_classes)])
    cond_bd = jnp.take(var_params["class_emb"], labels2, axis=0)
    ctx = var_mod.cond_context(var_params, var_cfg, cond_bd, decode=True)
    lvl_pos = var_mod.lvl_pos_embed(var_params, var_cfg)
    ntm = cond_bd[:, None, :] + var_params["pos_start"] + lvl_pos[:, : var_cfg.first_l]

    f_hat = jnp.zeros((b, pns[-1], pns[-1], vae_cfg.z_channels), F32)
    caches = ("chunks", (), ())  # copy-free per-stage KV (see decode_tokens_cfg)
    cur = 0
    sum_ll = jnp.float32(0.0)
    sum_dll = jnp.float32(0.0)
    token_segs = []
    for si, pn in enumerate(pns):
        ratio = si / var_cfg.num_stages_minus_1
        seg = pn * pn
        if isinstance(caches[0], str):
            caches = var_mod.maybe_concat_chunks(caches, ntm.shape[1],
                                                 var_cfg, attn_impl,
                                                 mesh=mesh, batch=2 * b)
        x, caches = var_mod.transformer_stage(
            var_params, var_cfg, ntm, ctx, caches, dtype=dtype,
            attn_impl=attn_impl, mesh=mesh
        )
        lg = var_mod.get_logits_cfg(var_params, var_cfg, x, cond_bd, cfg_scale * ratio)
        log_probs = jax.nn.log_softmax(lg, axis=-1)  # (B, seg, V)

        gt_seg = gt_tokens[:, cur : cur + seg]  # (B, seg)
        cand = jnp.take(top_n, gt_seg, axis=0)  # (B, seg, n)
        cand_dists = jnp.take(top_n_dists, gt_seg, axis=0)  # (B, seg, n)
        dist_logp = jax.nn.log_softmax(-cand_dists, axis=-1)
        cand_logp = jnp.take_along_axis(log_probs, cand, axis=-1)  # (B, seg, n)

        if neighbor_threshold is None:
            count = 1 + int((n - 1) * ratio)
            masked_logp = jnp.where(
                jnp.arange(n) < count, cand_logp, -jnp.inf
            )
        else:
            d_min = cand_dists[:, :, :1]
            eff = d_min + (neighbor_threshold - d_min) * ratio
            masked_logp = jnp.where(cand_dists <= eff, cand_logp, -jnp.inf)
        max_idx = jnp.argmax(masked_logp, axis=-1)  # (B, seg)
        max_val = jnp.take_along_axis(masked_logp, max_idx[..., None], -1)[..., 0]
        # fallback to nearest neighbor when all candidates masked (var.py:521-527)
        all_masked = ~jnp.isfinite(max_val)
        max_idx = jnp.where(all_masked, 0, max_idx)
        max_val = jnp.where(all_masked, cand_logp[..., 0], max_val)

        tokens = jnp.take_along_axis(cand, max_idx[..., None], -1)[..., 0]
        token_segs.append(tokens)
        sum_ll = sum_ll + max_val.sum()
        sum_dll = sum_dll + jnp.take_along_axis(dist_logp, max_idx[..., None], -1)[..., 0].sum()

        h = q.embed(qp, tokens).reshape(b, pn, pn, vae_cfg.z_channels)
        f_hat, nxt = q.get_next_autoregressive_input(qp, vae_cfg, si, f_hat, h, pns)
        cur += seg
        if si != sn - 1:
            nseg = pns[si + 1] ** 2
            ntm = var_mod._linear(var_params["word_embed"], nxt.reshape(b, nseg, -1).astype(F32))
            ntm = ntm + lvl_pos[:, cur : cur + nseg]
            ntm = jnp.tile(ntm, (2, 1, 1))

    img = vae_mod.fhat_to_img(vae_params, vae_cfg, f_hat) * 0.5 + 0.5
    return SmoothResult(img, jnp.concatenate(token_segs, axis=1), sum_ll, sum_dll)
