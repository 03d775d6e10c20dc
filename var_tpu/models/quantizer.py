"""Multi-scale residual vector quantizer — the core VAR algorithm.

Re-implements the behaviour of the reference ``VectorQuantizer2``
(``models/quant.py:15-243``) as pure functions over a parameter pytree:

* iterate scales small->large; per scale: area-downsample the residual,
  nearest-codebook lookup, bicubic-upsample the code embedding to the full
  grid, pass through a phi conv, accumulate into ``f_hat`` and subtract
  from the residual (``quant.py:147-164``).
* phi convs are partially shared across scales via the tick rule
  (``quant.py:223-226``).
* training forward adds the straight-through estimator, commitment loss
  (beta averaged over scales) and EMA codebook-usage stats
  (``quant.py:52-104``).

TPU-first notes: the scale loop is a static Python loop (10 iterations,
static shapes each) that XLA unrolls; the V=4096-way lookup is a single
fp32 dot-general per scale (MXU); resizes are weight-matrix matmuls
(see ``var_tpu.ops.resize``). Everything here runs in float32 — the
reference forces fp32 inside the quantizer (``quant.py:53-61``) and token
choices are discrete argmins that bf16 would perturb.

Arrays are NHWC: ``f`` is (B, H, W, Cvae).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.config import VAEConfig
from var_tpu.ops.resize import resize_area, resize_bicubic

HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# params


def init_quantizer_params(rng: jax.Array, cfg: VAEConfig) -> dict:
    """Codebook + phi convs. Phi starts as reference ``nn.Conv2d`` default
    (kaiming-uniform) — parity checkpoints overwrite these anyway."""
    k_emb, k_phi = jax.random.split(rng)
    n_phi = num_phi(cfg)
    c = cfg.z_channels
    fan_in = c * 9
    bound = float(1.0 / np.sqrt(fan_in))
    phis = []
    for i in range(n_phi):
        kk, kb, k_phi = jax.random.split(k_phi, 3)
        phis.append(
            {
                "kernel": jax.random.uniform(kk, (3, 3, c, c), jnp.float32, -bound, bound),
                "bias": jax.random.uniform(kb, (c,), jnp.float32, -bound, bound),
            }
        )
    emb = jax.random.uniform(
        k_emb, (cfg.vocab_size, c), jnp.float32, -1.0 / cfg.vocab_size, 1.0 / cfg.vocab_size
    )
    return {"embedding": emb, "phi": phis}


def eini(params: dict, rng: jax.Array, value: float, cfg: VAEConfig) -> dict:
    """Codebook re-init (reference ``quant.py:44-46``): value > 0 ->
    trunc-normal(std=value); value < 0 -> uniform(+-|value|/V); 0 -> no-op."""
    if value == 0:
        return params
    v, c = params["embedding"].shape
    if value > 0:
        emb = jax.random.truncated_normal(rng, -2.0 / value, 2.0 / value,
                                          (v, c), jnp.float32) * value
    else:
        emb = jax.random.uniform(rng, (v, c), jnp.float32,
                                 -abs(value) / v, abs(value) / v)
    out = dict(params)
    out["embedding"] = emb
    return out


def num_phi(cfg: VAEConfig) -> int:
    if cfg.share_quant_resi == 0:  # non-shared: one phi per scale
        return len(cfg.v_patch_nums)
    return max(cfg.share_quant_resi, 1)


def phi_index(cfg: VAEConfig, si: int, num_scales: Optional[int] = None) -> int:
    """Which phi conv scale ``si`` uses (reference tick rule, quant.py:223-226)."""
    sn = num_scales or len(cfg.v_patch_nums)
    k = num_phi(cfg)
    if k == 1:
        return 0
    half = 1.0 / 3.0 / k if k == 4 else 1.0 / 2.0 / k
    ticks = np.linspace(half, 1.0 - half, k)
    at = si / (sn - 1)
    return int(np.argmin(np.abs(ticks - at)))


def apply_phi(params: dict, cfg: VAEConfig, si: int, h: jax.Array, num_scales=None) -> jax.Array:
    """phi(h) = (1-r)*h + r*conv3x3(h)  (reference ``Phi.forward``, quant.py:205-206)."""
    r = abs(cfg.quant_resi)
    if r <= 1e-6:
        return h
    p = params["phi"][phi_index(cfg, si, num_scales)]
    conv = jax.lax.conv_general_dilated(
        h.astype(jnp.float32),
        p["kernel"].astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=HIGHEST,
    ) + p["bias"].astype(jnp.float32)
    return h * (1.0 - r) + conv * r


# ---------------------------------------------------------------------------
# codebook lookup


def nearest_code(params: dict, z_nc: jax.Array, using_znorm: bool) -> jax.Array:
    """Nearest codebook index for rows of ``z_nc`` (N, C) -> (N,) int32.

    L2 path matches ``quant.py:155-157``: d = |z|^2 + |e|^2 - 2 z e^T in fp32
    (single MXU dot-general); znorm path is cosine argmax (``quant.py:151-153``).
    """
    emb = params["embedding"].astype(jnp.float32)
    z = z_nc.astype(jnp.float32)
    if using_znorm:
        zn = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        en = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        return jnp.argmax(jnp.dot(zn, en.T, precision=HIGHEST), axis=1).astype(jnp.int32)
    d = (
        jnp.sum(z * z, axis=1, keepdims=True)
        + jnp.sum(emb * emb, axis=1)
        - 2.0 * jnp.dot(z, emb.T, precision=HIGHEST)
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def embed(params: dict, idx: jax.Array) -> jax.Array:
    """Codebook gather: (...,) int -> (..., Cvae)."""
    return jnp.take(params["embedding"], idx, axis=0)


# ---------------------------------------------------------------------------
# inference-side transforms


def f_to_idxBl(
    params: dict,
    cfg: VAEConfig,
    f_bhwc: jax.Array,
    v_patch_nums: Optional[Sequence[int]] = None,
    to_fhat: bool = False,
):
    """Encode a feature map into the token pyramid (``quant.py:135-166``).

    Returns (list per scale, final f_hat). List entries are (B, pn*pn) int32
    token ids, or (B, H, W, C) accumulated f_hat snapshots if ``to_fhat``.
    """
    pns = tuple(v_patch_nums or cfg.v_patch_nums)
    b, h, w, c = f_bhwc.shape
    assert pns[-1] == h == w, f"last patch_num {pns[-1]} != feature size {h}"
    f_rest = f_bhwc.astype(jnp.float32)
    f_hat = jnp.zeros_like(f_rest)
    out = []
    sn = len(pns)
    for si, pn in enumerate(pns):
        z = resize_area(f_rest, (pn, pn))
        idx = nearest_code(params, z.reshape(-1, c), cfg.using_znorm)
        h_bhwc = embed(params, idx).reshape(b, pn, pn, c)
        h_bhwc = resize_bicubic(h_bhwc, (h, w))
        h_bhwc = apply_phi(params, cfg, si, h_bhwc, sn)
        f_hat = f_hat + h_bhwc
        f_rest = f_rest - h_bhwc
        out.append(f_hat if to_fhat else idx.reshape(b, pn * pn))
    return out, f_hat


def idxBl_to_var_input(params: dict, cfg: VAEConfig, gt_idx_bl: List[jax.Array]) -> jax.Array:
    """Teacher-forcing input for VAR training (``quant.py:169-184``).

    Input at scale k+1 is the accumulated f_hat of scales <= k, area-resized
    to pn_{k+1}. Returns (B, L - first_l, Cvae) float32.
    """
    pns = cfg.v_patch_nums
    b = gt_idx_bl[0].shape[0]
    c = cfg.z_channels
    hw = pns[-1]
    sn = len(pns)
    f_hat = jnp.zeros((b, hw, hw, c), jnp.float32)
    segs = []
    for si in range(sn - 1):
        pn = pns[si]
        h = embed(params, gt_idx_bl[si]).reshape(b, pn, pn, c)
        h = resize_bicubic(h, (hw, hw))
        f_hat = f_hat + apply_phi(params, cfg, si, h, sn)
        nxt = pns[si + 1]
        segs.append(resize_area(f_hat, (nxt, nxt)).reshape(b, nxt * nxt, c))
    return jnp.concatenate(segs, axis=1)


def get_next_autoregressive_input(
    params: dict, cfg: VAEConfig, si: int, f_hat: jax.Array, h_bhwc: jax.Array,
    v_patch_nums: Optional[Sequence[int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One decode-loop step (``quant.py:187-196``).

    ``h_bhwc`` is the (B, pn, pn, C) embedding of this scale's sampled tokens.
    Returns (new f_hat, next scale's quantizer-space input).
    """
    pns = tuple(v_patch_nums or cfg.v_patch_nums)
    sn = len(pns)
    hw = pns[-1]
    if si != sn - 1:
        h = apply_phi(params, cfg, si, resize_bicubic(h_bhwc, (hw, hw)), sn)
        f_hat = f_hat + h
        nxt = pns[si + 1]
        return f_hat, resize_area(f_hat, (nxt, nxt))
    h = apply_phi(params, cfg, si, h_bhwc, sn)
    f_hat = f_hat + h
    return f_hat, f_hat


def embed_to_fhat(
    params: dict, cfg: VAEConfig, ms_h_bhwc: List[jax.Array], all_to_max_scale=True, last_one=False
):
    """Sum per-scale embeddings into f_hat(s) (``quant.py:107-133``)."""
    pns = cfg.v_patch_nums
    sn = len(pns)
    hw = pns[-1]
    b = ms_h_bhwc[0].shape[0]
    outs = []
    if all_to_max_scale:
        f_hat = jnp.zeros((b, hw, hw, cfg.z_channels), jnp.float32)
        for si, pn in enumerate(pns):
            h = ms_h_bhwc[si]
            if si < sn - 1:
                h = resize_bicubic(h, (hw, hw))
            f_hat = f_hat + apply_phi(params, cfg, si, h, sn)
            outs.append(f_hat)
    else:
        # experimental path: progressively grow f_hat (quant.py:123-131)
        f_hat = jnp.zeros((b, pns[0], pns[0], cfg.z_channels), jnp.float32)
        for si, pn in enumerate(pns):
            f_hat = resize_bicubic(f_hat, (pn, pn))
            f_hat = f_hat + apply_phi(params, cfg, si, ms_h_bhwc[si], sn)
            outs.append(f_hat)
    return outs[-1] if last_one else outs


# ---------------------------------------------------------------------------
# VAE-training forward (straight-through + commitment loss)


class QuantResult(NamedTuple):
    f_hat: jax.Array  # (B,H,W,C) with straight-through gradient to f
    vq_loss: jax.Array  # scalar
    hits: jax.Array  # (S, V) per-scale codebook hit counts this batch
    idx_bl: List[jax.Array]


def quantizer_forward(params: dict, cfg: VAEConfig, f_bhwc: jax.Array) -> QuantResult:
    """Training forward (``quant.py:52-104``): returns f_hat with the
    straight-through estimator ``sg(f_hat - f) + f`` and the commitment loss
    ``mean_si [ beta*mse(sg(f_hat), f) + mse(f_hat, sg(f)) ]``.

    EMA usage tracking is the caller's job (it owns mutable state and the
    cross-device psum; see ``var_tpu.engine.vae_trainer``) — this function
    returns raw per-scale hit counts instead.
    """
    f = f_bhwc.astype(jnp.float32)
    b, h, w, c = f.shape
    f_ng = jax.lax.stop_gradient(f)
    f_rest = f_ng
    f_hat = jnp.zeros_like(f_ng)
    pns = cfg.v_patch_nums
    sn = len(pns)
    vq_loss = 0.0
    hits = []
    idx_bl = []
    for si, pn in enumerate(pns):
        z = resize_area(f_rest, (pn, pn))
        idx = nearest_code(params, z.reshape(-1, c), cfg.using_znorm)
        idx_bl.append(idx.reshape(b, pn * pn))
        hits.append(jnp.bincount(idx, length=cfg.vocab_size).astype(jnp.float32))
        h_b = embed(params, idx).reshape(b, pn, pn, c)
        h_b = resize_bicubic(h_b, (h, w))
        h_b = apply_phi(params, cfg, si, h_b, sn)
        f_hat = f_hat + h_b
        f_rest = f_rest - jax.lax.stop_gradient(h_b)
        # beta * ||sg(f_hat) - f||^2 pulls the encoder toward the codes;
        # ||f_hat - sg(f)||^2 trains the codebook/phi (quant.py:95).
        vq_loss = vq_loss + cfg.beta * jnp.mean(
            (jax.lax.stop_gradient(f_hat) - f) ** 2
        ) + jnp.mean((f_hat - f_ng) ** 2)
    vq_loss = vq_loss / sn
    f_hat_ste = jax.lax.stop_gradient(f_hat) - f_ng + f  # quant.py:98
    return QuantResult(f_hat_ste, vq_loss, jnp.stack(hits), idx_bl)


def update_ema_hits(ema_sv: jax.Array, hits_sv: jax.Array, record_hit) -> jax.Array:
    """EMA codebook-usage update (``quant.py:88-93``); ``hits_sv`` must already
    be summed across data-parallel replicas. ``record_hit`` may be a python
    int or a traced int32 — ``engine/vae_trainer.py`` calls this inside its
    jitted step: step 0 replaces outright, then decay 0.9 until 100 recorded
    steps and 0.99 after."""
    decay = jnp.where(record_hit == 0, 0.0,
                      jnp.where(record_hit < 100, 0.9, 0.99))
    return ema_sv * decay + hits_sv * (1.0 - decay)


def vocab_usage(ema_sv: jax.Array, cfg: VAEConfig, world_size: int, tokens_per_img: int, batch: int):
    """Percent of codebook in live use per scale (``quant.py:100-102``)."""
    margin = world_size * (batch * tokens_per_img) / cfg.vocab_size * 0.08
    return jnp.mean((ema_sv >= margin).astype(jnp.float32), axis=1) * 100.0
