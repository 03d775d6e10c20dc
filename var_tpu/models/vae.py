"""VQGAN-style conv encoder/decoder + VQVAE wrapper, NHWC, functional.

Capabilities mirror the reference (``models/basic_vae.py``, ``models/vqvae.py``):
an f16-downsampling encoder (ch=160, ch_mult (1,1,2,2,4), 2 res blocks,
single-head attention at the lowest resolution and mid), a mirrored decoder,
3x3 quant/post-quant convs, and the multi-scale quantizer in between.

TPU-first: NHWC layout throughout (XLA's preferred conv layout on TPU),
GroupNorm/swish fused by XLA, attention as one dot-general pair. The module
is a pytree of params + pure apply functions, so it jits/shards/converts
(torch ``.pth`` -> pytree) without framework magic.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.config import VAEConfig
from var_tpu.models import quantizer as q

HIGHEST = jax.lax.Precision.HIGHEST

# decoder upsample formulation: "phase" (4 subpixel 2x2 convs + interleave)
# or "deconv" (one input-dilated conv, 4x4 collapsed kernel). Exact same
# function either way (equivalence-tested against the nearest+conv oracle);
# module-level so benches can A/B it without threading a config field.
UPSAMPLE_IMPL = "phase"


# ---------------------------------------------------------------------------
# primitive layers


def conv2d(p: dict, x: jax.Array, stride: int = 1, padding="SAME") -> jax.Array:
    dtype = x.dtype
    out = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(dtype)


def group_norm(p: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-6,
               impl: str = "dot") -> jax.Array:
    """torch.nn.GroupNorm semantics (``basic_vae.py:18-19``): normalize over
    (spatial, channels-within-group) per sample, fp32 statistics.

    Bandwidth-shaped for TPU: the default "dot" impl computes the spatial
    stat reductions as ones-vector dot_generals so the MXU does the
    accumulation (XLA's convert+reduce stat fusions ran at ~85 GB/s on the
    256px decoder tensors); the affine transform is folded into one
    per-(batch, channel) scale/shift applied in the input dtype. "xla" is
    the plain reduce formulation; "pallas" (``ops/pallas/gn_stats``)
    measures SLOWER here — the decoder convs emit a B-interleaved
    {3,0,2,1} layout and feeding pallas forces a dense-layout copy first
    (73.0 -> 59.2 img/s end to end) — kept opt-in for layouts where the
    producer is already dense."""
    b, h, w, c = x.shape
    cg = c // num_groups
    n = h * w * cg  # elements per (batch, group)
    if impl == "pallas":
        from var_tpu.ops.pallas.gn_stats import gn_channel_stats

        s, ss = gn_channel_stats(x)  # (b, c) fp32 each
        gs = jnp.sum(s.reshape(b, num_groups, cg), axis=-1)
        gss = jnp.sum(ss.reshape(b, num_groups, cg), axis=-1)
        mean = (gs / n).reshape(b, 1, num_groups, 1)
        var = (gss / n).reshape(b, 1, num_groups, 1) - jnp.square(mean)
    elif impl == "dot":
        # spatial reduction as a dot with a ones vector: the MXU does the
        # accumulation and the fp32 convert/square fuse into the operand read
        ones = jnp.ones((h, w), jnp.float32)
        xf = x.astype(jnp.float32)
        dims = (((1, 2), (0, 1)), ((), ()))
        s = jax.lax.dot_general(xf, ones, dims, preferred_element_type=jnp.float32)
        ss = jax.lax.dot_general(jnp.square(xf), ones, dims,
                                 preferred_element_type=jnp.float32)
        gs = jnp.sum(s.reshape(b, num_groups, cg), axis=-1)
        gss = jnp.sum(ss.reshape(b, num_groups, cg), axis=-1)
        mean = (gs / n).reshape(b, 1, num_groups, 1)
        var = (gss / n).reshape(b, 1, num_groups, 1) - jnp.square(mean)
    else:
        xf = x.reshape(b, h * w, num_groups, cg).astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)  # (b,1,g,1)
        var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - jnp.square(mean)
    xg = x.reshape(b, h * w, num_groups, cg)
    inv = jax.lax.rsqrt(var + eps)
    g_scale = p["scale"].reshape(1, 1, num_groups, cg) * inv  # (b,1,g,cg) f32
    g_shift = p["bias"].reshape(1, 1, num_groups, cg) - mean * g_scale
    y = xg * g_scale.astype(x.dtype) + g_shift.astype(x.dtype)
    return y.reshape(b, h, w, c)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def resnet_block(p: dict, x: jax.Array) -> jax.Array:
    """norm-swish-conv x2 with (1x1-projected) residual (``basic_vae.py:40-60``)."""
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def attn_block(p: dict, x: jax.Array) -> jax.Array:
    """Single-head self-attention over the spatial grid (``basic_vae.py:63-92``)."""
    b, h, w, c = x.shape
    qkv = conv2d(p["qkv"], group_norm(p["norm"], x))  # (B,H,W,3C)
    # reference packs as (B, 3, C, H, W).unbind(1): channel blocks are q|k|v
    qq, kk, vv = jnp.split(qkv.reshape(b, h * w, 3, c), 3, axis=2)
    qq = qq[:, :, 0].astype(jnp.float32)
    kk = kk[:, :, 0].astype(jnp.float32)
    vv = vv[:, :, 0].astype(jnp.float32)
    attn = jnp.einsum("bqc,bkc->bqk", qq, kk, precision=HIGHEST) * (c ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", attn, vv, precision=HIGHEST)
    out = out.reshape(b, h, w, c).astype(x.dtype)
    return x + conv2d(p["proj_out"], out)


def downsample2x(p: dict, x: jax.Array) -> jax.Array:
    """Asymmetric pad (0,1,0,1) + stride-2 VALID conv (``basic_vae.py:31-37``)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, padding="VALID")


def upsample2x_repeat(p: dict, x: jax.Array) -> jax.Array:
    """Nearest 2x + 3x3 conv, literal formulation (``basic_vae.py:22-28``).

    Kept as the reference oracle for :func:`upsample2x`'s equivalence test;
    the shipping path below computes the same function without materializing
    the 4x-sized intermediate."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p["conv"], x)


def upsample2x_deconv(p: dict, x: jax.Array) -> jax.Array:
    """Nearest 2x + 3x3 conv (``basic_vae.py:22-28``) as ONE input-dilated
    conv (a stride-2 transposed convolution with a 4x4 collapsed kernel).

    Derivation: output row P = 2i+di reads nearest-upsampled rows
    (P-1, P, P+1), which collapse onto low-res rows with summed taps —
    row sets per 4x4 kernel row m: {0}, {0,1}, {1,2}, {2} (and the same
    along columns), i.e. K4[m1, m2] = sum_{a in R[m1], b in R[m2]} k[a, b].
    With ``lhs_dilation=2`` and padding (2, 2) the even/odd output phases
    pick exactly the right taps (zeros fall on the dilation gaps). Exact
    math — same function as :func:`upsample2x` / the repeat oracle — with
    no phase stack / interleave transpose in the graph."""
    dtype = x.dtype
    k = p["conv"]["kernel"].astype(dtype)  # (3, 3, Cin, Cout)
    C = jnp.asarray(np.array([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]],
                             np.float32)).astype(dtype)  # (4, 3) row collapse
    k4 = jnp.einsum("ma,nb,abio->mnio", C, C, k)  # (4, 4, Cin, Cout)
    y = jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["conv"]["bias"].astype(dtype)


def upsample2x(p: dict, x: jax.Array) -> jax.Array:
    """Nearest 2x + 3x3 conv (``basic_vae.py:22-28``), computed as four
    phase-specific 2x2 convs on the LOW-res input + depth-to-space.

    Because nearest upsampling duplicates each pixel 2x2, every output
    pixel's 3x3 window covers only a 2x2 low-res neighborhood, with the
    duplicated kernel taps summed: for output parity di (row phase),
    tap weights collapse to [k0, k1+k2] (di=0, support rows i-1..i) or
    [k0+k1, k2] (di=1, support rows i..i+1); same along columns. This is
    exact math, 36 -> 16 MACs/output (2.25x fewer FLOPs), and skips the
    4x-sized nearest-upsampled tensor entirely — the decoder's upsample
    levels run at 128-256px where HBM traffic dominates."""
    b, h, w, c = x.shape
    dtype = x.dtype
    k = p["conv"]["kernel"].astype(dtype)  # (3, 3, Cin, Cout)
    rows = (jnp.stack([k[0], k[1] + k[2]]),          # di=0: rows i-1, i
            jnp.stack([k[0] + k[1], k[2]]))          # di=1: rows i, i+1
    phases = []
    for di in (0, 1):
        r = rows[di]
        cols = (jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1),   # dj=0
                jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1))   # dj=1
        for dj in (0, 1):
            y = jax.lax.conv_general_dilated(
                x, cols[dj], window_strides=(1, 1),
                padding=((1 - di, di), (1 - dj, dj)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            phases.append(y)
    y = jnp.stack(phases).reshape(2, 2, b, h, w, -1)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * w, -1)
    return y + p["conv"]["bias"].astype(dtype)


# ---------------------------------------------------------------------------
# parameter init (torch Conv2d/GroupNorm defaults so fresh VAE training
# starts from the same distribution family; parity runs load checkpoints)


def _init_conv(rng, kh, kw, cin, cout) -> dict:
    fan_in = cin * kh * kw
    bound = float(1.0 / np.sqrt(fan_in))
    kk, kb = jax.random.split(rng)
    return {
        "kernel": jax.random.uniform(kk, (kh, kw, cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _init_gn(c) -> dict:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_resblock(rng, cin, cout) -> dict:
    r1, r2, r3 = jax.random.split(rng, 3)
    p = {
        "norm1": _init_gn(cin),
        "conv1": _init_conv(r1, 3, 3, cin, cout),
        "norm2": _init_gn(cout),
        "conv2": _init_conv(r2, 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(r3, 1, 1, cin, cout)
    return p


def _init_attn(rng, c) -> dict:
    r1, r2 = jax.random.split(rng)
    return {
        "norm": _init_gn(c),
        "qkv": _init_conv(r1, 1, 1, c, 3 * c),
        "proj_out": _init_conv(r2, 1, 1, c, c),
    }


def init_encoder_params(rng: jax.Array, cfg: VAEConfig) -> dict:
    ch, mult, nblk = cfg.ch, cfg.ch_mult, cfg.num_res_blocks
    nres = len(mult)
    keys = iter(jax.random.split(rng, 64))
    p: dict = {"conv_in": _init_conv(next(keys), 3, 3, 3, ch)}
    in_mult = (1,) + tuple(mult)
    downs = []
    for i in range(nres):
        cin, cout = ch * in_mult[i], ch * mult[i]
        level = {"block": [], "attn": []}
        for j in range(nblk):
            level["block"].append(_init_resblock(next(keys), cin if j == 0 else cout, cout))
            if i == nres - 1 and cfg.using_sa:
                level["attn"].append(_init_attn(next(keys), cout))
        if i != nres - 1:
            level["downsample"] = {"conv": _init_conv(next(keys), 3, 3, cout, cout)}
        downs.append(level)
    p["down"] = downs
    cmid = ch * mult[-1]
    p["mid"] = {
        "block_1": _init_resblock(next(keys), cmid, cmid),
        "attn_1": _init_attn(next(keys), cmid) if cfg.using_mid_sa else {},
        "block_2": _init_resblock(next(keys), cmid, cmid),
    }
    p["norm_out"] = _init_gn(cmid)
    p["conv_out"] = _init_conv(next(keys), 3, 3, cmid, cfg.z_channels)
    return p


def init_decoder_params(rng: jax.Array, cfg: VAEConfig) -> dict:
    ch, mult, nblk = cfg.ch, cfg.ch_mult, cfg.num_res_blocks
    nres = len(mult)
    keys = iter(jax.random.split(rng, 64))
    cin = ch * mult[-1]
    p: dict = {"conv_in": _init_conv(next(keys), 3, 3, cfg.z_channels, cin)}
    p["mid"] = {
        "block_1": _init_resblock(next(keys), cin, cin),
        "attn_1": _init_attn(next(keys), cin) if cfg.using_mid_sa else {},
        "block_2": _init_resblock(next(keys), cin, cin),
    }
    ups: List[Optional[dict]] = [None] * nres
    block_in = cin
    for i in reversed(range(nres)):
        cout = ch * mult[i]
        level = {"block": [], "attn": []}
        for j in range(nblk + 1):
            level["block"].append(_init_resblock(next(keys), block_in, cout))
            block_in = cout
            if i == nres - 1 and cfg.using_sa:
                level["attn"].append(_init_attn(next(keys), cout))
        if i != 0:
            level["upsample"] = {"conv": _init_conv(next(keys), 3, 3, cout, cout)}
        ups[i] = level
    p["up"] = ups
    p["norm_out"] = _init_gn(block_in)
    p["conv_out"] = _init_conv(next(keys), 3, 3, block_in, 3)
    return p


def init_vae_params(rng: jax.Array, cfg: VAEConfig) -> dict:
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
    c = cfg.z_channels
    ks = cfg.quant_conv_ks
    return {
        "encoder": init_encoder_params(r1, cfg),
        "decoder": init_decoder_params(r2, cfg),
        "quant_conv": _init_conv(r3, ks, ks, c, c),
        "post_quant_conv": _init_conv(r4, ks, ks, c, c),
        "quantize": q.init_quantizer_params(r5, cfg),
    }


# ---------------------------------------------------------------------------
# encoder / decoder forward


def encoder_apply(p: dict, cfg: VAEConfig, x: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [-1,1] -> (B, H/16, W/16, Cvae) (``basic_vae.py:144-160``)."""
    nres = len(cfg.ch_mult)
    h = conv2d(p["conv_in"], x)
    for i in range(nres):
        level = p["down"][i]
        for j, blk in enumerate(level["block"]):
            h = resnet_block(blk, h)
            if level["attn"]:
                h = attn_block(level["attn"][j], h)
        if "downsample" in level:
            h = downsample2x(level["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    if cfg.using_mid_sa:
        h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    return conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))


def decoder_apply(p: dict, cfg: VAEConfig, z: jax.Array) -> jax.Array:
    """(B, h, w, Cvae) -> (B, 16h, 16w, 3) (``basic_vae.py:210-226``)."""
    nres = len(cfg.ch_mult)
    h = conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["block_1"], h)
    if cfg.using_mid_sa:
        h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    up_fn = upsample2x_deconv if UPSAMPLE_IMPL == "deconv" else upsample2x
    for i in reversed(range(nres)):
        level = p["up"][i]
        for j, blk in enumerate(level["block"]):
            h = resnet_block(blk, h)
            if level["attn"]:
                h = attn_block(level["attn"][j], h)
        if "upsample" in level:
            h = up_fn(level["upsample"], h)
    return conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))


# ---------------------------------------------------------------------------
# VQVAE-level API (reference ``models/vqvae.py:56-98``)


def img_to_f(params: dict, cfg: VAEConfig, img: jax.Array) -> jax.Array:
    """Encoder + quant_conv: image -> pre-quantization features (vqvae.py:66)."""
    return conv2d(params["quant_conv"], encoder_apply(params["encoder"], cfg, img))


def img_to_idxBl(
    params: dict, cfg: VAEConfig, img: jax.Array, v_patch_nums: Optional[Sequence[int]] = None
) -> List[jax.Array]:
    """Tokenize: (B,H,W,3) in [-1,1] -> list of (B, pn*pn) ids (vqvae.py:65-67)."""
    idx_bl, _ = q.f_to_idxBl(params["quantize"], cfg, img_to_f(params, cfg, img), v_patch_nums)
    return idx_bl


def img_to_fhat(params, cfg, img, v_patch_nums=None) -> List[jax.Array]:
    """Accumulated f_hat snapshots per scale (vqvae.py:69-71)."""
    fhats, _ = q.f_to_idxBl(
        params["quantize"], cfg, img_to_f(params, cfg, img), v_patch_nums, to_fhat=True
    )
    return fhats


def fhat_to_img(params: dict, cfg: VAEConfig, f_hat: jax.Array) -> jax.Array:
    """post_quant_conv + decoder, clamped to [-1,1] (vqvae.py:62-63)."""
    img = decoder_apply(params["decoder"], cfg, conv2d(params["post_quant_conv"], f_hat))
    return jnp.clip(img, -1.0, 1.0)


def idxBl_to_img(
    params: dict, cfg: VAEConfig, ms_idx_bl: List[jax.Array], same_shape: bool = True, last_one=True
):
    """Tokens -> image(s) (vqvae.py:77-90)."""
    b = ms_idx_bl[0].shape[0]
    ms_h = []
    for idx in ms_idx_bl:
        pn = int(round(idx.shape[1] ** 0.5))
        ms_h.append(q.embed(params["quantize"], idx).reshape(b, pn, pn, cfg.z_channels))
    fh = q.embed_to_fhat(params["quantize"], cfg, ms_h, all_to_max_scale=same_shape, last_one=last_one)
    if last_one:
        return fhat_to_img(params, cfg, fh)
    return [fhat_to_img(params, cfg, f) for f in fh]


def embed_to_img(params: dict, cfg: VAEConfig, ms_h_bhwc: List[jax.Array],
                 all_to_max_scale: bool = True, last_one: bool = True):
    """Per-scale embeddings -> decoded image(s) (vqvae.py:86-90)."""
    fh = q.embed_to_fhat(params["quantize"], cfg, ms_h_bhwc,
                         all_to_max_scale=all_to_max_scale, last_one=last_one)
    if last_one:
        return fhat_to_img(params, cfg, fh)
    return [fhat_to_img(params, cfg, f) for f in fh]


def img_to_reconstructed_img(params, cfg, img, v_patch_nums=None, last_one=True):
    """Round-trip reconstruction (vqvae.py:92-98)."""
    fhats = img_to_fhat(params, cfg, img, v_patch_nums)
    if last_one:
        return fhat_to_img(params, cfg, fhats[-1])
    return [fhat_to_img(params, cfg, f) for f in fhats]


class VAETrainOutput(NamedTuple):
    recon: jax.Array
    vq_loss: jax.Array
    hits: jax.Array
    idx_bl: list


def vae_train_forward(params: dict, cfg: VAEConfig, img: jax.Array) -> VAETrainOutput:
    """VQVAE training forward (vqvae.py:56-59): encode -> quantize with
    straight-through -> decode. Returns reconstruction + commitment loss."""
    f = img_to_f(params, cfg, img)
    res = q.quantizer_forward(params["quantize"], cfg, f)
    recon = decoder_apply(params["decoder"], cfg, conv2d(params["post_quant_conv"], res.f_hat))
    return VAETrainOutput(recon, res.vq_loss, res.hits, res.idx_bl)
