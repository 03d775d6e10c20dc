"""VAR transformer: class-conditional AdaLN decoder over the scale pyramid.

Re-implements the reference ``VAR`` (``models/var.py:21-234``) and its blocks
(``models/basic_var.py:33-174``) as pure functions over a param pytree:

* next-scale prediction: training runs one teacher-forced pass over all L
  tokens with a block-causal additive mask (attend to all scales <= own,
  ``var.py:107-112``); inference decodes scale-by-scale with KV caching.
* AdaLN conditioning: 6 modulation vectors (gamma1, gamma2, scale1, scale2,
  shift1, shift2) from SiLU+Linear per block, or a shared table ``ada_gss``
  plus one shared projection when ``shared_aln`` (``basic_var.py:152-158``).
* optional QK L2-norm attention with learnable per-head log-scale clamped at
  ln(100) (``basic_var.py:67-70,101-105``); otherwise scale 0.25/sqrt(d).

TPU-first: the whole teacher-forced pass is one jittable function (bf16
matmuls, fp32 layer-norm statistics and logits head, matching the
reference's fp32-forced regions ``var.py:200,223``); decode carries KV as
traced values inside a single jitted 10-stage unrolled program so no host
round-trips happen between scales.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.config import VARConfig
from var_tpu.ops.attention import attention

F32 = jnp.float32

# VMEM bytes the paired decode kernel may spend on resident K+V per program;
# sets its cache-length envelope (see attn_apply). Module-level so tests can
# shrink it to exercise the pallas->XLA fallback seam.
PAIRED_VMEM_BUDGET = 6_000_000


# ---------------------------------------------------------------------------
# static (config-derived) tables


def level_ids(cfg: VARConfig) -> np.ndarray:
    """(L,) int32: which pyramid scale each flat position belongs to."""
    return np.concatenate(
        [np.full(pn * pn, i, np.int32) for i, pn in enumerate(cfg.patch_nums)]
    )


def block_causal_bias(cfg: VARConfig) -> np.ndarray:
    """(1, 1, L, L) additive mask: 0 where key-scale <= query-scale, -inf
    otherwise (``var.py:107-112``)."""
    d = level_ids(cfg)
    mask = d[:, None] >= d[None, :]
    return np.where(mask, 0.0, -np.inf).astype(np.float32)[None, None]


# ---------------------------------------------------------------------------
# init


def _trunc_normal(key, shape, std):
    if std <= 0:
        return jnp.zeros(shape, F32)
    # torch.nn.init.trunc_normal_ truncates at absolute +-2 (var.py:585)
    return jax.random.truncated_normal(key, -2.0 / std, 2.0 / std, shape, F32) * std


def init_var_params(
    rng: jax.Array,
    cfg: VARConfig,
    init_std: float = -1.0,
    init_head: float = 0.02,
    init_adaln: float = 0.5,
    init_adaln_gamma: float = 1e-5,
) -> dict:
    """Weight init replicating ``VAR.init_weights`` (``models/var.py:577-627``)
    with build-time defaults from ``models/__init__.py`` / ``arg_util.py``
    (ini=-1 -> std = sqrt(1/C/3); head *= hd; adaln scale/shift *= aln;
    adaln gammas *= alng; residual projections /= sqrt(2*depth))."""
    C, D, V = cfg.embed_dim, cfg.embed_dim, cfg.vocab_size
    Cv = cfg.z_channels
    std = math.sqrt(1.0 / C / 3.0) if init_std < 0 else init_std
    keys = iter(jax.random.split(rng, 16 + 8 * cfg.depth))
    resi_div = math.sqrt(2.0 * cfg.depth)

    p: dict = {
        "word_embed": {
            "kernel": _trunc_normal(next(keys), (Cv, C), std),
            "bias": jnp.zeros((C,), F32),
        },
        "class_emb": _trunc_normal(next(keys), (cfg.num_classes + 1, C), std),
        "pos_start": _trunc_normal(next(keys), (1, cfg.first_l, C), std),
        "pos_1LC": _trunc_normal(next(keys), (1, cfg.seq_len, C), std),
        "lvl_embed": _trunc_normal(next(keys), (len(cfg.patch_nums), C), std),
        "head_nm": {
            "ada_lin": {
                "kernel": _trunc_normal(next(keys), (D, 2 * C), std) * init_adaln,
                "bias": jnp.zeros((2 * C,), F32),
            }
        },
        "head": {
            "kernel": _trunc_normal(next(keys), (C, V), std) * init_head,
            "bias": jnp.zeros((V,), F32),
        },
    }
    if cfg.shared_aln:
        p["shared_ada_lin"] = {
            "kernel": _trunc_normal(next(keys), (D, 6 * C), std),
            "bias": jnp.zeros((6 * C,), F32),
        }
    blocks = []
    for _ in range(cfg.depth):
        blk: dict = {
            "attn": {
                "qkv": {"kernel": _trunc_normal(next(keys), (C, 3 * C), std)},
                "q_bias": jnp.zeros((C,), F32),
                "v_bias": jnp.zeros((C,), F32),
                "proj": {
                    "kernel": _trunc_normal(next(keys), (C, C), std) / resi_div,
                    "bias": jnp.zeros((C,), F32),
                },
            },
            "ffn": {
                "fc1": {
                    "kernel": _trunc_normal(next(keys), (C, round(C * cfg.mlp_ratio)), std),
                    "bias": jnp.zeros((round(C * cfg.mlp_ratio),), F32),
                },
                "fc2": {
                    "kernel": _trunc_normal(next(keys), (round(C * cfg.mlp_ratio), C), std)
                    / resi_div,
                    "bias": jnp.zeros((C,), F32),
                },
            },
        }
        if cfg.attn_l2_norm:
            blk["attn"]["scale_mul"] = jnp.full((1, 1, cfg.num_heads, 1), math.log(4.0), F32)
        if cfg.shared_aln:
            gss = jax.random.normal(next(keys), (1, 1, 6, C), F32) / math.sqrt(C)
            gss = gss.at[:, :, :2].mul(init_adaln_gamma).at[:, :, 2:].mul(init_adaln)
            blk["ada_gss"] = gss
        else:
            k = _trunc_normal(next(keys), (D, 6 * C), std)
            k = k.at[:, : 2 * C].mul(init_adaln_gamma).at[:, 2 * C :].mul(init_adaln)
            blk["ada_lin"] = {"kernel": k, "bias": jnp.zeros((6 * C,), F32)}
        blocks.append(blk)
    p["blocks"] = blocks
    return p


def param_count(params) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))


def cast_block_matmul_params(params: dict, dtype=jnp.bfloat16) -> dict:
    """Cast the transformer blocks' matmul weights/biases to the compute
    dtype for INFERENCE of the big presets (d30/d36: 2B+ fp32 params alone
    are 9.2G of a 16G chip).

    Bit-identical decode: these tensors are ``astype(compute dtype)`` at
    every use anyway (:func:`_linear`, :func:`attn_apply`), so rounding them
    once up front changes nothing. Everything consumed in fp32 stays fp32:
    ada_lin/ada_gss (AdaLN), scale_mul (QK log-scale), word_embed, head,
    head_nm, class/pos/level embeddings."""
    out = dict(params)
    blocks = params["blocks"]

    def cast_one(blk: dict) -> dict:
        blk = dict(blk)
        attn = dict(blk["attn"])
        attn["qkv"] = {"kernel": attn["qkv"]["kernel"].astype(dtype)}
        attn["proj"] = {k: v.astype(dtype) for k, v in attn["proj"].items()}
        attn["q_bias"] = attn["q_bias"].astype(dtype)
        attn["v_bias"] = attn["v_bias"].astype(dtype)
        blk["attn"] = attn
        blk["ffn"] = {
            name: {k: v.astype(dtype) for k, v in lin.items()}
            for name, lin in blk["ffn"].items()
        }
        return blk

    if isinstance(blocks, (list, tuple)):
        out["blocks"] = [cast_one(b) for b in blocks]
    else:
        out["blocks"] = cast_one(blocks)
    return out


# ---------------------------------------------------------------------------
# building blocks


def _ln(x: jax.Array, eps: float) -> jax.Array:
    """LayerNorm without affine params, fp32 statistics (``basic_var.py:141``).
    Statistics come from fused convert+reduce passes; the normalization is
    applied in the input dtype so no fp32 copy of the activations is
    materialized (exact for fp32 inputs; bf16 runs round once like every
    other elementwise op)."""
    xf = x.astype(F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    dt = x.dtype
    return (x - mu.astype(dt)) * inv.astype(dt)


def _l2norm(x: jax.Array) -> jax.Array:
    xf = x.astype(F32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-24)


def _linear(p: dict, x: jax.Array) -> jax.Array:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _adaln6(blk: dict, cfg: VARConfig, cond_ctx) -> jax.Array:
    """(B, 1, 6, C) modulation params for one block."""
    kind, val = cond_ctx
    if kind == "shared":  # val: (B, 1, 6, C) from shared_ada_lin (var.py:15-18)
        return blk["ada_gss"].astype(F32) + val
    if kind == "precomp":  # val: this block's (B, 1, 6, C), hoisted by the caller
        return val
    # val: (B, D) raw class embedding
    h = jax.nn.silu(val.astype(F32))
    return _linear(blk["ada_lin"], h).reshape(-1, 1, 6, cfg.embed_dim)


def attn_apply(
    ap: dict,
    cfg: VARConfig,
    x: jax.Array,
    bias: Optional[jax.Array],
    cache_kv: Optional[Tuple[Optional[jax.Array], Optional[jax.Array]]] = None,
    impl: str = "xla",
    scale_ends: Optional[Tuple[int, ...]] = None,
    remat_core: bool = False,
    mesh=None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """Self-attention with fused QKV, zero k-bias, optional QK L2-norm and
    KV-cache append (``basic_var.py:90-119``).

    ``cache_kv``: previous (k, v) each (B, Lprev, C) or (None, None) at
    the first decode stage. Returns (out, (k_new, v_new)) — the *new* slices
    only, also (B, L, C); the caller owns cache accumulation (so both the
    unrolled and the lax.scan block paths share this function).

    Caches store heads MERGED into the embed dim (C = H*D minormost): TPU
    tiles the last dim to 128 lanes, so a (…, H, 64) cache layout would pad
    head_dim 64 -> 128 and double KV HBM (measured: bs96 decode OOM at
    19.9G, 1.5x padding expansion on every cache buffer). The split to
    (B, L, H, D) happens only at the attention dot, where XLA repacks
    operands for the MXU anyway."""
    b, l, c = x.shape
    h, d = cfg.num_heads, cfg.head_dim
    if impl == "paired" and not (h % 2 == 0 and d * 2 == 128):
        impl = "xla"  # paired needs head_dim-64 pairs; tiny/debug configs don't
    # mesh discipline: XLA cannot auto-partition a pallas_call, so on a
    # non-trivial mesh every kernel goes through the shard_map bridges in
    # parallel/shard_attn — or, when the (heads, batch) geometry doesn't
    # shard, falls back to the XLA path, which partitions fine. 'auto'
    # therefore never produces an un-partitionable kernel on a pod.
    from var_tpu.parallel import shard_attn as sa

    if sa.mesh_is_trivial(mesh):
        mesh = None
    elif impl == "paired" and not sa.paired_mesh_ok(mesh, h, b):
        impl = "xla"  # the paired TRAIN kernel needs even heads/device
    elif impl == "hybrid" and not sa.flash_mesh_ok(mesh, h, b):
        impl = "xla"  # hybrid's forward is the BLHD streaming kernel
    # decode 'pallas' gates per call site: the paired decode kernels need
    # paired_mesh_ok (below); the streaming-BLHD fallback inside attention()
    # checks flash_mesh_ok itself — each downgrades to XLA independently
    mesh_paired_ok = mesh is None or sa.paired_mesh_ok(mesh, h, b)
    # per-device lane width sets the decode kernels' VMEM envelope under TP
    c_dev = c if mesh is None else c // sa.axis_sizes(mesh)[1]
    dtype = x.dtype
    qkv_bias = jnp.concatenate(
        [ap["q_bias"], jnp.zeros_like(ap["q_bias"]), ap["v_bias"]]
    ).astype(dtype)
    # keep q/k/v MERGED (B, L, C): the (B, L, 3, H, D) reshape drags every
    # downstream op into padded head-split layouts (profiled: ~2 ms/block of
    # f32 copies+broadcasts in decode); lane-range slices of the 3C output
    # are layout-clean
    qkv = x @ ap["qkv"]["kernel"].astype(dtype) + qkv_bias  # (B, L, 3C)

    def _split_norm(qkv_m, scale_mul_p, with_q: bool = True):
        """Merged qkv -> (q, k, v) merged (B, L, C) + static softmax scale,
        with the optional per-head QK L2 norm applied. ``with_q=False``
        skips the q slice + norm entirely (the chunked decode kernel reads
        raw q lanes straight from the fused qkv and normalizes in-kernel)."""
        qm_ = qkv_m[..., :c] if with_q else None
        km_, vm_ = qkv_m[..., c : 2 * c], qkv_m[..., 2 * c :]
        if cfg.attn_l2_norm:
            sc = 1.0
            scale_mul = jnp.exp(jnp.minimum(scale_mul_p.astype(F32),
                                            math.log(100.0))).reshape(h)
            # per-head L2 norm via two block-diagonal matmuls on merged
            # lanes: sumsq_h = x^2 @ seg (C x H); inv broadcast back via
            # seg^T. Exactly _l2norm per head, but no 4-D fp32
            # intermediates or lane-64 layouts.
            from var_tpu.ops.pallas.flash_attention import head_segment_matrix

            seg = head_segment_matrix(h, d)  # (C, H)
            kf = km_.astype(F32)
            inv_k = jax.lax.rsqrt(jnp.square(kf) @ seg + 1e-24)
            km_ = (kf * (inv_k @ seg.T)).astype(dtype)
            if with_q:
                qf = qm_.astype(F32)
                inv_q = jax.lax.rsqrt(jnp.square(qf) @ seg + 1e-24) * scale_mul
                qm_ = (qf * (inv_q @ seg.T)).astype(dtype)
        else:
            sc = 0.25 / math.sqrt(d)
        return qm_, km_, vm_, sc

    if remat_core and cache_kv is None:
        # Attention-core rematerialization (remat mode 2): everything from
        # the fused qkv output through the attention dot is recomputed in
        # backward, so neither the L x L softmax residuals (~23G at d16
        # bs32) nor the fp32 QK-norm intermediates survive — only the qkv
        # tensor itself is saved. recompute_grad is checkpoint-by-custom-vjp:
        # jax.checkpoint expressed the same thing but XLA:TPU compile time
        # exploded (>30 min) on remat regions inside the depth scan.
        assert bias is None, "remat_core uses the factored mask only"
        from var_tpu.ops.attention import recompute_grad

        def _core(qkv_m, scale_mul_p, impl_=impl):
            qm_, km_, vm_, sc = _split_norm(qkv_m, scale_mul_p)
            if impl_ == "paired":
                if mesh is not None:
                    return sa.paired_train(mesh, qm_, km_, vm_, h, sc, scale_ends)
                # merged-lane paired-head training kernel: no head-split
                # transposes, flash O(BLC) residuals (see flash_attention.py)
                from var_tpu.ops.pallas.flash_attention import (
                    flash_attention_paired_train)

                return flash_attention_paired_train(qm_, km_, vm_, h, sc,
                                                    scale_ends)
            return attention(qm_.reshape(b, l, h, d), km_.reshape(b, l, h, d),
                             vm_.reshape(b, l, h, d), sc, impl=impl_,
                             scale_ends=scale_ends, mesh=mesh).reshape(b, l, c)

        if impl == "hybrid":
            # flash primal (no L x L tensor in forward) + dense XLA backward
            # (whose recompute-and-VJP beats the flash VJP at L=680): the
            # fast half of each, picked per measurement (BENCH_extra.json)
            wrapped = recompute_grad(
                functools.partial(_core, impl_="pallas"),
                bwd_fn=functools.partial(_core, impl_="xla"))
        else:
            wrapped = recompute_grad(_core)
        out = wrapped(qkv, ap.get("scale_mul"))
        return _linear(ap["proj"], out), None

    if cache_kv is not None and isinstance(cache_kv[0], str):  # ("chunks", ...)
        # chunked decode cache: past stages stay as the (depth, B, l_i, C)
        # stacks the depth-scan produced — never copied, never concatenated.
        # The paired kernel reads each chunk in place at row ``idx`` via
        # scalar prefetch, reads q's lanes straight from the fused qkv (no
        # slice materialized), and applies the per-head q L2 norm in-kernel;
        # outside its envelope the chunks are materialized into one
        # (B, Lk, C) buffer for the XLA dot path (correct but copy-heavy —
        # the envelope covers every 256px-preset stage).
        _, cks, cvs, idx = cache_kv
        lk = l + sum(int(ck.shape[-2]) for ck in cks)
        paired_ok = (impl == "pallas" and bias is None and d * 2 == 128
                     and h % 2 == 0 and lk <= PAIRED_VMEM_BUDGET // (4 * c_dev)
                     and l >= 8 and mesh_paired_ok)
        if paired_ok:
            from var_tpu.ops.pallas.flash_attention import flash_decode_paired_chunks

            _, km, vm, scale = _split_norm(qkv, ap.get("scale_mul"),
                                           with_q=False)
            sm = None
            if cfg.attn_l2_norm:
                sm = jnp.exp(jnp.minimum(ap["scale_mul"].astype(F32),
                                         math.log(100.0))).reshape(h)
            if mesh is not None:
                out = sa.decode_paired_chunks(mesh, qkv, (*cks, km), (*cvs, vm),
                                              idx, h, scale, sm)
            else:
                out = flash_decode_paired_chunks(qkv, (*cks, km), (*cvs, vm), idx,
                                                 h, scale, q_l2_scale_mul=sm)
            return _linear(ap["proj"], out), (km, vm)
        qm, km, vm, scale = _split_norm(qkv, ap.get("scale_mul"))
        parts_k = [jax.lax.dynamic_index_in_dim(ck, idx, 0, False) for ck in cks]
        parts_v = [jax.lax.dynamic_index_in_dim(cv, idx, 0, False) for cv in cvs]
        k_att_m = jnp.concatenate(parts_k + [km], axis=1) if parts_k else km
        v_att_m = jnp.concatenate(parts_v + [vm], axis=1) if parts_v else vm
        q = qm.reshape(b, l, h, d)
        k_att = k_att_m.reshape(b, lk, h, d)
        v_att = v_att_m.reshape(b, lk, h, d)
        out = attention(q, k_att, v_att, scale, bias=bias,
                        impl="xla" if impl == "pallas" else impl).reshape(b, l, c)
        return _linear(ap["proj"], out), (km, vm)
    qm, km, vm, scale = _split_norm(qkv, ap.get("scale_mul"))
    if cache_kv is None and impl == "paired":
        if mesh is not None:
            out = sa.paired_train(mesh, qm, km, vm, h, scale, scale_ends)
            return _linear(ap["proj"], out), None
        from var_tpu.ops.pallas.flash_attention import flash_attention_paired_train

        out = flash_attention_paired_train(qm, km, vm, h, scale, scale_ends)
        return _linear(ap["proj"], out), None
    new_kv = None
    k_att_m = v_att_m = None  # merged (B, Lk, C) forms for the decode kernel
    if cache_kv is not None and len(cache_kv) == 4:
        # preallocated decode cache: full (depth, B, Lmax, C) buffers written
        # in place at static offset ``cum`` (block index ``idx`` may be a
        # scan-traced scalar). No concat: the grow-by-concat path kept the
        # old and new cache alive simultaneously each stage (13.9G live at
        # the final d16 stage, bs96) and fragmented the heap.
        ckf, cvf, idx, cum = cache_kv
        ckf = jax.lax.dynamic_update_slice(ckf, km.astype(ckf.dtype)[None],
                                           (idx, 0, cum, 0))
        cvf = jax.lax.dynamic_update_slice(cvf, vm.astype(cvf.dtype)[None],
                                           (idx, 0, cum, 0))
        lk = cum + l
        k_att_m = jax.lax.dynamic_slice(ckf, (idx, 0, 0, 0), (1, b, lk, c))[0]
        v_att_m = jax.lax.dynamic_slice(cvf, (idx, 0, 0, 0), (1, b, lk, c))[0]
        new_kv = (ckf, cvf)
    elif cache_kv is not None:
        new_kv = (km, vm)
        if cache_kv[0] is not None:
            k_att_m = jnp.concatenate([cache_kv[0], km], axis=1)
            v_att_m = jnp.concatenate([cache_kv[1], vm], axis=1)
    # paired-kernel envelope: whole K/V resident in VMEM per program, so the
    # cache length bound scales inversely with width (d16 C=1024 -> 1464
    # covers the full 256px pyramid; d36 C=2304 -> 651 covers stages 1-7 and
    # the long tail stages take the XLA path)
    paired_max_lk = PAIRED_VMEM_BUDGET // (4 * c_dev)
    use_paired = (k_att_m is not None and impl == "pallas" and bias is None
                  and d * 2 == 128 and h % 2 == 0
                  and k_att_m.shape[1] <= paired_max_lk and l >= 8
                  and mesh_paired_ok)
    if use_paired:
        # decode: paired-head flash kernel — caches stay (B, Lk, C), no
        # (B, H, Lq, Lk) logits tensor, no head transposes or padded layouts.
        # Outside its envelope (longer caches at the 512px/1024px presets,
        # tiny stages) XLA's dot-general pair measures faster than the
        # streaming merged kernel (per-head lane slicing relayouts), so
        # everything else takes the XLA path below.
        if mesh is not None:
            out = sa.decode_paired(mesh, qm, k_att_m, v_att_m, h, scale)
        else:
            from var_tpu.ops.pallas.flash_attention import flash_decode_paired

            out = flash_decode_paired(qm, k_att_m, v_att_m, h, scale)
    else:
        q = qm.reshape(b, l, h, d)
        if k_att_m is not None:
            lk = k_att_m.shape[1]
            k_att = k_att_m.reshape(b, lk, h, d)
            v_att = v_att_m.reshape(b, lk, h, d)
            if impl == "pallas":
                impl = "xla"  # decode outside the paired envelope (see above)
        else:
            k_att, v_att = km.reshape(b, l, h, d), vm.reshape(b, l, h, d)
        out = attention(q, k_att, v_att, scale, bias=bias, impl=impl,
                        scale_ends=scale_ends, mesh=mesh).reshape(b, l, c)
    return _linear(ap["proj"], out), new_kv


def ffn_apply(fp: dict, x: jax.Array) -> jax.Array:
    """Linear-GELU(tanh)-Linear (``basic_var.py:33-52``)."""
    return _linear(fp["fc2"], jax.nn.gelu(_linear(fp["fc1"], x), approximate=True))


def block_apply(
    blk: dict,
    cfg: VARConfig,
    x: jax.Array,
    cond_ctx,
    bias: Optional[jax.Array],
    cache_kv=None,
    impl: str = "xla",
    drop_path_mask: Optional[Tuple[jax.Array, jax.Array]] = None,
    scale_ends: Optional[Tuple[int, ...]] = None,
    ln_impl: str = "xla",
    attn_remat: bool = False,
    mesh=None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """Pre-norm AdaLN block (``basic_var.py:152-158``):
    x += dp(attn(ln(x)*(s1+1)+sh1) * g1); x += dp(ffn(ln(x)*(s2+1)+sh2) * g2).

    ``ln_impl="pallas"`` fuses each LN+modulation into one Pallas pass
    (decode-only: XLA's per-stage LN fusions profile at 20-60 GB/s and
    dominate decode; the kernel has no VJP so training keeps "xla").
    """
    dtype = x.dtype
    if ln_impl == "pallas" and mesh is not None:
        from var_tpu.parallel import shard_attn as sa

        if not sa.mesh_is_trivial(mesh):
            # the fused-LN pallas kernel reduces across the full C lane dim;
            # under a mesh XLA cannot partition it, and per-shard stats would
            # be wrong under TP — XLA's own LN fusion partitions correctly
            ln_impl = "xla"
    p6 = _adaln6(blk, cfg, cond_ctx)
    g1, g2, s1, s2, sh1, sh2 = [p6[:, :, i].astype(dtype) for i in range(6)]

    def _mod_ln(x_, s_, sh_):
        return _ln(x_, cfg.norm_eps) * (s_ + 1.0) + sh_

    if attn_remat:
        # remat mode 2: _ln's backward otherwise saves the fp32 cast of its
        # input — two (depth, B, L, C) fp32 stacks (~2.7G at d16 bs32)
        from var_tpu.ops.attention import recompute_grad

        _mod_ln = recompute_grad(_mod_ln)
    if ln_impl == "pallas":
        from var_tpu.ops.pallas.fused_ln import modulated_layernorm

        a_in = modulated_layernorm(x, p6[:, 0, 2], p6[:, 0, 4], eps=cfg.norm_eps)
    else:
        a_in = _mod_ln(x, s1, sh1)
    a_out, new_kv = attn_apply(blk["attn"], cfg, a_in, bias, cache_kv, impl,
                               scale_ends, remat_core=attn_remat, mesh=mesh)
    a_out = a_out * g1
    if drop_path_mask is not None:
        a_out = a_out * drop_path_mask[0].astype(dtype)
    x = x + a_out
    if ln_impl == "pallas":
        from var_tpu.ops.pallas.fused_ln import modulated_layernorm

        f_in = modulated_layernorm(x, p6[:, 0, 3], p6[:, 0, 5], eps=cfg.norm_eps)
    else:
        f_in = _mod_ln(x, s2, sh2)
    if attn_remat:
        # remat mode 2 also re-derives the FFN hidden states: the
        # (depth, B, L, 4C) GELU residual stacks alone are ~5.3G at d16
        # bs32; recomputing fc1+GELU in backward costs ~1/3 of the FFN's
        # forward matmul FLOPs
        from var_tpu.ops.attention import recompute_grad

        f_out = recompute_grad(ffn_apply)(blk["ffn"], f_in) * g2
    else:
        f_out = ffn_apply(blk["ffn"], f_in) * g2
    if drop_path_mask is not None:
        f_out = f_out * drop_path_mask[1].astype(dtype)
    x = x + f_out
    return x, new_kv


def get_logits(params: dict, cfg: VARConfig, h: jax.Array, cond_bd: jax.Array) -> jax.Array:
    """AdaLN-before-head + classifier head, all fp32 (``var.py:118-124``)."""
    return _linear(params["head"], _head_nm(params, cfg, h, cond_bd))


def _head_nm(params: dict, cfg: VARConfig, h: jax.Array, cond_bd: jax.Array) -> jax.Array:
    hf = h.astype(F32)
    ada = _linear(params["head_nm"]["ada_lin"], jax.nn.silu(cond_bd.astype(F32)))
    ada = ada.reshape(-1, 1, 2, cfg.embed_dim)
    scale, shift = ada[:, :, 0], ada[:, :, 1]
    return _ln(hf, cfg.norm_eps) * (scale + 1.0) + shift


def get_logits_cfg(params: dict, cfg: VARConfig, h_2b: jax.Array,
                   cond_bd_2b: jax.Array, t) -> jax.Array:
    """CFG-mixed logits for a (cond | uncond) doubled batch.

    Exactly equal to ``(1+t)*get_logits(h_c) - t*get_logits(h_u)``
    (``var.py:172-173``) but mixes *before* the classifier head: the head is
    linear and its bias survives since (1+t) - t = 1, so the expensive fp32
    (C x V) matmul runs on B rows instead of 2B."""
    b = h_2b.shape[0] // 2
    nm = _head_nm(params, cfg, h_2b, cond_bd_2b)
    mixed = (1.0 + t) * nm[:b] - t * nm[b:]
    return _linear(params["head"], mixed)


def cond_context(params: dict, cfg: VARConfig, cond_bd: jax.Array, decode: bool = False):
    """Precompute per-forward conditioning (``var.py:165,210``).

    ``decode=True`` hoists every block's AdaLN-6 projection out of the stage
    loop: the class conditioning never changes across a decode's 10 stages,
    so recomputing ada_lin per (stage, block) — 160 small matmuls at d16 —
    is pure waste. Teacher-forced training keeps the lazy per-block form
    (one pass, nothing to reuse; remat re-derives it cheaply)."""
    if cfg.shared_aln:
        gss = _linear(params["shared_ada_lin"], jax.nn.silu(cond_bd.astype(F32)))
        return ("shared", gss.reshape(-1, 1, 6, cfg.embed_dim))
    if decode:
        blocks = params["blocks"]
        h = jax.nn.silu(cond_bd.astype(F32))
        if isinstance(blocks, (list, tuple)):
            p6 = [_linear(b["ada_lin"], h).reshape(-1, 1, 6, cfg.embed_dim)
                  for b in blocks]
        else:  # stacked: one batched einsum over depth
            k = blocks["ada_lin"]["kernel"].astype(F32)  # (depth, C, 6C)
            bias = blocks["ada_lin"]["bias"].astype(F32)  # (depth, 6C)
            p6 = jnp.einsum("bc,dcx->dbx", h, k) + bias[:, None]
            p6 = p6.reshape(k.shape[0], -1, 1, 6, cfg.embed_dim)
        return ("precomp", p6)
    return ("perblock", cond_bd)


def lvl_pos_embed(params: dict, cfg: VARConfig) -> jax.Array:
    """(1, L, C) = scale embedding + absolute positions (``var.py:153``)."""
    lvl = jnp.asarray(level_ids(cfg))
    return jnp.take(params["lvl_embed"], lvl, axis=0)[None] + params["pos_1LC"]


# ---------------------------------------------------------------------------
# teacher-forced forward (training / likelihood scoring)


def var_forward(
    params: dict,
    cfg: VARConfig,
    label_b: jax.Array,
    x_blcv_wo_first_l: Optional[jax.Array],
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    prog_si: int = -1,
    dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    remat=False,
    mesh=None,
) -> jax.Array:
    """Teacher-forced forward (``var.py:192-234``) -> fp32 logits (B, ed, V).

    ``remat`` modes: 0/False off; 1/True rematerializes each WHOLE block in
    backward (activation memory O(1) in depth — the d30/d36 fit knob, ~33%
    extra FLOPs); 2/"attn" checkpoints only the QK-norm+attention core so
    the L x L softmax residuals are recomputed but every matmul's
    activations are stored once (~11% of forward matmul FLOPs re-run —
    the d16-class sweet spot when the weights+activations otherwise fit).

    ``x_blcv_wo_first_l``: (B, L - first_l, Cvae) quantizer-space inputs from
    ``quantizer.idxBl_to_var_input``. ``prog_si`` >= 0 truncates the sequence
    for progressive training (static argument).
    """
    b = label_b.shape[0]
    ed = cfg.seq_len if prog_si < 0 else cfg.begin_ends[prog_si][1]
    if train and cfg.cond_drop_rate > 0:
        assert rng is not None, "training forward needs an rng for cond-drop"
        rng, r_drop = jax.random.split(rng)
        drop = jax.random.uniform(r_drop, (b,)) < cfg.cond_drop_rate
        label_b = jnp.where(drop, cfg.num_classes, label_b)
    cond_bd = jnp.take(params["class_emb"], label_b, axis=0)  # (B, C) fp32
    sos = cond_bd[:, None, :] + params["pos_start"]  # (B, first_l, C)
    sos = jnp.broadcast_to(sos, (b, cfg.first_l, cfg.embed_dim))
    if prog_si == 0:
        x = sos
    else:
        tok = x_blcv_wo_first_l[:, : ed - cfg.first_l].astype(F32)
        x = jnp.concatenate([sos, _linear(params["word_embed"], tok)], axis=1)
    x = x + lvl_pos_embed(params, cfg)[:, :ed]

    # factored mask for BOTH impls: no L x L bias tensor (AD kept a
    # (depth, B, H, L, L) fp32 broadcast of it as a scan residual)
    bias = None
    scale_ends = tuple(e for _, e in cfg.begin_ends)
    ctx = cond_context(params, cfg, cond_bd)
    x = x.astype(dtype)
    blocks = params["blocks"]
    remat_mode = {False: 0, True: 1, "attn": 2}.get(remat, remat)
    if remat_mode == 1:
        # close over non-jax statics (cfg, mask kind, impl); checkpoint only
        # traced operands so backward rematerializes each block
        ctx_kind = None

        @jax.checkpoint
        def _blk_remat(blk, x_, cond_val, dpm):
            return block_apply(blk, cfg, x_, (ctx_kind, cond_val), bias,
                               impl=attn_impl, drop_path_mask=dpm,
                               scale_ends=scale_ends, mesh=mesh)[0]

        def block_fn(blk, cfg_, x_, ctx_, bias_, impl=None, drop_path_mask=None,
                     scale_ends=None, mesh=None):
            nonlocal ctx_kind
            ctx_kind = ctx_[0]
            return _blk_remat(blk, x_, ctx_[1], drop_path_mask), None
    elif remat_mode == 2:
        block_fn = functools.partial(block_apply, attn_remat=True)
    else:
        block_fn = block_apply
    dp_rates = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
    use_dp = train and cfg.drop_path_rate > 0
    if isinstance(blocks, (list, tuple)):  # unrolled path
        for i, blk in enumerate(blocks):
            dp_mask = None
            if use_dp and dp_rates[i] > 0:
                rng, r1, r2 = jax.random.split(rng, 3)
                keep = 1.0 - dp_rates[i]
                m1 = jax.random.bernoulli(r1, keep, (b, 1, 1)).astype(F32) / keep
                m2 = jax.random.bernoulli(r2, keep, (b, 1, 1)).astype(F32) / keep
                dp_mask = (m1, m2)
            x, _ = block_fn(blk, cfg, x, ctx, bias, impl=attn_impl,
                            drop_path_mask=dp_mask, scale_ends=scale_ends,
                            mesh=mesh)
    else:  # stacked params -> lax.scan over depth (compile-time O(1) in depth)
        if use_dp:
            rng, r_dp = jax.random.split(rng)
            keep = jnp.asarray(1.0 - dp_rates, F32).reshape(cfg.depth, 1, 1, 1, 1)
            u = jax.random.uniform(r_dp, (cfg.depth, 2, b, 1, 1))
            dp_masks = (u < keep).astype(F32) / keep  # (depth, 2, B, 1, 1)

            def body(xc, xs):
                blk, dpm = xs
                xc, _ = block_fn(blk, cfg, xc, ctx, bias, impl=attn_impl,
                                 drop_path_mask=(dpm[0], dpm[1]),
                                 scale_ends=scale_ends, mesh=mesh)
                return xc, None

            x, _ = jax.lax.scan(body, x, (blocks, dp_masks))
        else:

            def body(xc, blk):
                xc, _ = block_fn(blk, cfg, xc, ctx, bias, impl=attn_impl,
                                 scale_ends=scale_ends, mesh=mesh)
                return xc, None

            x, _ = jax.lax.scan(body, x, blocks)
    return get_logits(params, cfg, x, cond_bd)


# ---------------------------------------------------------------------------
# stacked blocks + KV-cached stage step (inference)


def stack_block_params(params: dict) -> dict:
    """Convert ``blocks`` from a per-layer list to stacked arrays (leading
    ``depth`` axis) so forward/decode can lax.scan over layers: compile time
    and HLO size become O(1) in depth instead of O(depth)."""
    if not isinstance(params["blocks"], (list, tuple)):
        return params
    out = dict(params)
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *params["blocks"])
    return out


def unstack_block_params(params: dict, depth: int) -> dict:
    if isinstance(params["blocks"], (list, tuple)):
        return params
    out = dict(params)
    out["blocks"] = [jax.tree.map(lambda x: x[i], params["blocks"]) for i in range(depth)]
    return out


def init_caches(cfg: VARConfig, batch: int, dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Empty stacked KV caches: (depth, B, 0, C) x2 — stage steps append
    along the length axis; shapes stay static per decode stage. Heads stay
    merged in storage (see :func:`attn_apply`: a head-split layout pads
    head_dim to the 128-lane tile and doubles cache HBM)."""
    shape = (cfg.depth, batch, 0, cfg.embed_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def init_prealloc_caches(cfg: VARConfig, batch: int, lmax: Optional[int] = None,
                         dtype=jnp.bfloat16):
    """Full-length decode KV caches written in place: (K, V, cum=0) with K, V
    of shape (depth, B, lmax, C). The grow-by-concat alternative keeps the
    old and the grown cache alive simultaneously at every stage boundary and
    fragments the heap (bs96 d16 decode: 6.1G fragmentation, OOM); a single
    preallocated buffer + ``dynamic_update_slice`` is XLA's in-place KV-cache
    pattern and makes decode cache memory exactly 2 x depth x B x L x C."""
    lmax = cfg.seq_len if lmax is None else lmax
    shape = (cfg.depth, batch, lmax, cfg.embed_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), 0


def paired_chunks_ok(cfg: VARConfig, lk: int, attn_impl: str = "auto",
                     mesh=None, batch=None) -> bool:
    """THE serving-envelope predicate for the paired chunked-decode kernel at
    total cache length ``lk``: pallas impl, paired head geometry (head_dim
    64, even head count), a mesh the kernel can shard over ('model'-sharded
    heads stay paired per device), and the VMEM budget at the PER-DEVICE lane
    width (under TP the envelope scales with C/mp). Single source of truth
    for :func:`maybe_concat_chunks` and :func:`window_chunks_viable` — the
    per-stage gate in ``attn_apply`` adds only its stage-local extras
    (``bias is None``, ``l >= 8``) on top of this formula."""
    if attn_impl == "auto":
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if attn_impl != "pallas" or cfg.head_dim * 2 != 128 or cfg.num_heads % 2:
        return False
    from var_tpu.parallel import shard_attn as sa

    c_dev = cfg.embed_dim
    if not sa.mesh_is_trivial(mesh):
        if batch is not None and not sa.paired_mesh_ok(mesh, cfg.num_heads, batch):
            return False
        c_dev = cfg.embed_dim // sa.axis_sizes(mesh)[1]
    return lk <= PAIRED_VMEM_BUDGET // (4 * c_dev)


def maybe_concat_chunks(caches, l_next: int, cfg: VARConfig,
                        attn_impl: str = "auto", mesh=None, batch=None):
    """Leave chunked storage at the first stage the paired kernel cannot
    serve (:func:`paired_chunks_ok`): cache past its VMEM envelope,
    non-paired head geometry, an unshardable mesh geometry, or a non-pallas
    attention impl (the chunked XLA fallback re-joins the chunks per LAYER
    inside the depth scan — depth x the copy traffic of plain concat
    caches). All lengths static -> a compile-time branch; the one-off concat
    equals the cache state the concat representation would hold."""
    if not (isinstance(caches[0], str) and caches[1]):
        return caches
    lk_total = sum(int(k.shape[-2]) for k in caches[1]) + l_next
    if not paired_chunks_ok(cfg, lk_total, attn_impl, mesh, batch):
        return chunks_to_concat(caches)
    return caches


def window_chunks_viable(cfg: VARConfig, kv_window: int, attn_impl: str = "auto",
                         mesh=None, batch=None) -> bool:
    """Can a ``kv_window``-pruned decode keep the chunked cache for the WHOLE
    pyramid? Scale-granular pruning is a tuple slice on the chunk list (no
    kernel change), but mixing representations mid-decode would need the full
    unpruned history the windowed path deliberately never keeps — so the
    choice is made once, up front, with the shared :func:`paired_chunks_ok`
    envelope evaluated at the MAX pruned cache length any stage sees
    (first_l + the kv_window most recent stages)."""
    lens = [pn * pn for pn in cfg.patch_nums]
    max_lk = max(lens[0] + sum(lens[max(1, si - kv_window + 1): si + 1])
                 for si in range(len(lens)))
    return paired_chunks_ok(cfg, max_lk, attn_impl, mesh, batch)


def chunks_to_concat(caches) -> Tuple[jax.Array, jax.Array]:
    """Materialize a chunked cache into the grow-by-concat (K, V) form —
    the decode switches to this representation at the first stage whose
    total cache length leaves the paired kernel's VMEM envelope (long 512px
    stages): the chunked XLA fallback re-joins the chunks per LAYER inside
    the depth scan, which is depth x the copy traffic of concat caches.
    (Measured dead ends at d16 bs128, kept for the record: coalescing small
    chunks to cut kernel operand DMAs lost ~2-4 img/s — the merge copies
    outweigh the DMA savings; block_q=128 lost ~3.)"""
    _, ks, vs = caches
    return jnp.concatenate(ks, axis=2), jnp.concatenate(vs, axis=2)


def transformer_stage(
    params: dict,
    cfg: VARConfig,
    x: jax.Array,
    cond_ctx,
    caches,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    ln_impl: str = "auto",
    mesh=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run all blocks over one scale's token map with KV caching
    (``var.py:166-169``). Three cache representations:

    * grow-by-concat (compat / kv_window pruning): ``caches`` = (K, V) of
      shape (depth, B, Lprev, C) — heads merged, see :func:`init_caches`;
      pass None to start. Returns (x, grown (K, V)).
    * preallocated in-place (latency-bound serving): ``caches`` = (K, V, cum)
      from :func:`init_prealloc_caches`; K, V are full-length buffers updated
      at static offset ``cum``. Returns (x, (K, V, cum + L)).
    * chunked (the decode hot path): ``caches`` = ("chunks", ks, vs) with
      ks/vs tuples of per-stage (depth, B, l_i, C) stacks — pass
      ("chunks", (), ()) to start. Each stage appends the scan's stacked
      new-KV as-is; the paired kernel reads every chunk in place (scalar-
      prefetched layer index), so no cache concat or full-length carry
      exists at any point. Returns (x, ("chunks", ks + new, vs + new)).
    """
    if ln_impl == "auto":  # fused pallas LN on real TPUs, XLA elsewhere
        ln_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if attn_impl == "auto":  # paired-head pallas decode attention on TPUs
        attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    x = x.astype(dtype)
    if caches is None:
        caches = init_caches(cfg, x.shape[0], dtype)
    blocks = params["blocks"]
    precomp = cond_ctx[1] if cond_ctx[0] == "precomp" else None
    l = x.shape[1]
    if isinstance(caches[0], str):  # chunked path: ("chunks", ks, vs)
        _, cks, cvs = caches
        if isinstance(blocks, (list, tuple)):
            new_k, new_v = [], []
            for i, blk in enumerate(blocks):
                ctx_i = ("precomp", precomp[i]) if precomp is not None else cond_ctx
                x, kv = block_apply(blk, cfg, x, ctx_i, bias=None,
                                    cache_kv=("chunks", cks, cvs, i),
                                    impl=attn_impl, ln_impl=ln_impl, mesh=mesh)
                new_k.append(kv[0])
                new_v.append(kv[1])
            knew, vnew = jnp.stack(new_k), jnp.stack(new_v)
        else:

            def body(xc, xs):
                blk, i, p6i = xs
                ctx_i = ("precomp", p6i) if p6i is not None else cond_ctx
                xc, kv = block_apply(blk, cfg, xc, ctx_i, bias=None,
                                     cache_kv=("chunks", cks, cvs, i),
                                     impl=attn_impl, ln_impl=ln_impl, mesh=mesh)
                return xc, kv

            idxs = jnp.arange(cfg.depth)
            x, (knew, vnew) = jax.lax.scan(body, x, (blocks, idxs, precomp))
        return x, ("chunks", (*cks, knew), (*cvs, vnew))
    if len(caches) == 3:  # preallocated in-place path
        ck, cv, cum = caches
        if isinstance(blocks, (list, tuple)):
            for i, blk in enumerate(blocks):
                ctx_i = ("precomp", precomp[i]) if precomp is not None else cond_ctx
                x, (ck, cv) = block_apply(blk, cfg, x, ctx_i, bias=None,
                                          cache_kv=(ck, cv, i, cum), impl=attn_impl, ln_impl=ln_impl, mesh=mesh)
        else:

            def body(carry, xs):
                xc, ckc, cvc = carry
                blk, i, p6i = xs
                ctx_i = ("precomp", p6i) if p6i is not None else cond_ctx
                xc, (ckc, cvc) = block_apply(blk, cfg, xc, ctx_i, bias=None,
                                             cache_kv=(ckc, cvc, i, cum), impl=attn_impl, ln_impl=ln_impl, mesh=mesh)
                return (xc, ckc, cvc), None

            idxs = jnp.arange(cfg.depth)
            (x, ck, cv), _ = jax.lax.scan(body, (x, ck, cv), (blocks, idxs, precomp))
        return x, (ck, cv, cum + l)
    ck, cv = caches
    if isinstance(blocks, (list, tuple)):  # unrolled path
        new_k, new_v = [], []
        for i, blk in enumerate(blocks):
            ctx_i = ("precomp", precomp[i]) if precomp is not None else cond_ctx
            x, kv = block_apply(blk, cfg, x, ctx_i, bias=None,
                                cache_kv=(ck[i], cv[i]), impl=attn_impl, ln_impl=ln_impl, mesh=mesh)
            new_k.append(kv[0])
            new_v.append(kv[1])
        knew = jnp.stack(new_k)
        vnew = jnp.stack(new_v)
    else:  # scan path

        def body(xc, xs):
            blk, cki, cvi, p6i = xs
            ctx_i = ("precomp", p6i) if p6i is not None else cond_ctx
            xc, kv = block_apply(blk, cfg, xc, ctx_i, bias=None,
                                 cache_kv=(cki, cvi), impl=attn_impl, ln_impl=ln_impl, mesh=mesh)
            return xc, kv

        x, (knew, vnew) = jax.lax.scan(body, x, (blocks, ck, cv, precomp))
    return x, (jnp.concatenate([ck, knew], axis=2), jnp.concatenate([cv, vnew], axis=2))
