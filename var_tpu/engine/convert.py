"""Torch checkpoint -> JAX param-pytree converters.

Imports the published reference checkpoints (``vae_ch160v4096z32.pth``,
``var_d{16,20,24,30,36}.pth`` — README.md:96, train.py:93-98) and any
torch state_dict produced by the reference model classes, for parity
testing and weight reuse.

Key layout translations:
* Conv2d weight (O, I, kh, kw) -> HWIO (kh, kw, I, O)
* Linear weight (O, I)         -> (I, O)
* GroupNorm/LayerNorm weight/bias -> scale/bias

Torch is imported lazily (only needed to *read* ``.pth`` files; conversion
itself operates on numpy arrays).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.models.quantizer import num_phi


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth`` into {name: float32/int64 numpy array}."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "trainer" in obj:  # full training ckpt (train.py:222-227)
        obj = obj["trainer"]["var_wo_ddp"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def to_numpy_state_dict(sd) -> Dict[str, np.ndarray]:
    """Accept a torch state_dict or {str: ndarray} and return numpy copies.
    Already-numpy dicts are returned unchanged (no full-checkpoint copy)."""
    if all(isinstance(v, np.ndarray) for v in sd.values()):
        return sd
    out = {}
    for k, v in sd.items():
        out[k] = v if isinstance(v, np.ndarray) else v.detach().cpu().numpy()
    return out


def _conv(sd, prefix) -> dict:
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _norm(sd, prefix) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _linear(sd, prefix) -> dict:
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _resblock(sd, prefix) -> dict:
    p = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return p


def _attnblock(sd, prefix) -> dict:
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "qkv": _conv(sd, f"{prefix}.qkv"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }


def _enc_dec(sd, cfg: VAEConfig, side: str) -> dict:
    nres = len(cfg.ch_mult)
    nblk = cfg.num_res_blocks if side == "encoder" else cfg.num_res_blocks + 1
    levels_key = "down" if side == "encoder" else "up"
    p: dict = {"conv_in": _conv(sd, f"{side}.conv_in")}
    levels = []
    for i in range(nres):
        level: dict = {"block": [], "attn": []}
        for j in range(nblk):
            level["block"].append(_resblock(sd, f"{side}.{levels_key}.{i}.block.{j}"))
            if f"{side}.{levels_key}.{i}.attn.{j}.norm.weight" in sd:
                level["attn"].append(_attnblock(sd, f"{side}.{levels_key}.{i}.attn.{j}"))
        resample = "downsample" if side == "encoder" else "upsample"
        if f"{side}.{levels_key}.{i}.{resample}.conv.weight" in sd:
            level[resample] = {"conv": _conv(sd, f"{side}.{levels_key}.{i}.{resample}.conv")}
        levels.append(level)
    p[levels_key] = levels
    p["mid"] = {
        "block_1": _resblock(sd, f"{side}.mid.block_1"),
        "block_2": _resblock(sd, f"{side}.mid.block_2"),
    }
    if f"{side}.mid.attn_1.norm.weight" in sd:
        p["mid"]["attn_1"] = _attnblock(sd, f"{side}.mid.attn_1")
    else:
        p["mid"]["attn_1"] = {}
    p["norm_out"] = _norm(sd, f"{side}.norm_out")
    p["conv_out"] = _conv(sd, f"{side}.conv_out")
    return p


def convert_vae(sd, cfg: VAEConfig) -> dict:
    """Reference VQVAE state_dict -> var_tpu VAE param pytree."""
    sd = to_numpy_state_dict(sd)
    phis = []
    for k in range(num_phi(cfg)):
        if cfg.share_quant_resi == 0:
            prefix = f"quantize.quant_resi.{k}"
        elif cfg.share_quant_resi == 1:
            prefix = "quantize.quant_resi.qresi"
        else:
            prefix = f"quantize.quant_resi.qresi_ls.{k}"
        phis.append(_conv(sd, prefix))
    return {
        "encoder": _enc_dec(sd, cfg, "encoder"),
        "decoder": _enc_dec(sd, cfg, "decoder"),
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "quantize": {"embedding": sd["quantize.embedding.weight"], "phi": phis},
    }


def convert_var(sd, cfg: VARConfig) -> dict:
    """Reference VAR state_dict -> var_tpu VAR param pytree.

    Reference modules (``models/var.py:55-116``, ``models/basic_var.py``):
    word_embed (Linear), class_emb, pos_start, pos_1LC, lvl_embed,
    shared_ada_lin (if shared_aln), per-block {ada_lin | ada_gss},
    attn {mat_qkv, q_bias, v_bias, scale_mul_1H11?, proj}, ffn {fc1, fc2},
    head_nm.ada_lin, head.
    """
    sd = to_numpy_state_dict(sd)
    p: dict = {
        "word_embed": _linear(sd, "word_embed"),
        "class_emb": sd["class_emb.weight"],
        "pos_start": sd["pos_start"],
        "pos_1LC": sd["pos_1LC"],
        "lvl_embed": sd["lvl_embed.weight"],
        "head_nm": {"ada_lin": _linear(sd, "head_nm.ada_lin.1")},
        "head": _linear(sd, "head"),
    }
    if cfg.shared_aln:
        p["shared_ada_lin"] = _linear(sd, "shared_ada_lin.1")
    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        blk: dict = {
            "attn": {
                "qkv": {"kernel": np.ascontiguousarray(sd[f"{pre}.attn.mat_qkv.weight"].T)},
                "q_bias": sd[f"{pre}.attn.q_bias"],
                "v_bias": sd[f"{pre}.attn.v_bias"],
                "proj": _linear(sd, f"{pre}.attn.proj"),
            },
            "ffn": {"fc1": _linear(sd, f"{pre}.ffn.fc1"), "fc2": _linear(sd, f"{pre}.ffn.fc2")},
        }
        if cfg.attn_l2_norm:
            blk["attn"]["scale_mul"] = sd[f"{pre}.attn.scale_mul_1H11"].reshape(1, 1, cfg.num_heads, 1)
        if cfg.shared_aln:
            blk["ada_gss"] = sd[f"{pre}.ada_gss"]
        else:
            blk["ada_lin"] = _linear(sd, f"{pre}.ada_lin.1")
        blocks.append(blk)
    p["blocks"] = blocks
    return p


def export_var_to_torch_names(params: dict, cfg: VARConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_var` — emit reference-named numpy arrays so
    checkpoints trained here can be consumed by torch-side tooling."""
    from var_tpu.models.var import unstack_block_params

    params = unstack_block_params(params, cfg.depth)
    out: Dict[str, np.ndarray] = {}

    def put(name, arr):
        out[name] = np.asarray(arr)

    put("word_embed.weight", np.asarray(params["word_embed"]["kernel"]).T)
    put("word_embed.bias", params["word_embed"]["bias"])
    put("class_emb.weight", params["class_emb"])
    put("pos_start", params["pos_start"])
    put("pos_1LC", params["pos_1LC"])
    put("lvl_embed.weight", params["lvl_embed"])
    put("head_nm.ada_lin.1.weight", np.asarray(params["head_nm"]["ada_lin"]["kernel"]).T)
    put("head_nm.ada_lin.1.bias", params["head_nm"]["ada_lin"]["bias"])
    put("head.weight", np.asarray(params["head"]["kernel"]).T)
    put("head.bias", params["head"]["bias"])
    if cfg.shared_aln:
        put("shared_ada_lin.1.weight", np.asarray(params["shared_ada_lin"]["kernel"]).T)
        put("shared_ada_lin.1.bias", params["shared_ada_lin"]["bias"])
    for i, blk in enumerate(params["blocks"]):
        pre = f"blocks.{i}"
        put(f"{pre}.attn.mat_qkv.weight", np.asarray(blk["attn"]["qkv"]["kernel"]).T)
        put(f"{pre}.attn.q_bias", blk["attn"]["q_bias"])
        put(f"{pre}.attn.v_bias", blk["attn"]["v_bias"])
        put(f"{pre}.attn.zero_k_bias", np.zeros_like(np.asarray(blk["attn"]["q_bias"])))
        put(f"{pre}.attn.proj.weight", np.asarray(blk["attn"]["proj"]["kernel"]).T)
        put(f"{pre}.attn.proj.bias", blk["attn"]["proj"]["bias"])
        put(f"{pre}.ffn.fc1.weight", np.asarray(blk["ffn"]["fc1"]["kernel"]).T)
        put(f"{pre}.ffn.fc1.bias", blk["ffn"]["fc1"]["bias"])
        put(f"{pre}.ffn.fc2.weight", np.asarray(blk["ffn"]["fc2"]["kernel"]).T)
        put(f"{pre}.ffn.fc2.bias", blk["ffn"]["fc2"]["bias"])
        if cfg.attn_l2_norm:
            put(f"{pre}.attn.scale_mul_1H11", np.asarray(blk["attn"]["scale_mul"]).reshape(1, cfg.num_heads, 1, 1))
        if cfg.shared_aln:
            put(f"{pre}.ada_gss", blk["ada_gss"])
        else:
            put(f"{pre}.ada_lin.1.weight", np.asarray(blk["ada_lin"]["kernel"]).T)
            put(f"{pre}.ada_lin.1.bias", blk["ada_lin"]["bias"])
    return out
