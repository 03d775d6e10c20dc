"""Generate VAR-transformer parity fixtures from the reference implementation.

Builds reference VAR models (torch, CPU, seeded random weights, fp16-rounded)
on a tiny config and records, for both the default (attn_l2_norm) and the
shared-AdaLN variants:

* state_dict
* teacher-forced forward logits (cond_drop disabled; ``var.py:192-234``)
* greedy (top_k=1) CFG decode token trajectory + final f_hat + image
  (``var.py:126-190``) — greedy removes RNG-stream divergence so tokens must
  match exactly.

Output: tests/fixtures/var_tiny.npz. Run: python scripts/gen_var_fixture.py
"""

import os
import sys
import typing

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib
import types

import numpy as np
import torch

torch.Optional = typing.Optional  # reference var.py uses torch.Optional annotations

_pkg = types.ModuleType("models")
_pkg.__path__ = ["/root/reference/models"]
sys.modules.setdefault("models", _pkg)
VQVAE = importlib.import_module("models.vqvae").VQVAE
VAR = importlib.import_module("models.var").VAR

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures", "var_tiny.npz"
)

PATCH_NUMS = (1, 2, 3, 4)
DEPTH, WIDTH, HEADS, NCLS = 3, 64, 4, 10
B = 2


def round_fp16(model):
    sd = {k: v.half().float() for k, v in model.state_dict().items()}
    model.load_state_dict(sd)
    return {k: v.half().numpy() for k, v in model.state_dict().items()}


def build_vae():
    torch.manual_seed(0)
    vae = VQVAE(vocab_size=64, z_channels=8, ch=32, test_mode=True,
                share_quant_resi=4, v_patch_nums=PATCH_NUMS).eval()
    with torch.no_grad():
        vae.quantize.embedding.weight.normal_(0, 0.5)
    return vae


def build(vae, shared_aln: bool, seed: int):
    torch.manual_seed(seed)
    var = VAR(
        vae_local=vae, num_classes=NCLS, depth=DEPTH, embed_dim=WIDTH, num_heads=HEADS,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.1,
        norm_eps=1e-6, shared_aln=shared_aln, cond_drop_rate=0.0,
        attn_l2_norm=not shared_aln, patch_nums=PATCH_NUMS,
        flash_if_available=False, fused_if_available=False,
    ).eval()
    var.init_weights(init_adaln=0.5, init_adaln_gamma=1e-3, init_head=0.02, init_std=-1)
    # make the heads non-degenerate so greedy decode isn't all-ties
    torch.manual_seed(seed + 100)
    with torch.no_grad():
        var.head.weight.normal_(0, 0.05)
        var.head.bias.normal_(0, 0.05)
    return var


def main():
    out = {"patch_nums": np.array(PATCH_NUMS)}
    vae = build_vae()
    for k, v in round_fp16(vae).items():
        out[f"vae_sd/{k}"] = v
    for tag, shared in (("l2", False), ("saln", True)):
        var = build(vae, shared, seed=2 if shared else 1)
        var_sd = round_fp16(var)

        g = torch.Generator().manual_seed(3)
        img = torch.rand((B, 3, 64, 64), generator=g) * 2 - 1
        label = torch.tensor([1, 7])
        with torch.no_grad():
            gt_idx = vae.img_to_idxBl(img)
            x_in = vae.quantize.idxBl_to_var_input(gt_idx)
            logits = var(label, x_in)
            # greedy CFG decode trajectory
            dec_img = var.autoregressive_infer_cfg(B=B, label_B=label, g_seed=0,
                                                   cfg=1.5, top_k=1, top_p=0.0)

        out[f"{tag}/img"] = img.numpy()
        out[f"{tag}/label"] = label.numpy()
        out[f"{tag}/gt_BL"] = torch.cat(gt_idx, 1).numpy()
        out[f"{tag}/var_input"] = x_in.numpy()
        out[f"{tag}/logits"] = logits.numpy()
        out[f"{tag}/dec_img"] = dec_img.numpy()
        for k, v in var_sd.items():
            out[f"{tag}/var_sd/{k}"] = v

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
