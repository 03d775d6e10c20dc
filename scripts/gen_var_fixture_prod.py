"""Generate the PRODUCTION-GEOMETRY VAR parity fixture.

d16 geometry — C=1024, 16 heads (head_dim 64), attn_l2_norm, V=4096,
Cvae=32, full 10-scale 256px pyramid (L=680) — at depth 2: exactly the
shapes where the merged-head KV caches, the paired-head decode kernel and
``get_logits_cfg`` pre-head CFG mixing operate (reference hot path
``models/var.py:126-234``). Depth is 2 because parity is per-block; the
stacked-scan depth handling is covered elsewhere.

Weights are synthesized deterministically per (name, shape)
(tests/synth_weights.py) and NOT stored; the fixture records the parameter
manifest, inputs, teacher-forced logits (fp16) and the greedy (top_k=1)
CFG decode token trajectory + final f_hat. Greedy decode tokens are
captured by wrapping the reference's sampling helper; the generation
asserts a healthy argmax margin so parity testing is robust to last-bit
float divergence.

Run once on the host (requires /root/reference + torch):
    python scripts/gen_var_fixture_prod.py
"""

import json
import os
import sys
import typing

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib
import types

import numpy as np
import torch

from tests.synth_weights import synth_state_dict

torch.Optional = typing.Optional  # reference var.py uses torch.Optional annotations

_pkg = types.ModuleType("models")
_pkg.__path__ = ["/root/reference/models"]
sys.modules.setdefault("models", _pkg)
VQVAE = importlib.import_module("models.vqvae").VQVAE
ref_var_mod = importlib.import_module("models.var")
VAR = ref_var_mod.VAR

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "var_prod.npz")

PATCH_NUMS = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
DEPTH, WIDTH, HEADS, NCLS = 2, 1024, 16, 1000


def main():
    torch.manual_seed(0)
    vae = VQVAE(vocab_size=4096, z_channels=32, ch=160, test_mode=True,
                share_quant_resi=4, v_patch_nums=PATCH_NUMS).eval()
    vae_keys_shapes = [(k, list(v.shape)) for k, v in vae.state_dict().items()]
    vae.load_state_dict({k: torch.from_numpy(v) for k, v in
                         synth_state_dict(vae_keys_shapes).items()})

    torch.manual_seed(1)
    var = VAR(vae_local=vae, num_classes=NCLS, depth=DEPTH, embed_dim=WIDTH,
              num_heads=HEADS, drop_rate=0.0, attn_drop_rate=0.0,
              drop_path_rate=0.0, norm_eps=1e-6, shared_aln=False,
              cond_drop_rate=0.0, attn_l2_norm=True, patch_nums=PATCH_NUMS,
              flash_if_available=False, fused_if_available=False).eval()
    # parameters only — buffers (lvl_1L, attn_bias_for_masking, zero_k_bias)
    # are derived and must keep their constructed values
    var_keys_shapes = [(f"var/{k}", list(v.shape)) for k, v in var.named_parameters()]
    synth = synth_state_dict(var_keys_shapes)
    var.load_state_dict({k[len("var/"):]: torch.from_numpy(v)
                         for k, v in synth.items()}, strict=False)

    g = torch.Generator().manual_seed(2)
    img = torch.rand((1, 3, 256, 256), generator=g) * 2 - 1
    label = torch.tensor([567])
    with torch.no_grad():
        idx_bl = vae.img_to_idxBl(img)
        x_in = vae.quantize.idxBl_to_var_input(idx_bl)
        logits = var(label, x_in)

    # greedy CFG decode: capture the per-stage sampled tokens + argmax margin
    captured, margins = [], []
    orig_sample = ref_var_mod.sample_with_top_k_top_p_

    def capture(logits_blv, **kw):
        # margin BEFORE sampling: the reference helper masks logits in place
        top2 = torch.topk(logits_blv, 2, dim=-1).values
        margins.append(float((top2[..., 0] - top2[..., 1]).min()))
        idx = orig_sample(logits_blv, **kw)
        captured.append(idx[:, :, 0].clone())
        return idx

    ref_var_mod.sample_with_top_k_top_p_ = capture
    # pick the label pair whose whole greedy trajectory has the largest
    # worst-case argmax margin: parity must survive ~1e-5 fp32 reduction
    # differences between torch and XLA at every one of the 1360 draws
    best = None
    for labels in ([567, 980], [33, 421], [110, 747], [880, 5], [250, 603]):
        captured.clear()
        margins.clear()
        dec_label = torch.tensor(labels)
        with torch.no_grad():
            var.autoregressive_infer_cfg(B=2, label_B=dec_label, g_seed=0,
                                         cfg=1.5, top_k=1, top_p=0.0)
        mm = min(margins)
        print(f"labels {labels}: greedy min margin {mm:.6f}")
        if best is None or mm > best[0]:
            best = (mm, labels, torch.cat(captured, dim=1))
    ref_var_mod.sample_with_top_k_top_p_ = orig_sample
    min_margin, dec_label_list, tokens = best
    dec_label = torch.tensor(dec_label_list)
    assert tokens.shape == (2, sum(p * p for p in PATCH_NUMS))
    # robust greedy parity needs a non-degenerate argmax gap everywhere
    assert min_margin > 1e-4, f"greedy argmax margin too small: {min_margin}"

    # final f_hat from the captured tokens through the quantizer (the decode
    # image itself is VQVAE-decoder territory, covered by vae_prod.npz)
    with torch.no_grad():
        f_hat = torch.zeros(2, 32, PATCH_NUMS[-1], PATCH_NUMS[-1])
        cur = 0
        for si, pn in enumerate(PATCH_NUMS):
            seg = tokens[:, cur:cur + pn * pn]
            h = vae.quantize.embedding(seg).transpose(1, 2).reshape(2, 32, pn, pn)
            f_hat, _ = vae.quantize.get_next_autoregressive_input(
                si, len(PATCH_NUMS), f_hat, h)
            cur += pn * pn

    out = {
        "patch_nums": np.array(PATCH_NUMS),
        "depth_width_heads_ncls": np.array([DEPTH, WIDTH, HEADS, NCLS]),
        "img": img.numpy().astype(np.float16),
        "label": label.numpy(),
        "gt_BL": torch.cat(idx_bl, 1).numpy().astype(np.int32),
        "var_input": x_in.numpy(),
        "logits_f16": logits.numpy().astype(np.float16),
        "dec_label": dec_label.numpy(),
        "dec_tokens": tokens.numpy().astype(np.int32),
        "dec_fhat": f_hat.numpy(),
        "min_margin": np.float32(min_margin),
        "vae_keys_shapes_json": np.frombuffer(
            json.dumps(vae_keys_shapes).encode(), dtype=np.uint8),
        "var_keys_shapes_json": np.frombuffer(
            json.dumps(var_keys_shapes).encode(), dtype=np.uint8),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB); "
          f"logits std {float(logits.std()):.3f}; greedy min margin {min_margin:.4f}; "
          f"unique decode tokens {int(np.unique(tokens.numpy()).size)}")


if __name__ == "__main__":
    main()
