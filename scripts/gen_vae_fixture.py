"""Generate VQVAE parity fixtures from the reference implementation.

Runs the reference VQVAE (torch, CPU) with seeded random weights on a tiny
config and records state_dict + inputs + tokenization/reconstruction outputs
to ``tests/fixtures/vae_tiny.npz``. Tests then convert the state_dict with
``var_tpu.engine.convert.convert_vae`` and compare outputs — token-for-token
for idxBl, numeric tolerance for f_hat/recon.

Run once on the host (requires /root/reference):
    python scripts/gen_vae_fixture.py
The resulting npz is committed; tests never import the reference.
"""

import os
import sys

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib
import types

import numpy as np
import torch

# import reference models.vqvae without running models/__init__.py (whose
# var.py import is broken under this torch version: `torch.Optional`)
_pkg = types.ModuleType("models")
_pkg.__path__ = ["/root/reference/models"]
sys.modules.setdefault("models", _pkg)
VQVAE = importlib.import_module("models.vqvae").VQVAE  # reference

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures", "vae_tiny.npz")

PATCH_NUMS = (1, 2, 3, 4)  # last=4 -> input 64x64 with f16 downsample


def main():
    torch.manual_seed(0)
    vae = VQVAE(
        vocab_size=64, z_channels=8, ch=32, test_mode=True,
        share_quant_resi=4, v_patch_nums=PATCH_NUMS,
    ).eval()
    # re-randomize the codebook away from default N(0,1) extremes
    torch.manual_seed(1)
    with torch.no_grad():
        vae.quantize.embedding.weight.normal_(0, 0.5)
    # round weights to fp16 and reload so the committed fp16 state_dict is
    # bit-exact with the weights that produced the fixture outputs
    sd16 = {k: v.half().float() for k, v in vae.state_dict().items()}
    vae.load_state_dict(sd16)

    g = torch.Generator().manual_seed(2)
    img = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1

    with torch.no_grad():
        idx_bl = vae.img_to_idxBl(img)
        f = vae.quant_conv(vae.encoder(img))
        fhats = vae.quantize.f_to_idxBl_or_fhat(f, to_fhat=True)
        recon = vae.img_to_reconstructed_img(img, last_one=True)
        # teacher-forcing input for the VAR training path (quant.py:169-184)
        var_input = vae.quantize.idxBl_to_var_input(idx_bl)
        # decode-loop step outputs at each scale (quant.py:187-196)
        f_hat_step = torch.zeros(2, 8, PATCH_NUMS[-1], PATCH_NUMS[-1])
        step_fhats, step_next = [], []
        for si, pn in enumerate(PATCH_NUMS):
            h = vae.quantize.embedding(idx_bl[si]).transpose(1, 2).reshape(2, 8, pn, pn)
            f_hat_step, nxt = vae.quantize.get_next_autoregressive_input(
                si, len(PATCH_NUMS), f_hat_step, h
            )
            step_fhats.append(f_hat_step.clone())
            step_next.append(nxt.clone())

    out = {
        "img": img.numpy(),
        "f": f.numpy(),
        "f_hat_final": fhats[-1].numpy(),
        "recon": recon.numpy(),
        "var_input": var_input.numpy(),
        "patch_nums": np.array(PATCH_NUMS),
    }
    for si, idx in enumerate(idx_bl):
        out[f"idx_{si}"] = idx.numpy()
    for si in range(len(PATCH_NUMS)):
        out[f"step_fhat_{si}"] = step_fhats[si].numpy()
        out[f"step_next_{si}"] = step_next[si].numpy()
    for k, v in vae.state_dict().items():
        out[f"sd/{k}"] = v.half().numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB), tokens per scale:",
          [tuple(i.shape) for i in idx_bl])


if __name__ == "__main__":
    main()
