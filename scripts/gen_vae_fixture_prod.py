"""Generate the PRODUCTION-SHAPE VQVAE parity fixture.

Full 10-scale 256px pyramid (1..16), V=4096, Cvae=32, ch=160 — the real
tokenizer geometry, exercising the compounding non-integer area (16->13,
16->10, ...) and bicubic (13->16, ...) resizes inside the residual loop
(reference hot path ``models/quant.py:135-166``).

Weights are synthesized deterministically per tensor name/shape
(tests/synth_weights.py) and NOT stored; only the key/shape manifest plus
inputs and reference outputs go into ``tests/fixtures/vae_prod.npz``.

Run once on the host (requires /root/reference + torch):
    python scripts/gen_vae_fixture_prod.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib
import types

import numpy as np
import torch

from tests.synth_weights import synth_state_dict

_pkg = types.ModuleType("models")
_pkg.__path__ = ["/root/reference/models"]
sys.modules.setdefault("models", _pkg)
VQVAE = importlib.import_module("models.vqvae").VQVAE  # reference

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "vae_prod.npz")

PATCH_NUMS = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)


def main():
    torch.manual_seed(0)
    vae = VQVAE(vocab_size=4096, z_channels=32, ch=160, test_mode=True,
                share_quant_resi=4, v_patch_nums=PATCH_NUMS).eval()
    keys_shapes = [(k, list(v.shape)) for k, v in vae.state_dict().items()]
    sd = {k: torch.from_numpy(v) for k, v in synth_state_dict(keys_shapes).items()}
    vae.load_state_dict(sd)

    g = torch.Generator().manual_seed(2)
    img = torch.rand((2, 3, 256, 256), generator=g) * 2 - 1

    with torch.no_grad():
        f = vae.quant_conv(vae.encoder(img))
        idx_bl = vae.img_to_idxBl(img)
        fhats = vae.quantize.f_to_idxBl_or_fhat(f, to_fhat=True)
        recon = vae.img_to_reconstructed_img(img, last_one=True)
        var_input = vae.quantize.idxBl_to_var_input(idx_bl)
        f_hat_step = torch.zeros(2, 32, PATCH_NUMS[-1], PATCH_NUMS[-1])
        step_fhats, step_next = [], []
        for si, pn in enumerate(PATCH_NUMS):
            h = vae.quantize.embedding(idx_bl[si]).transpose(1, 2).reshape(2, 32, pn, pn)
            f_hat_step, nxt = vae.quantize.get_next_autoregressive_input(
                si, len(PATCH_NUMS), f_hat_step, h)
            step_fhats.append(f_hat_step.clone())
            step_next.append(nxt.clone())

    out = {
        "img": img.numpy(),
        "f": f.numpy(),
        "f_hat_final": fhats[-1].numpy(),
        "recon": recon.numpy(),
        "var_input": var_input.numpy(),
        "patch_nums": np.array(PATCH_NUMS),
        "keys_shapes_json": np.frombuffer(
            json.dumps(keys_shapes).encode(), dtype=np.uint8),
    }
    for si, idx in enumerate(idx_bl):
        out[f"idx_{si}"] = idx.numpy().astype(np.int32)
    for si in range(len(PATCH_NUMS)):
        out[f"step_fhat_{si}"] = step_fhats[si].numpy()
        out[f"step_next_{si}"] = step_next[si].numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    uniq = [int(np.unique(i.numpy()).size) for i in idx_bl]
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB); "
          f"tokens/scale {[tuple(i.shape) for i in idx_bl]}; unique/scale {uniq}")


if __name__ == "__main__":
    main()
