"""Inpainting / outpainting / box-editing driver (reference ``inpainting.py``
and the zero-shot-edit notebook).

Per input image: tokenize with the frozen VAE, build a keep-mask, decode with
ground truth forced at kept positions, save original + result PNGs.

Mask recipes:
* ``--keep_through K``  — keep scales 0..K, regenerate the rest (default 6,
  the fork's recipe, inpainting.py:347-348).
* ``--target_layer T --patches "i,j;i,j"``  — patch masks at scale T
  propagated to later scales (inpainting.py:48-100); ``--reverse`` flips.
* ``--box "y0,x0,y1,x1"``  — embedding-space spatial box editing
  (notebook ``get_edit_mask``/``replace_embedding``); ``--outpaint`` keeps
  only the box.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--vae_ckpt", default="vae_ch160v4096z32.pth")
    p.add_argument("--var_ckpt", default="")
    p.add_argument("--pn", default="1_2_3_4_5_6_8_10_13_16")
    p.add_argument("--data_path", required=True, help="folder of class subdirs")
    p.add_argument("--out_dir", default="inpaint_out")
    p.add_argument("--cfg", type=float, default=4.0)
    p.add_argument("--top_k", type=int, default=1)  # inpainting.py:351 uses top_k=1
    p.add_argument("--top_p", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--label", type=int, default=-1, help="-1: use folder label")
    p.add_argument("--keep_through", type=int, default=6)
    p.add_argument("--target_layer", type=int, default=-1)
    p.add_argument("--patches", default="", help='e.g. "2,3;4,1"')
    p.add_argument("--reverse", action="store_true")
    p.add_argument("--box", default="", help='"y0,x0,y1,x1" in [0,1] -> edit-mask mode')
    p.add_argument("--outpaint", action="store_true")
    p.add_argument("--limit", type=int, default=10)
    args = p.parse_args(argv)

    import jax

    if os.environ.get("VAR_TPU_FORCE_CPU"):  # same knob as train.py
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from var_tpu.apps.masks import generate_inpainting_mask, get_edit_mask, keep_scales_mask
    from var_tpu.config import parse_patch_nums
    from var_tpu.data.imagenet import FolderDataset, make_transform
    from var_tpu.engine.sampler import decode_cfg
    from var_tpu.models import build_vae_var, vae as vae_mod

    pns = parse_patch_nums(args.pn)
    vae_cfg, var_cfg, vae_params, var_params = build_vae_var(
        patch_nums=pns, depth=args.depth,
        vae_ckpt=args.vae_ckpt if os.path.exists(args.vae_ckpt) else None,
        var_ckpt=args.var_ckpt if os.path.exists(args.var_ckpt) else None,
    )
    reso = pns[-1] * vae_cfg.downsample
    tf = make_transform(reso, train=False)
    ds = FolderDataset(args.data_path)
    os.makedirs(args.out_dir, exist_ok=True)

    dtype = jnp.float32 if jax.devices()[0].platform == "cpu" else jnp.bfloat16
    edit_mask = None
    keep = None
    if args.box:
        y0, x0, y1, x1 = [float(v) for v in args.box.split(",")]
        edit_mask = jnp.asarray(get_edit_mask(pns, y0, x0, y1, x1,
                                              inpainting=not args.outpaint))
    elif args.target_layer >= 0:
        coords = [tuple(int(v) for v in c.split(",")) for c in args.patches.split(";") if c]
        keep = generate_inpainting_mask(pns, args.target_layer, coords, args.reverse)
    else:
        keep = keep_scales_mask(pns, args.keep_through)

    fn = jax.jit(lambda vp, ve, rng, lab, gt, km, em: decode_cfg(
        vp, ve, var_cfg, vae_cfg, rng, lab, cfg_scale=args.cfg, top_k=args.top_k,
        top_p=args.top_p, dtype=dtype, gt_tokens=gt, keep_mask=km, edit_mask=em))
    tokenize = jax.jit(lambda ve, img: jnp.concatenate(
        vae_mod.img_to_idxBl(ve, vae_cfg, img), axis=1))

    rng_np = np.random.default_rng(args.seed)
    for idx in range(min(args.limit, len(ds))):
        path, label = ds.samples[idx]
        img = jnp.asarray(tf(path, rng_np))[None]
        gt = tokenize(vae_params, img)
        lab = jnp.asarray([args.label if args.label >= 0 else label], jnp.int32)
        km = jnp.asarray(keep)[None] if keep is not None else jnp.ones_like(gt, bool)
        res = fn(var_params, vae_params, jax.random.PRNGKey(args.seed + idx),
                 lab, gt, km, edit_mask)
        out = np.clip(np.asarray(res.image[0]) * 255, 0, 255).astype(np.uint8)
        orig = np.clip((np.asarray(img[0]) * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(orig).save(os.path.join(args.out_dir, f"{idx}_original.png"))
        Image.fromarray(out).save(os.path.join(args.out_dir, f"{idx}_inpainted_{int(lab[0])}.png"))
        print(f"[{idx}] label={int(lab[0])} saved")


if __name__ == "__main__":
    main()
