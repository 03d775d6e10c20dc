"""Smooth-sampling driver (reference ``smoothing.py``).

Per image: tokenize, regenerate constrained to codebook neighbors of the
ground-truth tokens (``smooth_sampling``), save the result and log the model
and distance log-likelihoods (smoothing.py:352-369).
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
    p.add_argument("--data_path", required=True)
    p.add_argument("--out_dir", default="smooth_out")
    p.add_argument("--cfg", type=float, default=1.5)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--threshold", type=float, default=None,
                   help="L2 neighbor threshold; None = candidate-count mode")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--label", type=int, default=-1)
    p.add_argument("--limit", type=int, default=10)
    args = p.parse_args(argv)

    import jax

    if os.environ.get("VAR_TPU_FORCE_CPU"):  # same knob as train.py
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from var_tpu.config import parse_patch_nums
    from var_tpu.data.imagenet import FolderDataset, make_transform
    from var_tpu.engine.sampler import smooth_sampling
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

    fn = jax.jit(lambda vp, ve, gt, lab: smooth_sampling(
        vp, ve, var_cfg, vae_cfg, gt, n=args.n, label_b=lab, cfg_scale=args.cfg,
        neighbor_threshold=args.threshold, dtype=dtype))
    tokenize = jax.jit(lambda ve, img: jnp.concatenate(
        vae_mod.img_to_idxBl(ve, vae_cfg, img), axis=1))

    rng_np = np.random.default_rng(args.seed)
    for idx in range(min(args.limit, len(ds))):
        path, label = ds.samples[idx]
        img = jnp.asarray(tf(path, rng_np))[None]
        gt = tokenize(vae_params, img)
        lab = jnp.asarray([args.label if args.label >= 0 else label], jnp.int32)
        res = fn(var_params, vae_params, gt, lab)
        out = np.clip(np.asarray(res.image[0]) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(out).save(os.path.join(args.out_dir, f"{idx}_smoothed_{int(lab[0])}.png"))
        ll, dll = float(res.log_likelihood), float(res.distance_log_likelihood)
        print(f"[{idx}] label={int(lab[0])} log_lik={ll:.2f} dist_log_lik={dll:.2f} "
              f"sum={ll + dll:.2f}")


if __name__ == "__main__":
    main()
