"""Demo sampler (reference ``demo_sample.py``): canonical inference recipe.

    python -m var_tpu.apps.sample --depth 16 --vae_ckpt vae_ch160v4096z32.pth \
        --var_ckpt var_d16.pth --out demo.png

Defaults mirror the reference: seed 0, cfg=4, top_k=900, top_p=0.95, the
same 8 demo classes, reduced-precision decode, images tiled into a grid.
Without checkpoints it runs with random weights (smoke / perf use).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def save_grid(images: np.ndarray, path: str, per_row: int = 4) -> None:
    """images: (B, H, W, 3) in [0,1] -> one tiled PNG."""
    from PIL import Image

    b, h, w, _ = images.shape
    rows = (b + per_row - 1) // per_row
    grid = np.zeros((rows * h, per_row * w, 3), np.uint8)
    arr = np.clip(images * 255.0, 0, 255).astype(np.uint8)
    for i in range(b):
        r, c = divmod(i, per_row)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = arr[i]
    Image.fromarray(grid).save(path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--vae_ckpt", default="vae_ch160v4096z32.pth")
    p.add_argument("--var_ckpt", default="")
    p.add_argument("--pn", default="1_2_3_4_5_6_8_10_13_16")
    p.add_argument("--cfg", type=float, default=4.0)
    p.add_argument("--top_k", type=int, default=900)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--more_smooth", action="store_true")
    p.add_argument("--classes", default="980,980,437,437,22,22,562,562")  # demo_sample.py:64
    p.add_argument("--out", default="demo.png")
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args(argv)

    import jax

    if os.environ.get("VAR_TPU_FORCE_CPU"):  # same knob as train.py
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from var_tpu.config import parse_patch_nums
    from var_tpu.engine.sampler import make_sampler
    from var_tpu.models import build_vae_var

    pns = parse_patch_nums(args.pn)
    vae_cfg, var_cfg, vae_params, var_params = build_vae_var(
        patch_nums=pns, depth=args.depth,
        shared_aln=(args.depth == 36),  # d36-512 uses shared AdaLN (README.md:143)
        vae_ckpt=args.vae_ckpt if os.path.exists(args.vae_ckpt) else None,
        var_ckpt=args.var_ckpt if os.path.exists(args.var_ckpt) else None,
    )
    labels = jnp.asarray([int(c) for c in args.classes.split(",")], jnp.int32)
    dtype = jnp.float32 if (args.fp32 or jax.devices()[0].platform == "cpu") else jnp.bfloat16
    if args.depth >= 30 and dtype == jnp.bfloat16:
        # 2B+ fp32 block weights alone are ~9G of a 16G chip; bit-identical
        # under bf16 compute (weights are cast at use anyway)
        from var_tpu.models import var as var_mod

        var_params = var_mod.cast_block_matmul_params(var_params)
    sampler = make_sampler(var_cfg, vae_cfg, cfg_scale=args.cfg, top_k=args.top_k,
                           top_p=args.top_p, more_smooth=args.more_smooth, dtype=dtype)
    t0 = time.time()
    res = sampler(var_params, vae_params, jax.random.PRNGKey(args.seed), labels)
    res.image.block_until_ready()
    print(f"generated {labels.shape[0]} images in {time.time()-t0:.2f}s "
          f"(incl. compile on first call)")
    save_grid(np.asarray(res.image), args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
