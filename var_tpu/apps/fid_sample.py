"""FID sampling protocol (README.md:151-157).

Samples ``per_class`` images for each of 1000 classes with the benchmark
recipe (cfg=1.5, top_p=0.96, top_k=900, more_smooth=False), writes
``{i:06d}.png`` files, and packs them into the OpenAI-evaluator npz via
``create_npz_from_sample_folder`` (reference ``utils/misc.py:360-381``).
Kill/resume-safe: existing PNGs are skipped.
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
    p.add_argument("--out_dir", default="fid_samples")
    p.add_argument("--per_class", type=int, default=50)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--cfg", type=float, default=1.5)
    p.add_argument("--top_k", type=int, default=900)
    p.add_argument("--top_p", type=float, default=0.96)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rounds", type=int, default=1,
                   help="decode batches per device dispatch (lax.scan inside "
                        "one jit): amortizes host dispatch overhead for bulk "
                        "generation; resume granularity becomes rounds*batch")
    p.add_argument("--pack", action="store_true", help="pack npz when done")
    # tokenizer geometry overrides — small-scale protocol dry-runs only;
    # FID numbers are meaningful with the published geometry (defaults)
    p.add_argument("--V", type=int, default=4096)
    p.add_argument("--Cvae", type=int, default=32)
    p.add_argument("--ch", type=int, default=160)
    args = p.parse_args(argv)

    import jax

    if os.environ.get("VAR_TPU_FORCE_CPU"):  # same knob as train.py
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from var_tpu.config import parse_patch_nums
    from var_tpu.engine.sampler import make_sampler
    from var_tpu.models import build_vae_var
    from var_tpu.utils.logging import create_npz_from_sample_folder

    pns = parse_patch_nums(args.pn)
    vae_cfg, var_cfg, vae_params, var_params = build_vae_var(
        patch_nums=pns, depth=args.depth, num_classes=args.num_classes,
        V=args.V, Cvae=args.Cvae, ch=args.ch,
        vae_ckpt=args.vae_ckpt if os.path.exists(args.vae_ckpt) else None,
        var_ckpt=args.var_ckpt if os.path.exists(args.var_ckpt) else None,
    )
    dtype = jnp.float32 if jax.devices()[0].platform == "cpu" else jnp.bfloat16
    kw = dict(cfg_scale=args.cfg, top_k=args.top_k, top_p=args.top_p, dtype=dtype)
    if args.rounds > 1:
        from var_tpu.engine.sampler import make_scan_sampler

        scan_sampler = make_scan_sampler(var_cfg, vae_cfg, args.rounds, **kw)
        chunk = args.rounds * args.batch

        def sampler(vp, vaep, rng, labels):
            res = scan_sampler(vp, vaep, rng,
                               jnp.asarray(labels).reshape(args.rounds, args.batch))
            return res._replace(image=res.image.reshape((-1,) + res.image.shape[2:]))
    else:
        sampler = make_sampler(var_cfg, vae_cfg, **kw)
        chunk = args.batch
    os.makedirs(args.out_dir, exist_ok=True)

    total = args.num_classes * args.per_class
    assert args.batch >= 1
    if total % chunk:
        print(f"note: {total} images not divisible by rounds*batch {chunk}; "
              f"the final short chunk will trigger one extra compile")
    i = 0
    rng_i = 0
    labels_all = np.repeat(np.arange(args.num_classes), args.per_class)
    while i < total:
        batch_labels = labels_all[i: i + chunk]
        if args.rounds > 1 and len(batch_labels) < chunk:
            # ragged tail under dispatch batching: fall back to per-batch
            # decodes for the remainder (avoids a short-shape scan compile)
            sampler = make_sampler(var_cfg, vae_cfg, **kw)
            chunk = args.batch
            args.rounds = 1
            continue
        fnames = [os.path.join(args.out_dir, f"{j:06d}.png") for j in range(i, i + len(batch_labels))]
        rng_i += 1
        if all(os.path.exists(f) for f in fnames):
            i += len(batch_labels)
            continue
        res = sampler(var_params, vae_params, jax.random.PRNGKey(args.seed + rng_i),
                      jnp.asarray(batch_labels, jnp.int32))
        imgs = np.clip(np.asarray(res.image) * 255, 0, 255).astype(np.uint8)
        for f, img in zip(fnames, imgs):
            Image.fromarray(img).save(f)
        i += len(batch_labels)
        if (i // chunk) % 20 == 0:
            print(f"{i}/{total} images")
    if args.pack:
        create_npz_from_sample_folder(args.out_dir, total)


if __name__ == "__main__":
    main()
