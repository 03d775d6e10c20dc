"""Measure --vae_bf16's token-flip rate: how many teacher-forcing target
tokens change when the frozen tokenizer encoder runs in bf16 instead of fp32.

The quantizer's distance argmin and accumulation stay fp32-forced either way
(reference quant.py:53-61 semantics); bf16 only touches the conv encoder, so
flips happen where two codebook entries are near-equidistant. A negligible
rate justifies promoting --vae_bf16 to the training default (VERDICT r3 #4).

Run on TPU: python scripts/measure_vae_bf16_flips.py [--batch 32] [--iters 4]
Prints per-scale and total flip rates.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")

from var_tpu.config import VAEConfig  # noqa: E402
from var_tpu.models import vae as vae_mod  # noqa: E402


def main():
    def arg(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    batch = arg("--batch", 32)
    iters = arg("--iters", 4)
    vae_cfg = VAEConfig()
    params = vae_mod.init_vae_params(jax.random.PRNGKey(0), vae_cfg)

    @jax.jit
    def tokens(img):
        f32 = jnp.concatenate(vae_mod.img_to_idxBl(params, vae_cfg, img), axis=1)
        b16 = jnp.concatenate(
            vae_mod.img_to_idxBl(params, vae_cfg, img.astype(jnp.bfloat16)), axis=1)
        return f32, b16

    pns = vae_cfg.v_patch_nums
    ends = []
    cur = 0
    for pn in pns:
        cur += pn * pn
        ends.append(cur)
    reso = pns[-1] * vae_cfg.downsample
    flips_per_scale = [0] * len(pns)
    n_per_scale = [0] * len(pns)
    t0 = time.perf_counter()
    for i in range(iters):
        img = jax.random.uniform(jax.random.PRNGKey(10 + i),
                                 (batch, reso, reso, 3), jnp.float32) * 2 - 1
        f32, b16 = jax.device_get(tokens(img))
        bg = 0
        for si, e in enumerate(ends):
            seg32, seg16 = f32[:, bg:e], b16[:, bg:e]
            flips_per_scale[si] += int((seg32 != seg16).sum())
            n_per_scale[si] += seg32.size
            bg = e
    dt = time.perf_counter() - t0
    tot_f = sum(flips_per_scale)
    tot_n = sum(n_per_scale)
    for si, pn in enumerate(pns):
        rate = flips_per_scale[si] / max(n_per_scale[si], 1)
        print(f"scale {si} (pn={pn}): {flips_per_scale[si]}/{n_per_scale[si]} "
              f"flipped ({rate:.4%})")
    print(f"TOTAL: {tot_f}/{tot_n} flipped ({tot_f / tot_n:.4%})  "
          f"[{batch * iters} imgs, {dt:.1f}s]")


if __name__ == "__main__":
    main()
