"""Headline benchmark: VAR-d16 256x256 CFG sampling throughput per chip.

Measures end-to-end image generation (10-scale KV-cached CFG decode through
the VQVAE decoder — the reference's ``demo_sample.py`` hot path) in
images/sec on one chip, bf16.

The reference publishes no absolute throughput (BASELINE.md: "published: {}"),
so ``vs_baseline`` is computed against BASELINE_IMGS_PER_SEC, our documented
estimate of the reference implementation on an H100-class GPU (fp16,
flash-attn, batch 64). Update when a measured reference number exists.

Usage: python bench.py [--smoke] [--batch N] [--iters N]
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_IMGS_PER_SEC = 40.0  # estimated reference d16 on H100-class, fp16, bs64


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the 10-stage decode graph is large (~8 min
    # cold compile at d16); warm runs skip it entirely
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/var_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    smoke = "--smoke" in sys.argv

    def arg(name, default):
        if name in sys.argv:
            return int(sys.argv[sys.argv.index(name) + 1])
        return default

    if smoke:
        jax.config.update("jax_platforms", "cpu")

    from var_tpu.config import VAEConfig, VARConfig
    from var_tpu.engine.sampler import make_sampler
    from var_tpu.models import vae as vae_mod
    from var_tpu.models import var as var_mod

    if smoke:
        pns = (1, 2, 3)
        vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, ch_mult=(1, 1),
                            v_patch_nums=pns)
        var_cfg = VARConfig(num_classes=10, depth=2, embed_dim=64, num_heads=4,
                            patch_nums=pns, vocab_size=64, z_channels=8, attn_l2_norm=True)
        batch = arg("--batch", 4)
        iters = arg("--iters", 2)
    else:
        vae_cfg = VAEConfig()
        var_cfg = VARConfig.from_depth(16, attn_l2_norm=True)
        batch = arg("--batch", 64)
        iters = arg("--iters", 5)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    # benchmark in bf16 compute on TPU (reference benches fp16 autocast);
    # params stay fp32 — modules cast weights to the compute dtype on use,
    # and the quantizer is fp32-forced (reference quant.py:53-61)
    dtype = jnp.float32 if smoke else jnp.bfloat16

    attn_impl = "pallas" if "--attn-pallas" in sys.argv else "xla"
    sampler = make_sampler(var_cfg, vae_cfg, cfg_scale=1.5, top_k=900 if not smoke else 8,
                           top_p=0.96, dtype=dtype, attn_impl=attn_impl)
    labels = jnp.arange(batch, dtype=jnp.int32) % var_cfg.num_classes

    # compile + warmup
    res = sampler(var_params, vae_params, jax.random.PRNGKey(1), labels)
    res.image.block_until_ready()

    t0 = time.perf_counter()
    for i in range(iters):
        res = sampler(var_params, vae_params, jax.random.PRNGKey(2 + i), labels)
    res.image.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "var_d16_cfg_sampling_throughput" if not smoke else "smoke_sampling_throughput",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
