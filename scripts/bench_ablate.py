"""Decode ablation bench: where does d16 CFG sampling time go?

Variants (each its own jit; persistent compile cache keeps reruns cheap):
  full          — the shipping decode (bench.py path; chunked KV cache)
  pallas        — same with the pallas decode attention
  no_vae        — stop before the VQVAE decoder (returns f_hat)
  greedy        — top_k=1 (no top-900 + top-p machinery)
  concat        — grow-by-concat KV caches (the pre-chunked representation)
  prealloc      — in-place preallocated KV caches (serving layout)

Run on the TPU: python scripts/bench_ablate.py [--batch 64] [--iters 5]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")

sys.path.insert(0, ".")

from var_tpu.config import VAEConfig, VARConfig  # noqa: E402
from var_tpu.engine import sampler as S  # noqa: E402
from var_tpu.models import vae as vae_mod  # noqa: E402
from var_tpu.models import var as var_mod  # noqa: E402


def main():
    def arg(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    batch = arg("--batch", 64)
    iters = arg("--iters", 5)
    vae_cfg = VAEConfig()
    var_cfg = VARConfig.from_depth(16, attn_l2_norm=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    labels = jnp.arange(batch, dtype=jnp.int32) % 1000

    def full(vp, ve, rng, lab):
        return S.decode_cfg(vp, ve, var_cfg, vae_cfg, rng, lab, cfg_scale=1.5,
                            top_k=900, top_p=0.96, dtype=jnp.bfloat16).image

    def pallas(vp, ve, rng, lab):
        return S.decode_cfg(vp, ve, var_cfg, vae_cfg, rng, lab, cfg_scale=1.5,
                            top_k=900, top_p=0.96, dtype=jnp.bfloat16,
                            attn_impl="pallas").image

    def no_vae(vp, ve, rng, lab):
        return S.decode_cfg(vp, ve, var_cfg, vae_cfg, rng, lab, cfg_scale=1.5,
                            top_k=900, top_p=0.96, dtype=jnp.bfloat16).f_hat

    def greedy(vp, ve, rng, lab):
        return S.decode_cfg(vp, ve, var_cfg, vae_cfg, rng, lab, cfg_scale=1.5,
                            top_k=1, dtype=jnp.bfloat16).image

    def cache(impl):
        def fn(vp, ve, rng, lab):
            return S.decode_cfg(vp, ve, var_cfg, vae_cfg, rng, lab,
                                cfg_scale=1.5, top_k=900, top_p=0.96,
                                dtype=jnp.bfloat16, cache_impl=impl).image
        return fn

    for name, fn in [("full", full), ("pallas", pallas), ("no_vae", no_vae),
                     ("greedy", greedy), ("concat", cache("concat")),
                     ("prealloc", cache("prealloc"))]:
        try:
            f = jax.jit(fn)
            out = f(var_params, vae_params, jax.random.PRNGKey(1), labels)
            out.block_until_ready()
            t0 = time.perf_counter()
            for i in range(iters):
                out = f(var_params, vae_params, jax.random.PRNGKey(2 + i), labels)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:8s}: {dt*1000:7.1f} ms/batch  {batch/dt:7.2f} img/s", flush=True)
        except Exception as e:
            msg = str(e)
            i = msg.find("Scoped allocation")
            print(f"{name:8s}: FAIL {msg[i:i+70] if i >= 0 else msg[:120]}", flush=True)


if __name__ == "__main__":
    main()
