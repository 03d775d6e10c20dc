"""Training-step throughput bench: d16 teacher-forced step (frozen-VAE
tokenize + forward + backward + AdamW) in images/sec/chip.

Run on the TPU: python scripts/bench_train.py [--batch 32] [--iters 5]
                [--attn pallas|xla|hybrid|paired] [--remat 0|1|2] [--depth 16]
                [--pn 256|512]  (hybrid = flash fwd + dense bwd, remat=2 only)
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")

from var_tpu.config import TrainArgs, VAEConfig, VARConfig  # noqa: E402
from var_tpu.engine import trainer as tr  # noqa: E402
from var_tpu.models import vae as vae_mod  # noqa: E402
from var_tpu.models import var as var_mod  # noqa: E402


def main():
    def arg(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    batch = arg("--batch", 32)
    iters = arg("--iters", 5)
    depth = arg("--depth", 16)
    pn = sys.argv[sys.argv.index("--pn") + 1] if "--pn" in sys.argv else "256"
    attn = sys.argv[sys.argv.index("--attn") + 1] if "--attn" in sys.argv else "xla"
    assert attn in ("xla", "pallas", "hybrid", "paired")

    from var_tpu.config import parse_patch_nums
    pns = parse_patch_nums(pn)
    vae_cfg = VAEConfig(v_patch_nums=pns)
    var_cfg = VARConfig.from_depth(depth, attn_l2_norm=True, patch_nums=pns)
    args = TrainArgs(depth=depth, bs=batch, ac=1, ep=200, fp16=1, pn=pn).finalize(world_size=1)
    args.remat = arg("--remat", 2)
    args.vae_bf16 = arg("--vae_bf16", 0)
    args.tokenize_chunk = arg("--tokenize_chunk", 0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.init_var_params(k2, var_cfg)
    if arg("--unroll", 0) == 0:
        # stacked blocks -> lax.scan over depth (the train.py default);
        # --unroll 1 keeps blocks as a list (unrolled layer loop, O(depth)
        # compile) to measure the scan stacks' dynamic-update-slice cost
        var_params = var_mod.stack_block_params(var_params)

    init_state, step = tr.make_train_step(var_cfg, vae_cfg, args, iters_per_ep=1000,
                                          dtype=jnp.bfloat16, attn_impl=attn)
    state = init_state(var_params)
    reso = pns[-1] * vae_cfg.downsample
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, batch, reso, reso, 3),
                              jnp.float32) * 2 - 1
    labels = (jnp.arange(batch) % 1000).reshape(1, batch).astype(jnp.int32)

    state, m = step(state, vae_params, imgs, labels, jax.random.PRNGKey(2),
                    jnp.int32(0), jnp.float32(1.0))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, vae_params, imgs, labels, jax.random.PRNGKey(3 + i),
                        jnp.int32(i), jnp.float32(1.0))
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    print(f"train d{depth} pn={pn} bs={batch} attn={attn} remat={args.remat}: "
          f"{dt*1000:.1f} ms/step  {batch/dt:.2f} img/s  loss={float(m.loss):.4f}")


if __name__ == "__main__":
    main()
