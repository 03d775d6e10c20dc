"""Record a short d16 learning curve on TPU: overfit a fixed batch at the
PRODUCTION geometry (C=1024, 10 scales, V=4096) and print the unsmoothed CE
every few steps. Complements tests/test_trainer.py::test_training_learns_overfit
(tiny config, CPU): this proves the full-size step learns on real hardware —
loss must decrease, not merely stay finite (reference trains real models,
train.py:171-250).

Run: python scripts/train_curve.py [--steps 200] [--batch 32] [--every 20]
Prints one JSON line at the end: {"ce": [...], "acc_final": ..}.
"""

import json
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

    steps = arg("--steps", 200)
    batch = arg("--batch", 32)
    every = arg("--every", 20)
    vae_cfg = VAEConfig()
    var_cfg = VARConfig.from_depth(16, attn_l2_norm=True)
    # full lr from step 0 (sche=lin0 holds factor 1.0 for the first 5% of
    # max_it; wp=0 disables warmup) so the curve shows learning immediately
    # tlr = tblr*bs/256 = 3e-4: an overfit-friendly rate for a 310M model
    # memorizing one fixed batch in a few hundred steps
    args = TrainArgs(depth=16, bs=batch, ac=1, ep=200, fp16=1, wp=0.0,
                     tblr=2.4e-3).finalize(world_size=1)
    args.remat = 2
    args.vae_bf16 = arg("--vae_bf16", 0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    attn = "xla" if jax.devices()[0].platform == "cpu" else "paired"
    init_state, step = tr.make_train_step(var_cfg, vae_cfg, args,
                                          iters_per_ep=100000, dtype=jnp.bfloat16,
                                          attn_impl=attn)
    state = init_state(var_params)
    reso = var_cfg.patch_nums[-1] * vae_cfg.downsample
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, batch, reso, reso, 3),
                              jnp.float32) * 2 - 1
    labels = (jnp.arange(batch) % var_cfg.num_classes).reshape(1, batch).astype(jnp.int32)
    ces, accs = [], []
    t0 = time.perf_counter()
    for it in range(steps):
        # fixed rng: deterministic batch; dropout stays stochastic-free
        state, m = step(state, vae_params, imgs, labels, jax.random.PRNGKey(0),
                        jnp.int32(it), jnp.float32(1.0))
        if it % every == 0 or it == steps - 1:
            ces.append(round(float(m.Lm), 4))
            accs.append(round(float(m.accm), 2))
            print(f"step {it}: CE {ces[-1]:.4f}  acc {accs[-1]:.2f}%", flush=True)
    dt = time.perf_counter() - t0
    # learned: CE >= 2 nats below the ln(V)=8.32 uniform start (e^2 ~ 7.4x
    # likelihood) AND greedy accuracy >= 100x chance (1/4096). A sign error
    # in the loss/grad fails both; the fixed batch is uniform noise, the
    # hardest memorization target, so absolute-CE thresholds are meaningless.
    print(json.dumps({"ce": ces, "acc": accs, "steps": steps, "batch": batch,
                      "wall_s": round(dt, 1),
                      "learned": (ces[-1] < ces[0] - 2.0
                                  and accs[-1] > 100 * 100.0 / 4096)}))


if __name__ == "__main__":
    main()
