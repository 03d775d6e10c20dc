"""Headline benchmark: VAR-d16 256x256 CFG sampling throughput per chip.

Measures end-to-end image generation (10-scale KV-cached CFG decode through
the VQVAE decoder — the reference's ``demo_sample.py`` hot path) in
images/sec on one chip, bf16.

The reference publishes no absolute throughput (BASELINE.md: "published: {}"),
so ``vs_baseline`` is computed against BASELINE_IMGS_PER_SEC — the reference
implementation's estimated H100 throughput hardware-normalized to one v5e
chip (full derivation in BASELINE.md). Update when a measured number exists.

Usage: python bench.py [--smoke] [--batch N] [--iters N] [--train]
The LAST line is ONE JSON line: {"metric", "value", "unit", "vs_baseline"}
— the CFG-decode headline. A full (non-smoke) run also emits the d16
train-step line BEFORE it (subprocess under a --train-budget time cap, so a
cold cache can't blow the driver run; suppress with --no-train).
``--train`` benches the d16 training step (tokenize+fwd+bwd+AdamW) alone;
its baseline is the same derivation applied to the reference's training
path (3x forward FLOPs, no CFG/VQVAE-decode).
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_IMGS_PER_SEC = 40.0  # reference d16 H100 estimate, normalized to v5e peak (BASELINE.md)
TRAIN_BASELINE_IMGS_PER_SEC = 40.0  # same derivation on the training path (~1.5 TFLOP/img, ~30% MFU)


def _probe_backend(attempts: int = 4, probe_timeout: int = 90) -> dict:
    """Bounded-retry first contact with the TPU backend, in a subprocess.

    The axon tunnel can hang *indefinitely* inside backend init (observed
    round 3: ``jax.devices()`` blocked >10 min and burned the round's only
    driver bench). An in-process retry cannot recover from that, so the
    probe runs in a killable subprocess with a hard timeout and backs off
    between attempts. On persistent failure the caller emits a structured
    failure JSON instead of hanging until the driver's timeout.
    """
    import os
    import subprocess

    if os.environ.get("VAR_TPU_FORCE_CPU") == "1":
        return {"ok": True, "platform": "cpu"}
    last_err = "unknown"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print('PROBE_OK', d[0].platform, len(d))"],
                capture_output=True, text=True, timeout=probe_timeout)
            out = (r.stdout or "").strip()
            if r.returncode == 0 and "PROBE_OK" in out:
                plat = out.split("PROBE_OK", 1)[1].split()[0]
                return {"ok": True, "platform": plat}
            tail = (r.stderr or r.stdout or "").strip().splitlines()
            last_err = tail[-1] if tail else f"probe exited rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last_err = f"backend init exceeded {probe_timeout}s (axon tunnel hang)"
        except Exception as e:  # noqa: BLE001 - report, don't crash the bench
            last_err = f"{type(e).__name__}: {e}"
        if i + 1 < attempts:
            time.sleep(min(15 * (i + 1), 45))
    return {"ok": False, "error": last_err}


def _fail_backend(err: str) -> None:
    """Emit one structured JSON line naming the backend error, then exit 1."""
    print(json.dumps({
        "metric": "backend_unavailable",
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "error": err,
    }))
    raise SystemExit(1)


def bench_train(batch: int, iters: int, smoke: bool = False):
    """d16 training-step throughput (frozen-VAE tokenize + fwd + bwd + AdamW)."""
    import jax
    import jax.numpy as jnp

    from var_tpu.config import TrainArgs, VAEConfig, VARConfig
    from var_tpu.engine import trainer as tr
    from var_tpu.models import vae as vae_mod
    from var_tpu.models import var as var_mod

    if smoke:
        pns = (1, 2, 3)
        vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, ch_mult=(1, 1),
                            v_patch_nums=pns)
        var_cfg = VARConfig(num_classes=10, depth=2, embed_dim=64, num_heads=4,
                            patch_nums=pns, vocab_size=64, z_channels=8,
                            attn_l2_norm=True)
        args = TrainArgs(depth=2, bs=batch, ac=1, ep=2, pn="1_2_3").finalize(world_size=1)
    else:
        vae_cfg = VAEConfig()
        var_cfg = VARConfig.from_depth(16, attn_l2_norm=True)
        args = TrainArgs(depth=16, bs=batch, ac=1, ep=200, fp16=1).finalize(world_size=1)
        # default: attention-core remat (mode 2) — the L x L softmax
        # residuals are recomputed (the chip OOMs storing them) but every
        # matmul activation is stored once; --remat 1 = whole-block remat
        args.remat = 2
        if "--remat" in sys.argv:
            args.remat = int(sys.argv[sys.argv.index("--remat") + 1])
        if "--tokenize_chunk" in sys.argv:  # bounds tokenizer conv temps
            args.tokenize_chunk = int(sys.argv[sys.argv.index("--tokenize_chunk") + 1])
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    # same auto rule as train.py: the paired merged-lane kernel (L-exact K
    # blocks) measures 68.0 img/s vs 55.3 xla at d16 bs32 256px on v5e
    attn_impl = "xla" if (smoke or jax.devices()[0].platform == "cpu") else "paired"
    if "--attn" in sys.argv:
        attn_impl = sys.argv[sys.argv.index("--attn") + 1]
    init_state, step = tr.make_train_step(var_cfg, vae_cfg, args, iters_per_ep=1000,
                                          dtype=jnp.float32 if smoke else jnp.bfloat16,
                                          attn_impl=attn_impl)
    state = init_state(var_params)
    reso = var_cfg.patch_nums[-1] * vae_cfg.downsample
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, batch, reso, reso, 3),
                              jnp.float32) * 2 - 1
    labels = (jnp.arange(batch) % var_cfg.num_classes).reshape(1, batch).astype(jnp.int32)

    state, _ = step(state, vae_params, imgs, labels, jax.random.PRNGKey(2),
                    jnp.int32(0), jnp.float32(1.0))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(iters):
        state, _ = step(state, vae_params, imgs, labels, jax.random.PRNGKey(3 + i),
                        jnp.int32(i), jnp.float32(1.0))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "smoke_train_step_throughput" if smoke else "var_d16_train_step_throughput",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / TRAIN_BASELINE_IMGS_PER_SEC, 3),
    }))


def _train_line_budgeted(budget_s: int) -> None:
    """Emit the d16 train-step JSON line BEFORE the decode headline.

    The driver parses the LAST line, so the headline stays the decode
    metric while the tail captures both (round-4 verdict item 3: the train
    number was builder-reported only). Runs in a killable subprocess under
    a hard time budget: warm-cache runs (scripts/warm_cache.sh) finish in
    ~1 min; a cold compile (~4 min) still fits, and a hung/over-budget run
    is killed without losing the round's decode bench.
    """
    import subprocess

    try:
        r = subprocess.run([sys.executable, __file__, "--train"],
                           capture_output=True, text=True, timeout=budget_s)
        for line in (r.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{") and "train_step_throughput" in line:
                print(line, flush=True)
                return
        tail = (r.stderr or "").strip().splitlines()
        sys.stderr.write(f"[bench] train line skipped: rc={r.returncode} "
                         f"{tail[-1] if tail else ''}\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[bench] train line skipped: exceeded {budget_s}s budget\n")
    except Exception as e:  # noqa: BLE001 - never lose the decode headline
        sys.stderr.write(f"[bench] train line skipped: {type(e).__name__}: {e}\n")


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

    probe = {"ok": True, "platform": "cpu"}
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        # bounded first contact with the TPU backend — see _probe_backend
        probe = _probe_backend()
        if not probe["ok"]:
            _fail_backend(probe["error"])

    if "--train" in sys.argv:
        bench_train(batch=arg("--batch", 4 if smoke else 32),
                    iters=arg("--iters", 2 if smoke else 5), smoke=smoke)
        return

    # the d16 train subprocess can't finish on CPU within any sane budget
    # (VAR_TPU_FORCE_CPU=1 runs land here with platform == "cpu"), so only
    # emit the train line when a real accelerator answered the probe
    if not smoke and "--no-train" not in sys.argv and probe["platform"] != "cpu":
        _train_line_budgeted(arg("--train-budget", 900))

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
        batch = arg("--batch", 128)  # 84.4 img/s vs 80.2 at bs64 (fits since the
        iters = arg("--iters", 5)    # pallas decode attn keeps caches unpadded)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    # benchmark in bf16 compute on TPU (reference benches fp16 autocast);
    # params stay fp32 — modules cast weights to the compute dtype on use,
    # and the quantizer is fp32-forced (reference quant.py:53-61)
    dtype = jnp.float32 if smoke else jnp.bfloat16

    attn_impl = "pallas" if "--attn-pallas" in sys.argv else ("xla" if "--attn-xla" in sys.argv else "auto")
    sampler = make_sampler(var_cfg, vae_cfg, cfg_scale=1.5, top_k=900 if not smoke else 8,
                           top_p=0.96, dtype=dtype, attn_impl=attn_impl,
                           cache_impl=("prealloc" if "--cache-prealloc" in sys.argv else
                                       "concat" if "--cache-concat" in sys.argv else "chunked"),
                           approx_topk="--approx-topk" in sys.argv)
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
