"""Profile one d16 CFG decode (or train) step and aggregate device time.

Parses the xplane proto from jax.profiler (TPU device plane, "XLA Ops"
line, %while events excluded since they nest children) and buckets op time
by name heuristics: attention kernels, convs, gemms, selection, LN/GN,
copies/dynamic-update, etc.

Run on the TPU (serialize with other TPU work!):
    python scripts/profile_decode.py [--batch 128] [--train] [--remat N]
"""

import glob
import os
import sys
import time
from collections import defaultdict

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")

from var_tpu.config import TrainArgs, VAEConfig, VARConfig  # noqa: E402
from var_tpu.models import vae as vae_mod  # noqa: E402
from var_tpu.models import var as var_mod  # noqa: E402


def arg(name, default):
    return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


def classify(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "flash" in n or "bound_kernel" in n or "custom-call" in n:
        return "pallas/custom"
    if "conv" in n:
        return "conv"
    if "dot" in n or "einsum" in n or "gemm" in n:
        return "gemm"
    if "sort" in n or "top-k" in n or "topk" in n:
        return "sort/topk"
    if "dynamic-update" in n or "dynamic-slice" in n or "copy" in n or "concatenate" in n:
        return "copy/slice/concat"
    if "reduce" in n or "rsqrt" in n or "norm" in n:
        return "reduce/norm"
    if "fusion" in n:
        return "fusion(other)"
    return "other"


def dump_trace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "/device:TPU:0" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        buckets = defaultdict(float)
        names = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                if name.startswith("%while"):
                    continue  # nests children
                dur = ev.duration_ps / 1e9  # ms
                total += dur
                buckets[classify(name)] += dur
                names[name] += dur
        print(f"\n== device total {total:.1f} ms ==")
        for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"  {k:22s} {v:8.1f} ms  {100*v/max(total,1e-9):5.1f}%")
        print("\ntop ops:")
        for k, v in sorted(names.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {v:8.2f} ms  {k[:120]}")


def main():
    batch = arg("--batch", 128)
    vae_cfg = VAEConfig()
    var_cfg = VARConfig.from_depth(16, attn_l2_norm=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    trace_dir = f"/tmp/var_tpu_profile_{int(time.time())}"

    if "--train" in sys.argv:
        from var_tpu.engine import trainer as tr

        args = TrainArgs(depth=16, bs=batch, ac=1, ep=200, fp16=1).finalize(world_size=1)
        args.remat = arg("--remat", 2)
        attn = (sys.argv[sys.argv.index("--attn") + 1] if "--attn" in sys.argv
                else "paired")
        init_state, step = tr.make_train_step(var_cfg, vae_cfg, args,
                                              iters_per_ep=1000, dtype=jnp.bfloat16,
                                              attn_impl=attn)
        state = init_state(var_params)
        reso = var_cfg.patch_nums[-1] * vae_cfg.downsample
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, batch, reso, reso, 3),
                                  jnp.float32) * 2 - 1
        labels = (jnp.arange(batch) % 1000).reshape(1, batch).astype(jnp.int32)

        def run(i):
            nonlocal state
            state, _ = step(state, vae_params, imgs, labels,
                            jax.random.PRNGKey(2 + i), jnp.int32(i), jnp.float32(1.0))
            jax.block_until_ready(state.params)
    else:
        from var_tpu.engine.sampler import make_sampler

        sampler = make_sampler(var_cfg, vae_cfg, cfg_scale=1.5, top_k=900,
                               top_p=0.96, dtype=jnp.bfloat16,
                               cache_impl="prealloc" if "--cache-prealloc" in sys.argv
                               else "concat" if "--cache-concat" in sys.argv
                               else "chunked")
        labels = jnp.arange(batch, dtype=jnp.int32) % 1000

        def run(i):
            res = sampler(var_params, vae_params, jax.random.PRNGKey(2 + i), labels)
            res.image.block_until_ready()

    run(0)  # compile + warm
    run(1)
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    run(2)
    jax.profiler.stop_trace()
    print(f"wall for traced iter: {time.perf_counter()-t0:.3f} s (incl. trace overhead)")
    dump_trace(trace_dir)


if __name__ == "__main__":
    main()
