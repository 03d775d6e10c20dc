"""Decode throughput for the non-headline model sizes (README table rows).

Run on the TPU (serialize with other TPU work):
    python scripts/bench_models.py d20          # 256px, bs48
    python scripts/bench_models.py d36          # 512px, bs4 (2.3B params)

d36 numbers through this dev environment's remote-TPU tunnel understate the
chip (~4.6 s/dispatch host overhead for 2B+-param programs); the README
reports its device-timeline rate from scripts/profile_decode.py.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")

from var_tpu.config import VAEConfig, VARConfig, parse_patch_nums  # noqa: E402
from var_tpu.engine.sampler import make_sampler  # noqa: E402
from var_tpu.models import build_vae_var  # noqa: E402
from var_tpu.models import vae as vae_mod  # noqa: E402
from var_tpu.models import var as var_mod  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "d20"
    if which == "d20":
        vae_cfg = VAEConfig()
        var_cfg = VARConfig.from_depth(20, attn_l2_norm=True)
        batch, iters = 48, 3
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        vae_params = vae_mod.init_vae_params(k1, vae_cfg)
        var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    elif which in ("d24", "d30"):
        # 1.0B / 2.0B @256px: host-CPU init (factory rule) + bf16-cast block
        # weights (bit-identical decode) to fit the 16G chip. Wall numbers
        # through the dev tunnel are param-upload bound for 1B+ programs —
        # the README reports the device-timeline rate from
        # scripts/profile_decode.py's aggregation (see BENCH_extra.json)
        vae_cfg, var_cfg, vae_params, var_params = build_vae_var(
            depth=int(which[1:]), attn_l2_norm=True)
        var_params = jax.device_put(var_mod.cast_block_matmul_params(var_params))
        vae_params = jax.device_put(vae_params)
        batch, iters = 16, 3
    elif which == "d16_512":
        # 512px decode at d16: L=2240 crosses the paired kernel's VMEM
        # envelope at stage 9, so this row exercises the chunked->concat
        # switchover for real (tests pin it on CPU; this measures it)
        pns = parse_patch_nums("512")
        vae_cfg = VAEConfig(v_patch_nums=pns)
        var_cfg = VARConfig.from_depth(16, attn_l2_norm=True, patch_nums=pns)
        batch, iters = 16, 3
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        vae_params = vae_mod.init_vae_params(k1, vae_cfg)
        var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    elif which == "d16_1024":
        # 1024px decode at d16 (L=9451, reference arg_util.py:244-249): the
        # switchover fires at stage 10 (Lk 1755 > 1464-key envelope); the
        # remaining 4 stages (incl. the 4096-token tail) run the XLA path
        pns = parse_patch_nums("1024")
        vae_cfg = VAEConfig(v_patch_nums=pns)
        var_cfg = VARConfig.from_depth(16, attn_l2_norm=True, patch_nums=pns)
        batch, iters = 4, 2
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        vae_params = vae_mod.init_vae_params(k1, vae_cfg)
        var_params = var_mod.stack_block_params(var_mod.init_var_params(k2, var_cfg))
    elif which == "d36":
        pns = parse_patch_nums("512")
        # factory does host-CPU init for d24+; bf16-cast the block weights on
        # host (bit-identical decode) before the device transfer
        vae_cfg, var_cfg, vae_params, var_params = build_vae_var(
            patch_nums=pns, depth=36, shared_aln=True, attn_l2_norm=True)
        var_params = jax.device_put(var_mod.cast_block_matmul_params(var_params))
        vae_params = jax.device_put(vae_params)
        batch, iters = 4, 3
    else:
        raise SystemExit(
            f"unknown model {which!r} (d20 | d24 | d30 | d16_512 | d16_1024 | d36)")

    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 1
    labels = jnp.arange(batch, dtype=jnp.int32) % 1000
    if rounds > 1:
        # dispatch batching: ONE program scans `rounds` decodes — amortizes
        # the remote-dispatch overhead that caps d36 wall throughput
        from var_tpu.engine.sampler import make_scan_sampler

        scan = make_scan_sampler(var_cfg, vae_cfg, rounds, cfg_scale=1.5,
                                 top_k=900, top_p=0.96, dtype=jnp.bfloat16)
        labels_rb = jnp.tile(labels, (rounds, 1))
        r = scan(var_params, vae_params, jax.random.PRNGKey(1), labels_rb)
        r.image.block_until_ready()
        t0 = time.perf_counter()
        for i in range(iters):
            r = scan(var_params, vae_params, jax.random.PRNGKey(2 + i), labels_rb)
        r.image.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        n = batch * rounds
        print(f"{which} bs{batch} rounds={rounds}: {dt*1000:.1f} ms/dispatch  "
              f"{n/dt:.2f} img/s wall")
        return
    sampler = make_sampler(var_cfg, vae_cfg, cfg_scale=1.5, top_k=900,
                           top_p=0.96, dtype=jnp.bfloat16)
    r = sampler(var_params, vae_params, jax.random.PRNGKey(1), labels)
    r.image.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        r = sampler(var_params, vae_params, jax.random.PRNGKey(2 + i), labels)
    r.image.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{which} bs{batch}: {dt*1000:.1f} ms/batch  {batch/dt:.2f} img/s")


if __name__ == "__main__":
    main()
