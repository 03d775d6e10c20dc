"""TPU compile/run probe for the paired-train flash kernel (fwd + bwd).

Production geometry slice: C=1024, nh=16, L=680 (10-scale 256px pyramid),
bf16 merged tensors. Runs fwd alone, then grad, printing timings — used to
validate Mosaic lowering after kernel-layout changes without paying a full
train-step compile.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from var_tpu.ops.pallas.flash_attention import flash_attention_paired_train  # noqa: E402

PNS = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
ENDS = []
t = 0
for p in PNS:
    t += p * p
    ENDS.append(t)
L = t  # 680
B, C, NH = 8, 1024, 16


def main():
    print("devices:", jax.devices())
    k = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(k, 3)
    q = jax.random.normal(kq, (B, L, C), jnp.bfloat16)
    kk_ = jax.random.normal(kk, (B, L, C), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, C), jnp.bfloat16)

    fwd = jax.jit(lambda q, k, v: flash_attention_paired_train(
        q, k, v, NH, scale=0.125, scale_ends=ENDS, interpret=False))
    t0 = time.time()
    o = fwd(q, kk_, v)
    o.block_until_ready()
    print(f"fwd ok: {o.shape} {o.dtype}, compile+run {time.time()-t0:.1f}s, "
          f"finite={bool(jnp.isfinite(o.astype(jnp.float32)).all())}")

    loss = jax.jit(jax.grad(lambda q, k, v: flash_attention_paired_train(
        q, k, v, NH, scale=0.125, scale_ends=ENDS,
        interpret=False).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    t0 = time.time()
    gq, gk, gv = loss(q, kk_, v)
    jax.block_until_ready((gq, gk, gv))
    fin = all(bool(jnp.isfinite(g.astype(jnp.float32)).all())
              for g in (gq, gk, gv))
    print(f"bwd ok: compile+run {time.time()-t0:.1f}s, finite={fin}")


if __name__ == "__main__":
    main()
