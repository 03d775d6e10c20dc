"""Microbench paired-train flash kernel block sizes at the 256px geometry.

L=680 makes the default (bq=256, bk=512) pad the K stream to 1024 rows —
33% wasted MXU work per q block. Candidates ending at 680 (multiple of 8)
remove the padding entirely. Run: python scripts/bench_ptrain_blocks.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")

from var_tpu.ops.pallas.flash_attention import flash_attention_paired_train  # noqa: E402

PNS = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
ENDS, t = [], 0
for p in PNS:
    t += p * p
    ENDS.append(t)
L = t
B, C, NH = 32, 1024, 16


def main():
    k = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(k, 3)
    q = jax.random.normal(kq, (B, L, C), jnp.bfloat16)
    km = jax.random.normal(kk, (B, L, C), jnp.bfloat16)
    vm = jax.random.normal(kv, (B, L, C), jnp.bfloat16)

    for bq, bk in [(256, 512), (256, 680), (344, 680), (344, 512),
                   (128, 680), (232, 680), (680, 680)]:
        def f(q, k, v, bq=bq, bk=bk):
            return flash_attention_paired_train(
                q, k, v, NH, scale=0.125, scale_ends=ENDS,
                block_q=bq, block_k=bk, interpret=False
            ).astype(jnp.float32).sum()

        try:
            # 10 chained fwd+bwd inside ONE jit: dispatch/tunnel overhead
            # amortizes away and the eps*grad coupling defeats DCE/folding
            @jax.jit
            def many(q, k, v, f=f):
                def body(qc, _):
                    _, gq = jax.value_and_grad(f)(qc, k, v)
                    return qc + 1e-12 * gq, ()
                qf, _ = jax.lax.scan(body, q, None, length=10)
                return jnp.float32(qf.astype(jnp.float32).sum())

            float(many(q, km, vm))  # compile + warm
            q2 = q + jnp.bfloat16(1e-3)
            t0 = time.perf_counter()
            s = float(many(q2, km, vm))  # scalar fetch: a true sync point
            dt = (time.perf_counter() - t0) / 10
            print(f"bq={bq:4d} bk={bk:4d}: {dt*1000:7.2f} ms fwd+bwd  (s={s:.3e})")
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:4d} bk={bk:4d}: FAIL {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
