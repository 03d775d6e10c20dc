"""Kernel-only microbench: single-buffer paired decode kernel vs the
chunked variant at the d16 final-stage shapes (2B=256, Lq=256, Lk=680,
C=1024, 16 heads) to pin the VMEM-join / pipelining cost."""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")
from var_tpu.ops.pallas.flash_attention import (flash_decode_paired,
                                                flash_decode_paired_chunks)

B, LQ, C, H, DEPTH = 256, 256, 1024, 16, 16
lens = [1, 4, 9, 16, 25, 36, 64, 100, 169]  # past chunks; live = 256
LK = sum(lens) + LQ
r = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(r[0], (B, LQ, C), jnp.bfloat16)
k_full = jax.random.normal(r[1], (B, LK, C), jnp.bfloat16)
v_full = jax.random.normal(r[2], (B, LK, C), jnp.bfloat16)

ks, vs, off = [], [], 0
for i, L in enumerate(lens):
    rr = jax.random.split(jax.random.PRNGKey(10 + i), 2)
    ks.append(jax.random.normal(rr[0], (DEPTH, B, L, C), jnp.bfloat16))
    vs.append(jax.random.normal(rr[1], (DEPTH, B, L, C), jnp.bfloat16))
ks.append(k_full[:, sum(lens):])
vs.append(v_full[:, sum(lens):])


def timeit(f, n=30):
    o = f(); o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        o = f()
    o.block_until_ready()
    return (time.perf_counter() - t0) / n * 1000


single = jax.jit(lambda: flash_decode_paired(q, k_full, v_full, H, 0.125))
chunked = jax.jit(lambda: flash_decode_paired_chunks(q, ks, vs, 3, H, 0.125))
t1 = timeit(single)
t2 = timeit(chunked)
print(f"single-buffer: {t1:.2f} ms   chunked(10 ops): {t2:.2f} ms   ratio {t2/t1:.2f}")

# fewer, bigger chunks: join cost same bytes, fewer operands
ks2 = [jnp.concatenate([k[3] for k in ks[:-1]], axis=1), ks[-1]]
vs2 = [jnp.concatenate([v[3] for v in vs[:-1]], axis=1), vs[-1]]
chunk2 = jax.jit(lambda: flash_decode_paired_chunks(q, ks2, vs2, 0, H, 0.125))
t3 = timeit(chunk2)
print(f"chunked(2 merged 3-D ops): {t3:.2f} ms   ratio {t3/t1:.2f}")
