"""A/B the fused modulated-LN block cap: 20 chained LNs in ONE jit so the
tunnel round-trip amortizes (memory: float() sync costs ~3-4 ms alone)."""
import os, sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")
from var_tpu.ops.pallas.fused_ln import modulated_layernorm

B, L, C = 256, 256, 1024
N = 20
x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.bfloat16)
s = jax.random.normal(jax.random.PRNGKey(1), (B, C), jnp.float32) * 0.1
sh = jax.random.normal(jax.random.PRNGKey(2), (B, C), jnp.float32) * 0.1

@jax.jit
def f(x, s, sh):
    for _ in range(N):
        x = modulated_layernorm(x, s, sh)
    return jnp.sum(x.astype(jnp.float32))

float(f(x, s, sh))
t0 = time.perf_counter()
iters = 5
for _ in range(iters):
    r = float(f(x, s, sh))
dt = (time.perf_counter() - t0) / iters / N * 1000
gbs = (2 * B * L * C * 2) / (dt / 1000) / 1e9
print(f"cap={os.environ.get('VAR_TPU_LN_BLOCK_BYTES','2M-default')}: {dt:.3f} ms/LN  ({gbs:.0f} GB/s)")
