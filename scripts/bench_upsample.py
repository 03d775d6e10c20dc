"""A/B the decoder upsample formulation inside the full render at bs128."""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/var_tpu_jax_cache")
sys.path.insert(0, ".")
from var_tpu.config import VAEConfig
from var_tpu.models import vae as vae_mod

cfg = VAEConfig()
params = vae_mod.init_vae_params(jax.random.PRNGKey(0), cfg)
B = 128
f_hat = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, cfg.z_channels), jnp.bfloat16)

for impl in ("phase", "deconv"):
    vae_mod.UPSAMPLE_IMPL = impl

    @jax.jit
    def render(params, f_hat):
        return jnp.sum(vae_mod.fhat_to_img(params, cfg, f_hat).astype(jnp.float32))

    float(render(params, f_hat))
    t0 = time.perf_counter()
    for _ in range(10):
        s = float(render(params, f_hat))
    dt = (time.perf_counter() - t0) / 10
    print(f"render bs{B} upsample={impl}: {dt*1000:.1f} ms  sum={s:.4g}")
