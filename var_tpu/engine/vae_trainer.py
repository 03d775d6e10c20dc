"""VQVAE training step.

The reference keeps the VQVAE training *forward* in-tree
(``vqvae.py:56-59``, ``quant.py:52-104``: straight-through estimator,
commitment loss, EMA codebook-usage stats) but ships no VAE training loop —
the tokenizer is used frozen everywhere. This module provides the same
forward plus a minimal jitted optimization step (L2 reconstruction +
commitment loss, AdamW) and the EMA/usage bookkeeping, so VQVAE training is
a first-class capability rather than dead code.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from var_tpu.config import VAEConfig
from var_tpu.models import quantizer as q
from var_tpu.models import vae as vae_mod


class VAETrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_hits: jax.Array  # (S, V) EMA codebook usage (quant.py:35)
    record_hit: jax.Array  # int32 step counter for the EMA decay schedule
    step: jax.Array


def make_vae_train_step(cfg: VAEConfig, lr: float = 3e-4, beta_recon: float = 1.0,
                        tclip: float = 2.0):
    tx = optax.chain(
        optax.clip_by_global_norm(tclip) if tclip > 0 else optax.identity(),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.0),
    )

    def init_state(params) -> VAETrainState:
        sn = len(cfg.v_patch_nums)
        return VAETrainState(
            params, tx.init(params),
            jnp.zeros((sn, cfg.vocab_size), jnp.float32),
            jnp.int32(0), jnp.int32(0),
        )

    def loss_fn(params, img):
        out = vae_mod.vae_train_forward(params, cfg, img)
        recon_loss = jnp.mean((out.recon - img.astype(jnp.float32)) ** 2)
        return beta_recon * recon_loss + out.vq_loss, (recon_loss, out.vq_loss, out.hits)

    @jax.jit
    def step(state: VAETrainState, img):
        (loss, (recon, vq, hits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img)
        # data-parallel runs shard the batch; hits must be global before the
        # EMA update (reference async all_reduce, quant.py:79-93). Under
        # pjit-with-sharded-batch the bincount above is already global.
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = q.update_ema_hits(state.ema_hits, hits, state.record_hit)
        new_state = VAETrainState(params, opt_state, ema,
                                  state.record_hit + 1, state.step + 1)
        metrics = {"loss": loss, "recon": recon, "vq": vq}
        return new_state, metrics

    return init_state, step


def vocab_usage_percent(state: VAETrainState, cfg: VAEConfig, world_size: int,
                        batch: int) -> jax.Array:
    """(S,) percent of codebook in live use (reference margin rule,
    quant.py:100-102)."""
    tokens_per_img = cfg.v_patch_nums[-1] ** 2
    return q.vocab_usage(state.ema_hits, cfg, world_size, tokens_per_img, batch)
