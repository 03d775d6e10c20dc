"""Attention for the VAR transformer.

The reference dispatches flash-attn / xformers / torch-SDPA CUDA kernels
(``models/basic_var.py:14-30,96-117``). Here the default is an XLA
dot-general pair (fuses well on the MXU for VAR's short sequences: 680
tokens @256px), with a Pallas flash-attention kernel for the longer 512px /
1024px presets (``var_tpu.ops.pallas.flash_attention``).

Layout is BLHD (batch, seq, heads, head_dim) to match flash kernels and
avoid transposes at the callsite.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_IMPL = "xla"


def recompute_grad(fn, bwd_fn=None):
    """``jax.checkpoint`` semantics via custom_vjp + ``jax.vjp`` in the
    backward: residuals are exactly ``fn``'s inputs; everything inside is
    re-derived when the cotangent arrives. Emits plain HLO instead of remat
    regions — XLA:TPU compile time exploded (>30 min at d16) on
    checkpoint regions nested in the depth scan, while this form compiles
    like any other graph.

    ``bwd_fn``: optional numerically-equivalent implementation whose VJP is
    used in the backward instead of ``fn``'s — e.g. a flash-attention primal
    (no L x L tensor in forward) paired with a dense backward (XLA's
    attention VJP beats the flash VJP at L=680, BENCH_extra.json)."""

    @jax.custom_vjp
    def wrapped(*args):
        return fn(*args)

    def fwd(*args):
        return fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(bwd_fn if bwd_fn is not None else fn, *args)
        return vjp(g)

    wrapped.defvjp(fwd, bwd)
    return wrapped


def _levels_mask(lq: int, lk: int, scale_ends) -> jax.Array:
    """(Lq, Lk) bool block-causal validity from the factored scale ends."""
    def _levels(n):
        pos = jnp.arange(n)
        lvl = jnp.zeros((n,), jnp.int32)
        for e in scale_ends:
            lvl = lvl + (pos >= e).astype(jnp.int32)
        return lvl

    return _levels(lk)[None, :] <= _levels(lq)[:, None]


def _dense_probs(q, k, scale, scale_ends):
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32) * scale
    if scale_ends is not None:
        logits = jnp.where(_levels_mask(q.shape[1], k.shape[1], scale_ends)[None, None],
                           logits, -jnp.inf)
    return jax.nn.softmax(logits, axis=-1)




def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | jax.Array,
    bias: Optional[jax.Array] = None,
    impl: str = DEFAULT_IMPL,
    scale_ends: Optional[tuple] = None,
    mesh=None,
) -> jax.Array:
    """softmax(q @ k^T * scale + bias) @ v.

    q: (B, Lq, H, D); k, v: (B, Lk, H, D); bias broadcastable to
    (B, H, Lq, Lk) (the reference's additive block-causal mask,
    ``var.py:107-112``). ``scale_ends`` = static cumulative per-scale token
    counts — the mask in factored form, required by the pallas path (which
    never materializes the L x L bias). Softmax in fp32; output in q.dtype.
    """
    if scale_ends is not None:
        # the factored mask derives query levels from position 0; a KV-cached
        # caller (Lq < Lk) would get silently wrong levels — decode never
        # passes scale_ends, so reject the combination outright
        assert q.shape[1] == k.shape[1], \
            "scale_ends requires full-sequence q (no KV cache offset)"
    if impl == "pallas":
        from var_tpu.parallel import shard_attn as sa

        if sa.mesh_is_trivial(mesh):
            from var_tpu.ops.pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale, scale_ends=scale_ends)
        # XLA cannot partition a pallas_call over sharded operands: shard
        # batch over 'data' and heads over 'model' via shard_map (attention
        # is per-(batch, head) independent), or fall back to the
        # partitionable XLA path when the geometry doesn't shard
        if sa.flash_mesh_ok(mesh, q.shape[2], q.shape[0]):
            return sa.flash_blhd(mesh, q, k, v, scale, scale_ends)
        impl = "xla"
    if bias is None:
        # factored block-causal mask: level(p) = #{e in ends : p >= e};
        # attend where key-level <= query-level. Computed from iotas in
        # place of an L x L bias constant — AD saved a (depth, B, H, L, L)
        # fp32 broadcast of the bias tensor as a scan residual (8 GB at
        # d16 bs16), where this form is recomputed for free.
        probs = _dense_probs(q, k, scale, scale_ends).astype(v.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", probs, v)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32) * scale
    logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)
