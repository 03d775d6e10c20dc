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

from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_IMPL = "xla"


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | jax.Array,
    bias: Optional[jax.Array] = None,
    impl: str = DEFAULT_IMPL,
    scale_ends: Optional[tuple] = None,
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
        from var_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, scale_ends=scale_ends)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32) * scale
    if scale_ends is not None:
        # factored block-causal mask: level(p) = #{e in ends : p >= e};
        # attend where key-level <= query-level. Computed from iotas in
        # place of an L x L bias constant — AD saved a (depth, B, H, L, L)
        # fp32 broadcast of the bias tensor as a scan residual (8 GB at
        # d16 bs16), where this form is recomputed for free.
        def _levels(n):
            pos = jnp.arange(n)
            lvl = jnp.zeros((n,), jnp.int32)
            for e in scale_ends:
                lvl = lvl + (pos >= e).astype(jnp.int32)
            return lvl

        ok = _levels(k.shape[1])[None, :] <= _levels(q.shape[1])[:, None]
        logits = jnp.where(ok[None, None], logits, -jnp.inf)
    elif bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)
