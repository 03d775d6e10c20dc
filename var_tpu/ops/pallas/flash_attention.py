"""Pallas TPU flash attention for VAR.

Replaces the reference's CUDA attention stack (flash-attn / xformers /
SDPA, ``models/basic_var.py:14-30,96-117``) with an in-repo TPU kernel:

* online-softmax streaming over KV blocks — O(L) memory instead of the
  materialized L x L bias (``var.py:107-112``), which is what makes the
  512px (L=2240) and 1024px (L=9451) presets trainable.
* VAR's block-causal mask is evaluated *in kernel* from per-position scale
  ids (key-scale <= query-scale), so no L x L mask tensor ever exists.
* custom VJP with Pallas backward kernels (dq and dk/dv passes) using the
  standard recompute-from-logsumexp formulation.
* the same forward with no mask is the decode-time kernel over the growing
  KV cache (q block = current scale's tokens).

Layout contract: q (B, Lq, H, D), k/v (B, Lk, H, D) — matching
``var_tpu.ops.attention``. Softmax statistics in fp32; matmuls hit the MXU
with ``preferred_element_type=float32``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
NEG_INF = float(np.finfo(np.float32).min)  # large-negative, not -inf (NaN-safe)


def _pick_block(n: int, target: int = 256) -> int:
    """Largest multiple-of-8 block <= target covering n (or n itself)."""
    if n <= target:
        return max(8, -(-n // 8) * 8)
    return target


# ---------------------------------------------------------------------------
# forward kernel


def _fwd_kernel(lvlq_ref, lvlk_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                block_k: int, lk: int, masked: bool):
    q = q_ref[0].astype(F32)  # (Bq, D)
    bq = q.shape[0]
    d = q.shape[1]
    nk = pl.cdiv(lk, block_k)
    m = jnp.full((bq, 1), NEG_INF, F32)
    l = jnp.zeros((bq, 1), F32)
    acc = jnp.zeros((bq, d), F32)
    if masked:
        lvl_q = lvlq_ref[0, :, 0]  # (Bq,)

    for kb in range(nk):  # static unroll over KV blocks
        k_blk = k_ref[0, kb * block_k:(kb + 1) * block_k].astype(F32)  # (Bk, D)
        v_blk = v_ref[0, kb * block_k:(kb + 1) * block_k].astype(F32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=F32
        )  # (Bq, Bk)
        if masked:
            lvl_k = lvlk_ref[0, kb * block_k:(kb + 1) * block_k, 0]  # (Bk,)
            ok = lvl_k[None, :] <= lvl_q[:, None]
            s = jnp.where(ok, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=F32
        )
        m = m_new

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)  # (Bq, 1)


def _fwd(q3, k3, v3, lvl_q, lvl_k, block_q, block_k, masked, interpret):
    bh, lq, d = q3.shape
    lk = k3.shape[1]
    nq = pl.cdiv(lq, block_q)
    grid = (bh, nq)
    kernel = functools.partial(_fwd_kernel, block_k=block_k, lk=lk, masked=masked)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, 1), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, lq, 1), F32),
        ],
        interpret=interpret,
    )(lvl_q[None, :, None], lvl_k[None, :, None], q3, k3, v3)
    return out, lse


# ---------------------------------------------------------------------------
# backward kernels (recompute-from-LSE formulation)


def _bwd_dq_kernel(lvlq_ref, lvlk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, *, block_k: int, lk: int, masked: bool):
    q = q_ref[0].astype(F32)
    do = do_ref[0].astype(F32)
    lse = lse_ref[0]  # (Bq, 1)
    delta = delta_ref[0]
    bq, d = q.shape
    dq = jnp.zeros((bq, d), F32)
    if masked:
        lvl_q = lvlq_ref[0, :, 0]
    for kb in range(pl.cdiv(lk, block_k)):
        k_blk = k_ref[0, kb * block_k:(kb + 1) * block_k].astype(F32)
        v_blk = v_ref[0, kb * block_k:(kb + 1) * block_k].astype(F32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)
        if masked:
            lvl_k = lvlk_ref[0, kb * block_k:(kb + 1) * block_k, 0]
            s = jnp.where(lvl_k[None, :] <= lvl_q[:, None], s, NEG_INF)
        p = jnp.exp(s - lse)  # (Bq, Bk)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)
        ds = p * (dp - delta)
        dq = dq + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())),
                                      preferred_element_type=F32)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(lvlq_ref, lvlk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, *, block_q: int, lq: int, masked: bool):
    k_blk = k_ref[0].astype(F32)  # (Bk, D)
    v_blk = v_ref[0].astype(F32)
    bk, d = k_blk.shape
    dk = jnp.zeros((bk, d), F32)
    dv = jnp.zeros((bk, d), F32)
    if masked:
        lvl_k = lvlk_ref[0, :, 0]
    for qb in range(pl.cdiv(lq, block_q)):
        q = q_ref_block = q_ref[0, qb * block_q:(qb + 1) * block_q].astype(F32)
        do = do_ref[0, qb * block_q:(qb + 1) * block_q].astype(F32)
        lse = lse_ref[0, qb * block_q:(qb + 1) * block_q]  # (Bq, 1)
        delta = delta_ref[0, qb * block_q:(qb + 1) * block_q]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)
        if masked:
            lvl_q = lvlq_ref[0, qb * block_q:(qb + 1) * block_q, 0]
            s = jnp.where(lvl_k[None, :] <= lvl_q[:, None], s, NEG_INF)
        p = jnp.exp(s - lse)  # (Bq, Bk)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=F32)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=F32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(q3, k3, v3, lvl_q, lvl_k, out, lse, do, block_q, block_k, masked, interpret):
    bh, lq, d = q3.shape
    lk = k3.shape[1]
    delta = jnp.sum(do.astype(F32) * out.astype(F32), axis=-1, keepdims=True)  # (BH, Lq, 1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, lk=lk, masked=masked),
        grid=(bh, pl.cdiv(lq, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, 1), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q3.dtype),
        interpret=interpret,
    )(lvl_q[None, :, None], lvl_k[None, :, None], q3, k3, v3, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, lq=lq, masked=masked),
        grid=(bh, pl.cdiv(lk, block_k)),
        in_specs=[
            pl.BlockSpec((1, lq, 1), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v3.dtype),
        ],
        interpret=interpret,
    )(lvl_q[None, :, None], lvl_k[None, :, None], q3, k3, v3, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash(q3, k3, v3, lvl_q, lvl_k, masked: bool, block_sizes, interpret: bool):
    out, _ = _fwd(q3, k3, v3, lvl_q, lvl_k, block_sizes[0], block_sizes[1],
                  masked, interpret)
    return out


def _flash_fwd(q3, k3, v3, lvl_q, lvl_k, masked, block_sizes, interpret):
    out, lse = _fwd(q3, k3, v3, lvl_q, lvl_k, block_sizes[0], block_sizes[1],
                    masked, interpret)
    return out, (q3, k3, v3, lvl_q, lvl_k, out, lse)


def _flash_bwd(masked, block_sizes, interpret, res, do):
    q3, k3, v3, lvl_q, lvl_k, out, lse = res
    dq, dk, dv = _bwd(q3, k3, v3, lvl_q, lvl_k, out, lse, do,
                      block_sizes[0], block_sizes[1], masked, interpret)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float = 1.0,
    bias: Optional[jax.Array] = None,
    level_ids_q: Optional[jax.Array] = None,
    level_ids_k: Optional[jax.Array] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over BLHD tensors with VAR's block-causal scale mask.

    Either pass ``level_ids_q/k`` (int32 scale ids; attend where
    k-level <= q-level) or nothing (dense attention, the decode case).
    ``bias`` is accepted for API compatibility with the XLA path but only
    the block-causal pattern derived from level ids is supported here —
    callers that need an arbitrary bias should use impl='xla'.
    """
    assert bias is None, "pallas path takes level_ids, not a dense bias"
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if lq < 8 or lk < 8:
        # tiny decode stages (1-4 query tokens): below the TPU tile minimum
        # and faster as a plain fused dot-general anyway
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(F32) * scale
        if level_ids_q is not None:
            ok = level_ids_k[None, :] <= level_ids_q[:, None]
            logits = jnp.where(ok[None, None], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", probs, v)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    masked = level_ids_q is not None
    if not masked:
        level_ids_q = jnp.zeros((lq,), jnp.int32)
        level_ids_k = jnp.zeros((lk,), jnp.int32)

    bq = min(block_q, _pick_block(lq))
    bk = min(block_k, _pick_block(lk))
    # fold scale into q (scalar; the l2-norm path pre-scales q itself)
    qs = (q.astype(F32) * scale).astype(q.dtype)
    # BLHD -> (B*H, L, D)
    q3 = qs.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    out = _flash(q3, k3, v3, level_ids_q.astype(jnp.int32),
                 level_ids_k.astype(jnp.int32), masked, (bq, bk), interpret)
    return out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
