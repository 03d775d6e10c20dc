"""shard_map bridges: the Pallas attention kernels under a device mesh.

XLA's SPMD partitioner cannot auto-partition a ``pallas_call`` over sharded
operands, so on a mesh the kernels must be invoked per-device via
``jax.shard_map``. Attention is embarrassingly parallel over (batch, head):
batch shards over the mesh's 'data' axis and heads over 'model' — in the
merged (B, L, C = H*64) layout every contiguous C/mp lane chunk is a whole
group of heads, so a plain ``PartitionSpec('data', None, 'model')`` hands
each device complete heads and the kernel runs unchanged with
``h_local = H/mp``. No collectives are needed inside (the surrounding
matmuls stay in XLA-propagated SPMD land; shard_map reshards its operands
to the declared specs automatically).

This is the TPU-native replacement seam for the reference's DDP training
path (``train.py:102``, ``dist.py:20-49``): data parallelism = 'data'
sharding here + XLA's gradient all-reduce; tensor parallelism = the
'model' head sharding (reference has none — SURVEY.md §2c).

Geometry contract (checked by :func:`paired_mesh_ok`): mp divides H with an
EVEN per-device head count (the paired kernels process heads two at a time
in 128-lane tiles) and dp divides the batch. Callers fall back to the XLA
attention path when it does not hold — 'auto' never produces an
un-partitionable kernel on a pod.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from var_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

F32 = jnp.float32


def axis_sizes(mesh: Mesh):
    """(dp, mp) — sizes of the data/model axes (1 if absent)."""
    return (int(mesh.shape.get(DATA_AXIS, 1)), int(mesh.shape.get(MODEL_AXIS, 1)))


def mesh_is_trivial(mesh: Optional[Mesh]) -> bool:
    if mesh is None:
        return True
    dp, mp = axis_sizes(mesh)
    return dp * mp == 1


def paired_mesh_ok(mesh: Optional[Mesh], num_heads: int, batch: int) -> bool:
    """Can the paired (head-pair, merged-lane) kernels run under this mesh?"""
    if mesh is None:
        return False
    dp, mp = axis_sizes(mesh)
    if num_heads % mp or (num_heads // mp) % 2:
        return False  # per-device head count must be even (pairs)
    return batch % dp == 0


def flash_mesh_ok(mesh: Optional[Mesh], num_heads: int, batch: int) -> bool:
    """Geometry check for the BLHD streaming kernel (per-head grid: any
    positive per-device head count works)."""
    if mesh is None:
        return False
    dp, mp = axis_sizes(mesh)
    return num_heads % mp == 0 and batch % dp == 0


def _smap(fn, mesh, in_specs, out_specs):
    # check_vma off: pallas_call + custom_vjp bodies don't carry the
    # varying-manual-axes metadata the checker wants
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


BLC = P(DATA_AXIS, None, MODEL_AXIS)  # merged (B, L, C): heads on the lane dim


def paired_train(mesh: Mesh, q_m, k_m, v_m, num_heads: int, scale,
                 scale_ends) -> jax.Array:
    """:func:`flash_attention_paired_train` over the mesh. The scale mask is
    position-only, so every head shard evaluates it identically."""
    from var_tpu.ops.pallas.flash_attention import flash_attention_paired_train

    _, mp = axis_sizes(mesh)
    h_local = num_heads // mp

    def local(q_, k_, v_):
        return flash_attention_paired_train(q_, k_, v_, h_local, scale, scale_ends)

    return _smap(local, mesh, (BLC, BLC, BLC), BLC)(q_m, k_m, v_m)


def decode_paired(mesh: Mesh, q_m, k_m, v_m, num_heads: int, scale) -> jax.Array:
    """:func:`flash_decode_paired` over the mesh (concat/prealloc caches)."""
    from var_tpu.ops.pallas.flash_attention import flash_decode_paired

    _, mp = axis_sizes(mesh)
    h_local = num_heads // mp

    def local(q_, k_, v_):
        return flash_decode_paired(q_, k_, v_, h_local, scale)

    return _smap(local, mesh, (BLC, BLC, BLC), BLC)(q_m, k_m, v_m)


def decode_paired_chunks(mesh: Mesh, qkv, k_chunks: Sequence[jax.Array],
                         v_chunks: Sequence[jax.Array], layer_idx,
                         num_heads: int, scale,
                         q_l2_scale_mul: Optional[jax.Array]) -> jax.Array:
    """:func:`flash_decode_paired_chunks` over the mesh.

    The fused (B, L, 3C) qkv CANNOT shard its lane dim directly (a
    contiguous 3C/mp chunk straddles the q|k|v segments), so the q lanes are
    sliced out in XLA-land first — the same (B, L, C) head-group sharding
    then applies. Past-stage chunks are (depth, B, l_i, C); the current
    stage's fresh k/v are (B, l, C). ``layer_idx`` (a scan-traced scalar)
    and nothing else is replicated."""
    from var_tpu.ops.pallas.flash_attention import flash_decode_paired_chunks

    _, mp = axis_sizes(mesh)
    h_local = num_heads // mp
    c = 64 * num_heads
    qm = qkv[..., :c]
    n = len(k_chunks)
    l2 = q_l2_scale_mul is not None
    sm = (jnp.asarray(q_l2_scale_mul, F32).reshape(num_heads) if l2
          else jnp.ones((num_heads,), F32))
    idx = jnp.asarray(layer_idx, jnp.int32)

    def chunk_spec(kc):
        if kc.ndim == 4:  # stacked (depth, B, l_i, C)
            return P(None, DATA_AXIS, None, MODEL_AXIS)
        return BLC

    in_specs = (BLC, P(), P(MODEL_AXIS),
                *[chunk_spec(kc) for kc in k_chunks],
                *[chunk_spec(vc) for vc in v_chunks])

    def local(qm_, idx_, sm_, *chunks):
        ks, vs = chunks[:n], chunks[n:]
        return flash_decode_paired_chunks(
            qm_, ks, vs, idx_, h_local, scale,
            q_l2_scale_mul=sm_ if l2 else None)

    return _smap(local, mesh, in_specs, BLC)(qm, idx, sm, *k_chunks, *v_chunks)


BLHD = P(DATA_AXIS, None, MODEL_AXIS, None)  # split-head (B, L, H, D)


def flash_blhd(mesh: Mesh, q, k, v, scale, scale_ends) -> jax.Array:
    """Streaming :func:`flash_attention` (BLHD) over the mesh — the long-
    preset (512/1024px) training/eval kernel, O(block) VMEM per program."""
    from var_tpu.ops.pallas.flash_attention import flash_attention

    def local(q_, k_, v_):
        return flash_attention(q_, k_, v_, scale=scale, scale_ends=scale_ends)

    return _smap(local, mesh, (BLHD, BLHD, BLHD), BLHD)(q, k, v)
