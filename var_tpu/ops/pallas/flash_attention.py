"""Pallas TPU flash attention for VAR.

Replaces the reference's CUDA attention stack (flash-attn / xformers /
SDPA, ``models/basic_var.py:14-30,96-117``) with an in-repo TPU kernel:

* online-softmax with KV streamed through the pallas pipeline (3-D grid
  ``(batch*heads, q_blocks, kv_blocks)``; running max / denominator /
  accumulator live in VMEM scratch across the innermost grid dim) —
  O(block) VMEM regardless of sequence length, which is what makes the
  512px (L=2240) and 1024px (L=9451) presets trainable.
* VAR's block-causal mask is evaluated *in kernel* from the position iota
  against the static scale boundaries (level(p) = #ends <= p; attend where
  key-level <= query-level) — no L x L bias tensor and no mask operands at
  all (an s32 level-id input was enough to trip XLA's scoped-VMEM
  accounting at L=2240).
* custom VJP with Pallas backward kernels (dq and dk/dv passes) using the
  standard recompute-from-logsumexp formulation, same streaming structure.
* the same forward with no mask is the decode-time kernel over the growing
  KV cache (q block = current scale's tokens).

Layout contract: q (B, Lq, H, D), k/v (B, Lk, H, D) — matching
``var_tpu.ops.attention``. Softmax statistics in fp32; matmuls hit the MXU
with ``preferred_element_type=float32``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
NEG_INF = float(np.finfo(np.float32).min)  # large-negative, not -inf (NaN-safe)
LANES = 128  # scalar-per-row scratch is stored broadcast across one lane tile


def _pick_block(n: int, target: int) -> int:
    """Multiple-of-8 block covering n, capped at target."""
    if n <= target:
        return max(8, -(-n // 8) * 8)
    return target


def head_segment_matrix(num_heads: int, head_dim: int) -> jax.Array:
    """(C, H) block-diagonal ones matrix for per-head reductions on MERGED
    (.., C = H*D) lanes: ``x2 @ seg`` sums within each head's lane group and
    ``vals @ seg.T`` broadcasts per-head values back to the lanes. Shared by
    the merged-lane q/k L2 norm (``models/var.py::_split_norm``) and the
    paired-train backward's delta reduction — both must agree on the
    head->lane layout, so there is exactly one construction of it."""
    return jnp.asarray(np.kron(np.eye(num_heads, dtype=np.float32),
                               np.ones((head_dim, 1), np.float32)))


def _pick_block_q_ptrain(n: int, target: int, interpret: bool) -> int:
    """q-block choice for the paired-train kernels: Mosaic constrains the
    lse output block's trailing dim (= bq) to a multiple of 128 or the full
    array dim, so on hardware blocks round to 128 (padded rows are masked
    and their outputs discarded); interpret mode keeps the tests' tiny
    multiple-of-8 blocks. Every return value is target (a multiple of 128)
    or a multiple of the granule — pinned by tests/test_flash_attention.py."""
    g = 8 if interpret else 128
    return target if n > target else max(g, -(-n // g) * g)


def _pick_block_k(l: int, target: int) -> int:
    """K-stream block minimizing padded grid work.

    cdiv(L, bk) * bk - L rows of every K pass are pure padding — at the
    256px geometry (L=680) the old fixed bk=512 padded to 1024, i.e. 33%
    wasted MXU work, and bk=680 measured 36% faster fwd+bwd
    (scripts/bench_ptrain_blocks.py). A single block covering L removes
    padding entirely and is used whenever L is small enough to sit in VMEM
    comfortably; beyond that, pick the multiple-of-16 block near ``target``
    with the least total padded rows (e.g. 512px L=2240 -> bk=560, zero
    padding, vs 2560 rows at bk=512).
    """
    if l <= 1024:
        return max(8, -(-l // 8) * 8)
    best, best_cost = target, -(-l // target) * target
    for bk in range(256, min(2 * target, 1024) + 1, 16):
        cost = -(-l // bk) * bk
        if cost < best_cost or (cost == best_cost and bk > best):
            best, best_cost = bk, cost
    return best


# the paired TRAIN kernels' working set at C=1024 (bq=256, bk=512 blocks +
# double buffering + fp32 scratch) sits ~2% over Mosaic's default 16M scoped-
# vmem cap (measured: 16.31M at d16 bs32 256px). v5e has 128M physical VMEM;
# raise the cap rather than shrink the measured-optimal blocks.
PTRAIN_VMEM_LIMIT = 96 * 1024 * 1024  # 1024px segment prefixes pick bk=1024
#   blocks whose dkv-bwd stack needs ~52M; v5e has 128M physical VMEM


def _params(dim_sems, vmem_limit: int = 0):
    # vmem_limit raises Mosaic's scoped-vmem stack cap (default 16M; v5e has
    # 128M physical VMEM) for kernels whose per-program intermediates are
    # deliberately large (paired decode: whole K/V resident + (2Bq, Lk)
    # probs + their bf16 hi/lo split)
    if vmem_limit:
        return pltpu.CompilerParams(dimension_semantics=dim_sems,
                                    vmem_limit_bytes=vmem_limit)
    return pltpu.CompilerParams(dimension_semantics=dim_sems)


def _levels_of(pos: jax.Array, ends: Tuple[int, ...]) -> jax.Array:
    """Scale id of each position: level(p) = #{e in ends : p >= e}.

    ``ends`` are the static cumulative token counts per scale (cfg.begin_ends
    ends). Positions past the last end (tail-block padding) get a level
    larger than any real query level, so padded KEY columns mask themselves.
    """
    lvl = jnp.zeros(pos.shape, jnp.int32)
    for e in ends:
        lvl = lvl + (pos >= e).astype(jnp.int32)
    return lvl


def _zero_pad_rows(x, block_idx, limit):
    """Zero rows past ``limit`` — pallas pads out-of-bounds tail blocks with
    arbitrary values (NaN in interpret mode), and 0 * NaN = NaN would leak
    through the matmuls even where probabilities are zero."""
    row = block_idx * x.shape[0] + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(row < limit, x, 0.0)


def _mask(qi, ki, bq, bk, lk, ends):
    """(Bq, Bk) validity: key in-range and (if ends) key-level <= query-level."""
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    valid = col < lk
    if ends is not None:
        row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        valid = valid & (_levels_of(col, ends) <= _levels_of(row, ends))
    return valid


# ---------------------------------------------------------------------------
# forward kernel: grid (BH, nq, nk); scratch carries online-softmax state


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, ends, lk: int):
    qi = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # bf16 inputs keep bf16 MXU-rate dots with f32 accumulation — the same
    # operand precision as the XLA dense path (its einsum dots bf16 q/k and
    # casts softmax output to v.dtype); fp32 inputs keep full-precision dots
    fast = q_ref.dtype == jnp.bfloat16
    q = q_ref[0] if fast else q_ref[0].astype(F32)  # (Bq, D)
    k = k_ref[0] if fast else k_ref[0].astype(F32)  # (Bk, D)
    v = _zero_pad_rows(v_ref[0] if fast else v_ref[0].astype(F32), j, lk)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=F32)  # (Bq, Bk)
    s = jnp.where(_mask(qi, j, q.shape[0], k.shape[0], lk, ends), s, NEG_INF)

    m_prev = m_scr[:, :1]  # (Bq, 1)
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=F32)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _flush():
        l_safe = jnp.where(l_scr[:, :1] == 0.0, 1.0, l_scr[:, :1])
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:, :1] + jnp.log(l_safe)


def _fwd(q3, k3, v3, block_q, block_k, ends, interpret):
    bh, lq, d = q3.shape
    lk = k3.shape[1]
    grid = (bh, pl.cdiv(lq, block_q), pl.cdiv(lk, block_k))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, ends=ends, lk=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, qi, ki: (i, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, qi, ki: (i, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, lq, 1), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), F32),  # m
            pltpu.VMEM((block_q, LANES), F32),  # l
            pltpu.VMEM((block_q, d), F32),      # acc
        ],
        compiler_params=_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q3, k3, v3)
    return out, lse


# ---------------------------------------------------------------------------
# backward kernels (recompute-from-LSE); same streaming structure


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_scr, *, ends, lk: int):
    qi = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    fast = q_ref.dtype == jnp.bfloat16  # bf16 MXU-rate dots, f32 softmax math
    q = q_ref[0] if fast else q_ref[0].astype(F32)
    k = _zero_pad_rows(k_ref[0] if fast else k_ref[0].astype(F32), j, lk)
    v = _zero_pad_rows(v_ref[0] if fast else v_ref[0].astype(F32), j, lk)
    do = do_ref[0] if fast else do_ref[0].astype(F32)
    lse = lse_ref[0]  # (Bq, 1)
    delta = delta_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=F32)
    s = jnp.where(_mask(qi, j, q.shape[0], k.shape[0], lk, ends), s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=F32)
    ds = p * (dp - delta)
    dq_scr[...] += jax.lax.dot_general(ds.astype(q.dtype), k,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=F32)

    @pl.when(j == nk - 1)
    def _flush():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, ends, lq: int, lk: int):
    ki = pl.program_id(1)
    j = pl.program_id(2)  # query-block index
    nq = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    fast = q_ref.dtype == jnp.bfloat16  # bf16 MXU-rate dots, f32 softmax math
    q = _zero_pad_rows(q_ref[0] if fast else q_ref[0].astype(F32), j, lq)
    k = k_ref[0] if fast else k_ref[0].astype(F32)  # (Bk, D)
    v = v_ref[0] if fast else v_ref[0].astype(F32)
    do = _zero_pad_rows(do_ref[0] if fast else do_ref[0].astype(F32), j, lq)
    lse = _zero_pad_rows(lse_ref[0], j, lq)  # (Bq, 1)
    delta = _zero_pad_rows(delta_ref[0], j, lq)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=F32)  # (Bq, Bk)
    bq, bk = s.shape
    row = j * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    # note the swapped roles: grid dim 1 is the KV block, dim 2 the q block
    valid = (row < lq) & _mask(j, ki, bq, bk, lk, ends)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.where(row < lq, jnp.exp(s - lse), 0.0)
    dv_scr[...] += jax.lax.dot_general(p.astype(q.dtype), do,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=F32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=F32)
    ds = jnp.where(row < lq, p * (dp - delta), 0.0)
    dk_scr[...] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=F32)

    @pl.when(j == nq - 1)
    def _flush():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd(q3, k3, v3, out, lse, do, block_q, block_k, ends, interpret):
    bh, lq, d = q3.shape
    lk = k3.shape[1]
    delta = jnp.sum(do.astype(F32) * out.astype(F32), axis=-1, keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, ends=ends, lk=lk),
        grid=(bh, pl.cdiv(lq, block_q), pl.cdiv(lk, block_k)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, qi, ki: (i, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, qi, ki: (i, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, qi, ki: (i, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q3.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), F32)],
        compiler_params=_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q3, k3, v3, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, ends=ends, lq=lq, lk=lk),
        grid=(bh, pl.cdiv(lk, block_k), pl.cdiv(lq, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, ki, qi: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, ki, qi: (i, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, ki, qi: (i, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, ki, qi: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, ki, qi: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, ki, qi: (i, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, ki, qi: (i, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, ki, qi: (i, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v3.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), F32), pltpu.VMEM((block_k, d), F32)],
        compiler_params=_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q3, k3, v3, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q3, k3, v3, ends, block_sizes, interpret: bool):
    out, _ = _fwd(q3, k3, v3, block_sizes[0], block_sizes[1], ends, interpret)
    return out


def _flash_fwd(q3, k3, v3, ends, block_sizes, interpret):
    out, lse = _fwd(q3, k3, v3, block_sizes[0], block_sizes[1], ends, interpret)
    return out, (q3, k3, v3, out, lse)


def _flash_bwd(ends, block_sizes, interpret, res, do):
    q3, k3, v3, out, lse = res
    dq, dk, dv = _bwd(q3, k3, v3, out, lse, do, block_sizes[0], block_sizes[1],
                      ends, interpret)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float = 1.0,
    bias: Optional[jax.Array] = None,
    scale_ends: Optional[Sequence[int]] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over BLHD tensors with VAR's block-causal scale mask.

    ``scale_ends``: static cumulative per-scale token counts (the ends of
    ``cfg.begin_ends``); attend where key-scale <= query-scale. None = dense
    attention (the decode case). ``bias`` is accepted for API compatibility
    with the XLA path but only the block-causal pattern is supported here —
    callers needing an arbitrary bias should use impl='xla'.
    """
    assert bias is None, "pallas path takes scale_ends, not a dense bias"
    b, lq, h, d = q.shape
    lk = k.shape[1]
    ends = tuple(int(e) for e in scale_ends) if scale_ends is not None else None
    if lq < 8 or lk < 8:
        # tiny decode stages (1-4 query tokens): below the TPU tile minimum
        # and faster as a plain fused dot-general anyway — the ONE dense
        # masked-softmax implementation lives in ops.attention (lazy import:
        # that module dispatches to this one inside functions)
        from var_tpu.ops.attention import _dense_probs

        probs = _dense_probs(q, k, scale, ends).astype(v.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", probs, v)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    bq = _pick_block(lq, block_q)
    bk = _pick_block_k(lk, block_k)
    # fold scale into q (scalar; the l2-norm path pre-scales q itself)
    qs = (q.astype(F32) * scale).astype(q.dtype)
    # BLHD -> (B*H, L, D)
    q3 = qs.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    out = _flash(q3, k3, v3, ends, (bq, bk), interpret)
    return out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# paired-head decode kernel: all slicing at 128-lane tile granularity


def _fwd_kernel_paired(q_ref, k_ref, v_ref, o_ref, *, lk: int, nh: int, d: int):
    """One (batch, q-block) program, whole K/V in VMEM, softmax per row.

    C is covered in 128-lane tiles; tile j holds heads (2j, 2j+1). For the
    QK dot the two heads are separated by stacking two lane-masked copies of
    the q tile ([q_even|0] and [0|q_odd]) along rows — a (2Bq, 128) x
    (128, Bk) dot then yields both heads' logits with NO sub-tile lane
    slicing (Mosaic relayouts made a per-head 64-lane-slice kernel 4x slower
    than XLA). The PV dot computes both heads against the full tile and the
    halves are recombined with constant lane masks.
    """
    q = q_ref[0]  # (Bq, C)
    k = k_ref[0]  # (Bk, C)
    v = v_ref[0]  # (Bk, C)
    bq = q.shape[0]
    bk = k.shape[0]
    # bf16 inputs take MXU-rate dots: masking q by 0/1 and the QK dot with
    # fp32 accumulation are EXACT for bf16 operands (4x the fp32-dot rate),
    # and the PV dot uses the fp32-normalized probs cast to bf16 — the same
    # precision the XLA decode path ships (``attention`` casts softmax
    # output to v.dtype). fp32 inputs (parity tests call the kernel
    # directly with fp32) keep full-precision dots.
    fast = q.dtype == jnp.bfloat16
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    m_even = (lane < d).astype(F32)  # [1]*d + [0]*d
    m_odd = 1.0 - m_even
    col_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) < lk)
    for j in range(nh // 2):
        sl = slice(j * 2 * d, (j + 1) * 2 * d)  # one full 128-lane tile
        qt = q[:, sl] if fast else q[:, sl].astype(F32)  # (Bq, 128)
        kt = k[:, sl] if fast else k[:, sl].astype(F32)  # (Bk, 128)
        # zero padded tail rows: their probs are 0 but 0 * NaN = NaN
        row_ok = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) < lk
        vt = jnp.where(row_ok, v[:, sl], 0).astype(qt.dtype)
        me = m_even.astype(qt.dtype)
        mo = m_odd.astype(qt.dtype)
        qe = jnp.concatenate([qt * me, qt * mo], axis=0)  # (2Bq, 128)
        s = jax.lax.dot_general(qe, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)  # (2Bq, Bk)
        s = jnp.where(col_ok, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if fast:
            p = p.astype(jnp.bfloat16)
        o2 = jax.lax.dot_general(p, vt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=F32)  # (2Bq, 128)
        o_ref[0, :, sl] = (o2[:bq] * m_even + o2[bq:] * m_odd).astype(o_ref.dtype)


def _fwd_kernel_paired_chunks(idx_ref, sm_ref, q_ref, *rest, nchunks: int,
                              lks: Tuple[int, ...], nh: int, d: int,
                              scale: float, l2: bool):
    """Chunked-KV variant of :func:`_fwd_kernel_paired`: the cache is a list
    of per-stage (depth, B, l_i, C) chunks read in place at layer ``idx_ref``
    (scalar-prefetched scan counter) — no concatenated cache buffer exists in
    HBM anywhere. The chunk blocks are joined once per program in VMEM
    (aligned concat; every block is sublane-rounded) and the head-pair loop
    then matches :func:`_fwd_kernel_paired` exactly, with the tail-padding
    mask precomputed per segment as a trace-time constant.
    """
    k_refs = rest[:nchunks]
    v_refs = rest[nchunks : 2 * nchunks]
    o_ref = rest[2 * nchunks]
    q = q_ref[0]  # (Bq, C)
    bq = q.shape[0]
    fast = q.dtype == jnp.bfloat16
    # Assemble the chunks into one (sum bk_i, C) VMEM value up front: every
    # chunk block is sublane-rounded (bk_i % 8 == 0), so the concat is an
    # aligned, layout-preserving shuffle done ONCE per program — the nh/2
    # head-pair dots then run at full MXU width exactly like the
    # single-buffer kernel (a per-chunk dot loop measured ~2x kernel time:
    # 10 narrow dots under-fill the MXU's 128-wide passes).
    k_parts, v_parts, col_parts = [], [], []
    for ci in range(nchunks):
        kc = k_refs[ci][0, 0] if k_refs[ci].ndim == 4 else k_refs[ci][0]
        vc = v_refs[ci][0, 0] if v_refs[ci].ndim == 4 else v_refs[ci][0]
        row_ok = jax.lax.broadcasted_iota(jnp.int32, (vc.shape[0], 1), 0) < lks[ci]
        k_parts.append(kc)
        v_parts.append(jnp.where(row_ok, vc, 0))  # padded rows: 0 * NaN = NaN
        col_parts.append(kc.shape[0])
    k = k_parts[0] if nchunks == 1 else jnp.concatenate(k_parts, axis=0)
    v = v_parts[0] if nchunks == 1 else jnp.concatenate(v_parts, axis=0)
    # validity over the joined width from one iota + per-segment bounds
    # (static offsets; a concat of boolean parts trips Mosaic's vector
    # register casts, plain int32 compares don't)
    colid = jax.lax.broadcasted_iota(jnp.int32, (1, k.shape[0]), 1)
    col_ok = jnp.zeros((1, k.shape[0]), jnp.bool_)
    off = 0
    for bk_i, lk_i in zip(col_parts, lks):
        col_ok = col_ok | ((colid >= off) & (colid < off + lk_i))
        off += bk_i
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    m_even = (lane < d).astype(F32)
    m_odd = 1.0 - m_even
    for j in range(nh // 2):
        sl = slice(j * 2 * d, (j + 1) * 2 * d)  # one full 128-lane tile
        qt = q[:, sl] if fast else q[:, sl].astype(F32)
        if l2:
            # per-head q L2 norm + learned scale folded in (the k side is
            # normalized once at cache-write time outside): a lane-masked
            # rowwise sumsq per 64-lane half — fp32 math matching the
            # external seg-matmul formulation, zero sub-tile slicing
            qf = qt.astype(F32)
            sq = qf * qf
            s_e = jnp.sum(sq * m_even, axis=-1, keepdims=True)  # (Bq, 1)
            s_o = jnp.sum(sq * m_odd, axis=-1, keepdims=True)
            inv = (m_even * (jax.lax.rsqrt(s_e + 1e-24) * sm_ref[2 * j])
                   + m_odd * (jax.lax.rsqrt(s_o + 1e-24) * sm_ref[2 * j + 1]))
            qt = (qf * inv).astype(q.dtype) if fast else qf * inv
        kt = k[:, sl] if fast else k[:, sl].astype(F32)
        vt = v[:, sl] if fast else v[:, sl].astype(F32)
        me = m_even.astype(qt.dtype)
        mo = m_odd.astype(qt.dtype)
        qe = jnp.concatenate([qt * me, qt * mo], axis=0)  # (2Bq, 128)
        s = jax.lax.dot_general(qe, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)  # (2Bq, sum bk_i)
        if scale != 1.0:  # post-dot, matching the XLA path's logits * scale
            s = s * scale
        s = jnp.where(col_ok, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if fast:
            p = p.astype(jnp.bfloat16)
        o2 = jax.lax.dot_general(p, vt.astype(p.dtype), (((1,), (0,)), ((), ())),
                                 preferred_element_type=F32)  # (2Bq, 128)
        o_ref[0, :, sl] = (o2[:bq] * m_even + o2[bq:] * m_odd).astype(o_ref.dtype)


def flash_decode_paired_chunks(
    q_m: jax.Array,
    k_chunks: Sequence[jax.Array],
    v_chunks: Sequence[jax.Array],
    layer_idx,
    num_heads: int,
    scale: float = 1.0,
    block_q: int = 256,
    interpret: Optional[bool] = None,
    q_l2_scale_mul: Optional[jax.Array] = None,
) -> jax.Array:
    """Paired-head decode attention over a CHUNKED KV cache.

    ``k_chunks``/``v_chunks``: per-stage caches, each (depth, B, l_i, C)
    exactly as the depth-scan stacked them — except the last entry, the
    current stage's freshly projected (B, l_cur, C). ``layer_idx`` (traced or
    static int) selects the depth row of the stacked chunks in the kernel's
    index maps via scalar prefetch, so no per-layer slice or concatenated
    cache buffer is ever materialized — this removes the grow-by-concat
    cache copies (~110 ms/batch at d16 bs128, 26% of decode device time).
    Behaviorally identical to concatenating the chunks and calling
    :func:`flash_decode_paired` (up to fp32 sum reassociation).

    ``q_m`` may carry extra trailing lanes (e.g. the fused (B, L, 3C) qkv
    projection): only the first C = 64 * num_heads lanes are read, through
    the block spec — the q slice is never materialized. With
    ``q_l2_scale_mul`` ((H,) fp32 learned per-head scales), the per-head q
    L2 norm runs INSIDE the kernel (SMEM-prefetched scales), replacing the
    external fp32 normalize chain (~40 ms/batch at d16 bs128 together with
    the avoided slice); the cached k side stays normalized at write time.
    ``scale`` is applied post-dot like the XLA path.
    """
    b, lq, cq = q_m.shape
    d = 64
    c = d * num_heads
    assert num_heads % 2 == 0 and cq % c == 0, "paired kernel wants D=64 pairs"
    assert len(k_chunks) == len(v_chunks) and len(k_chunks) >= 1
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    bq = _pick_block(lq, block_q)
    grid = (b, pl.cdiv(lq, bq))
    lks = tuple(int(kc.shape[-2]) for kc in k_chunks)
    nchunks = len(k_chunks)

    def _chunk_spec(kc):
        bk = _pick_block(kc.shape[-2], 1 << 30)  # whole chunk, sublane-rounded
        if kc.ndim == 4:  # stacked (depth, B, l, C): row picked by the scalar
            return pl.BlockSpec((1, 1, bk, c),
                                lambda i, qi, s, sm: (s[0], i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, bk, c), lambda i, qi, s, sm: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    l2 = q_l2_scale_mul is not None
    sm = (jnp.asarray(q_l2_scale_mul, F32).reshape(num_heads) if l2
          else jnp.ones((num_heads,), F32))
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_paired_chunks, nchunks=nchunks,
                          lks=lks, nh=num_heads, d=d,
                          scale=float(scale), l2=l2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, c), lambda i, qi, s, sm: (i, qi, 0),
                             memory_space=pltpu.VMEM),
                *[_chunk_spec(kc) for kc in k_chunks],
                *[_chunk_spec(vc) for vc in v_chunks],
            ],
            out_specs=pl.BlockSpec((1, bq, c), lambda i, qi, s, sm: (i, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, lq, c), q_m.dtype),
        compiler_params=_params(("parallel", "parallel")),
        interpret=interpret,
    )(idx, sm, q_m, *k_chunks, *v_chunks)


def flash_decode_paired(
    q_m: jax.Array,
    k_m: jax.Array,
    v_m: jax.Array,
    num_heads: int,
    scale: float = 1.0,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Decode attention over merged-head (B, L, C) tensors with the whole
    K/V resident in VMEM per program (lk <= ~1300 at C=1024; see
    ``var.PAIRED_VMEM_BUDGET``). Longer caches fall back to the XLA
    dot-general pair in ``attn_apply``, which measured faster than a
    streaming per-head-slice Pallas kernel (Mosaic sub-tile lane slices
    relayout ~4x slower)."""
    b, lq, c = q_m.shape
    lk = k_m.shape[1]
    d = c // num_heads
    assert num_heads % 2 == 0 and 2 * d == 128, "paired kernel wants D=64 pairs"
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    bq = _pick_block(lq, block_q)
    bk = _pick_block(lk, 1 << 30)  # whole cache, rounded to sublane multiple
    qs = (q_m.astype(F32) * scale).astype(q_m.dtype)
    grid = (b, pl.cdiv(lq, bq))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_paired, lk=lk, nh=num_heads, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, qi: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, qi: (i, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq, c), q_m.dtype),
        compiler_params=_params(("parallel", "parallel")),
        interpret=interpret,
    )(qs, k_m, v_m)


# ---------------------------------------------------------------------------
# paired-head TRAINING attention: merged (B, L, C) end to end, custom VJP
#
# The BLHD flash path above pays head-split transposes around every kernel
# call and runs D=64 blocks (half-empty lane tiles). This variant applies the
# decode kernel's pairing trick to teacher-forced training: tensors stay
# (B, L, C) everywhere, each 128-lane tile holds one head PAIR, the
# block-causal scale mask is evaluated in kernel, and the backward produces
# merged dq/dk/dv tiles directly (the paired p/ds rows recombine the two
# heads' gradients in a single dot). No (B, H, L, L) tensor, no transposes,
# no sub-128-lane slicing anywhere in forward or backward.


def _mask2(qi, ki, bq, bk, lq, lk, ends):
    """(2Bq, Bk) validity for paired rows: row r is query qi*bq + r % bq."""
    col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (2 * bq, 1), 0) % bq
    row = qi * bq + row2
    valid = (col < lk) & (row < lq)
    if ends is not None:
        valid = valid & (_levels_of(col, ends) <= _levels_of(row, ends))
    return valid


def _fwd_kernel_ptrain(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                       acc_scr, *, ends, lq: int, lk: int, nh: int, d: int):
    qi = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    q = q_ref[0]  # (Bq, C)
    k = k_ref[0]  # (Bk, C)
    v = v_ref[0]
    bq = q.shape[0]
    bk = k.shape[0]
    fast = q.dtype == jnp.bfloat16

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    m_even = (lane < d).astype(F32)
    m_odd = 1.0 - m_even
    valid = _mask2(qi, j, bq, bk, lq, lk, ends)
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + j * bk < lk
    for hp in range(nh // 2):
        sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
        qt = q[:, sl] if fast else q[:, sl].astype(F32)
        kt = k[:, sl] if fast else k[:, sl].astype(F32)
        vt = jnp.where(row_ok, v[:, sl], 0).astype(qt.dtype)
        me = m_even.astype(qt.dtype)
        mo = m_odd.astype(qt.dtype)
        qe = jnp.concatenate([qt * me, qt * mo], axis=0)  # (2Bq, 128)
        s = jax.lax.dot_general(qe, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)  # (2Bq, Bk)
        s = jnp.where(valid, s, NEG_INF)
        rows = slice(hp * 2 * bq, (hp + 1) * 2 * bq)
        m_prev = m_scr[rows, :1]
        l_prev = l_scr[rows, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[rows] = acc_scr[rows] * alpha + jax.lax.dot_general(
            p.astype(qt.dtype), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=F32)
        m_scr[rows] = jnp.broadcast_to(m_new, (2 * bq, m_scr.shape[1]))
        l_scr[rows] = jnp.broadcast_to(l_new, (2 * bq, l_scr.shape[1]))

    @pl.when(j == nk - 1)
    def _flush():
        for hp in range(nh // 2):
            sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
            rows = slice(hp * 2 * bq, (hp + 1) * 2 * bq)
            l_raw = l_scr[rows, :1]
            l_safe = jnp.where(l_raw == 0.0, 1.0, l_raw)
            o2 = acc_scr[rows] / l_safe
            o_ref[0, :, sl] = (o2[:bq] * m_even + o2[bq:] * m_odd).astype(o_ref.dtype)
            lse2 = m_scr[rows, :1] + jnp.log(l_safe)  # (2Bq, 1)
            lse_ref[0, 2 * hp, :] = lse2[:bq, 0]
            lse_ref[0, 2 * hp + 1, :] = lse2[bq:, 0]


def _paired_col(t, hlane, hp: int, bq: int):
    """(Bq, H) lane-major per-head tile -> (2Bq, 1) paired column: even head
    rows stacked over odd head rows. Lane-masked reductions keep every
    operand at natural layout; the sublane concat runs at LANES width
    because Mosaic implements sublane concats of full-lane tiles only."""
    col_e = jnp.broadcast_to(
        jnp.sum(t * (hlane == 2 * hp).astype(F32), axis=1, keepdims=True),
        (bq, LANES))
    col_o = jnp.broadcast_to(
        jnp.sum(t * (hlane == 2 * hp + 1).astype(F32), axis=1, keepdims=True),
        (bq, LANES))
    return jnp.concatenate([col_e, col_o], axis=0)[:, :1]


def _bwd_dq_kernel_ptrain(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dq_ref, dq_scr, *, ends, lq: int, lk: int,
                          nh: int, d: int):
    qi = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bq = q.shape[0]
    bk = k.shape[0]
    fast = q.dtype == jnp.bfloat16

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    m_even = (lane < d).astype(F32)
    m_odd = 1.0 - m_even
    valid = _mask2(qi, j, bq, bk, lq, lk, ends)
    row_ok = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + j * bk < lk
    # lse/delta arrive (Bq, H): per-head values live on the lane dim, so the
    # paired (2Bq, 1) column is two lane-masked reductions + one sublane
    # concat of full-lane tiles — Mosaic rejects 1-D vector concats, and
    # narrow (Bq, 1) operands would force relayouts, so stay at LANES width.
    lse_t = lse_ref[0]    # (Bq, H) f32
    dlt_t = delta_ref[0]  # (Bq, H) f32
    hlane = jax.lax.broadcasted_iota(jnp.int32, (1, lse_t.shape[1]), 1)
    for hp in range(nh // 2):
        sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
        qt = q[:, sl] if fast else q[:, sl].astype(F32)
        kt = jnp.where(row_ok, k[:, sl], 0).astype(qt.dtype)
        vt = jnp.where(row_ok, v[:, sl], 0).astype(qt.dtype)
        dot = do[:, sl] if fast else do[:, sl].astype(F32)
        me = m_even.astype(qt.dtype)
        mo = m_odd.astype(qt.dtype)
        qe = jnp.concatenate([qt * me, qt * mo], axis=0)      # (2Bq, 128)
        doe = jnp.concatenate([dot * me, dot * mo], axis=0)   # (2Bq, 128)
        lse2 = _paired_col(lse_t, hlane, hp, bq)              # (2Bq, 1)
        dlt2 = _paired_col(dlt_t, hlane, hp, bq)
        s = jax.lax.dot_general(qe, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse2)
        dp = jax.lax.dot_general(doe, vt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)
        ds = p * (dp - dlt2)
        rows = slice(hp * 2 * bq, (hp + 1) * 2 * bq)
        dq_scr[rows] += jax.lax.dot_general(ds.astype(qt.dtype), kt,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=F32)

    @pl.when(j == nk - 1)
    def _flush():
        for hp in range(nh // 2):
            sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
            rows = slice(hp * 2 * bq, (hp + 1) * 2 * bq)
            g2 = dq_scr[rows]
            dq_ref[0, :, sl] = (g2[:bq] * m_even + g2[bq:] * m_odd).astype(dq_ref.dtype)


def _bwd_dkv_kernel_ptrain(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                           dk_ref, dv_ref, dk_scr, dv_scr, *, ends, lq: int,
                           lk: int, nh: int, d: int):
    ki = pl.program_id(1)
    j = pl.program_id(2)  # query-block index
    nq = pl.num_programs(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bq = q.shape[0]
    bk = k.shape[0]
    fast = q.dtype == jnp.bfloat16

    @pl.when(j == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    m_even = (lane < d).astype(F32)
    m_odd = 1.0 - m_even
    # roles swapped: grid dim 1 is the KV block, dim 2 streams q blocks
    valid = _mask2(j, ki, bq, bk, lq, lk, ends)
    qrow_ok = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + j * bq < lq
    qrow_ok2 = jnp.concatenate([jnp.broadcast_to(qrow_ok, (bq, LANES)),
                                jnp.broadcast_to(qrow_ok, (bq, LANES))],
                               axis=0)[:, :1]
    lse_t = lse_ref[0]    # (Bq, H) f32
    dlt_t = delta_ref[0]  # (Bq, H) f32
    hlane = jax.lax.broadcasted_iota(jnp.int32, (1, lse_t.shape[1]), 1)
    for hp in range(nh // 2):
        sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
        qt = jnp.where(qrow_ok, q[:, sl], 0).astype(
            q.dtype if fast else F32)
        kt = k[:, sl] if fast else k[:, sl].astype(F32)
        vt = v[:, sl] if fast else v[:, sl].astype(F32)
        dot = jnp.where(qrow_ok, do[:, sl], 0).astype(qt.dtype)
        me = m_even.astype(qt.dtype)
        mo = m_odd.astype(qt.dtype)
        qe = jnp.concatenate([qt * me, qt * mo], axis=0)
        doe = jnp.concatenate([dot * me, dot * mo], axis=0)
        lse2 = _paired_col(lse_t, hlane, hp, bq)
        dlt2 = _paired_col(dlt_t, hlane, hp, bq)
        s = jax.lax.dot_general(qe, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.where(qrow_ok2, jnp.exp(s - lse2), 0.0)
        # p rows hold both heads lane-masked; one transposed dot therefore
        # yields the MERGED dv/dk tile (even-head cols + odd-head cols)
        dv_scr[hp * bk:(hp + 1) * bk] += jax.lax.dot_general(
            p.astype(qt.dtype), doe, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)
        dp = jax.lax.dot_general(doe, vt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)
        ds = jnp.where(qrow_ok2, p * (dp - dlt2), 0.0)
        dk_scr[hp * bk:(hp + 1) * bk] += jax.lax.dot_general(
            ds.astype(qt.dtype), qe, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)

    @pl.when(j == nq - 1)
    def _flush():
        for hp in range(nh // 2):
            sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
            rows = slice(hp * bk, (hp + 1) * bk)
            dk_ref[0, :, sl] = dk_scr[rows].astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv_scr[rows].astype(dv_ref.dtype)


def _ptrain_fwd(qm, km, vm, nh, ends, bq, bk, interpret):
    b, lq, c = qm.shape
    lk = km.shape[1]
    d = c // nh
    grid = (b, pl.cdiv(lq, bq), pl.cdiv(lk, bk))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_ptrain, ends=ends, lq=lq, lk=lk,
                          nh=nh, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c), lambda i, qi, ki: (i, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c), lambda i, qi, ki: (i, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, bq), lambda i, qi, ki: (i, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, c), qm.dtype),
            jax.ShapeDtypeStruct((b, nh, lq), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nh // 2 * 2 * bq, LANES), F32),  # m
            pltpu.VMEM((nh // 2 * 2 * bq, LANES), F32),  # l
            pltpu.VMEM((nh // 2 * 2 * bq, 2 * d), F32),  # acc
        ],
        compiler_params=_params(("parallel", "parallel", "arbitrary"),
                                vmem_limit=PTRAIN_VMEM_LIMIT),
        interpret=interpret,
    )(qm, km, vm)
    return out, lse


def _bwd_fused_kernel_ptrain(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                             dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr,
                             *, ends, lq: int, lk: int, nh: int, d: int):
    """One-pass backward: s/p/ds are computed ONCE per (q, k) tile and feed
    dq, dk AND dv — the split dq/dkv kernels each rebuilt them (7 MXU dots
    and 2 exp sweeps per tile vs 5 and 1 here), and streamed q/k/v/do from
    HBM twice. dq accumulates in a per-q-block scratch (flushed when the k
    sweep ends); dk/dv accumulate in a FULL-LENGTH paired scratch
    (nh/2 * Lk_pad, 128) that lives in VMEM for the whole grid and is
    flushed by the last program — which is what caps this kernel at
    moderate Lk (see _ptrain_bwd's dispatch)."""
    qi = pl.program_id(1)
    j = pl.program_id(2)  # k-block index (inner sweep)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bq = q.shape[0]
    bk = k.shape[0]
    lk_pad = nk * bk
    fast = q.dtype == jnp.bfloat16

    @pl.when(j == 0)
    def _init_dq():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when((qi == 0) & (j == 0))
    def _init_dkv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    m_even = (lane < d).astype(F32)
    m_odd = 1.0 - m_even
    valid = _mask2(qi, j, bq, bk, lq, lk, ends)
    krow_ok = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + j * bk < lk
    qrow_ok = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + qi * bq < lq
    qrow_ok2 = jnp.concatenate([jnp.broadcast_to(qrow_ok, (bq, LANES)),
                                jnp.broadcast_to(qrow_ok, (bq, LANES))],
                               axis=0)[:, :1]
    lse_t = lse_ref[0]    # (Bq, H) f32, seq-major (see _ptrain_bwd)
    dlt_t = delta_ref[0]  # (Bq, H) f32
    hlane = jax.lax.broadcasted_iota(jnp.int32, (1, lse_t.shape[1]), 1)
    for hp in range(nh // 2):
        sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
        qt = jnp.where(qrow_ok, q[:, sl], 0).astype(q.dtype if fast else F32)
        kt = jnp.where(krow_ok, k[:, sl], 0).astype(qt.dtype)
        vt = jnp.where(krow_ok, v[:, sl], 0).astype(qt.dtype)
        dot = jnp.where(qrow_ok, do[:, sl], 0).astype(qt.dtype)
        me = m_even.astype(qt.dtype)
        mo = m_odd.astype(qt.dtype)
        qe = jnp.concatenate([qt * me, qt * mo], axis=0)      # (2Bq, 128)
        doe = jnp.concatenate([dot * me, dot * mo], axis=0)   # (2Bq, 128)
        lse2 = _paired_col(lse_t, hlane, hp, bq)              # (2Bq, 1)
        dlt2 = _paired_col(dlt_t, hlane, hp, bq)
        s = jax.lax.dot_general(qe, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=F32)   # (2Bq, Bk)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.where(qrow_ok2, jnp.exp(s - lse2), 0.0)
        dp = jax.lax.dot_general(doe, vt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)
        ds = jnp.where(qrow_ok2, p * (dp - dlt2), 0.0)
        qrows = slice(hp * 2 * bq, (hp + 1) * 2 * bq)
        dq_scr[qrows] += jax.lax.dot_general(ds.astype(qt.dtype), kt,
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=F32)
        krows = pl.ds(hp * lk_pad + j * bk, bk)  # j is traced: dynamic slice
        # p/ds rows hold both heads lane-masked, so one transposed dot
        # yields the MERGED (Bk, 128) dv/dk tile (even cols + odd cols)
        dv_scr[krows] += jax.lax.dot_general(
            p.astype(qt.dtype), doe, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)
        dk_scr[krows] += jax.lax.dot_general(
            ds.astype(qt.dtype), qe, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)

    @pl.when(j == nk - 1)
    def _flush_dq():
        for hp in range(nh // 2):
            sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
            rows = slice(hp * 2 * bq, (hp + 1) * 2 * bq)
            g2 = dq_scr[rows]
            dq_ref[0, :, sl] = (g2[:bq] * m_even + g2[bq:] * m_odd).astype(dq_ref.dtype)

    @pl.when((qi == nq - 1) & (j == nk - 1))
    def _flush_dkv():
        for hp in range(nh // 2):
            sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
            rows = slice(hp * lk_pad, (hp + 1) * lk_pad)
            dk_ref[0, :, sl] = dk_scr[rows].astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv_scr[rows].astype(dv_ref.dtype)


# full-length paired dk/dv scratch budget for the fused backward: two
# (nh/2 * Lk_pad, 128) f32 buffers. 680 (256px) and every 512px segment
# prefix fit comfortably; the 1024px tail (Lk=9451) would want ~77M, so it
# falls back to the split kernels.
FUSED_BWD_SCRATCH_BYTES = 40 * 1024 * 1024


def _ptrain_bwd(qm, km, vm, out, lse, do, nh, ends, bq, bk, interpret):
    b, lq, c = qm.shape
    lk = km.shape[1]
    d = c // nh
    # per-(row, head) delta = sum_d do*o within the head's lanes: one
    # block-diagonal ones matmul on merged lanes, then H to the sublane dim
    seg = head_segment_matrix(nh, d)  # (C, H)
    delta = jax.lax.dot_general(do.astype(F32) * out.astype(F32), seg,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=F32)  # (B, L, H)
    # kernels take lse/delta seq-major (B, L, H): per-head values on the lane
    # dim slice cleanly into (Bq, H) blocks with no in-kernel relayout (the
    # (B, H, L) head-major layout forced 1-D row concats Mosaic can't lower)
    lse_t = lse.transpose(0, 2, 1)  # (B, L, H) — tiny

    lk_pad = pl.cdiv(lk, bk) * bk
    scratch_bytes = 2 * (nh // 2) * lk_pad * 2 * d * 4
    fused = (scratch_bytes <= FUSED_BWD_SCRATCH_BYTES
             and os.environ.get("VAR_TPU_PTRAIN_FUSED_BWD", "1") != "0")
    if fused:
        qf_spec = pl.BlockSpec((1, bq, c), lambda i, qi, ki: (i, qi, 0),
                               memory_space=pltpu.VMEM)
        kvf_spec = pl.BlockSpec((1, bk, c), lambda i, qi, ki: (i, ki, 0),
                                memory_space=pltpu.VMEM)
        hlf_spec = pl.BlockSpec((1, bq, nh), lambda i, qi, ki: (i, qi, 0),
                                memory_space=pltpu.VMEM)
        full_spec = pl.BlockSpec((1, lk_pad, c), lambda i, qi, ki: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel_ptrain, ends=ends, lq=lq,
                              lk=lk, nh=nh, d=d),
            grid=(b, pl.cdiv(lq, bq), pl.cdiv(lk, bk)),
            in_specs=[qf_spec, kvf_spec, kvf_spec, qf_spec, hlf_spec, hlf_spec],
            out_specs=[qf_spec, full_spec, full_spec],
            out_shape=[jax.ShapeDtypeStruct((b, lq, c), qm.dtype),
                       jax.ShapeDtypeStruct((b, lk, c), km.dtype),
                       jax.ShapeDtypeStruct((b, lk, c), vm.dtype)],
            scratch_shapes=[pltpu.VMEM((nh // 2 * 2 * bq, 2 * d), F32),
                            pltpu.VMEM((nh // 2 * lk_pad, 2 * d), F32),
                            pltpu.VMEM((nh // 2 * lk_pad, 2 * d), F32)],
            compiler_params=_params(("parallel", "arbitrary", "arbitrary"),
                                    vmem_limit=PTRAIN_VMEM_LIMIT),
            interpret=interpret,
        )(qm, km, vm, do, lse_t, delta)
        return dq, dk, dv

    q_spec = pl.BlockSpec((1, bq, c), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bk, c), lambda i, qi, ki: (i, ki, 0), memory_space=pltpu.VMEM)
    hl_spec = pl.BlockSpec((1, bq, nh), lambda i, qi, ki: (i, qi, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_ptrain, ends=ends, lq=lq, lk=lk,
                          nh=nh, d=d),
        grid=(b, pl.cdiv(lq, bq), pl.cdiv(lk, bk)),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, hl_spec, hl_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, lq, c), qm.dtype),
        scratch_shapes=[pltpu.VMEM((nh // 2 * 2 * bq, 2 * d), F32)],
        compiler_params=_params(("parallel", "parallel", "arbitrary"),
                                vmem_limit=PTRAIN_VMEM_LIMIT),
        interpret=interpret,
    )(qm, km, vm, do, lse_t, delta)

    qs_spec = pl.BlockSpec((1, bq, c), lambda i, ki, qi: (i, qi, 0), memory_space=pltpu.VMEM)
    kvs_spec = pl.BlockSpec((1, bk, c), lambda i, ki, qi: (i, ki, 0), memory_space=pltpu.VMEM)
    hls_spec = pl.BlockSpec((1, bq, nh), lambda i, ki, qi: (i, qi, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_ptrain, ends=ends, lq=lq, lk=lk,
                          nh=nh, d=d),
        grid=(b, pl.cdiv(lk, bk), pl.cdiv(lq, bq)),
        in_specs=[qs_spec, kvs_spec, kvs_spec, qs_spec, hls_spec, hls_spec],
        out_specs=[kvs_spec, kvs_spec],
        out_shape=[jax.ShapeDtypeStruct((b, lk, c), km.dtype),
                   jax.ShapeDtypeStruct((b, lk, c), vm.dtype)],
        scratch_shapes=[pltpu.VMEM((nh // 2 * bk, 2 * d), F32),
                        pltpu.VMEM((nh // 2 * bk, 2 * d), F32)],
        compiler_params=_params(("parallel", "parallel", "arbitrary"),
                                vmem_limit=PTRAIN_VMEM_LIMIT),
        interpret=interpret,
    )(qm, km, vm, do, lse_t, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ptrain(qm, km, vm, nh, ends, bq, bk, interpret):
    out, _ = _ptrain_fwd(qm, km, vm, nh, ends, bq, bk, interpret)
    return out


def _ptrain_vjp_fwd(qm, km, vm, nh, ends, bq, bk, interpret):
    out, lse = _ptrain_fwd(qm, km, vm, nh, ends, bq, bk, interpret)
    return out, (qm, km, vm, out, lse)


def _ptrain_vjp_bwd(nh, ends, bq, bk, interpret, res, do):
    qm, km, vm, out, lse = res
    return _ptrain_bwd(qm, km, vm, out, lse, do, nh, ends, bq, bk, interpret)


_ptrain.defvjp(_ptrain_vjp_fwd, _ptrain_vjp_bwd)


def flash_attention_paired_train(
    q_m: jax.Array,
    k_m: jax.Array,
    v_m: jax.Array,
    num_heads: int,
    scale: float = 1.0,
    scale_ends: Optional[Sequence[int]] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    segment: bool = True,
) -> jax.Array:
    """Teacher-forced attention over MERGED (B, L, C) tensors with the
    block-causal scale mask, differentiable (custom VJP, flash-style
    O(B L C) residuals: q/k/v/out/lse — no (B, H, L, L) tensor in either
    pass). See the section comment above for why this beats the BLHD path
    on TPU. ``scale`` is folded into q up front; residuals stay merged.

    With ``scale_ends`` and ``segment=True`` the call is decomposed by the
    mask's structure instead of evaluating it: block-causal over scales
    means queries of scale s attend exactly the key prefix [0, ends[s])
    with NO masking (key-level <= query-level holds for the whole prefix).
    The small leading scales (ends <= block_q) share one masked call; every
    remaining scale gets its own unmasked call over its prefix. Useful
    score fraction at the 256px pyramid is sum(n_s * ends[s]) / L^2 = 62%,
    so the single masked L x L pass wastes ~40% of its dot/exp work on
    columns the mask kills; the segmented form skips both their compute
    AND their K/V fetches. Autodiff composes the per-segment custom VJPs
    (dk/dv prefix contributions pad-and-add)."""
    b, lq, c = q_m.shape
    lk = k_m.shape[1]
    d = c // num_heads
    assert num_heads % 2 == 0 and 2 * d == 128, "paired kernel wants D=64 pairs"
    assert k_m.shape[0] == b and k_m.shape[2] == c and v_m.shape == k_m.shape, \
        "k/v must be merged (B, Lk, C) with Lk >= Lq"
    ends = tuple(int(e) for e in scale_ends) if scale_ends is not None else None
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    qs = (q_m.astype(F32) * scale).astype(q_m.dtype)

    segment = segment and os.environ.get("VAR_TPU_PTRAIN_SEGMENT", "1") != "0"

    def _bq(n):
        return _pick_block_q_ptrain(n, block_q, interpret)

    if ends is not None and segment and lq == lk and ends[-1] == lq:
        p = 0
        while p < len(ends) and ends[p] <= block_q:
            p += 1
        if p < len(ends):  # at least one tail scale worth splitting off
            outs = []
            cut = ends[p - 1] if p > 0 else 0
            if cut:
                outs.append(_ptrain(qs[:, :cut], k_m[:, :cut], v_m[:, :cut],
                                    num_heads, ends[:p], _bq(cut),
                                    _pick_block_k(cut, block_k), interpret))
            lo = cut
            for e in ends[p:]:
                outs.append(_ptrain(qs[:, lo:e], k_m[:, :e], v_m[:, :e],
                                    num_heads, None, _bq(e - lo),
                                    _pick_block_k(e, block_k), interpret))
                lo = e
            return jnp.concatenate(outs, axis=1)

    # non-segmented fall-through (tiny pyramids where every scale fits one
    # q block, masked single call, or segment=False): the SAME 128-rounding
    # applies — _pick_block's multiple-of-8 choice (e.g. bq=16 at the
    # local-debug pn=1_2_3, L=14) violates the lse block constraint and
    # fails Mosaic lowering on real TPUs (verified: crash at L=14/155,
    # fixed output matches XLA within the hardware path's usual MXU noise)
    bq = _bq(lq)
    bk = _pick_block_k(lk, block_k)
    return _ptrain(qs, k_m, v_m, num_heads, ends, bq, bk, interpret)
