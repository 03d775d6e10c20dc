"""Sort-free exact top-k / top-p candidate selection (Pallas TPU).

The reference filters logits with a full-vocab sort + two argsorts per token
(``models/helpers.py:6-36``); the repo's XLA fast path still pays one
``lax.top_k`` (a sort on TPU) per stage — ~160 ms of a d16 bs128 decode.
This kernel computes the same candidate SET with zero sorts:

* map logits to a 32-bit integer key space that is monotone in the float
  value (sign-magnitude flip), keeping each row resident in VMEM;
* top-k: 32-step greedy MSB descent finds the EXACT k-th largest key (the
  largest threshold T with count(key >= T) >= k). Ties at the k-th value
  are all kept — precisely the reference's ``logits < kth -> -inf`` mask
  semantics (``helpers.py:9``), which a plain ``lax.top_k`` candidate list
  actually truncates;
* top-p: over the top-k candidates' softmax mass M, the kept set
  {v : mass(l > v) < p*M} is downward-closed, so it is also a key
  threshold — found by the same 32-step descent on the candidate-masked
  exponential sums (``helpers.py:12-15`` semantics; the argmax is never
  removed since mass above it is 0). Only fp32-exact ties at the boundary
  can differ from the sorted formulation (whole tied group kept vs cut
  inside the group) — zero-probability in practice.

Output is one int32 key bound per row: keep position v iff key(l_v) >=
bound. Sampling then masks + ``jax.random.categorical`` — all elementwise,
no sort anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
INT32_MIN = -(2 ** 31)  # python int: jnp constants would be closure-captured


def float_key(l: jax.Array) -> jax.Array:
    """Monotone int32 key of a finite fp32 value: sign-magnitude flip so
    integer comparisons order like float comparisons. -0.0 is canonicalized
    to +0.0 first (floats compare them equal; their bit patterns do not)."""
    lf = l.astype(jnp.float32)
    lf = jnp.where(lf == 0.0, 0.0, lf)
    i = jax.lax.bitcast_convert_type(lf, I32)
    return jnp.where(i >= 0, i, i ^ jnp.int32(0x7FFFFFFF))


def _descend(key, weights, target, strict: bool):
    """Greedy MSB descent: largest uint-space threshold T such that
    sum(weights * (key >= T + strict)) >= target. Keys/thresholds live in
    the int32 representation (uint key ^ 0x8000_0000)."""
    rows = key.shape[0]
    t = jnp.full((rows, 1), INT32_MIN, I32)  # uint 0
    for b in range(31, -1, -1):
        if b == 31:  # setting uint bit 31 flips the int32 sign bit
            cand = t ^ INT32_MIN
        else:
            cand = t | jnp.int32(1 << b)
        ok = key > cand if strict else key >= cand
        stat = jnp.sum(weights * ok.astype(weights.dtype), axis=-1, keepdims=True)
        t = jnp.where(stat >= target, cand, t)
    return t


def _bound_kernel(l_ref, bound_ref, *, k: int, p: float):
    l = l_ref[...].astype(jnp.float32)  # (R, V) resident rows
    key = float_key(l)
    ones = jnp.ones_like(l)
    tk = _descend(key, ones, jnp.float32(k), strict=False)  # exact kth key
    if p > 0.0:
        e = jnp.exp(l - jnp.max(l, axis=-1, keepdims=True))
        e = e * (key >= tk).astype(jnp.float32)  # candidate masses only
        pm = jnp.float32(p) * jnp.sum(e, axis=-1, keepdims=True)
        # largest T with mass(key > T) >= p*M; kept set is key > T
        tq = _descend(key, e, pm, strict=True)
        bound = jnp.maximum(tk, tq + 1)
    else:
        bound = tk
    bound_ref[...] = jnp.broadcast_to(bound, bound_ref.shape)


def topk_topp_bound(
    logits: jax.Array,
    top_k: int,
    top_p: float,
    rows_per_block: int = 64,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """(..., V) fp32 logits -> (...,) int32 key bound per row.

    Keep position v iff ``float_key(l_v) >= bound``. ``top_k <= 0`` means no
    top-k (k = V); ``top_p <= 0`` disables the mass threshold.
    """
    *lead, v = logits.shape
    rows = 1
    for s in lead:
        rows *= s
    l2 = logits.reshape(rows, v)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    k = top_k if top_k > 0 else v
    r = min(rows_per_block, max(8, rows))
    grid = (pl.cdiv(rows, r),)
    bound = pl.pallas_call(
        functools.partial(_bound_kernel, k=k, p=float(top_p)),
        grid=grid,
        in_specs=[pl.BlockSpec((r, v), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), I32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(l2)
    return bound[:, 0].reshape(lead)
