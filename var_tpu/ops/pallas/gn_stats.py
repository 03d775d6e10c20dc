"""Pallas GroupNorm statistics pass for the VQVAE decoder.

XLA compiles the GroupNorm stat reduction over NHWC activations into
(sum, sumsq) fusions that profile at ~110 GB/s on the 256px decoder tensors
(the C=160 lane dim pads to 256, and the fp32 convert+reduce fusion is
VPU-lumpy) — six of them cost ~115 ms of a 230 ms d16 bs64 render. This
kernel is a plain streaming accumulation: one pass over the activation,
per-channel fp32 sum/sumsq in VMEM scratch, flushed once per batch row.

The normalization *apply* stays in XLA (it fuses into the following conv's
input); only the stats pass is replaced. Forward-only use (decode); the VQVAE
trainer keeps XLA GroupNorm end to end for gradients.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _kernel(x_ref, s_ref, ss_ref, acc_s, acc_ss, *, hdim: int, bh: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_s[...] = jnp.zeros_like(acc_s)
        acc_ss[...] = jnp.zeros_like(acc_ss)

    xf = x_ref[0].astype(F32)  # (BH, W, C)
    if hdim % bh:  # zero tail-block padding rows so they don't pollute sums
        row = j * bh + jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0)
        xf = jnp.where(row < hdim, xf, 0.0)
    acc_s[...] += jnp.sum(xf, axis=(0, 1)).reshape(acc_s.shape)
    acc_ss[...] += jnp.sum(xf * xf, axis=(0, 1)).reshape(acc_ss.shape)

    @pl.when(j == nj - 1)
    def _flush():
        s_ref[0] = acc_s[...]
        ss_ref[0] = acc_ss[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gn_channel_stats(
    x: jax.Array, interpret: Optional[bool] = None
) -> Tuple[jax.Array, jax.Array]:
    """Per-(batch, channel) fp32 (sum, sum-of-squares) over spatial dims.

    x: (B, H, W, C) -> two (B, C) fp32 arrays. Group statistics follow by
    summing channel groups outside (tiny). One streaming read of x. Has a
    custom VJP (the stats are linear/quadratic in x), so the VQVAE trainer
    can differentiate through it.
    """
    return _stats_impl(x, interpret)


def _stats_fwd(x, interpret):
    return _stats_impl(x, interpret), x


def _stats_bwd(interpret, x, g):
    g_s, g_ss = g  # (B, C) each
    dx = g_s[:, None, None, :] + 2.0 * x.astype(F32) * g_ss[:, None, None, :]
    return (dx.astype(x.dtype),)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stats_impl(x: jax.Array, interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hdim, w, c = x.shape
    bh = hdim if hdim <= 8 else 8
    while bh * w * c * x.dtype.itemsize > 4 * 1024 * 1024 and bh > 1:
        bh //= 2
    grid = (b, pl.cdiv(hdim, bh))
    s, ss = pl.pallas_call(
        functools.partial(_kernel, hdim=hdim, bh=bh),
        grid=grid,
        in_specs=[pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), F32),
            jax.ShapeDtypeStruct((b, 1, c), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c), F32),
            pltpu.VMEM((1, c), F32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x)
    return s[:, 0], ss[:, 0]


gn_channel_stats.defvjp(_stats_fwd, _stats_bwd)
