"""LR / weight-decay annealing schedules.

Replicates the reference schedule family (``utils/lr_control.py:10-65``):
linear warmup from ``wp0`` to 1 over ``wp_it`` iterations, then one of
{cos, lin, lin0, lin00, lin<T>, exp} decaying to ``wpe``; weight decay
follows a half-cosine from ``wd`` to ``wd_end`` over the whole run.

Implemented as jit-traceable functions of the (traced) iteration index so
the whole train step stays one XLA program; the schedule *type* is static.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def lr_factor(sche: str, cur_it, wp_it: float, max_it: float, wp0=0.005, wpe=0.001):
    """Multiplier on peak lr at iteration ``cur_it`` (traced or python int)."""
    t = jnp.asarray(cur_it, jnp.float32)
    wp_it = round(wp_it)
    warm = wp0 + (1.0 - wp0) * t / max(wp_it, 1)
    pasd = (t - wp_it) / (max_it - 1 - wp_it)
    rest = 1.0 - pasd
    if sche == "cos":
        main = wpe + (1 - wpe) * (0.5 + 0.5 * jnp.cos(math.pi * pasd))
    elif sche == "lin":
        T = 0.15
        main = jnp.where(pasd < T, 1.0, wpe + (1 - wpe) * rest / (1 - T))
    elif sche == "lin0":
        T = 0.05
        main = jnp.where(pasd < T, 1.0, wpe + (1 - wpe) * rest / (1 - T))
    elif sche == "lin00":
        main = wpe + (1 - wpe) * rest
    elif sche.startswith("lin"):
        T = float(sche[3:])
        max_rest = 1 - T
        wpe_mid = (1 + wpe + (1 - wpe) * max_rest) / 2
        main = jnp.where(
            pasd < T,
            1 + (wpe_mid - 1) * pasd / T,
            wpe + (wpe_mid - wpe) * rest / max_rest,
        )
    elif sche == "exp":
        T = 0.15
        expo = (pasd - T) / (1 - T) * math.log(wpe)
        main = jnp.where(pasd < T, 1.0, jnp.exp(expo))
    else:
        raise NotImplementedError(f"unknown sche_type {sche}")
    return jnp.where(t < wp_it, warm, main)


def wd_value(cur_it, max_it: float, wd: float, wd_end: float):
    """Half-cosine wd anneal (``lr_control.py:47-48``)."""
    pasd = jnp.asarray(cur_it, jnp.float32) / (max_it - 1)
    return wd_end + (wd - wd_end) * (0.5 + 0.5 * jnp.cos(math.pi * pasd))
