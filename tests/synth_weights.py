"""Deterministic synthesis of reference-VQVAE weights by (name, shape).

The production-shape parity fixture (full 10-scale pyramid, V=4096,
Cvae=32, ch=160) would need ~218MB of fp16 weights — too large to commit.
Instead both sides regenerate identical weights from this recipe:

* ``scripts/gen_vae_fixture_prod.py`` loads them into the reference torch
  VQVAE and records inputs/outputs,
* ``tests/test_vae_parity_prod.py`` regenerates the same state_dict, runs
  it through ``convert_vae``, and compares.

Weights are keyed per-tensor by crc32(name) so the recipe is independent of
iteration order, and fp16-rounded so both sides see bit-identical values.
"""

import zlib

import numpy as np


def synth_tensor(key: str, shape) -> np.ndarray:
    shape = tuple(int(s) for s in shape)
    rng = np.random.default_rng(zlib.crc32(key.encode()) & 0xFFFFFFFF)
    if "ema_vocab_hit" in key or "vocab_hit" in key:
        v = np.zeros(shape, np.float32)
    elif "embedding" in key and len(shape) >= 2:
        v = rng.normal(0.0, 0.5, shape)  # codebook spread (gen_vae_fixture.py)
    elif len(shape) >= 2:
        fan_in = int(np.prod(shape[1:]))  # torch conv/linear [out, in, ...]
        v = rng.normal(0.0, np.sqrt(2.0 / max(fan_in, 1)), shape)
    elif key.endswith("bias"):
        v = rng.normal(0.0, 0.02, shape)
    elif len(shape) == 1:  # norm scales
        v = 1.0 + rng.normal(0.0, 0.1, shape)
    else:
        v = np.zeros(shape, np.float32)
    return v.astype(np.float16).astype(np.float32)


def synth_state_dict(keys_shapes) -> dict:
    return {k: synth_tensor(k, s) for k, s in keys_shapes}
