"""Token sampling: top-k / top-p filtering and gumbel-softmax.

Replicates the *filtering mask* semantics of the reference exactly
(``models/helpers.py:6-36``):

* top-k: positions with logit strictly below the k-th largest are removed;
  ties at the threshold are kept (``helpers.py:9``).
* top-p: ascending sort, softmax, cumulative sum; remove positions whose
  cumsum <= 1 - top_p; the largest logit is never removed
  (``helpers.py:12-15``).

Sampling itself uses ``jax.random.categorical`` (Gumbel-max over the masked
logits), which draws from the identical distribution as the reference's
``torch.multinomial(softmax(logits))`` (``helpers.py:19``). RNG streams are
framework-specific: a given integer seed will not reproduce torch's draws
(documented divergence, SURVEY.md §7 hard part #3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["top_k_top_p_mask", "sample_with_top_k_top_p", "gumbel_softmax"]

_NEG_INF = float("-inf")


def top_k_top_p_mask(logits: jax.Array, top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    """Apply top-k then top-p filtering; removed entries become -inf.

    ``logits``: (..., V) float array. ``top_k``/``top_p`` are static Python
    values (they select compiled graphs, matching reference CLI flags).
    """
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, _NEG_INF, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)  # ascending, like helpers.py:12
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumprobs = jnp.cumsum(sorted_probs, axis=-1)
        remove_sorted = cumprobs <= (1.0 - top_p)
        remove_sorted = remove_sorted.at[..., -1].set(False)  # keep argmax always
        # Scatter the sorted-order mask back to vocab order: ranks[v] is the
        # ascending rank of vocab entry v, so gather remove_sorted at ranks.
        sorted_idx = jnp.argsort(logits, axis=-1)
        ranks = jnp.argsort(sorted_idx, axis=-1)
        remove = jnp.take_along_axis(remove_sorted, ranks, axis=-1)
        logits = jnp.where(remove, _NEG_INF, logits)
    return logits


def sample_with_top_k_top_p(
    rng: jax.Array, logits: jax.Array, top_k: int = 0, top_p: float = 0.0,
    approx: bool = False, impl: str = "auto",
) -> jax.Array:
    """Sample one token per position from filtered logits. Returns int32 (...).

    ``impl="pallas"`` (the "auto" choice on TPU when filtering is active):
    sort-free exact selection — a Pallas kernel binary-searches the monotone
    int32 key space for the exact k-th-largest logit and the top-p mass
    bound with each row resident in VMEM
    (``var_tpu.ops.pallas.select``), then sampling is a masked
    ``jax.random.categorical`` (Gumbel-max; elementwise + argmax, no sort).
    This IS the reference mask semantics (``helpers.py:6-36``, ties at the
    k-th logit kept); the full-vocab ``lax.top_k`` sorts it replaces were
    ~11% of d16 bs128 decode time.

    ``impl="sorted"`` ("auto" elsewhere): one ``lax.top_k`` puts the
    candidates in descending order; the top-p cutoff is a prefix-sum test
    in sorted space (remove rank r when the mass of strictly better ranks
    >= p — the descending-order restatement of helpers.py:12-15, which
    always keeps the argmax) and sampling happens over the k-wide
    candidate set. Differs from the mask semantics only on exact fp32 ties
    at the k-th logit (truncates the tied group instead of keeping it).

    ``approx=True`` (opt-in, non-parity): ``lax.approx_max_k`` instead of
    the exact sort — the TPU PartialReduce unit selects the candidate set,
    which may swap a few near-boundary candidates (rank ~k) whose softmax
    mass is negligible at V=4096/k=900.
    """
    v = logits.shape[-1]
    lf = logits.astype(jnp.float32)
    # k >= V selects everything — clamp so small-vocab configs can keep the
    # benchmark recipe's top_k=900 (torch .topk would reject k > V)
    k = min(top_k, v) if top_k > 0 else v
    if top_k <= 0 and top_p <= 0.0:  # no filtering: plain categorical
        return jax.random.categorical(rng, lf, axis=-1).astype(jnp.int32)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "sorted"
    if impl == "pallas" and not approx:
        from var_tpu.ops.pallas.select import float_key, topk_topp_bound

        bound = topk_topp_bound(lf, k, top_p)
        masked = jnp.where(float_key(lf) >= bound[..., None], lf, _NEG_INF)
        return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
    if approx and k < v:
        vals, idx = jax.lax.approx_max_k(lf, k, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(lf, k)  # descending candidates
    if top_p > 0.0:
        probs = jax.nn.softmax(vals, axis=-1)
        better_mass = jnp.cumsum(probs, axis=-1) - probs
        vals = jnp.where(better_mass >= top_p, _NEG_INF, vals)
    r = jax.random.categorical(rng, vals, axis=-1)
    return jnp.take_along_axis(idx, r[..., None], axis=-1)[..., 0]


def gumbel_softmax(
    rng: jax.Array, logits: jax.Array, tau: float = 1.0, hard: bool = False
) -> jax.Array:
    """Gumbel-softmax relaxation (reference ``helpers.py:22-36``).

    Used by the ``more_smooth`` decode path (``var.py:178-180``) to mix
    codebook rows by a soft distribution instead of a hard token.
    """
    g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y_soft, axis=-1, keepdims=True)
        y_hard = jnp.zeros_like(y_soft)
        y_hard = jnp.put_along_axis(y_hard, idx, 1.0, axis=-1, inplace=False)
        return y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    return y_soft
