"""VAR training engine: loss, optimizer, jitted train/eval steps.

Semantics follow the reference trainer (``trainer.py:20-160``,
``utils/lr_control.py:68-108``, ``utils/amp_sc.py:39-75``):

* teacher forcing: frozen-VAE tokenize -> quantizer teacher input ->
  VAR forward -> CE(label_smooth) weighted 1/L, summed over L, mean over B.
* progressive training re-weights the newly-activated scale by ``prog_wp``.
* AdamW (0.9, 0.95) with weight decay only on >=2-D weights not in the
  no-decay set {pos_1LC, pos_start, lvl_embed, ada_gss, scale_mul}
  (``train.py:110-116``); grad clip BEFORE the step (``amp_sc.py:51-53``);
  lr/wd annealed per iteration (``train.py:283``).
* gradient accumulation: the step takes (ac, B, ...) microbatches and
  lax.scans over them, accumulating grads with the same 1/ac loss scaling
  (``amp_sc.py:43``).

TPU-first: one jitted step covers tokenizer + forward + backward +
optimizer; data parallelism comes from sharding the batch over the mesh's
'data' axis (XLA inserts the gradient all-reduce — the DDP equivalent).
bf16 compute / fp32 params+optimizer state (no loss scaler needed on TPU;
reference fp16 GradScaler, ``amp_sc.py:27``, has no bf16 analogue).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from var_tpu.config import TrainArgs, VAEConfig, VARConfig
from var_tpu.engine.schedules import lr_factor, wd_value
from var_tpu.models import quantizer as q
from var_tpu.models import vae as vae_mod
from var_tpu.models import var as var_mod

F32 = jnp.float32

NOWD_NAMES = ("pos_1LC", "pos_start", "lvl_embed", "ada_gss", "scale_mul")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # optimizer steps taken


def weight_decay_mask(params) -> Any:
    """True where AdamW weight decay applies (reference ``filter_params``
    rule: >=2-D weights not in nowd_keys). In the VAR pytree the decayed
    set is exactly {all Linear kernels, class_emb} — biases, positional
    tables, ada_gss and scale_mul are not. Name-based so it is invariant to
    the stacked-blocks layout (stacking adds a leading depth axis, which
    would fool an ndim test on biases)."""

    def decide(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if any(n in NOWD_NAMES for n in names):
            return False
        return bool(names) and names[-1] in ("kernel", "class_emb")

    return jax.tree_util.tree_map_with_path(decide, params)


def make_adamw(tclip: float):
    """(init, update) for torch-AdamW semantics with per-step lr/wd:
    p -= lr * (adam(clip(g)) + wd * p * mask). Decay is neither clipped nor
    momentum-tracked, matching torch.optim.AdamW."""
    clip = optax.clip_by_global_norm(tclip) if tclip > 0 else optax.identity()
    adam = optax.scale_by_adam(b1=0.9, b2=0.95, eps=1e-8)

    def init(params):
        return {"clip": clip.init(params), "adam": adam.init(params)}

    def update(grads, opt_state, params, lr, wd):
        gnorm = optax.global_norm(grads)
        g, clip_state = clip.update(grads, opt_state["clip"], params)
        u, adam_state = adam.update(g, opt_state["adam"], params)
        mask = weight_decay_mask(params)
        new_params = jax.tree.map(
            lambda p, ui, mi: p - lr * (ui + (wd * p if mi else 0.0)), params, u, mask
        )
        return new_params, {"clip": clip_state, "adam": adam_state}, gnorm

    return init, update


def make_grad_scaler(init_scale: float = 2.0 ** 11, growth_interval: int = 1000,
                     max_scale: float = 32768.0, min_scale: float = 1.0):
    """Dynamic loss scaling with torch-GradScaler semantics for the fp16
    parity mode (reference ``utils/amp_sc.py:27,56-66``: init 2**11, scale
    capped at 32768; on non-finite grads the step is skipped and the scale
    halves, after ``growth_interval`` consecutive finite steps it doubles).

    Returns (init, update): ``update(scaler_state, grads_finite)`` gives the
    next state. Unnecessary numerically for bf16 on TPU — provided so fp16
    recipes behave identically."""

    def init():
        return {"scale": jnp.float32(init_scale), "growth_count": jnp.int32(0)}

    def update(state, grads_finite):
        grown = state["growth_count"] + 1 >= growth_interval
        new_scale = jnp.where(
            grads_finite,
            jnp.where(grown, jnp.minimum(state["scale"] * 2.0, max_scale), state["scale"]),
            jnp.maximum(state["scale"] * 0.5, min_scale),
        )
        new_count = jnp.where(grads_finite & ~grown, state["growth_count"] + 1, 0)
        return {"scale": new_scale, "growth_count": new_count}

    return init, update


# ---------------------------------------------------------------------------
# loss & metrics


def cross_entropy(logits: jax.Array, labels: jax.Array, label_smooth: float = 0.0) -> jax.Array:
    """Per-position CE with torch label-smoothing semantics, fp32."""
    logp = jax.nn.log_softmax(logits.astype(F32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if label_smooth > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smooth) * nll + label_smooth * smooth
    return nll


class StepMetrics(NamedTuple):
    loss: jax.Array
    Lm: jax.Array  # mean unsmoothed CE
    Lt: jax.Array  # tail (last-scale) CE; -1 under progressive training
    accm: jax.Array  # mean top-1 acc (%)
    acct: jax.Array  # tail top-1 acc (%)
    grad_norm: jax.Array
    lr: jax.Array
    wd: jax.Array
    scale: jax.Array  # dynamic loss scale (1.0 unless fp16 parity mode)
    per_scale_L: jax.Array  # (S,)
    per_scale_acc: jax.Array  # (S,)
    pred_hist: jax.Array  # (V,) argmax histogram -> z_voc_usage


def _metrics_from_logits(logits, gt_bl, var_cfg: VARConfig, prog_si: int) -> Dict[str, jax.Array]:
    ed = logits.shape[1]
    pred = jnp.argmax(logits, axis=-1)
    ce = cross_entropy(logits, gt_bl)
    last_l = var_cfg.patch_nums[-1] ** 2
    if prog_si < 0:
        lt = ce[:, -last_l:].mean()
        acct = (pred[:, -last_l:] == gt_bl[:, -last_l:]).mean() * 100.0
    else:  # trainer.py:130-134
        lt = jnp.float32(-1.0)
        acct = jnp.float32(-1.0)
    per_l, per_a = [], []
    for si, (bg, e) in enumerate(var_cfg.begin_ends):
        if e > ed:
            per_l.append(jnp.float32(jnp.nan))
            per_a.append(jnp.float32(jnp.nan))
        else:
            per_l.append(ce[:, bg:e].mean())
            per_a.append((pred[:, bg:e] == gt_bl[:, bg:e]).mean() * 100.0)
    hist = jnp.bincount(pred.reshape(-1), length=var_cfg.vocab_size).astype(F32)
    return dict(
        Lm=ce.mean(), Lt=lt, accm=(pred == gt_bl).mean() * 100.0, acct=acct,
        per_scale_L=jnp.stack(per_l), per_scale_acc=jnp.stack(per_a), pred_hist=hist,
    )


# ---------------------------------------------------------------------------
# train / eval steps


def make_train_step(
    var_cfg: VARConfig,
    vae_cfg: VAEConfig,
    args: TrainArgs,
    iters_per_ep: int,
    prog_si: int = -1,
    dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    mesh=None,
):
    """Build (init_state, jitted step).

    step(state, vae_params, imgs (ac, B, H, W, 3), labels (ac, B), rng,
    g_it, prog_wp) -> (state, StepMetrics). ``prog_si`` is static: one
    compiled graph per progressive stage, mirroring the reference's
    stage-by-stage behaviour (``trainer.py:91-99``).
    """
    opt_init, opt_update = make_adamw(args.tclip)
    # fp16=1 in the reference enables a GradScaler whose real protective
    # behaviour is skipping steps with non-finite grads (amp_sc.py:56-66).
    # bf16 on TPU needs no loss scaling, so the default keeps only the skip
    # guard; --dscale=1 adds full dynamic-scaling parity (loss scaled before
    # backward, scale halves on overflow / doubles after growth_interval).
    skip_nonfinite = args.fp16 == 1
    dynamic_scale = bool(getattr(args, "dscale", 0)) and args.fp16 == 1
    scaler_init, scaler_update = make_grad_scaler()
    max_it = float(args.ep * iters_per_ep)
    wp_it = float(args.wp * iters_per_ep)
    L = var_cfg.seq_len
    ed = L if prog_si < 0 else var_cfg.begin_ends[prog_si][1]
    bg = 0 if prog_si < 0 else var_cfg.begin_ends[prog_si][0]

    def loss_fn(params, vae_params, img, label, rng, prog_wp):
        if getattr(args, "vae_bf16", 0):
            # tokenizer encoder in bf16: the quantizer's distance argmin and
            # stats stay fp32-forced (quantizer.py); rare near-tie token
            # flips vs the fp32 encoder are acceptable for training targets
            img = img.astype(jnp.bfloat16)
        tc = int(getattr(args, "tokenize_chunk", 0) or 0)
        if 0 < tc < img.shape[0] and img.shape[0] % tc == 0:
            # frozen tokenize in batch chunks: bit-identical ids, but the
            # encoder's fullres fp32 conv temps (3G each at bs48) only ever
            # exist at chunk width — the step's real memory peak is the
            # transformer backward, so chunking here buys device batch
            imgc = img.reshape(img.shape[0] // tc, tc, *img.shape[1:])
            idx_bl = jax.lax.map(
                lambda im: vae_mod.img_to_idxBl(vae_params, vae_cfg, im), imgc)
            idx_bl = [x.reshape(img.shape[0], x.shape[-1]) for x in idx_bl]
        else:
            idx_bl = vae_mod.img_to_idxBl(vae_params, vae_cfg, img)
        gt_bl = jnp.concatenate(idx_bl, axis=1)[:, :ed]
        x_in = q.idxBl_to_var_input(vae_params["quantize"], vae_cfg, idx_bl)
        logits = var_mod.var_forward(
            params, var_cfg, label, x_in, rng=rng, train=True,
            prog_si=prog_si, dtype=dtype, attn_impl=attn_impl,
            remat=getattr(args, "remat", False), mesh=mesh,
        )
        ce = cross_entropy(logits, gt_bl, args.ls)  # (B, ed)
        lw = jnp.full((ed,), 1.0 / L, F32)
        if prog_si >= 0:
            lw = lw.at[bg:ed].mul(jnp.clip(prog_wp, 0.0, 1.0))
        loss = (ce * lw[None]).sum(axis=-1).mean()
        # metrics INSIDE the grad region (has_aux): the (B, L, V) logits
        # never leave the fused head+CE computation — returning them as aux
        # forced a ~178M HBM materialization (and an (ac, ...) stack under
        # accumulation) just to re-read them for argmax/acc outside
        return loss, _metrics_from_logits(logits, gt_bl, var_cfg, prog_si)

    def step(state: TrainState, vae_params, imgs, labels, rng, g_it, prog_wp):
        ac = imgs.shape[0]
        if dynamic_scale:
            scaler_state = state.opt_state["scaler"]
            scale = scaler_state["scale"]
            adamw_state = {k: v for k, v in state.opt_state.items() if k != "scaler"}
        else:
            scale = jnp.float32(1.0)
            adamw_state = state.opt_state

        def grad_fn(p, img, label, r):
            # loss scaled BEFORE backward (amp_sc.py:43 parity); grads are
            # unscaled afterwards, so downstream clip/step sees true grads
            def scaled(p_):
                loss, aux = loss_fn(p_, vae_params, img, label, r, prog_wp)
                return loss * scale, aux

            (loss_s, aux), grads_s = jax.value_and_grad(scaled, has_aux=True)(p)
            return loss_s / scale, aux, grads_s

        if ac == 1:  # no accumulation: skip the scan (avoids nested scans)
            loss, m, grads = grad_fn(state.params, imgs[0], labels[0], rng)
        else:

            def micro(carry, xs):
                grads_acc, loss_acc = carry
                img, label, r = xs
                loss, aux, grads = grad_fn(state.params, img, label, r)
                grads_acc = jax.tree.map(lambda a, g: a + g / ac, grads_acc, grads)
                return (grads_acc, loss_acc + loss / ac), aux

            zero = jax.tree.map(lambda p: jnp.zeros_like(p, F32), state.params)
            rngs = jax.random.split(rng, ac)
            (grads, loss), m_st = jax.lax.scan(
                micro, (zero, jnp.float32(0.0)), (imgs, labels, rngs)
            )
            # metrics of the LAST micro-batch (reference logs the stepping
            # micro-batch's logits, trainer.py:117-128). The scan computes
            # and discards the earlier micro-batches' metrics — one extra
            # pass over the fused head's logits each, ~0.2% of step time at
            # d16 bs32; gating on the scan index would put a lax.cond inside
            # the differentiated region for less than that
            m = jax.tree.map(lambda x: x[-1], m_st)
        if dynamic_scale:  # unscale accumulated grads (GradScaler.unscale_)
            grads = jax.tree.map(lambda g: g / scale, grads)
        lr = args.tlr * lr_factor(args.sche, g_it, wp_it, max_it, args.wp0, args.wpe)
        wd = wd_value(g_it, max_it, args.twd, args.twde)
        new_params, new_opt, gnorm = opt_update(grads, adamw_state, state.params, lr, wd)
        if skip_nonfinite:
            finite = jnp.isfinite(gnorm)
            new_params = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_params, state.params)
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_opt, adamw_state)
        if dynamic_scale:
            # the scaler state is NOT skip-guarded: overflow must halve it
            new_opt = dict(new_opt, scaler=scaler_update(scaler_state, jnp.isfinite(gnorm)))
        metrics = StepMetrics(loss=loss, grad_norm=gnorm, lr=lr, wd=wd, scale=scale, **m)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    def init_state(params) -> TrainState:
        opt_state = opt_init(params)
        if dynamic_scale:
            opt_state = dict(opt_state, scaler=scaler_init())
        return TrainState(params, opt_state, jnp.int32(0))

    # donate the incoming TrainState: params + AdamW moments (~3.7G at d16)
    # alias into the outputs instead of double-buffering across the step —
    # the caller always rebinds (state, m = step(state, ...))
    return init_state, jax.jit(step, donate_argnums=(0,))


def pick_eval_attn(train_attn: str, seq_len: int) -> str:
    """Eval attention for a given train impl: the paired train kernel is a
    custom-VJP training path, and the dense XLA fallback materializes
    (B, H, L, L) fp32 scores (``ops/attention.py``) — at the 1024px preset's
    L=9451, one such buffer is 11.4 GB even at batch 2 x 16 heads (~23 GB
    while scores and softmax output are both live). Long presets therefore
    eval through the STREAMING pallas forward (O(block) VMEM per program);
    256px keeps the dense path, which measures faster at L=680."""
    if train_attn == "paired":
        return "pallas" if seq_len > 1000 else "xla"
    return train_attn


def make_eval_step(var_cfg: VARConfig, vae_cfg: VAEConfig, dtype=jnp.bfloat16,
                   attn_impl="xla", mesh=None):
    """Validation step (reference ``eval_ep``, trainer.py:54-84): returns
    summed [L_mean_units, L_tail_units, acc_mean_units, acc_tail_units, n]
    to be divided by the total count ``n``.

    ``valid`` is a per-row (B,) float mask so every process can pad its
    contiguous no-pad eval split (reference data_sampler.py:6-17) to a
    mesh-divisible global batch and run the SAME sharded jit — padded rows
    contribute zero to every sum. Under a data-sharded batch the sums are
    global (XLA inserts the cross-device reduction), so no host-side
    allreduce or per-host full-param copy is needed."""
    last_l = var_cfg.patch_nums[-1] ** 2

    @jax.jit
    def step(var_params, vae_params, img, label, valid):
        idx_bl = vae_mod.img_to_idxBl(vae_params, vae_cfg, img)
        gt = jnp.concatenate(idx_bl, axis=1)
        x_in = q.idxBl_to_var_input(vae_params["quantize"], vae_cfg, idx_bl)
        logits = var_mod.var_forward(var_params, var_cfg, label, x_in, train=False,
                                     dtype=dtype, attn_impl=attn_impl, mesh=mesh)
        v = valid.astype(F32)
        ce = cross_entropy(logits, gt)
        pred = jnp.argmax(logits, -1)
        return jnp.stack([
            (ce.mean(axis=1) * v).sum(),
            (ce[:, -last_l:].mean(axis=1) * v).sum(),
            ((pred == gt).sum(axis=1) * (100.0 / gt.shape[1]) * v).sum(),
            ((pred[:, -last_l:] == gt[:, -last_l:]).sum(axis=1) * (100.0 / last_l) * v).sum(),
            v.sum(),
        ])

    return step
