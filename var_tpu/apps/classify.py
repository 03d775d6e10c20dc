"""Zero-shot VAR-as-classifier (reference ``eval_prob.py``).

Classifies an image as argmax over class conditions of a likelihood score.
Modes (reference ``eval_prob.py:433-584``):

* ``bayesian``             — sum of teacher-forced GT-token log-probs;
  optional ``Clayer`` restricts to scales >= Clayer.
* ``smooth_bayesian``      — same, after rank-group-k smoothing of the
  token distribution (``smooth_log_probs_by_k``, eval_prob.py:37-92, k=50).
* ``fast_neighbor_bayesian`` — per position, max log-prob over codebook
  neighbors of the GT token within an L2 threshold (eval_prob.py:560-584).
* ``neighbor_bayesian``    — accumulated log-lik of the full neighbor-
  constrained ``smooth_sampling`` decode (eval_prob.py:555-558).
* ``gen``                  — per class, greedy-inpaint the scales >= Clayer
  and score by negative L1 feature distance to the original; built-in
  features: ``vae_fhat``/``vae_post``; torch extractors (resnet50/clip/
  dinov2) used when torch+transformers weights are locally available.

Per-image JSON cache makes runs kill/resume-safe (eval_prob.py:409-416).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import List, Optional, Sequence

import jax

if os.environ.get("VAR_TPU_FORCE_CPU"):  # same knob as train.py
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from var_tpu.config import VAEConfig, VARConfig
from var_tpu.engine import sampler as sampler_mod
from var_tpu.models import quantizer as q
from var_tpu.models import vae as vae_mod
from var_tpu.models import var as var_mod

F32 = jnp.float32


def smooth_log_probs_by_k(log_probs: jax.Array, k: int) -> jax.Array:
    """Rank-group smoothing: average probabilities within groups of k ranks
    (descending), scatter back, re-log (reference eval_prob.py:37-92)."""
    b, l, v = log_probs.shape
    probs = jnp.exp(log_probs)
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    pad = (-v) % k
    if pad:
        sp = jnp.concatenate([sorted_probs, jnp.zeros((b, l, pad))], axis=-1)
        valid = jnp.concatenate([jnp.ones((b, l, v)), jnp.zeros((b, l, pad))], axis=-1)
    else:
        sp, valid = sorted_probs, jnp.ones((b, l, v))
    groups = sp.reshape(b, l, -1, k)
    counts = valid.reshape(b, l, -1, k).sum(-1)
    mean = groups.sum(-1) / jnp.maximum(counts, 1.0)
    smoothed = jnp.repeat(mean, k, axis=-1)[:, :, :v]
    ranks = jnp.argsort(order, axis=-1)
    unsorted = jnp.take_along_axis(smoothed, ranks, axis=-1)
    return jnp.log(unsorted + 1e-10)


def cumsum_tokens(patch_nums: Sequence[int]) -> List[int]:
    out, c = [0], 0
    for pn in patch_nums:
        c += pn * pn
        out.append(c)
    return out


class VARClassifier:
    """Likelihood-based zero-shot classifier over ``num_classes`` conditions."""

    def __init__(self, var_params, vae_params, var_cfg: VARConfig, vae_cfg: VAEConfig,
                 mode: str = "bayesian", Clayer: int = 0, threshold: float = 2.0,
                 smooth_k: int = 50, cfg_scale: float = 1.5, feat: str = "vae_fhat",
                 dtype=jnp.float32):
        self.var_params, self.vae_params = var_params, vae_params
        self.var_cfg, self.vae_cfg = var_cfg, vae_cfg
        self.mode, self.Clayer, self.threshold = mode, Clayer, threshold
        self.smooth_k, self.cfg_scale, self.feat = smooth_k, cfg_scale, feat
        self.dtype = dtype
        self.cums = cumsum_tokens(var_cfg.patch_nums)
        self._tokenize = jax.jit(partial(vae_mod.img_to_idxBl, vae_params, vae_cfg))
        self._score = jax.jit(self._score_fn)
        if mode == "fast_neighbor_bayesian":
            emb = vae_params["quantize"]["embedding"]
            n = min(64, var_cfg.vocab_size)  # neighbor table width
            _, self.top_n, self.top_n_dists = jax.jit(
                partial(sampler_mod.codebook_neighbor_tables, n=n))(emb)

    # ---- teacher-forced scoring (bayesian / smooth / fast-neighbor) ----
    def _score_fn(self, labels, x_in, gt_bl):
        logits = var_mod.var_forward(self.var_params, self.var_cfg, labels, x_in,
                                     train=False, dtype=self.dtype)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        if self.mode == "smooth_bayesian":
            log_probs = smooth_log_probs_by_k(log_probs, self.smooth_k)
        if self.mode == "fast_neighbor_bayesian":
            cand = jnp.take(self.top_n, gt_bl, axis=0)  # (B, L, n)
            cand_d = jnp.take(self.top_n_dists, gt_bl, axis=0)
            clp = jnp.take_along_axis(log_probs, cand, axis=-1)
            clp = jnp.where(cand_d <= self.threshold, clp, -jnp.inf)
            token_ll = jnp.max(clp, axis=-1)
        else:
            token_ll = jnp.take_along_axis(log_probs, gt_bl[..., None], -1)[..., 0]
        if self.Clayer:
            token_ll = token_ll[:, self.cums[self.Clayer]:]
        return token_ll.sum(axis=1), token_ll

    def class_likelihoods(self, img: jax.Array, class_ids: Sequence[int],
                          batch_size: int = 10, rng=None):
        """img: (1, H, W, 3) in [-1, 1]. Returns (len(class_ids),) scores."""
        idx_bl = self._tokenize(img)
        gt = jnp.concatenate(idx_bl, axis=1)
        out = []
        if self.mode in ("bayesian", "smooth_bayesian", "fast_neighbor_bayesian"):
            x_in = q.idxBl_to_var_input(self.vae_params["quantize"], self.vae_cfg, idx_bl)
            for i in range(0, len(class_ids), batch_size):
                cls = jnp.asarray(class_ids[i: i + batch_size])
                b = cls.shape[0]
                ll, _ = self._score(cls, jnp.tile(x_in, (b, 1, 1)), jnp.tile(gt, (b, 1)))
                out.append(np.asarray(ll))
            return np.concatenate(out)
        if self.mode == "neighbor_bayesian":
            for c in class_ids:
                res = sampler_mod.smooth_sampling(
                    self.var_params, self.vae_params, self.var_cfg, self.vae_cfg,
                    gt, n=self.var_cfg.vocab_size, label_b=jnp.asarray([c]),
                    cfg_scale=self.cfg_scale, neighbor_threshold=self.threshold,
                    dtype=self.dtype)
                out.append(float(res.log_likelihood))
            return np.asarray(out)
        if self.mode == "gen":
            return self._gen_scores(img, gt, class_ids, rng)
        raise ValueError(f"unknown mode {self.mode}")

    def _gen_scores(self, img, gt, class_ids, rng):
        keep = np.ones(self.var_cfg.seq_len, bool)
        if self.Clayer:
            keep[self.cums[self.Clayer]:] = False
        keep = jnp.asarray(keep)[None]
        rng = jax.random.PRNGKey(0) if rng is None else rng
        scores = []
        feat_in = self._features(img)
        for c in class_ids:
            res = sampler_mod.decode_cfg(
                self.var_params, self.vae_params, self.var_cfg, self.vae_cfg,
                rng, jnp.asarray([c]), cfg_scale=self.cfg_scale, top_k=1,
                dtype=self.dtype, gt_tokens=gt, keep_mask=keep)
            feat_gen = self._features(res.image * 2.0 - 1.0)
            scores.append(-float(jnp.abs(feat_in - feat_gen).mean()))
        return np.asarray(scores)

    def _features(self, img_pm1: jax.Array) -> jax.Array:
        if self.feat == "vae_fhat":
            return vae_mod.img_to_fhat(self.vae_params, self.vae_cfg, img_pm1)[-1].reshape(-1)
        if self.feat == "vae_post":
            return vae_mod.img_to_f(self.vae_params, self.vae_cfg, img_pm1).reshape(-1)
        return _torch_features(np.asarray(img_pm1), self.feat)

    def classify(self, img, num_classes: Optional[int] = None, batch_size: int = 10) -> int:
        ids = list(range(num_classes or self.var_cfg.num_classes))
        return int(np.argmax(self.class_likelihoods(img, ids, batch_size)))


def _torch_features(img_pm1: np.ndarray, feat: str) -> jax.Array:
    """External feature extractors (resnet50/clip/dinov2) via torch-cpu,
    only when weights are already cached locally (zero-egress)."""
    import torch

    x = torch.from_numpy(np.transpose(img_pm1, (0, 3, 1, 2)))
    # reference re-normalizes from [-1,1] to imagenet stats then 224 bicubic
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = ((x + 1) / 2 - mean) / std
    x = torch.nn.functional.interpolate(x, size=(224, 224), mode="bicubic")
    if feat == "resnet50":
        from torchvision.models import resnet50

        m = resnet50(weights="IMAGENET1K_V2").eval()
        m.fc = torch.nn.Identity()
    elif feat in ("clip", "dinov2"):
        from transformers import AutoModel

        name = {"clip": "openai/clip-vit-base-patch16",
                "dinov2": "facebook/dinov2-base"}[feat]
        m = AutoModel.from_pretrained(name).eval()
        with torch.no_grad():
            if feat == "clip":
                return jnp.asarray(m.get_image_features(pixel_values=x).numpy()).reshape(-1)
            return jnp.asarray(m(pixel_values=x).pooler_output.numpy()).reshape(-1)
    else:
        raise ValueError(f"unknown feat {feat}")
    with torch.no_grad():
        return jnp.asarray(m(x).numpy()).reshape(-1)


def main(argv=None):
    """CLI driver (reference ``eval_prob.py`` main, :235-609)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--vae_ckpt", default="vae_ch160v4096z32.pth")
    p.add_argument("--var_ckpt", default="")
    p.add_argument("--pn", default="1_2_3_4_5_6_8_10_13_16")
    p.add_argument("--data_path", required=True)
    p.add_argument("--out_dir", default="clf_out")
    p.add_argument("--mode", default="bayesian",
                   choices=["bayesian", "smooth_bayesian", "fast_neighbor_bayesian",
                            "neighbor_bayesian", "gen"])
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--Clayer", type=int, default=0)
    p.add_argument("--threshold", type=float, default=2.0)
    p.add_argument("--smooth_k", type=int, default=50)
    p.add_argument("--cfg", type=float, default=1.5)
    p.add_argument("--feat", default="vae_fhat",
                   choices=["vae_fhat", "vae_post", "resnet50", "clip", "dinov2"])
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--imagenet_a_json", default="",
                   help="imagenet_class_index.json for ImageNet-A folders")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from var_tpu.config import parse_patch_nums
    from var_tpu.data.imagenet import FolderDataset, build_imagenet_a_class_map, make_transform
    from var_tpu.models import build_vae_var

    pns = parse_patch_nums(args.pn)
    vae_cfg, var_cfg, vae_params, var_params = build_vae_var(
        patch_nums=pns, depth=args.depth, num_classes=max(args.num_classes, 1000)
        if args.var_ckpt else args.num_classes,
        vae_ckpt=args.vae_ckpt if os.path.exists(args.vae_ckpt) else None,
        var_ckpt=args.var_ckpt if os.path.exists(args.var_ckpt) else None,
    )
    cls_map = None
    if args.imagenet_a_json:
        cls_map = build_imagenet_a_class_map(args.imagenet_a_json, args.data_path)
    ds = FolderDataset(args.data_path, class_to_idx=cls_map)
    reso = pns[-1] * vae_cfg.downsample
    tf = make_transform(reso, train=False)
    rng = np.random.default_rng(0)

    clf = VARClassifier(var_params, vae_params, var_cfg, vae_cfg, mode=args.mode,
                        Clayer=args.Clayer, threshold=args.threshold,
                        smooth_k=args.smooth_k, cfg_scale=args.cfg, feat=args.feat)

    def images():
        for path, label in ds.samples:
            yield tf(path, rng), label

    run_eval(clf, images(), args.out_dir, num_classes=args.num_classes,
             limit=args.limit or None, batch_size=args.batch_size)


def run_eval(classifier: VARClassifier, dataset, out_dir: str, num_classes: int = 10,
             limit: Optional[int] = None, batch_size: int = 10) -> float:
    """Folder evaluation loop with per-image JSON cache (eval_prob.py:400-612)."""
    os.makedirs(out_dir, exist_ok=True)
    correct = total = 0
    for idx, (img, label) in enumerate(dataset):
        if limit is not None and idx >= limit:
            break
        cache = os.path.join(out_dir, f"{idx}.json")
        if os.path.exists(cache):
            with open(cache) as f:
                d = json.load(f)
        else:
            pred = classifier.classify(jnp.asarray(img)[None], num_classes, batch_size)
            d = {"pred": pred, "label": int(label)}
            with open(cache, "w") as f:
                json.dump(d, f)
        correct += int(d["pred"] == d["label"])
        total += 1
    acc = 100.0 * correct / max(total, 1)
    print(f"Final accuracy: {acc:.2f}% ({correct}/{total})")
    return acc
