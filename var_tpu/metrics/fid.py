"""In-repo Fréchet-distance scorer with pluggable feature extractors.

The reference delegates FID scoring to the external OpenAI guided-diffusion
evaluator (reference ``README.md:151-157``; ``utils/misc.py:360-381`` only
packs the npz). This module closes that boundary: one command goes
PNG folder (or packed npz) -> feature statistics -> a number, entirely
in-repo, so quality trends can be tracked across training runs.

Extractors (``--extractor``):

- ``vae`` (default, always available in-env): the frozen VQVAE encoder's
  pre-quantization features (``img_to_f``, reference ``vqvae.py:66``),
  spatially mean+std pooled to a 2*Cvae vector. With the production VAE
  checkpoint these are the tokenizer's own perceptual features; with a
  seeded random init they are random-projection features — still a valid
  distribution distance for *trend* tracking, not comparable to published
  Inception-FID numbers.
- ``inception``: the standard FID InceptionV3 pool3 (2048-d) via
  ``torch.jit.load`` of the pytorch-fid TorchScript module
  (``pt_inception-2015-12-05``). torchvision is not in this image, so the
  scriptmodule file is the supported way to run true Inception-FID when its
  weights are locally available (zero-egress: they cannot be downloaded).
- ``pixel``: 32x32 area-downsampled RGB, flattened. Extractor-free sanity
  baseline for tests and protocol plumbing.

Statistics are the classic (mu, Sigma); the distance is
``|mu1-mu2|^2 + tr(S1 + S2 - 2 sqrtm(S1 S2))`` with the symmetric-product
eigenvalue form of the cross term (numerically robust for PSD inputs; falls
back to scipy.linalg.sqrtm only if eigh fails).
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

Extractor = Callable[[np.ndarray], np.ndarray]  # (B,H,W,3) uint8 -> (B, D) f64


# ---------------------------------------------------------------------------
# Fréchet distance


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between N(mu1, sigma1) and N(mu2, sigma2).

    tr(sqrtm(S1 S2)) is computed as sum(sqrt(eigvals(R S2 R))) with
    R = sqrtm(S1) from a symmetric eigendecomposition — S1 S2 is similar to
    the PSD matrix R S2 R, so its eigenvalues are real and non-negative and
    no complex matrix sqrt is needed.
    """
    mu1 = np.asarray(mu1, np.float64).ravel()
    mu2 = np.asarray(mu2, np.float64).ravel()
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    try:
        w1, v1 = np.linalg.eigh(sigma1)
        root1 = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
        cross = root1 @ sigma2 @ root1
        wc = np.linalg.eigvalsh((cross + cross.T) / 2.0)
        tr_sqrt = float(np.sqrt(np.clip(wc, 0.0, None)).sum())
    except np.linalg.LinAlgError:  # pragma: no cover - eigh is robust on PSD
        import scipy.linalg

        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        tr_sqrt = float(np.trace(covmean))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt)


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu (D,), sigma (D, D))."""
    feats = np.asarray(feats, np.float64)
    assert feats.ndim == 2 and feats.shape[0] >= 2, \
        f"need (N>=2, D) features, got {feats.shape}"
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


# ---------------------------------------------------------------------------
# image sources: a folder of {i:06d}.png (fid_sample.py layout) or a packed
# OpenAI-evaluator npz (arr_0 = (N, H, W, 3) uint8)


def iter_images(path: str, batch: int = 64,
                limit: Optional[int] = None) -> Iterator[np.ndarray]:
    """Yield (b, H, W, 3) uint8 batches from a PNG folder or an npz."""
    if os.path.isdir(path):
        from PIL import Image

        names = sorted(f for f in os.listdir(path)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if limit is not None:
            names = names[:limit]
        assert names, f"no images in {path}"
        for i in range(0, len(names), batch):
            imgs = [np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
                    for n in names[i: i + batch]]
            yield np.stack(imgs)
    else:
        arr = np.load(path)["arr_0"]
        if limit is not None:
            arr = arr[:limit]
        assert arr.ndim == 4 and arr.shape[-1] == 3, f"bad npz shape {arr.shape}"
        for i in range(0, len(arr), batch):
            yield np.asarray(arr[i: i + batch], np.uint8)


# ---------------------------------------------------------------------------
# extractors


def make_vae_extractor(vae_params=None, vae_cfg=None, vae_ckpt: str = "",
                       seed: int = 0) -> Extractor:
    """Frozen-VQVAE encoder features: img_to_f -> spatial mean+std pool
    (2*Cvae dims). Loads ``vae_ckpt`` when given; otherwise a seeded random
    init (random-projection features — trend tracking only)."""
    import jax
    import jax.numpy as jnp

    from var_tpu.models import vae as vae_mod

    real_weights = vae_params is not None
    if vae_params is None:
        from var_tpu.config import VAEConfig

        vae_cfg = vae_cfg or VAEConfig()
        if vae_ckpt and os.path.exists(vae_ckpt):
            from var_tpu.engine.convert import convert_vae, load_torch_state_dict

            vae_params = convert_vae(load_torch_state_dict(vae_ckpt), vae_cfg)
            real_weights = True
        else:
            vae_params = vae_mod.init_vae_params(jax.random.PRNGKey(seed), vae_cfg)

    @jax.jit
    def _feats(x):  # (B, H, W, 3) in [-1, 1]
        f = vae_mod.img_to_f(vae_params, vae_cfg, x)  # (B, h, w, Cvae)
        mean = f.mean(axis=(1, 2))
        std = f.std(axis=(1, 2))
        return jnp.concatenate([mean, std], axis=-1)

    def extract(imgs_u8: np.ndarray) -> np.ndarray:
        x = np.asarray(imgs_u8, np.float32) / 127.5 - 1.0
        return np.asarray(_feats(x), np.float64)

    # scores from checkpoint features and from seeded random-projection
    # features live in DIFFERENT spaces — label the extractor so callers
    # (apps/fid_score.py) can name the metric accordingly instead of
    # silently mixing incomparable numbers across machines
    extract.feature_space = "vae" if real_weights else "vae_randproj"
    return extract


def make_pixel_extractor(size: int = 32) -> Extractor:
    """Area-downsampled RGB pixels, flattened (3*size*size dims)."""
    import jax
    import jax.numpy as jnp

    from var_tpu.ops.resize import resize_area

    @jax.jit
    def _feats(x):
        y = resize_area(x, (size, size))
        return y.reshape(y.shape[0], -1)

    def extract(imgs_u8: np.ndarray) -> np.ndarray:
        x = np.asarray(imgs_u8, np.float32) / 127.5 - 1.0
        return np.asarray(_feats(x), np.float64)

    return extract


def make_inception_extractor(scriptmodule_path: str) -> Extractor:
    """pytorch-fid's TorchScript InceptionV3 (pool3, 2048-d). The file is
    the public ``pt_inception-2015-12-05-6726825d.pt``; torchvision is not
    in this image and zero egress means it cannot be fetched — supply it
    when running where the weights exist."""
    if not os.path.exists(scriptmodule_path):
        raise FileNotFoundError(
            f"Inception scriptmodule not found: {scriptmodule_path!r}. True "
            "Inception-FID needs the public pt_inception-2015-12-05 TorchScript "
            "file (github.com/mseitzer/pytorch-fid); in-env, use --extractor vae.")
    import torch

    model = torch.jit.load(scriptmodule_path).eval()

    @torch.no_grad()
    def extract(imgs_u8: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(np.asarray(imgs_u8, np.float32) / 255.0)
        x = x.permute(0, 3, 1, 2)  # NCHW in [0, 1] — pytorch-fid convention
        out = model(x)
        feats = out[0] if isinstance(out, (tuple, list)) else out
        return feats.squeeze(-1).squeeze(-1).double().numpy()

    return extract


def get_extractor(name: str, **kw) -> Extractor:
    if name == "vae":
        return make_vae_extractor(vae_ckpt=kw.get("vae_ckpt", ""),
                                  vae_params=kw.get("vae_params"),
                                  vae_cfg=kw.get("vae_cfg"))
    if name == "pixel":
        return make_pixel_extractor(size=kw.get("size", 32))
    if name == "inception":
        return make_inception_extractor(kw.get("inception_pt", "pt_inception-2015-12-05-6726825d.pt"))
    raise ValueError(f"unknown extractor {name!r} (vae | pixel | inception)")


def path_stats(path: str, extractor: Extractor, batch: int = 64,
               limit: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """mu/sigma of a PNG folder, an images npz (arr_0), or a precomputed
    stats npz (mu + sigma keys, as the OpenAI reference batches ship)."""
    if not os.path.isdir(path) and path.endswith(".npz"):
        z = np.load(path)
        if "mu" in z and "sigma" in z:
            return np.asarray(z["mu"], np.float64), np.asarray(z["sigma"], np.float64)
    feats = [extractor(b) for b in iter_images(path, batch=batch, limit=limit)]
    return feature_stats(np.concatenate(feats, axis=0))


def fid_between(path_a: str, path_b: str, extractor: Extractor,
                batch: int = 64, limit: Optional[int] = None) -> float:
    mu1, s1 = path_stats(path_a, extractor, batch=batch, limit=limit)
    mu2, s2 = path_stats(path_b, extractor, batch=batch, limit=limit)
    return frechet_distance(mu1, s1, mu2, s2)
