"""Apps layer tests on the tiny fixture models: smooth sampling, classifier
modes, masks, embedding-space editing, demo grid."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from var_tpu.apps.classify import VARClassifier, cumsum_tokens, smooth_log_probs_by_k
from var_tpu.apps.masks import generate_inpainting_mask, get_edit_mask, keep_scales_mask
from var_tpu.config import VAEConfig, VARConfig
from var_tpu.engine.convert import convert_vae, convert_var
from var_tpu.engine.sampler import decode_cfg, smooth_sampling
from var_tpu.models import vae as vae_mod

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "var_tiny.npz")


@pytest.fixture(scope="module")
def setup():
    data = np.load(FIXTURE)
    pns = tuple(data["patch_nums"].tolist())
    vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=10, depth=3, embed_dim=64, num_heads=4,
                        attn_l2_norm=True, cond_drop_rate=0.0, patch_nums=pns,
                        vocab_size=64, z_channels=8)
    vae_params = convert_vae(
        {k[7:]: data[k].astype(np.float32) for k in data.files if k.startswith("vae_sd/")},
        vae_cfg)
    var_params = convert_var(
        {k[10:]: data[k].astype(np.float32) for k in data.files if k.startswith("l2/var_sd/")},
        var_cfg)
    img = jnp.asarray(np.transpose(data["l2/img"], (0, 2, 3, 1)))[:1]
    gt = jnp.asarray(data["l2/gt_BL"])[:1]
    return vae_cfg, var_cfg, vae_params, var_params, img, gt


def test_masks():
    pns = (1, 2, 3, 4)
    m = keep_scales_mask(pns, 1)
    assert m[:5].all() and not m[5:].any() and m.shape == (30,)
    m2 = generate_inpainting_mask(pns, 1, [(0, 1)])
    assert m2[0]  # scale 0 kept
    assert not m2[1 + 1]  # (0,1) at scale 1 masked
    # scale 2 region for (0,1): x in [0,2), y in [1.5->1, 3]
    m3 = generate_inpainting_mask(pns, 1, [(0, 1)], reverse=True)
    assert (m3 == ~m2).all()
    em = get_edit_mask(pns, 0.25, 0.25, 0.75, 0.75, inpainting=True)
    assert em.shape == (4, 4)
    assert em[0, 0] == 1.0 and em[1, 1] == 0.0  # center regenerated


@pytest.mark.slow
def test_smooth_sampling_runs_and_respects_neighbors(setup):
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    res = smooth_sampling(var_params, vae_params, var_cfg, vae_cfg, gt, n=8,
                          label_b=jnp.asarray([3]), cfg_scale=1.5, dtype=jnp.float32)
    assert res.image.shape[1:] == (64, 64, 3)
    assert np.isfinite(float(res.log_likelihood))
    assert np.isfinite(float(res.distance_log_likelihood))
    # scale 0 (ratio 0): candidate count = 1 -> token must equal nearest
    # neighbor of gt token = gt token itself (distance 0)
    assert int(res.tokens[0, 0]) == int(gt[0, 0])


def test_smooth_sampling_threshold_mode(setup):
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    res = smooth_sampling(var_params, vae_params, var_cfg, vae_cfg, gt, n=8,
                          label_b=jnp.asarray([3]), neighbor_threshold=1e-6,
                          dtype=jnp.float32)
    # threshold ~0: only the gt token itself is ever a candidate
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(gt))


def test_smooth_log_probs_by_k_grouping():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 10)), jnp.float32)
    lp = jax.nn.log_softmax(logits, -1)
    sm = smooth_log_probs_by_k(lp, k=10)
    # k=V -> uniform distribution
    np.testing.assert_allclose(np.asarray(jnp.exp(sm)), 0.1, rtol=1e-4)
    sm1 = smooth_log_probs_by_k(lp, k=1)
    np.testing.assert_allclose(np.asarray(sm1), np.asarray(lp), atol=1e-5)
    # k=3 with V=10 exercises the remainder-padding path
    sm3 = smooth_log_probs_by_k(lp, k=3)
    np.testing.assert_allclose(np.asarray(jnp.exp(sm3).sum(-1)), 1.0, rtol=1e-3)


@pytest.mark.parametrize("mode", ["bayesian", "smooth_bayesian", "fast_neighbor_bayesian"])
def test_classifier_modes(setup, mode):
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    clf = VARClassifier(var_params, vae_params, var_cfg, vae_cfg, mode=mode,
                        threshold=5.0, smooth_k=4)
    ll = clf.class_likelihoods(img, list(range(10)), batch_size=5)
    assert ll.shape == (10,) and np.isfinite(ll).all()
    pred = clf.classify(img, 10)
    assert 0 <= pred < 10


def test_classifier_clayer_restricts(setup):
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    full = VARClassifier(var_params, vae_params, var_cfg, vae_cfg, mode="bayesian")
    part = VARClassifier(var_params, vae_params, var_cfg, vae_cfg, mode="bayesian", Clayer=2)
    ll_full = full.class_likelihoods(img, [0, 1], batch_size=2)
    ll_part = part.class_likelihoods(img, [0, 1], batch_size=2)
    assert (ll_part > ll_full).all()  # fewer (negative) terms summed
    assert cumsum_tokens((1, 2, 3, 4)) == [0, 1, 5, 14, 30]


def test_classifier_gen_mode_vae_feat(setup):
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    clf = VARClassifier(var_params, vae_params, var_cfg, vae_cfg, mode="gen",
                        Clayer=2, feat="vae_fhat")
    ll = clf.class_likelihoods(img, [0, 1], batch_size=1)
    assert ll.shape == (2,) and np.isfinite(ll).all() and (ll <= 0).all()


def test_edit_mask_decode_keeps_gt_embeddings(setup):
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    em = jnp.asarray(get_edit_mask(var_cfg.patch_nums, 0.0, 0.0, 1.0, 1.0,
                                   inpainting=False))  # keep everything
    res = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                     jax.random.PRNGKey(0), jnp.asarray([3]), cfg_scale=1.5,
                     top_k=4, dtype=jnp.float32, gt_tokens=gt, edit_mask=em)
    # full-keep edit must reproduce the VAE reconstruction of gt tokens
    idx_bl = [gt[:, b:e] for (b, e) in var_cfg.begin_ends]
    want = vae_mod.idxBl_to_img(vae_params, vae_cfg, idx_bl, last_one=True) * 0.5 + 0.5
    np.testing.assert_allclose(np.asarray(res.image), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_fid_protocol_end_to_end(tmp_path):
    """The full FID-protocol mechanics at small N: fid_sample writes one
    {i:06d}.png per (class, sample) with the benchmark recipe, resume skips
    existing files, and --pack produces the OpenAI-evaluator npz with
    arr_0 of shape (N, H, H, 3) uint8 (reference README.md:151-157,
    utils/misc.py:360-381). Tiny tokenizer geometry; the protocol — not the
    model quality — is under test."""
    from var_tpu.apps import fid_sample

    out = str(tmp_path / "fid")
    argv = ["--depth", "2", "--pn", "1_2_3", "--num_classes", "4",
            "--per_class", "2", "--batch", "4", "--out_dir", out,
            "--V", "64", "--Cvae", "8", "--ch", "32", "--pack"]
    fid_sample.main(argv)
    pngs = sorted(os.listdir(out))
    assert pngs == [f"{i:06d}.png" for i in range(8)]
    data = np.load(out + ".npz")
    arr = data["arr_0"]
    assert arr.shape == (8, 48, 48, 3) and arr.dtype == np.uint8
    # resume: re-running must not resample (mtimes unchanged)
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in pngs}
    fid_sample.main(argv[:-1])  # no --pack on resume
    assert {f: os.path.getmtime(os.path.join(out, f)) for f in pngs} == mtimes


def test_scan_sampler_matches_per_round(setup):
    """make_scan_sampler: one dispatch scanning R decodes must be bit-equal
    to R make_sampler calls keyed fold_in(rng, r) — dispatch batching is a
    pure cost change (the d36 wall-throughput mitigation)."""
    from var_tpu.engine.sampler import make_sampler, make_scan_sampler

    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    kw = dict(cfg_scale=1.5, top_k=4, top_p=0.9, dtype=jnp.float32)
    labels_rb = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    rng = jax.random.PRNGKey(9)
    scan = make_scan_sampler(var_cfg, vae_cfg, rounds=2, **kw)
    got = scan(var_params, vae_params, rng, labels_rb)
    plain = make_sampler(var_cfg, vae_cfg, **kw)
    for r in range(2):
        want = plain(var_params, vae_params, jax.random.fold_in(rng, r),
                     labels_rb[r])
        np.testing.assert_array_equal(np.asarray(got.tokens[r]),
                                      np.asarray(want.tokens))
        np.testing.assert_allclose(np.asarray(got.image[r]),
                                   np.asarray(want.image), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fid_sample_rounds_with_ragged_tail(tmp_path):
    """fid_sample --rounds 2: dispatch-batched sampling writes the same file
    set, and the ragged tail (total % (rounds*batch) != 0) falls back to
    per-batch decodes instead of compiling a short-shape scan."""
    from var_tpu.apps import fid_sample

    out = str(tmp_path / "fid_r")
    argv = ["--depth", "2", "--pn", "1_2_3", "--num_classes", "5",
            "--per_class", "2", "--batch", "2", "--rounds", "2",
            "--out_dir", out, "--V", "64", "--Cvae", "8", "--ch", "32"]
    fid_sample.main(argv)  # 10 images: 2 full 4-image dispatches + tail of 2
    pngs = sorted(os.listdir(out))
    assert pngs == [f"{i:06d}.png" for i in range(10)]


def test_save_grid(tmp_path):
    from var_tpu.apps.sample import save_grid

    imgs = np.random.default_rng(0).uniform(0, 1, (6, 8, 8, 3))
    path = str(tmp_path / "grid.png")
    save_grid(imgs, path, per_row=4)
    from PIL import Image

    g = Image.open(path)
    assert g.size == (32, 16)


def test_kv_window_pruning(setup):
    """kv_window >= num_scales is exactly the baseline; a small window runs
    and produces valid (different) tokens."""
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    base = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                      jax.random.PRNGKey(0), jnp.asarray([3]), cfg_scale=1.5,
                      top_k=1, dtype=jnp.float32)
    same = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                      jax.random.PRNGKey(0), jnp.asarray([3]), cfg_scale=1.5,
                      top_k=1, dtype=jnp.float32, kv_window=len(var_cfg.patch_nums))
    np.testing.assert_array_equal(np.asarray(base.tokens), np.asarray(same.tokens))
    pruned = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                        jax.random.PRNGKey(0), jnp.asarray([3]), cfg_scale=1.5,
                        top_k=1, dtype=jnp.float32, kv_window=1)
    t = np.asarray(pruned.tokens)
    assert t.shape == np.asarray(base.tokens).shape
    assert (t >= 0).all() and (t < var_cfg.vocab_size).all()
    assert np.isfinite(np.asarray(pruned.image)).all()


def test_more_smooth_decode(setup):
    """Gumbel-softmax smoothing path (reference more_smooth, var.py:176-182)."""
    vae_cfg, var_cfg, vae_params, var_params, img, gt = setup
    res = decode_cfg(var_params, vae_params, var_cfg, vae_cfg,
                     jax.random.PRNGKey(0), jnp.asarray([3]), cfg_scale=4.0,
                     top_k=8, more_smooth=True, dtype=jnp.float32)
    assert np.isfinite(np.asarray(res.image)).all()
    assert 0.0 <= float(res.image.min()) and float(res.image.max()) <= 1.0
