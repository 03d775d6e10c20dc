"""Data pipeline tests: samplers, transforms, loader, and the native C++
image pipeline vs PIL (reference transforms, ``utils/data.py:14-45``)."""

import os

import numpy as np
import pytest

from var_tpu.data.imagenet import (DataLoader, DistInfiniteBatchSampler,
                                   FolderDataset, eval_split_indices,
                                   make_transform)


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for ci, cls in enumerate(["c0", "c1", "c2"]):
        d = root / cls
        d.mkdir()
        for i in range(4):
            arr = rng.integers(0, 255, (80, 72, 3), dtype=np.uint8)
            img = Image.fromarray(arr.astype(np.uint8))
            if i % 2 == 0:
                img.save(d / f"{i}.jpg", quality=95)
            else:
                img.save(d / f"{i}.png")
    return str(root)


def test_folder_dataset(folder):
    ds = FolderDataset(folder)
    assert len(ds) == 12
    assert ds.class_to_idx == {"c0": 0, "c1": 1, "c2": 2}
    labels = sorted({lbl for _, lbl in ds.samples})
    assert labels == [0, 1, 2]


def test_transform_shapes_and_range(folder):
    ds = FolderDataset(folder)
    tf = make_transform(64, train=True, hflip=True)
    rng = np.random.default_rng(0)
    out = tf(ds.samples[0][0], rng)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_sampler_resume_and_shard():
    s = DistInfiniteBatchSampler(world_size=2, rank=0, dataset_len=20,
                                 glb_batch_size=8, fill_last=True, start_ep=0, start_it=0)
    it = iter(s)
    batches = [next(it) for _ in range(4)]
    assert all(len(b) == 4 for b in batches)
    assert len(s) == 3  # ceil(20/8)
    # resume at (ep, it=1) skips the first batch of that epoch
    s2 = DistInfiniteBatchSampler(world_size=2, rank=0, dataset_len=20,
                                  glb_batch_size=8, fill_last=True, start_ep=0, start_it=1)
    b2 = next(iter(s2))
    assert b2 == batches[1]
    # ranks partition the global permutation (fresh samplers: iterating
    # past an epoch boundary reshuffles indices)
    s_r0 = DistInfiniteBatchSampler(world_size=2, rank=0, dataset_len=20,
                                    glb_batch_size=8, fill_last=True)
    s_r1 = DistInfiniteBatchSampler(world_size=2, rank=1, dataset_len=20,
                                    glb_batch_size=8, fill_last=True)
    assert set(s_r0.indices).union(s_r1.indices) == set(range(20))


def test_eval_split():
    parts = [list(eval_split_indices(10, 3, r)) for r in range(3)]
    assert sum(len(p) for p in parts) == 10
    assert sorted(sum(parts, [])) == list(range(10))


def test_dataloader_yields_batches(folder):
    ds = FolderDataset(folder)
    batches = [[0, 1, 2], [3, 4, 5]]
    dl = DataLoader(ds, iter(batches), make_transform(64, train=False), num_threads=2)
    out = list(dl)
    assert len(out) == 2
    imgs, labels = out[0]
    assert imgs.shape == (3, 64, 64, 3) and labels.shape == (3,)


def test_augmentation_deterministic_across_threading(folder):
    """Random crops/flips are keyed by (seed, epoch, index): identical
    batches regardless of thread count, and stable under re-iteration —
    the property the bit-exact resume test relies on."""
    ds = FolderDataset(folder)
    batches = [[0, 3, 7], [1, 4, 8], [2, 5, 6]]
    tf = make_transform(48, train=True, hflip=True)

    def run(num_threads):
        dl = DataLoader(ds, list(batches), tf, num_threads=num_threads, seed=5)
        return list(dl)

    a, b = run(1), run(8)
    assert len(a) == len(b) == 3
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)
    # different seed -> different crops (the streams are actually live)
    dl2 = DataLoader(ds, list(batches), tf, num_threads=4, seed=6)
    other = next(iter(dl2))[0]
    assert np.abs(other - a[0][0]).max() > 0


def test_sampler_epoch_changes_augmentation(folder):
    """The same dataset index draws different crops in different epochs
    (epoch is part of the stream key), but the same crop within one."""
    from var_tpu.data.imagenet import sample_rng

    r_a = sample_rng(1, 1, 42)
    r_b = sample_rng(1, 1, 42)
    r_c = sample_rng(1, 2, 42)
    a, b, c = r_a.random(4), r_b.random(4), r_c.random(4)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_native_loader_matches_pil(folder):
    native = pytest.importorskip("var_tpu.data.native_loader")
    if not native.available():
        pytest.skip("native toolchain unavailable")
    ds = FolderDataset(folder)
    tf = make_transform(64, train=False)
    rng = np.random.default_rng(0)
    for path, _ in ds.samples[:4]:
        pil_out = tf(path, rng)
        nat_out = native.load_image(path, round(1.125 * 64), 64)
        # PIL quantizes filter coefficients to 8 bits and clips per-pass;
        # expect close but not bit-identical output
        diff = np.abs(pil_out - nat_out)
        assert diff.mean() < 0.01 and diff.max() < 0.15, (diff.mean(), diff.max())


def test_native_batch_loader(folder):
    native = pytest.importorskip("var_tpu.data.native_loader")
    if not native.available():
        pytest.skip("native toolchain unavailable")
    ds = FolderDataset(folder)
    paths = [p for p, _ in ds.samples[:6]]
    out = native.load_batch(paths, 72, 64, num_threads=4)
    assert out.shape == (6, 64, 64, 3)
    assert np.isfinite(out).all() and out.min() >= -1.0 and out.max() <= 1.0
    # DataLoader integration
    btf = native.make_native_batch_transform(64, train=True, hflip=True)
    dl = DataLoader(ds, iter([[0, 1, 2, 3]]), make_transform(64),
                    batch_transform=btf)
    imgs, labels = next(iter(dl))
    assert imgs.shape == (4, 64, 64, 3)
