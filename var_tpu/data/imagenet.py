"""ImageNet folder pipeline (host side) feeding the TPU.

Capabilities of the reference input stack (``utils/data.py:14-132``,
``utils/data_sampler.py:6-103``) rebuilt without torchvision:

* folder dataset (class-sorted subdirs), train transform = LANCZOS resize of
  the shorter side to round(1.125*reso) + random crop (+ optional hflip),
  val transform = center crop; pixels scaled [0,1] -> [-1,1].
* ImageNet-A subset mapping via an ``imagenet_class_index.json`` file
  (wnid -> original 1000-class index), like the fork's loader
  (``data.py:48-116``).
* infinite, epoch-seeded, resumable (start_ep/start_it) distributed batch
  sampler with fill-last padding, and a contiguous no-pad eval split.

The loader is a thread-pooled prefetcher producing numpy NHWC batches;
``jax.device_put`` with a 'data'-axis sharding moves them onto the mesh.
"""

from __future__ import annotations

import json
import os
import threading
import queue as queue_mod
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover - PIL is in the image
    Image = None

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".JPEG", ".JPG", ".PNG")


# ---------------------------------------------------------------------------
# dataset


class FolderDataset:
    """Class-per-subdir image dataset (torchvision DatasetFolder semantics)."""

    def __init__(self, root: str, class_to_idx: Optional[dict] = None):
        self.root = root
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if class_to_idx is None:
            class_to_idx = {c: i for i, c in enumerate(classes)}
        self.class_to_idx = class_to_idx
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            if c not in class_to_idx:
                continue
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fn), class_to_idx[c]))

    def __len__(self):
        return len(self.samples)


def build_imagenet_a_class_map(class_index_json: str, root: str) -> dict:
    """wnid-dir -> original ImageNet-1k index (fork's ImageNetADataset,
    ``data.py:48-116``). ``class_index_json`` maps "idx" -> [wnid, name]."""
    with open(class_index_json) as f:
        idx_map = json.load(f)
    wnid_to_idx = {v[0]: int(k) for k, v in idx_map.items()}
    present = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    return {w: wnid_to_idx[w] for w in present if w in wnid_to_idx}


def build_imagenet_a_dataset(root: str, class_index_json: str) -> "FolderDataset":
    """ImageNet-A folder with labels remapped to original 1k-class indices
    (fork's ``build_imagenet_a_dataset``, data.py:105-116)."""
    return FolderDataset(root, class_to_idx=build_imagenet_a_class_map(class_index_json, root))


# ---------------------------------------------------------------------------
# transforms (PIL + numpy; LANCZOS like data.py:21)


def _resize_shorter(img, target: int):
    w, h = img.size
    if w <= h:
        nw, nh = target, max(1, round(h * target / w))
    else:
        nw, nh = max(1, round(w * target / h)), target
    return img.resize((nw, nh), Image.LANCZOS)


def _to_pm1(img) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr[..., :3] * 2.0 - 1.0  # normalize_01_into_pm1 (data.py:10)


def make_transform(final_reso: int, mid_reso: float = 1.125, train: bool = True,
                   hflip: bool = False) -> Callable:
    mid = round(mid_reso * final_reso)

    def tf(path: str, rng: np.random.Generator) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        img = _resize_shorter(img, mid)
        w, h = img.size
        if train:
            x0 = int(rng.integers(0, w - final_reso + 1))
            y0 = int(rng.integers(0, h - final_reso + 1))
        else:
            x0 = (w - final_reso) // 2
            y0 = (h - final_reso) // 2
        img = img.crop((x0, y0, x0 + final_reso, y0 + final_reso))
        if train and hflip and rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return _to_pm1(img)

    return tf


# ---------------------------------------------------------------------------
# samplers (reference utils/data_sampler.py semantics)


def eval_split_indices(n: int, world_size: int, rank: int) -> range:
    """Contiguous no-pad split (EvalDistributedSampler, data_sampler.py:6-17)."""
    seps = np.linspace(0, n, world_size + 1, dtype=int)
    return range(seps[rank], seps[rank + 1])


class DistInfiniteBatchSampler:
    """Infinite epoch-seeded shuffled batches, contiguous per-rank slice,
    fill-last padding, resumable at (start_ep, start_it)
    (``data_sampler.py:67-103``)."""

    def __init__(self, world_size: int, rank: int, dataset_len: int, glb_batch_size: int,
                 same_seed_for_all_ranks: int = 0, fill_last: bool = True,
                 shuffle: bool = True, start_ep: int = 0, start_it: int = 0):
        assert glb_batch_size % world_size == 0
        self.world_size, self.rank = world_size, rank
        self.dataset_len = dataset_len
        self.glb_batch_size = glb_batch_size
        self.batch_size = glb_batch_size // world_size
        self.iters_per_ep = (dataset_len + glb_batch_size - 1) // glb_batch_size
        self.fill_last, self.shuffle = fill_last, shuffle
        self.same_seed_for_all_ranks = same_seed_for_all_ranks
        self.start_ep, self.start_it = start_ep, start_it
        self.epoch = start_ep
        self.indices = self._gen()

    def _gen(self) -> List[int]:
        gmax = self.iters_per_ep * self.glb_batch_size
        rng = np.random.default_rng(self.epoch + self.same_seed_for_all_ranks)
        g = rng.permutation(self.dataset_len) if self.shuffle else np.arange(self.dataset_len)
        filling = gmax - g.shape[0]
        if filling > 0 and self.fill_last:
            g = np.concatenate([g, g[:filling]])
        seps = np.linspace(0, g.shape[0], self.world_size + 1, dtype=int)
        local = g[seps[self.rank]: seps[self.rank + 1]].tolist()
        self.max_p = len(local)
        return local

    def __iter__(self) -> Iterator[List[int]]:
        # NOTE: the reference carries a start_it skip inside the sampler that
        # can never trigger (data_sampler.py:52-55 compares epoch after
        # incrementing) and instead skips batches in the train loop
        # (train.py:274). We implement the intended semantics here: the first
        # iterated epoch resumes at start_it.
        self.epoch = self.start_ep
        first = True
        while True:
            self.epoch += 1
            p = self.start_it * self.batch_size if first else 0
            first = False
            while p < self.max_p:
                yield self.indices[p: p + self.batch_size]
                p += self.batch_size
            if self.shuffle:
                self.indices = self._gen()

    def __len__(self):
        return self.iters_per_ep


# ---------------------------------------------------------------------------
# prefetching loader


def sample_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    """Augmentation stream for one (epoch, dataset-index) pair.

    Keying the generator by (seed, epoch, index) makes augmentation
    thread-safe (each concurrent load owns a private generator),
    restart-invariant (a resumed run redraws the identical crop/flip the
    uninterrupted run would) and world-size-invariant — which supersedes the
    reference's shared per-worker streams with rank-offset seeds
    (``arg_util.py:113-127``): those reproduce only under the same worker
    count and schedule."""
    return np.random.default_rng([int(seed), int(epoch), int(index)])


class DataLoader:
    """Thread-pooled prefetching loader -> (imgs NHWC float32, labels int32).

    Replaces torch DataLoader workers (``train.py:42-61``); decode/resize
    happen on host threads overlapping TPU steps.

    ``batch_iter`` may be the sampler OBJECT (anything iterable); if it
    exposes an ``epoch`` attribute (``DistInfiniteBatchSampler`` does) the
    per-sample augmentation streams are keyed by (seed, epoch, index) via
    :func:`sample_rng`, otherwise epoch 0 is used.
    """

    def __init__(self, dataset: FolderDataset, batch_iter, transform: Callable,
                 num_threads: int = 8, prefetch: int = 4, seed: int = 0,
                 batch_transform: Optional[Callable] = None):
        self.ds = dataset
        self.batch_iter = batch_iter
        self.tf = transform
        self.batch_tf = batch_transform  # native C++ whole-batch fast path
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.seed = seed

    def __iter__(self):
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        epoch_src = self.batch_iter if hasattr(self.batch_iter, "epoch") else None
        it = iter(self.batch_iter)

        def producer():
            from concurrent.futures import ThreadPoolExecutor

            if self.batch_tf is not None:  # native C++ path: one call per batch
                for idxs in it:
                    if stop.is_set():
                        return
                    ep = epoch_src.epoch if epoch_src is not None else 0
                    paths = [self.ds.samples[i][0] for i in idxs]
                    labels = np.asarray([self.ds.samples[i][1] for i in idxs], np.int32)
                    rngs = [sample_rng(self.seed, ep, i) for i in idxs]
                    q.put((self.batch_tf(paths, rngs), labels))
                q.put(None)
                return
            with ThreadPoolExecutor(self.num_threads) as pool:
                for idxs in it:
                    if stop.is_set():
                        return
                    ep = epoch_src.epoch if epoch_src is not None else 0

                    def load(i, ep=ep):
                        path, label = self.ds.samples[i]
                        return self.tf(path, sample_rng(self.seed, ep, i)), label
                    out = list(pool.map(load, idxs))
                    imgs = np.stack([o[0] for o in out]).astype(np.float32)
                    labels = np.asarray([o[1] for o in out], np.int32)
                    q.put((imgs, labels))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
