"""Multi-host (2-process) data sharding + training test on CPU.

Proves the reference's DDP data semantics (``utils/data_sampler.py:100-103``,
``train.py:102``) hold in the JAX rebuild: each process loads a disjoint
contiguous shard, the globally-sharded batch is assembled in rank order, and
one train step produces the same loss as a single-process run over the same
global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_tiny_dataset(root, n_classes=2, per_class=8, size=8):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = os.path.join(root, "train", f"class_{c}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{i}.png"))


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    _make_tiny_dataset(str(tmp_path))
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"out_{p}.json") for p in range(2)]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         coord, "2", str(p), str(tmp_path), outs[p]],
        env=env, cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{lg[-3000:]}"

    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    r0, r1 = sorted(results, key=lambda r: r["proc"])

    # 1. disjoint contiguous rank shards (data_sampler.py:100-103 semantics):
    # each rank batches its own epoch slice; the union over an epoch equals
    # the single-process epoch set
    i0, i1 = r0["local_indices"], r1["local_indices"]
    assert not set(i0) & set(i1), "rank shards overlap"
    from var_tpu.data.imagenet import DistInfiniteBatchSampler

    def epoch_batches(world, rank):
        s = DistInfiniteBatchSampler(world_size=world, rank=rank, dataset_len=16,
                                     glb_batch_size=8, same_seed_for_all_ranks=0)
        it = iter(s)
        return [next(it) for _ in range(len(s))]

    e0, e1 = epoch_batches(2, 0), epoch_batches(2, 1)
    assert e0[0] == i0 and e1[0] == i1, "workers diverged from sampler spec"
    single_epoch = epoch_batches(1, 0)
    assert (set(sum(e0, [])) | set(sum(e1, []))
            == set(sum(single_epoch, []))), "epoch union mismatch"
    glb = i0 + i1  # the actual global batch content at iter 0

    # 2. both processes assembled the identical global array (rank order)
    np.testing.assert_allclose(r0["row_sums"], r1["row_sums"], rtol=1e-6)

    # 3. loss identical across processes and matches a single-process step
    assert abs(r0["loss"] - r1["loss"]) < 1e-6

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from var_tpu.config import TrainArgs, VAEConfig, VARConfig
    from var_tpu.data.imagenet import DataLoader, FolderDataset, make_transform
    from var_tpu.engine import trainer as tr
    from var_tpu.models import vae as vae_mod
    from var_tpu.models import var as var_mod
    from var_tpu.parallel import mesh as pm

    pns = (1, 2, 3)
    vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=2, depth=2, embed_dim=64, num_heads=4,
                        patch_nums=pns, vocab_size=64, z_channels=8,
                        attn_l2_norm=True)
    reso = pns[-1] * vae_cfg.downsample
    ds = FolderDataset(str(tmp_path / "train"))
    loader = iter(DataLoader(ds, iter([glb]), make_transform(reso, train=False),
                             num_threads=2))
    imgs, labels = next(loader)
    np.testing.assert_allclose(imgs.sum(axis=(1, 2, 3)), r0["row_sums"], rtol=1e-5)

    mesh = pm.make_mesh(devices=jax.devices()[:4])
    args = TrainArgs(depth=2, bs=8, ac=1, ep=2, pn="1_2_3").finalize(
        world_size=mesh.shape[pm.DATA_AXIS])
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    init_state, step = tr.make_train_step(var_cfg, vae_cfg, args, iters_per_ep=4,
                                          dtype=jnp.float32)
    with mesh:
        state = jax.device_put(init_state(var_mod.init_var_params(k2, var_cfg)),
                               pm.replicated(mesh))
        vae_params = jax.device_put(vae_mod.init_vae_params(k1, vae_cfg),
                                    pm.replicated(mesh))
        sh = NamedSharding(mesh, P(None, pm.DATA_AXIS))
        _, metrics = step(state, vae_params,
                          jax.device_put(imgs[None], sh),
                          jax.device_put(labels[None].astype(np.int32), sh),
                          jax.random.PRNGKey(1), jnp.int32(0), jnp.float32(1.0))
        single_loss = float(metrics.loss)
    assert abs(single_loss - r0["loss"]) < 1e-4, (single_loss, r0["loss"])

    # 4. mesh-sharded masked eval: both processes report the SAME globally
    # summed stats (in-jit reduction, no host allreduce), and those stats
    # equal a single-device eval over exactly the 7 valid rows (proc 0
    # contributed 4, proc 1 contributed 3 + one zero-pad)
    np.testing.assert_allclose(r0["eval_stats"], r1["eval_stats"], rtol=1e-6)
    assert r0["eval_stats"][-1] == 7.0
    valid_rows = np.concatenate([imgs[:4], imgs[4:7]])
    valid_labels = np.concatenate([labels[:4], labels[4:7]]).astype(np.int32)
    eval_step = tr.make_eval_step(var_cfg, vae_cfg, dtype=jnp.float32)
    ref = np.asarray(eval_step(var_mod.init_var_params(k2, var_cfg),
                               vae_mod.init_vae_params(k1, vae_cfg),
                               jnp.asarray(valid_rows), jnp.asarray(valid_labels),
                               jnp.ones(7)))
    np.testing.assert_allclose(r0["eval_stats"], ref, rtol=1e-4)
