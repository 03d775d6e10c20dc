"""Worker process for the 2-process multi-host CPU test.

Launched by tests/test_multihost.py as:

    python tests/multihost_worker.py <coordinator> <num_procs> <proc_id> \
        <data_root> <out_json>

Each process:
  * joins the jax.distributed cluster (2 local CPU devices each),
  * loads ONLY its contiguous rank slice of the dataset
    (``DistInfiniteBatchSampler(world_size=nproc, rank=proc)``,
    reference ``utils/data_sampler.py:100-103``),
  * assembles the globally-sharded batch from process-local data,
  * runs ONE jitted train step over the global mesh,
and writes {local_indices, global_row_sums, loss} to out_json so the parent
can verify disjointness, assembly order, and the single-process loss match.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def main(coord: str, nproc: int, proc: int, data_root: str, out_json: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                               process_id=proc)
    assert jax.process_count() == nproc and jax.process_index() == proc

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from var_tpu.config import TrainArgs, VAEConfig, VARConfig
    from var_tpu.data.imagenet import (DataLoader, DistInfiniteBatchSampler,
                                       FolderDataset, make_transform)
    from var_tpu.engine import trainer as tr
    from var_tpu.models import vae as vae_mod
    from var_tpu.models import var as var_mod
    from var_tpu.parallel import mesh as pm

    mesh = pm.make_mesh()  # all 4 global devices, pure DP
    ndev = mesh.shape[pm.DATA_AXIS]

    pns = (1, 2, 3)
    vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, ch_mult=(1, 1),
                        v_patch_nums=pns)
    var_cfg = VARConfig(num_classes=2, depth=2, embed_dim=64, num_heads=4,
                        patch_nums=pns, vocab_size=64, z_channels=8,
                        attn_l2_norm=True)
    reso = pns[-1] * vae_cfg.downsample

    ds = FolderDataset(os.path.join(data_root, "train"))
    glb_bs = 8
    sampler = DistInfiniteBatchSampler(
        world_size=nproc, rank=proc, dataset_len=len(ds), glb_batch_size=glb_bs,
        fill_last=True, shuffle=True, same_seed_for_all_ranks=0)
    batch_iter = iter(sampler)
    local_idxs = next(batch_iter)

    # deterministic transform (center crop) so the parent can reproduce rows
    loader = iter(DataLoader(ds, iter([local_idxs]),
                             make_transform(reso, train=False), num_threads=2))
    imgs, labels = next(loader)

    sharding = NamedSharding(mesh, P(None, pm.DATA_AXIS))
    g_imgs = jax.make_array_from_process_local_data(
        sharding, imgs[None], (1, glb_bs, reso, reso, 3))
    g_labels = jax.make_array_from_process_local_data(
        sharding, labels[None].astype(np.int32), (1, glb_bs))

    # replicated per-global-row sums prove shard placement order
    row_sums = np.asarray(jax.jit(
        lambda x: x.sum(axis=(0, 2, 3, 4)),
        out_shardings=NamedSharding(mesh, P()))(g_imgs))

    args = TrainArgs(depth=2, bs=glb_bs, ac=1, ep=2, pn="1_2_3").finalize(world_size=ndev)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vae_params = vae_mod.init_vae_params(k1, vae_cfg)
    var_params = var_mod.init_var_params(k2, var_cfg)
    init_state, step = tr.make_train_step(var_cfg, vae_cfg, args, iters_per_ep=4,
                                          dtype=jnp.float32)
    with mesh:
        state = jax.device_put(init_state(var_params), pm.replicated(mesh))
        vae_params = jax.device_put(vae_params, pm.replicated(mesh))
        _, metrics = step(state, vae_params, g_imgs, g_labels,
                          jax.random.PRNGKey(1), jnp.int32(0), jnp.float32(1.0))
        loss = float(metrics.loss)

    # mesh-sharded masked eval (train.py's val path): ragged per-process
    # splits (proc 0 contributes 4 valid rows, proc 1 only 3 + one zero-pad)
    # run through ONE sharded jit; the stats must come out globally summed
    # and identical on every process — no per-host param copy, no allreduce.
    eval_step = tr.make_eval_step(var_cfg, vae_cfg, dtype=jnp.float32)
    n_valid = 4 if proc == 0 else 3
    valid = np.zeros((4,), np.float32)
    valid[:n_valid] = 1.0
    ev_imgs = np.asarray(imgs, np.float32).copy()
    ev_imgs[n_valid:] = 0.0
    ev_labels = np.asarray(labels, np.int32).copy()
    ev_labels[n_valid:] = 0
    rows = NamedSharding(mesh, P(pm.DATA_AXIS))
    # the train step donated `state`; rebuild identical params for eval
    ev_params = jax.device_put(var_mod.init_var_params(k2, var_cfg),
                               pm.replicated(mesh))
    with mesh:
        eval_stats = np.asarray(eval_step(
            ev_params, vae_params,
            jax.make_array_from_process_local_data(rows, ev_imgs, (glb_bs, reso, reso, 3)),
            jax.make_array_from_process_local_data(rows, ev_labels, (glb_bs,)),
            jax.make_array_from_process_local_data(rows, valid, (glb_bs,))))

    with open(out_json, "w") as f:
        json.dump(dict(proc=proc, local_indices=list(map(int, local_idxs)),
                       labels=[int(l) for l in labels],
                       row_sums=[float(s) for s in row_sums], loss=loss,
                       eval_stats=[float(s) for s in eval_stats]), f)
    print(f"[worker {proc}] wrote {out_json}; loss={loss:.6f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
