"""Device mesh & sharding — the distributed runtime.

Replaces the reference's NCCL wrapper (``dist.py:16-206``) with JAX SPMD
over an ICI/DCN mesh:

* DDP            -> batch sharded on the 'data' axis, params replicated;
  XLA inserts the gradient all-reduce (reference: DDP backward hook).
* allreduce/allgather of stats -> ``psum``/``all_gather`` inside jit, or
  ``multihost_utils`` outside.
* master-only    -> ``jax.process_index() == 0``.
* barrier        -> ``sync_global_devices``.

The mesh carries a 'model' axis so tensor-sharding the larger VAR variants
(d30/d36) is a sharding-rule change, not a rewrite (SURVEY.md §2c).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed() -> None:
    """Multi-host init (reference ``dist.initialize``, dist.py:20-49).

    Explicit localhost/manual clusters: set ``JAX_COORDINATOR_ADDRESS`` +
    ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID`` (the torchrun RANK/WORLD_SIZE
    analogue). Managed clusters (GKE/SLURM): set ``COORDINATOR_ADDRESS`` and
    jax auto-detects. No-op for single-process runs — mirrors the
    reference's graceful single-process fallback (dist.py:25-29)."""
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coord and nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    elif coord or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """(data, model) mesh over all devices; model_parallel=1 is pure DP."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, f"{n} devices not divisible by mp={model_parallel}"
    arr = mesh_utils.create_device_mesh((n // model_parallel, model_parallel),
                                        devices=devices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with batch-dim sharding on the mesh."""
    sh = data_sharded(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def process_is_master() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)


def gather_diff_shape(x, axis_name: str = DATA_AXIS, max_len=None):
    """All-gather arrays whose leading dim differs per shard (reference
    ``dist.allgather_diff_shape``, dist.py:122-146): pad to the max length,
    all-gather, return (stacked padded array, lengths). For use inside
    shard_map/pjit bodies."""
    import jax.numpy as jnp

    n = x.shape[0]
    assert max_len is not None, "static max_len required under jit"
    pad = [(0, max_len - n)] + [(0, 0)] * (x.ndim - 1)
    padded = jnp.pad(x, pad)
    gathered = jax.lax.all_gather(padded, axis_name)
    lengths = jax.lax.all_gather(jnp.asarray(n), axis_name)
    return gathered, lengths


def var_param_sharding_rules(mesh: Mesh):
    """PartitionSpec rules for tensor-parallel VAR params over 'model'.

    Megatron-style layout: QKV/fc1 column-sharded (output dim), proj/fc2
    row-sharded (input dim) so each block needs a single psum after proj and
    after fc2; embeddings/heads sharded on the vocab/width dim. Returned as
    (path-predicate, PartitionSpec) rules applied by ``shard_var_params``.
    """
    rules = [
        (("attn", "qkv", "kernel"), P(None, MODEL_AXIS)),
        (("attn", "proj", "kernel"), P(MODEL_AXIS, None)),
        (("ffn", "fc1", "kernel"), P(None, MODEL_AXIS)),
        (("ffn", "fc2", "kernel"), P(MODEL_AXIS, None)),
        (("head", "kernel"), P(None, MODEL_AXIS)),
        (("head", "bias"), P(MODEL_AXIS)),
    ]
    return rules


def shard_var_params(mesh: Mesh, params):
    """Apply TP rules where they match; replicate everything else.

    Works for both block layouts: rules are written against unstacked 2-D
    kernels, and stacked params (leading depth axis from
    ``stack_block_params``) get the spec left-padded with None so the
    feature dims — never depth — are the ones sharded."""
    rules = var_param_sharding_rules(mesh)

    def spec_for(path, leaf) -> P:
        names = tuple(p.key for p in path if hasattr(p, "key"))
        for suffix, spec in rules:
            if names[-len(suffix):] == suffix:
                pad = leaf.ndim - len(spec)
                return P(*([None] * pad + list(spec))) if pad > 0 else spec
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf))),
        params,
    )
