"""VAR training CLI (reference ``train.py`` capabilities, TPU-native).

Single entry point for class-conditional ImageNet training:

    python train.py --data_path=/path/to/imagenet --depth=16 --bs=768 \
        --ep=200 --fp16=1 --alng=1e-3 --wpe=0.1

Flags match the reference recipes (README.md:129-145). Differences by
design: parallelism is a JAX device mesh (one process per host, all chips
via pjit sharding) instead of one process per GPU; checkpoints are orbax
directories.

``--local_debug=1`` runs the 2-step random-tensor smoke with a checkpoint
round-trip between steps (reference train.py:140-162).
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    # select backend before any jax computation (see tests/conftest.py note)
    import jax

    if os.environ.get("VAR_TPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from var_tpu.config import parse_cli
    from var_tpu.engine import checkpoint as ckpt
    from var_tpu.engine import trainer as tr
    from var_tpu.models import vae as vae_mod
    from var_tpu.models import var as var_mod
    from var_tpu.parallel import mesh as pm
    from var_tpu.utils.logging import MetricLogger, TensorboardLogger, dump_log_line, log

    pm.initialize_distributed()
    mesh = pm.make_mesh()
    ndev = mesh.shape[pm.DATA_AXIS]
    args = parse_cli().finalize(world_size=ndev)
    os.makedirs(args.local_out_dir_path, exist_ok=True)
    if not args.local_debug:
        from var_tpu.utils.logging import tee_output

        tee_output(args.local_out_dir_path)
    if args.dbg_nan:  # the reference's detect-anomaly analogue (train.py:173-174)
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)
    log(f"devices={ndev} ({jax.devices()[0].platform}), args bs={args.bs} "
        f"batch/dev={args.batch_size} tlr={args.tlr:g} pn={args.patch_nums}")

    var_cfg = args.var_config()
    vae_cfg = args.vae_config()
    dtype = jnp.bfloat16 if args.fp16 else jnp.float32

    rng = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
    r_vae, r_var, rng = jax.random.split(rng, 3)

    if args.local_debug:
        # tiny shapes, runs on anything (reference local_debug semantics)
        from var_tpu.config import VAEConfig, VARConfig

        vae_cfg = VAEConfig(vocab_size=64, z_channels=8, ch=32, ch_mult=(1, 1),
                            v_patch_nums=args.patch_nums)
        var_cfg = VARConfig(num_classes=10, depth=2, embed_dim=64, num_heads=4,
                            patch_nums=args.patch_nums, vocab_size=64, z_channels=8,
                            attn_l2_norm=args.anorm, shared_aln=args.saln)
        dtype = jnp.float32

    vae_params = vae_mod.init_vae_params(r_vae, vae_cfg)
    vae_ckpt = os.environ.get("VAR_TPU_VAE_CKPT", "vae_ch160v4096z32.pth")
    if not args.local_debug:
        if os.path.exists(vae_ckpt):
            from var_tpu.engine.convert import convert_vae, load_torch_state_dict

            vae_params = convert_vae(load_torch_state_dict(vae_ckpt), vae_cfg)
            log(f"loaded frozen VAE tokenizer from {vae_ckpt}")
        elif args.allow_random_vae:
            log(f"WARNING: VAE checkpoint {vae_ckpt} not found; proceeding "
                f"with a RANDOM tokenizer (--allow_random_vae=1: training "
                f"targets are meaningless noise)", force=True)
        else:
            raise SystemExit(
                f"VAE checkpoint {vae_ckpt!r} not found. Training against a "
                f"random tokenizer silently produces meaningless targets "
                f"(the reference auto-downloads it, train.py:93-98). Point "
                f"VAR_TPU_VAE_CKPT at the converted vae_ch160v4096z32.pth, "
                f"or pass --allow_random_vae=1 to proceed anyway.")
    var_params = var_mod.stack_block_params(var_mod.init_var_params(
        r_var, var_cfg, init_std=args.ini, init_head=args.hd,
        init_adaln=args.aln, init_adaln_gamma=args.alng,
    ))
    log(f"VAR params: {var_mod.param_count(var_params)/1e6:.2f}M, "
        f"VAE params: {var_mod.param_count(vae_params)/1e6:.2f}M")

    # ---------------- resume metadata (before data: the sampler needs
    # (start_ep, start_it) to reproduce the uninterrupted batch sequence,
    # reference train.py:57-60 + data_sampler.py:55) ----------------
    start_ep, start_it, best_val_lt = 0, 0, 1e9
    # local_debug is a fresh 2-step smoke; never resume it from leftovers
    resume_path, meta = ((None, {}) if args.local_debug
                         else ckpt.auto_resume(args.local_out_dir_path))
    if resume_path:
        start_ep = int(meta.get("epoch", 0))
        start_it = int(meta.get("iter", 0))
        best_val_lt = float(meta.get("best_val_lt", 1e9))
        log(f"auto-resuming from {resume_path} at ep{start_ep} it{start_it}")

    # ---------------- data ----------------
    # Multi-host: each process loads ONLY its contiguous rank slice
    # (reference utils/data_sampler.py:100-103) and contributes it to the
    # globally-sharded batch below.
    nproc, proc = jax.process_count(), jax.process_index()
    if args.local_debug:
        iters_train = 2
        reso = args.patch_nums[-1] * vae_cfg.downsample

        glb = args.batch_size * ndev

        def debug_batches():
            k = jax.random.PRNGKey(7)
            while True:
                k, k1, k2 = jax.random.split(k, 3)
                yield (np.asarray(jax.random.uniform(k1, (glb, reso, reso, 3)) * 2 - 1),
                       np.asarray(jax.random.randint(k2, (glb,), 0, var_cfg.num_classes)))

        train_iter = debug_batches()
        val_iter = None
    else:
        from var_tpu.data.imagenet import (DataLoader, DistInfiniteBatchSampler,
                                           FolderDataset, eval_split_indices,
                                           make_transform)

        train_ds = FolderDataset(os.path.join(args.data_path, "train"))
        val_ds = FolderDataset(os.path.join(args.data_path, "val"))
        log(f"dataset: {len(train_ds)} train, {len(val_ds)} val images")
        sampler = DistInfiniteBatchSampler(
            world_size=nproc, rank=proc, dataset_len=len(train_ds),
            glb_batch_size=args.batch_size * ndev, fill_last=True, shuffle=True,
            same_seed_for_all_ranks=args.seed or 0,
            start_ep=start_ep, start_it=start_it,
        )
        iters_train = len(sampler)
        from var_tpu.data.native_loader import available as native_available
        from var_tpu.data.native_loader import make_native_batch_transform

        batch_tf = None
        if native_available():
            batch_tf = make_native_batch_transform(
                args.data_load_reso, args.mid_reso, train=True, hflip=args.hflip,
                num_threads=args.workers or 16)
            log("using native C++ image pipeline")
        train_iter = iter(DataLoader(
            # pass the sampler OBJECT: augmentation streams are keyed by
            # (seed, epoch, dataset index) — thread-safe, restart-invariant
            # and world-size-invariant (supersedes the reference's
            # rank-offset worker seeding, arg_util.py:113-127; global
            # dataset indices are disjoint across ranks already)
            train_ds, sampler, make_transform(args.data_load_reso, args.mid_reso,
                                              train=True, hflip=args.hflip),
            num_threads=args.workers or 16,
            seed=args.seed or 0,
            batch_transform=batch_tf,
        ))

        def val_iter():
            # contiguous no-pad per-process split (EvalDistributedSampler,
            # reference data_sampler.py:6-17); nproc==1 degenerates to full set
            idxs = list(eval_split_indices(len(val_ds), nproc, proc))
            vbs = max(1, args.batch_size * ndev // nproc)
            batches = [idxs[i:i + vbs] for i in range(0, len(idxs), vbs)]
            return iter(DataLoader(
                val_ds, iter(batches),
                make_transform(args.data_load_reso, args.mid_reso, train=False),
                num_threads=args.workers or 16,
            ))

    # ---------------- trainer ----------------
    attn_impl = args.attn
    assert attn_impl in ("auto", "xla", "pallas", "hybrid", "paired"), \
        f"--attn={attn_impl!r}: want auto|xla|pallas|hybrid|paired"
    if attn_impl == "auto":
        # Measured on v5e (scripts/bench_train.py, d16): the paired
        # merged-lane train kernel, segmented by the block-causal mask's
        # structure, wins at every preset — 256px 69.7 vs 55.3 img/s plain
        # XLA; 512px 14.3 vs 10.2 streaming pallas; 1024px 1.44 vs 0.85.
        # It self-degrades to xla when head_dim pairs don't fit
        # (models/var.py:261); CPU keeps xla (interpret mode is test-only).
        on_tpu = jax.devices()[0].platform != "cpu"
        attn_impl = "paired" if on_tpu else "xla"
    init_state, _ = tr.make_train_step(var_cfg, vae_cfg, args, iters_train,
                                       dtype=dtype, attn_impl=attn_impl,
                                       mesh=mesh)
    steps = {}

    def step_for(prog_si: int):
        if prog_si not in steps:
            steps[prog_si] = tr.make_train_step(
                var_cfg, vae_cfg, args, iters_train, prog_si=prog_si,
                dtype=dtype, attn_impl=attn_impl, mesh=mesh
            )[1]
        return steps[prog_si]

    eval_step = tr.make_eval_step(var_cfg, vae_cfg, dtype=dtype,
                                  attn_impl=tr.pick_eval_attn(attn_impl, var_cfg.seq_len),
                                  mesh=mesh)
    state = init_state(var_params)
    if resume_path:
        state = ckpt.load_checkpoint(resume_path, state)
        log(f"restored checkpoint state from {resume_path}")

    state = jax.device_put(state, pm.replicated(mesh))
    vae_params = jax.device_put(vae_params, pm.replicated(mesh))
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, pm.DATA_AXIS))

    def put_batch(sharding, local, glb_rows):
        """Assemble a globally-sharded batch from per-process local rows.

        Single process: plain device_put. Multi-host: every process holds
        its contiguous (ac, glb/nproc, ...) slice; build the global jax.Array
        from process-local shards (the JAX equivalent of the reference's
        per-rank DataLoader + DDP, train.py:102 / data_sampler.py:100-103).
        """
        if nproc == 1:
            return jax.device_put(local, sharding)
        glb_shape = (local.shape[0], glb_rows) + local.shape[2:]
        return jax.make_array_from_process_local_data(sharding, local, glb_shape)

    tb = TensorboardLogger(args.tb_log_dir_path)
    from var_tpu.utils.logging import ProfilerHooks

    profiler = ProfilerHooks()  # active only with VAR_TPU_PROFILE_DIR set
    max_it = args.ep * iters_train
    wp_it = args.wp * iters_train

    def prog_si_at(g_it: int) -> int:
        if not args.pg:
            return -1
        if g_it <= wp_it:
            return args.pg0
        if g_it >= max_it * args.pg:
            return len(args.patch_nums) - 1
        delta = len(args.patch_nums) - 1 - args.pg0
        progress = min(max((g_it - wp_it) / (max_it * args.pg - wp_it), 0), 1)
        return args.pg0 + round(progress * delta)

    prog_it, last_prog_si, first_prog = 0, -1, True

    for ep in range(start_ep, args.ep):
        me = MetricLogger()
        ep_start = time.time()
        opt_steps_per_ep = max(1, iters_train // args.ac)
        it0 = start_it // args.ac if ep == start_ep else 0
        for opt_it in range(it0, opt_steps_per_ep):
            g_it = ep * iters_train + (opt_it + 1) * args.ac - 1
            micro_imgs, micro_labels = [], []
            t_data = time.time()
            for _ in range(args.ac):
                imgs, labels = next(train_iter)
                micro_imgs.append(imgs)
                micro_labels.append(labels)
            glb_rows = args.batch_size * ndev
            imgs = put_batch(batch_sharding, np.stack(micro_imgs), glb_rows)
            labels = put_batch(batch_sharding, np.stack(micro_labels), glb_rows)
            data_t = time.time() - t_data

            prog_si = prog_si_at(g_it)
            if prog_si == len(args.patch_nums) - 1:
                prog_si = -1
            if last_prog_si != prog_si:
                if last_prog_si != -1:
                    first_prog = False
                last_prog_si, prog_it = prog_si, 0
            prog_it += 1
            prog_wp = max(min(prog_it / max(args.pgwp * iters_train, 1), 1), 0.01)
            if first_prog:
                prog_wp = 1.0

            profiler.maybe_toggle(opt_it)
            # restart-invariant per-step randomness: resume at step k uses
            # the same key the uninterrupted run would (vs a sequential
            # split chain, which desyncs after resume)
            r_step = jax.random.fold_in(rng, g_it)
            state, m = step_for(prog_si)(
                state, vae_params, imgs, labels, r_step,
                jnp.int32(g_it), jnp.float32(prog_wp),
            )
            me.update(Lm=m.Lm, Lt=m.Lt, Accm=m.accm, Acct=m.acct,
                      tnm=m.grad_norm, tlr=m.lr, data_t=data_t,
                      step_t=time.time() - t_data)
            if opt_it % 50 == 0 or opt_it == opt_steps_per_ep - 1:
                eta = me.eta("step_t", opt_steps_per_ep - opt_it - 1)
                log(f"[ep {ep}/{args.ep}] [{opt_it}/{opt_steps_per_ep}] {me} {eta}")
                tb.set_step(g_it)
                tb.update(head="AR_iter_loss", Lm=float(m.Lm), Lt=float(m.Lt),
                          Accm=float(m.accm), Acct=float(m.acct))
                tb.update(head="AR_opt_lr/lr_max", sche_tlr=float(m.lr))
                tb.update(head="AR_opt_wd/wd_max", sche_twd=float(m.wd))
                tb.update(head="AR_opt_grad/grad", grad_norm=float(m.grad_norm),
                          grad_clip=args.tclip)
            if (g_it == 0 or (g_it + 1) % 500 == 0):
                hist = np.asarray(m.pred_hist)
                usage = float((hist / max(hist.sum(), 1) > 0.001 / var_cfg.vocab_size).mean() * 100)
                per = {f"acc_{args.resos[si]}": float(a)
                       for si, a in enumerate(np.asarray(m.per_scale_acc)) if np.isfinite(a)}
                per.update({f"L_{args.resos[si]}": float(l)
                            for si, l in enumerate(np.asarray(m.per_scale_L)) if np.isfinite(l)})
                tb.update(head="AR_iter_loss", z_voc_usage=usage, step=g_it, **per)
            if args.ckpt_iters and (opt_it + 1) % args.ckpt_iters == 0 \
                    and (opt_it + 1) < opt_steps_per_ep:
                # mid-epoch checkpoint with the TRUE iteration so resume
                # replays the exact uninterrupted batch sequence
                # (reference train.py:57-60 + data_sampler.py:55)
                ckpt.save_checkpoint(
                    args.last_ckpt_path, state,
                    dict(epoch=ep, iter=(opt_it + 1) * args.ac,
                         best_val_lt=best_val_lt, args=args.state_dict()))
                log(f"[ep {ep} it {(opt_it + 1) * args.ac}] mid-epoch checkpoint saved")

        # ---- eval + checkpoint every 10 ep and at the end (train.py:208-231)
        if (ep + 1) % args.val_freq_ep == 0 or (ep + 1) == args.ep:
            if val_iter is not None:
                # Mesh-sharded eval (reference eval_ep, trainer.py:54-84, as
                # one global computation): every process pads its contiguous
                # no-pad split (data_sampler.py:6-17) to a fixed vbs rows per
                # batch and all processes run the SAME sharded jit for the
                # same number of batches. Params stay mesh-resident (no
                # per-host full-param device_get — ~8 GB/host at d30) and the
                # sums come out globally reduced, so no host allreduce either.
                vbs = max(1, args.batch_size * ndev // nproc)
                max_split = -(-len(val_ds) // nproc)
                nb = -(-max_split // vbs)  # identical on every process
                reso = args.patch_nums[-1] * vae_cfg.downsample
                eval_sharding = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(pm.DATA_AXIS))

                def put_rows(local):
                    if nproc == 1:
                        return jax.device_put(local, eval_sharding)
                    glb = (nproc * vbs,) + local.shape[1:]
                    return jax.make_array_from_process_local_data(
                        eval_sharding, local, glb)

                vit = val_iter()
                stats = np.zeros(5, np.float64)
                for _ in range(nb):
                    try:
                        imgs, labels = next(vit)
                        imgs = np.asarray(imgs, np.float32)
                        labels = np.asarray(labels, np.int32)
                    except StopIteration:  # this process ran out first
                        imgs = np.zeros((0, reso, reso, 3), np.float32)
                        labels = np.zeros((0,), np.int32)
                    n_local = imgs.shape[0]
                    valid = np.zeros((vbs,), np.float32)
                    valid[:n_local] = 1.0
                    if n_local < vbs:
                        pad = vbs - n_local
                        imgs = np.concatenate(
                            [imgs, np.zeros((pad,) + imgs.shape[1:], np.float32)])
                        labels = np.concatenate([labels, np.zeros((pad,), np.int32)])
                    stats += np.asarray(eval_step(
                        state.params, vae_params, put_rows(imgs),
                        put_rows(labels), put_rows(valid)), np.float64)
                tot = stats[-1]
                vL_mean, vL_tail, vacc_mean, vacc_tail = (stats[:4] / max(tot, 1)).tolist()
                log(f"[ep {ep}] val: L_mean {vL_mean:.4f} L_tail {vL_tail:.4f} "
                    f"acc_mean {vacc_mean:.2f} acc_tail {vacc_tail:.2f} (n={int(tot)})")
                tb.update(head="AR_ep_loss", step=ep, vL_mean=vL_mean, vL_tail=vL_tail,
                          vacc_mean=vacc_mean, vacc_tail=vacc_tail)
            else:
                vL_tail = float(me.meters["Lm"].global_avg)
            meta = dict(epoch=ep + 1, iter=0, best_val_lt=min(best_val_lt, vL_tail),
                        args=args.state_dict())
            ckpt.save_checkpoint(args.last_ckpt_path, state, meta)
            if vL_tail < best_val_lt:
                best_val_lt = vL_tail
                ckpt.save_checkpoint(args.last_ckpt_path + "-best", state, meta)
            log(f"[ep {ep}] checkpoint saved to {args.last_ckpt_path}")

        dump_log_line(args, _first=(ep == start_ep), ep=f"{ep+1}/{args.ep}",
                      L_mean=me.meters["Lm"].global_avg,
                      acc_mean=me.meters["Accm"].global_avg,
                      lr=me.meters["tlr"].value,
                      ep_time=round(time.time() - ep_start, 1))
        gc.collect()

        if args.local_debug and ep == start_ep:
            # 2-step smoke: checkpoint round-trip between epochs (train.py:150-160)
            ckpt.save_checkpoint(args.last_ckpt_path, state,
                                 dict(epoch=ep + 1, iter=0, args=args.state_dict()))
            state = ckpt.load_checkpoint(args.last_ckpt_path, state)
            log("[local_debug] checkpoint state_dict round-trip OK")
            if ep + 1 >= 2 or args.ep <= 1:
                log("[local_debug] smoke finished OK")
                return

    tb.close()
    log("training done")


if __name__ == "__main__":
    main()
