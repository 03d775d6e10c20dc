"""Mid-epoch resume: kill a training run after a mid-epoch checkpoint and
verify the resumed run reproduces the uninterrupted run exactly.

Reference semantics: checkpoint carries (epoch, iter); the sampler resumes
the exact batch sequence at (start_ep, start_it) (``train.py:57-60``,
``data_sampler.py:55``). Here randomness is restart-invariant by
construction (per-step key = fold_in(seed, g_it)), so an interrupted+resumed
run must produce bit-identical final parameters.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _make_tiny_dataset(root, n_classes=2, per_class=8, size=48):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for c in range(n_classes):
            d = os.path.join(root, split, f"class_{c}")
            os.makedirs(d, exist_ok=True)
            for i in range(per_class if split == "train" else 2):
                arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"img_{i}.png"))


def _train_cmd(data, out, ckpt_iters):
    # full augmentation ON (random crop via mid_reso default 1.125 + hflip):
    # per-sample (seed, epoch, index) streams make it restart-invariant, so
    # the resumed run must still be bit-exact
    return [sys.executable, os.path.join(ROOT, "train.py"),
            f"--data_path={data}", "--depth=2", "--bs=8", "--ep=2",
            "--allow_random_vae=1",
            "--pn=1_2_3", "--hflip=1", "--seed=1", "--val_freq_ep=100",
            "--workers=2", f"--local_out_dir_path={out}",
            f"--ckpt_iters={ckpt_iters}"]


def _env():
    env = dict(os.environ)
    env["VAR_TPU_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _load_params(ckpt_path):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(ckpt_path))


def test_sampler_resumes_exact_suffix():
    """Unit: (start_ep, start_it) yields exactly the uninterrupted suffix."""
    from var_tpu.data.imagenet import DistInfiniteBatchSampler

    def seq(start_ep, start_it, n):
        s = DistInfiniteBatchSampler(world_size=2, rank=1, dataset_len=50,
                                     glb_batch_size=8, same_seed_for_all_ranks=3,
                                     start_ep=start_ep, start_it=start_it)
        it = iter(s)
        return [next(it) for _ in range(n)]

    full = seq(0, 0, 20)
    iters_per_ep = 7  # ceil(50/8)
    for k in (1, 3, 6, 9):
        resumed = seq(k // iters_per_ep, k % iters_per_ep, 20 - k)
        assert resumed == full[k:], f"suffix mismatch at start_it={k}"


@pytest.mark.slow
def test_midepoch_kill_resume_matches_uninterrupted(tmp_path):
    _make_tiny_dataset(str(tmp_path / "data"))
    data = str(tmp_path / "data")
    out_a, out_b = str(tmp_path / "outA"), str(tmp_path / "outB")

    # uninterrupted run: 2 epochs x 2 opt steps
    r = subprocess.run(_train_cmd(data, out_a, 0), env=_env(), cwd=ROOT,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]

    # interrupted run: kill as soon as the first mid-epoch ckpt lands
    p = subprocess.Popen(_train_cmd(data, out_b, 1), env=_env(), cwd=ROOT,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    meta_path = os.path.join(out_b, "ar-ckpt-last.meta.json")
    deadline = time.time() + 900
    killed = False
    while time.time() < deadline and p.poll() is None:
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
            except (json.JSONDecodeError, OSError):
                time.sleep(0.02)
                continue
            if int(meta.get("iter", 0)) > 0:  # a true mid-epoch checkpoint
                p.send_signal(signal.SIGKILL)
                killed = True
                break
        time.sleep(0.02)
    log = p.communicate(timeout=900)[0]
    assert killed, f"no mid-epoch checkpoint observed; run output:\n{log[-3000:]}"

    # resume: same command, auto_resume picks up (epoch, iter)
    r2 = subprocess.run(_train_cmd(data, out_b, 1), env=_env(), cwd=ROOT,
                        capture_output=True, text=True, timeout=900)
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-2000:]
    assert "auto-resuming" in r2.stdout

    pa = _load_params(os.path.join(out_a, "ar-ckpt-last"))
    pb = _load_params(os.path.join(out_b, "ar-ckpt-last"))
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(pb)}
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=f"param {jax.tree_util.keystr(k)} diverged")
