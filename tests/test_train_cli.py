"""End-to-end train CLI smoke (subprocess): 2-step local_debug with
checkpoint round-trip; a re-invocation over the same out_dir must start
FRESH (local_debug never auto-resumes from leftovers — real resume is
covered end-to-end by ``test_resume.py``, which kills a run mid-epoch and
asserts bit-exact continuation via ``auto_resume``)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_local_debug_smoke_is_always_fresh(tmp_path):
    env = dict(os.environ,
               VAR_TPU_FORCE_CPU="1",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out_dir = str(tmp_path / "out")
    cmd = [sys.executable, "train.py", "--local_debug=1", "--bs=8", "--ep=2",
           f"--local_out_dir_path={out_dir}"]
    r1 = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True,
                        timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "checkpoint state_dict round-trip OK" in r1.stdout
    assert os.path.isdir(os.path.join(out_dir, "ar-ckpt-last"))

    # second smoke over the same out_dir: must NOT resume from the leftover
    # checkpoint -- a debug smoke is reproducible from scratch by contract
    cmd2 = [sys.executable, "train.py", "--local_debug=1", "--bs=8", "--ep=3",
            f"--local_out_dir_path={out_dir}"]
    r2 = subprocess.run(cmd2, cwd=REPO, env=env, capture_output=True, text=True,
                        timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "auto-resum" not in r2.stdout
    assert "checkpoint state_dict round-trip OK" in r2.stdout


def test_missing_vae_ckpt_fails_hard(tmp_path):
    """Without --allow_random_vae, a missing tokenizer checkpoint must abort
    instead of silently training against random-VAE targets (the reference
    auto-downloads it, train.py:93-98 — impossible in a zero-egress env)."""
    data = str(tmp_path / "data")
    os.makedirs(os.path.join(data, "train", "c0"))
    os.makedirs(os.path.join(data, "val", "c0"))
    env = dict(os.environ, VAR_TPU_FORCE_CPU="1",
               VAR_TPU_VAE_CKPT=str(tmp_path / "nope.pth"))
    r = subprocess.run(
        [sys.executable, "train.py", f"--data_path={data}", "--depth=2",
         "--bs=8", "--ep=1", "--pn=1_2_3",
         f"--local_out_dir_path={tmp_path / 'out'}"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "allow_random_vae" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_train_with_mesh_sharded_eval(tmp_path):
    """Full train.py over a tiny folder dataset with --val_freq_ep=1: the
    mesh-sharded masked eval path (padded ragged final batch, data-sharded
    jit, no per-host param copy) must run end-to-end and log val stats."""
    from tests.test_resume import _make_tiny_dataset

    data = str(tmp_path / "data")
    _make_tiny_dataset(data, n_classes=2, per_class=8, size=48)
    env = dict(os.environ,
               VAR_TPU_FORCE_CPU="1",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out_dir = str(tmp_path / "out")
    cmd = [sys.executable, "train.py", f"--data_path={data}", "--depth=2",
           "--bs=8", "--ep=1", "--pn=1_2_3", "--seed=1", "--val_freq_ep=1",
           "--workers=2", "--allow_random_vae=1",
           f"--local_out_dir_path={out_dir}"]
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "val: L_mean" in r.stdout, r.stdout[-3000:]
    # 4 val images (2/class), ragged vs the 8-row global batch -> n=4
    assert "(n=4)" in r.stdout, r.stdout[-3000:]
