"""The full train -> sample -> score quality loop (round-4 verdict item 5):
held-out val loss decreases and the FID proxy improves after training —
the guard memorization-based learning tests can't provide. Deterministic:
fixed seeds end-to-end on CPU."""

import pytest


@pytest.mark.slow
def test_quality_loop_val_and_fid_improve(tmp_path):
    import sys

    sys.path.insert(0, "scripts")
    import quality_loop

    result = quality_loop.main([
        "--out_dir", str(tmp_path), "--classes", "4", "--per_class", "24",
        "--val_per_class", "8", "--pn", "1_2_4", "--vae_steps", "60",
        "--epochs", "3", "--bs", "12", "--depth", "2", "--width", "128",
        "--heads", "2", "--vocab", "64", "--sample_per_class", "4",
    ])
    # tokenizer learned: reconstruction dropped
    r0, r1 = result["vae_recon_first_last"]
    assert r1 < 0.8 * r0, result
    # held-out val loss decreased (not memorization: val is disjoint)
    assert result["val_improved"], result
    assert result["val_curve"][-1] < result["val_curve"][0], result
    # the FID proxy (trained tokenizer features vs the train set) improved
    assert result["fid_improved"], result
