"""Suite guard for the per-shard loss semantics (VERDICT r4 missing #3).

The multi-chip step's shard_map loss (train/steps.py:_sharded_loss) is
DDP-equivalent — per-shard Lovász + pmean — which deviates from the
reference's batch-global sort (/root/reference/losses/LovaszSoftmax.py:
48-61). tools/sharded_twins.py measures the drift at CPU-mesh scale; this
test guards the machinery at tiny scale on the 8-device suite mesh:
the sharded and single-device runs must report near-identical losses at
step 0 (same params: the per-shard mean of class-present Lovász terms is a
close but not identical estimator), track within a few percent over a
short horizon, and both must learn. Documented in COVERAGE.md deviations;
full-scale numbers in PERF.md §4.3 / bench_artifacts/sharded_twins_r5.json.
"""
import sys
import pathlib

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_vs_single_short_horizon_twins():
    from sharded_twins import compare_sharded
    r = compare_sharded(backbone="resnet18", h=64, w=128, bs=8, n_pool=16,
                        n_steps=8, n_buckets=1024)
    # same params at step 0: the 4-shard loss estimate must sit within the
    # estimator's own bias band of the global loss (measured ~0.01 here)
    assert r["step0_abs_divergence"] < 0.05, r
    # short horizon: the two arms stay within a few percent of each other
    assert r["max_abs_loss_divergence"] < 0.1, r
    # both arms make progress below the start value
    assert min(r["losses_single"][4:]) < r["losses_single"][0] - 0.005
    assert min(r["losses_sharded"][4:]) < r["losses_sharded"][0] - 0.005
