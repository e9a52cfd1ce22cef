"""CPU-scale guard for sort-vs-bucket training-trajectory equivalence.

The full-scale evidence (200 steps of the bench workload on TPU, final-tail
divergence 0.0033 with twin divergence below the trajectory's own
step-to-step noise) lives in PERF.md §4.1 /
bench_artifacts/trajectory_twins_r3.json. This test guards the machinery at
tiny scale: same-seed twins must track closely over a short horizon
(individual SGD trajectories amplify ANY perturbation chaotically, so
long-horizon per-step closeness is not a meaningful assertion) and both
must be learning."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))


def test_sort_vs_bucket_short_horizon_twins():
    from trajectory_twins import compare_twins
    r = compare_twins(backbone="resnet18", h=64, w=128, bs=4, n_pool=8,
                      n_steps=8, n_buckets=1024, pad=False, lr=1e-3)
    # first-step loss identical to the bucket quantisation envelope
    assert abs(r["losses_sort"][0] - r["losses_bucket"][0]) < 1e-3
    # short horizon: twins stay within a few percent of each other
    # (measured 0.033 max at 8 steps; the per-step loss noise itself is
    # larger than this)
    assert r["max_abs_loss_divergence"] < 0.06, r
    # both runs make progress below the start value within the horizon
    assert min(r["losses_sort"][4:]) < r["losses_sort"][0] - 0.01
    assert min(r["losses_bucket"][4:]) < r["losses_bucket"][0] - 0.01


def test_sort_vs_dithered_bucket_short_horizon_twins():
    """Same guard with the per-step dither active on the bucket arm
    (lovasz_dither; chip-scale evidence in PERF.md §4.2.2): the dithered
    B=256 twin must track the sort twin over a short horizon and learn."""
    from trajectory_twins import compare_twins
    r = compare_twins(backbone="resnet18", h=64, w=128, bs=4, n_pool=8,
                      n_steps=8, n_buckets=256, pad=False, lr=1e-3,
                      dither=True)
    assert abs(r["losses_sort"][0] - r["losses_bucket"][0]) < 4e-3
    assert r["max_abs_loss_divergence"] < 0.08, r
    assert min(r["losses_bucket"][4:]) < r["losses_bucket"][0] - 0.01
