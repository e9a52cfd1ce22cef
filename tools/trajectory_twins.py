"""Same-seed training-twin comparison: exact sort Lovász vs bucket Lovász.

VERDICT r2 item 1: the flagship config trains on the bucket approximation,
whose equivalence to the reference's exact sort loss (losses/
LovaszSoftmax.py:34-95) was previously asserted from single-batch value/
gradient parity only. This tool runs two IDENTICAL training runs — same
model init, same data sequence, same augmentation RNG — differing only in
`lovasz_impl` (sort vs bucket), and reports the loss-trajectory divergence
and final parameter-tree distance after N steps of real compounding.

Data is learnable synthetic (colour-coded blobs; class == palette colour)
so both twins actually converge and the comparison covers a moving loss
surface, not a random-label plateau.

Usage:
    python tools/trajectory_twins.py                  # TPU bench workload
    python tools/trajectory_twins.py --cpu-scale      # tiny (test-sized)

The CPU-scale path is also imported by tests/test_trajectory_twins.py.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import numpy as np


def make_learnable_frames(rng: np.random.Generator, n: int, h: int, w: int,
                          num_classes: int):
    """(images u8 NHWC, labels u8 NHW): elliptical blobs whose colour
    identifies the class — learnable by any segmentation model."""
    palette = rng.integers(40, 255, (num_classes, 3)).astype(np.float32)
    imgs = np.zeros((n, h, w, 3), np.float32)
    lbls = np.zeros((n, h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        imgs[i] = palette[0]
        for _ in range(6):
            c = int(rng.integers(1, num_classes))
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            ry, rx = rng.uniform(h / 10, h / 3), rng.uniform(w / 10, w / 3)
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            imgs[i][mask] = palette[c]
            lbls[i][mask] = c
    imgs += rng.normal(0, 8.0, imgs.shape)
    return np.clip(imgs, 0, 255).astype(np.uint8), lbls


def run_twin(impl: str, batches, *, backbone: str, h: int, w: int,
             n_steps: int, n_buckets: int, task: int = 2, lr: float = 1e-4,
             pad: bool = True, record_every: int = 1,
             edges: str = "uniform", dither: bool = False):
    """One training run; returns (losses np.ndarray, final params pytree)."""
    import jax
    import jax.numpy as jnp

    from miccai2021_cataract_semantic_segmentation_tpu.data.transforms import (
        DeviceAugmentSpec)
    from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
    from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
    from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import (
        make_schedule)
    from miccai2021_cataract_semantic_segmentation_tpu.train.state import (
        create_train_state)
    from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
        make_train_step)

    model = build_model({"model": "OCRNet", "backbone": backbone,
                         "out_stride": 8}, task, dtype=jnp.bfloat16)
    loss_fn = build_loss({
        "name": "TwoScaleLoss",
        "lovasz_impl": impl,
        "lovasz_buckets": n_buckets,
        "lovasz_edges": edges,
        "lovasz_dither": dither,
        "interm": {"name": "LovaszSoftmax", "weight": 0.4},
        "final": {"name": "LovaszSoftmax", "weight": 1.0},
    }, task)
    spec = DeviceAugmentSpec(pad=pad, flip=True, blur=True, colorjitter=True)
    schedule = make_schedule({"epochs": 50, "learning_rate": lr}, 100)
    hp = h + 4 if pad else h
    bs = batches[0][0].shape[0]
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((bs, hp, w, 3)), {}, schedule)
    step = make_train_step(loss_fn, spec, task,
                           train_metrics="s8" if impl == "bucket" else "full")
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(n_steps):
        images, labels = batches[i % len(batches)]
        state, m = step(state, images, labels, key, 0)
        if i % record_every == 0 or i == n_steps - 1:
            losses.append(m["loss"])
    jax.block_until_ready(state.params)
    return np.asarray(jnp.stack(losses)), state.params


def compare_twins(*, backbone: str, h: int, w: int, bs: int, n_pool: int,
                  n_steps: int, n_buckets: int, pad: bool = True,
                  lr: float = 1e-4, data_seed: int = 0,
                  edges: str = "uniform", dither: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(data_seed)
    pool_i, pool_l = make_learnable_frames(rng, n_pool, h, w, 17)
    batches = [(jnp.asarray(pool_i[k:k + bs]), jnp.asarray(pool_l[k:k + bs]))
               for k in range(0, n_pool - bs + 1, bs)]

    results = {}
    for impl in ("sort", "bucket"):
        t0 = time.perf_counter()
        losses, params = run_twin(impl, batches, backbone=backbone, h=h, w=w,
                                  n_steps=n_steps, n_buckets=n_buckets,
                                  pad=pad, lr=lr, edges=edges,
                                  dither=dither and impl == "bucket")
        results[impl] = (losses, params)
        print(f"# {impl}: {n_steps} steps in {time.perf_counter() - t0:.0f}s, "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", file=sys.stderr)

    l_sort, p_sort = results["sort"]
    l_bucket, p_bucket = results["bucket"]
    d = np.abs(l_sort - l_bucket)
    sq = sum(float(jnp.sum((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2))
             for a, b in zip(jax.tree.leaves(p_sort), jax.tree.leaves(p_bucket)))
    nrm = sum(float(jnp.sum(a.astype(jnp.float32) ** 2))
              for a in jax.tree.leaves(p_sort))
    tail = max(1, n_steps // 10)
    return {
        "n_steps": n_steps,
        "n_buckets": n_buckets,
        "edges": edges,
        "dither": dither,
        "data_seed": data_seed,
        "loss_start_sort": float(l_sort[0]),
        "loss_final_sort": float(np.mean(l_sort[-tail:])),
        "loss_final_bucket": float(np.mean(l_bucket[-tail:])),
        "max_abs_loss_divergence": float(d.max()),
        "mean_abs_loss_divergence": float(d.mean()),
        "final_tail_divergence": float(abs(np.mean(l_sort[-tail:])
                                           - np.mean(l_bucket[-tail:]))),
        "rel_param_distance": float(np.sqrt(sq / max(nrm, 1e-30))),
        "losses_sort": [round(float(v), 5) for v in l_sort],
        "losses_bucket": [round(float(v), 5) for v in l_bucket],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-scale", action="store_true",
                    help="tiny shapes (test-sized) instead of the bench workload")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--edges", type=str, default="uniform",
                    help="bucket-edge mode: uniform | adaptive | adaptiveN "
                         "(N = octave count, losses/bucket_edges.py)")
    ap.add_argument("--dither", action="store_true",
                    help="per-step stochastic bucket assignment on the "
                         "bucket arm (lovasz_dither, losses/bucket_edges.py)")
    ap.add_argument("--seed", type=int, default=0,
                    help="data seed (multi-seed twins tighten the tail-mean "
                         "sigma; VERDICT r4 weak #1)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if args.cpu_scale:
        r = compare_twins(backbone="resnet18", h=64, w=128, bs=4, n_pool=8,
                          n_steps=args.steps or 30, n_buckets=args.buckets,
                          pad=False, lr=1e-3, edges=args.edges,
                          data_seed=args.seed, dither=args.dither)
    else:
        # the bench workload: OCRNet-R50-os8, 540x960 (padded 544), bs 8
        r = compare_twins(backbone="resnet50", h=540, w=960, bs=8, n_pool=32,
                          n_steps=args.steps or 200, n_buckets=args.buckets,
                          lr=1e-4, edges=args.edges, data_seed=args.seed,
                          dither=args.dither)
    out = json.dumps(r)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
