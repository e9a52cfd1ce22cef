"""Turn-key reproduction of the paper's headline test mIoU.

The reference publishes OCRNet-R50-os8 checkpoints reaching 86.40 / 79.40 /
71.94 test mIoU on CaDIS tasks 1/2/3 (README.md:104-106, split 2
train-val-test, no blacklist, no relabelled data; inference recipe
configs/OCRNet_pretrained_t{1,2,3}.json + BaseManager.py:640-688). This
harness collapses the whole acceptance to one command once the two
environment-blocked inputs exist — the CaDIS dataset and the published
.pt files (Google Drive links in the reference README):

    python tools/reproduce_paper.py \
        --data-root /path/to/CaDIS \
        --ckpt 1=/path/to/t1/chkpt_best.pt \
        --ckpt 2=/path/to/t2/chkpt_best.pt \
        --ckpt 3=/path/to/t3/chkpt_best.pt

Per task it: parses the shipped configs/OCRNet_pretrained_t{k}.json (mode
inference -> split 2 TEST videos, no blacklist/relabel), ports the torch
state dict onto the flax trees (train/port_torch.py, the f64
activation-parity-tested mapping), runs batched full-coverage inference
(optionally the reference's flip+multi-scale TTA with --tta — the
published numbers are the config default, i.e. no TTA), and prints the
mIoU table against the paper values.

Exit code 0 iff every evaluated task is within --tolerance (default 0.5
mIoU points) of the paper number. `--dry-table` prints the table with
blank results (for wiring checks).

Test hooks (--backbone/--data-csv/--max-frames) let the suite
run the identical code path end to end on synthetic frames and a
synthetic .pt (tests/test_reproduce_paper.py); they do not change the
default, paper-faithful behaviour.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

if "/root/repo" not in sys.path:
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PAPER_MIOU = {1: 86.40, 2: 79.40, 3: 71.94}


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data-root", required=True,
                   help="CaDIS dataset root (the directory holding "
                        "Video01..Video25)")
    p.add_argument("--ckpt", action="append", default=[],
                   metavar="TASK=PATH",
                   help="published checkpoint per task, e.g. 1=/x/t1.pt "
                        "(repeat for each task)")
    p.add_argument("--tta", action="store_true",
                   help="flip + multi-scale TTA merge (BaseManager.py:652-"
                        "660); the paper table numbers are WITHOUT TTA")
    p.add_argument("--tolerance", type=float, default=0.5,
                   help="pass/fail band in mIoU points (default 0.5)")
    p.add_argument("--valid-batch-size", type=int, default=None,
                   help="eval batch size (default: auto — 8 on TPU)")
    p.add_argument("--log-path", default="logs")
    p.add_argument("--dry-table", action="store_true",
                   help="print the table without running anything")
    # --- test hooks (suite only; defaults are paper-faithful) -----------
    p.add_argument("--backbone", default=None, help=argparse.SUPPRESS)
    p.add_argument("--data-csv", default=None, help=argparse.SUPPRESS)
    p.add_argument("--max-frames", type=int, default=None,
                   help=argparse.SUPPRESS)
    return p


def _parse_ckpts(specs) -> dict[int, str]:
    out = {}
    for s in specs:
        task, _, path = s.partition("=")
        if not path:
            raise SystemExit(f"--ckpt expects TASK=PATH, got '{s}'")
        try:
            tid = int(task)
        except ValueError:
            raise SystemExit(f"--ckpt task must be 1-3, got '{task}'")
        if tid not in PAPER_MIOU:
            raise SystemExit(f"--ckpt task must be 1-3, got {tid}")
        out[tid] = path
    return out


def run_task(task: int, ckpt_path: str, args) -> dict:
    """Port + infer one task; returns the results dict of Trainer.infer."""
    from miccai2021_cataract_semantic_segmentation_tpu.train import (
        Trainer, parse_config)

    cfg_file = pathlib.Path(__file__).resolve().parent.parent / "configs" / \
        f"OCRNet_pretrained_t{task}.json"
    config = parse_config(str(cfg_file), None, -1)
    config.pop("load_checkpoint", None)      # we port the torch .pt instead
    config["torch_checkpoint"] = str(ckpt_path)
    config["data_path"] = args.data_root
    config["log_path"] = args.log_path
    config["tta"] = bool(args.tta)
    config["run_id"] = f"reproduce_paper_t{task}"
    if args.valid_batch_size:
        config["valid_batch_size"] = args.valid_batch_size
    if args.backbone:                        # test hook
        config["graph"]["backbone"] = args.backbone
    if args.data_csv:                        # test hook
        config["data"]["data_csv"] = args.data_csv

    trainer = Trainer(config)
    if args.max_frames:                      # test hook: cap the test set
        trainer.valid_set = _truncate(trainer.valid_set, args.max_frames)
    return trainer.infer()


def _truncate(dataset, n: int):
    class _View:
        def __init__(self, ds, n):
            self._ds, self._n = ds, min(n, len(ds))

        def __len__(self):
            return self._n

        def __getitem__(self, i):
            return self._ds[i]

    return _View(dataset, n)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    ckpts = _parse_ckpts(args.ckpt)
    rows = []
    ok = True
    for task in (1, 2, 3):
        paper = PAPER_MIOU[task]
        if args.dry_table or task not in ckpts:
            rows.append((task, paper, None, None, "skipped (no --ckpt)"))
            continue
        res = run_task(task, ckpts[task], args)
        got = 100.0 * res["miou"]
        delta = got - paper
        passed = abs(delta) <= args.tolerance
        ok &= passed
        rows.append((task, paper, got, delta,
                     "PASS" if passed else f"FAIL (>{args.tolerance})"))

    print("\nCaDIS test-set mIoU vs the paper "
          "(README.md:104-106, split 2, OCRNet-R50-os8"
          + (", TTA)" if args.tta else ")"))
    print(f"{'task':<6}{'paper':>8}{'ours':>9}{'delta':>8}   status")
    for task, paper, got, delta, status in rows:
        got_s = f"{got:8.2f}" if got is not None else "       —"
        d_s = f"{delta:+7.2f}" if delta is not None else "      —"
        print(f"{task:<6}{paper:8.2f}{got_s}{d_s}   {status}")
    print(json.dumps({"results": [
        {"task": t, "paper_miou": p, "miou": g, "delta": d, "status": s}
        for t, p, g, d, s in rows]}))
    if args.dry_table:
        return
    if not any(r[2] is not None for r in rows):
        # a pass/fail gate must not exit 0 when nothing ran (no --ckpt given
        # or none matched a task): that would silently report success
        print("error: no task was evaluated — pass --ckpt TASK=PATH "
              "(or --dry-table for a wiring check)", file=sys.stderr)
        sys.exit(2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
