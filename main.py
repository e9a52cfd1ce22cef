"""CLI entry point — same flag surface as the reference (main.py:12-44).

    python main.py -c configs/OCRNet_rf_lvsz.json [-t 2] [-u user] [-d 0]
                   [-dp /path/to/cadis] [-bs 8] [-bl] [-rl]

Modes (config['mode']): training | inference | video_inference |
demo_video_inference. The manager-by-name dispatch of the reference
(globals()[...Manager], main.py:46) collapses into one Trainer; the
`manager` config key is accepted and ignored for compatibility.
"""
from __future__ import annotations

import argparse
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native CaDIS segmentation")
    p.add_argument("-c", "--config", required=True, help="run config JSON")
    p.add_argument("-u", "--user", default=None, help="path_info.json user code")
    p.add_argument("-d", "--device", type=int, default=-1, help="device index")
    p.add_argument("-t", "--task", type=int, default=None,
                   help="CaDIS task / experiment (1, 2, 3)")
    p.add_argument("-dp", "--data_path", default=None, help="dataset root")
    p.add_argument("-bs", "--batch_size", type=int, default=None)
    p.add_argument("-bl", "--no_blacklist", action="store_true",
                   help="disable blacklisting")
    p.add_argument("-rl", "--use_relabeled", action="store_true",
                   help="use relabelled data")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from miccai2021_cataract_semantic_segmentation_tpu.train import (
        Trainer, apply_cli_overrides, parse_config)

    config = parse_config(args.config, args.user, args.device)
    config = apply_cli_overrides(config, args)

    # anomaly-detection analogue of the reference's global
    # torch.autograd.set_detect_anomaly(True) (main.py:8): opt-in because it
    # disables some XLA optimisations. config: {"debug_nans": true}
    if config.get("debug_nans") or config.get("debugging"):
        import jax
        jax.config.update("jax_debug_nans", True)

    trainer = Trainer(config)
    mode = config.get("mode", "training")
    if mode == "training":
        if config.get("load_checkpoint"):
            trainer.load_checkpoint("last", run_id=config["load_checkpoint"])
        trainer.train()
    elif mode == "inference":
        if config.get("load_checkpoint"):
            trainer.load_checkpoint("best", run_id=config["load_checkpoint"])
        trainer.infer()
    elif mode in ("video_inference", "demo_video_inference"):
        from miccai2021_cataract_semantic_segmentation_tpu.train.video import demo_infer
        if config.get("load_checkpoint"):
            trainer.load_checkpoint("best", run_id=config["load_checkpoint"])
        demo_infer(trainer)
    else:
        raise ValueError(f"Unknown mode '{mode}'")


if __name__ == "__main__":
    main()
