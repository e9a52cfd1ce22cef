"""Export a trained run as a standalone AOT serving artifact.

    python tools/export_serving.py -c configs/OCRNet_pretrained_t2.json \
        [-r <run_id>] [-w best|last] [-o out.jaxexport] [--batch N] \
        [--platforms cpu,tpu]

Builds the model from the config, restores the checkpoint (the config's
`load_checkpoint` run-id by default, like inference mode), and writes one
StableHLO artifact with the weights baked in and a symbolic batch axis
(unless --batch pins it). The artifact runs under bare JAX on any listed
platform — see train/export.py.
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-dp", "--data_path", default=None,
                    help="dataset root (same flag as main.py)")
    ap.add_argument("-r", "--run_id", default=None,
                    help="run to restore (default: config load_checkpoint)")
    ap.add_argument("-w", "--which", default="best", choices=["best", "last"])
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="pin the batch axis (default: symbolic)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. cpu,tpu (default: current backend)")
    ap.add_argument("--tta", action="store_true",
                    help="bake the flip+multiscale TTA recipe into the artifact")
    ap.add_argument("--mesh", type=int, default=None, metavar="N",
                    help="shard the batch over N devices (data-parallel "
                         "serving; requires --batch divisible by N)")
    args = ap.parse_args(argv)

    from miccai2021_cataract_semantic_segmentation_tpu.train.config import parse_config
    from miccai2021_cataract_semantic_segmentation_tpu.train.trainer import Trainer
    from miccai2021_cataract_semantic_segmentation_tpu.train import export as exp

    config = parse_config(args.config)
    config["mode"] = "inference"
    if args.data_path:
        config["data_path"] = args.data_path
    is_ensemble = config.get("manager") == "Ensemble" or \
        (config.get("graph") or {}).get("model") == "Ensemble"
    run_id = args.run_id or config.get("load_checkpoint")
    if is_ensemble:
        # members always restore their own best checkpoints at construction
        if args.run_id or args.which != "best":
            ap.error("-r/-w do not apply to Ensemble configs: members "
                     "restore their own 'best' checkpoints (set per-member "
                     "'ckpt' run-ids in the config)")
        if args.tta:
            ap.error("--tta is a single-model recipe (BaseManager.infer); "
                     "not applicable to Ensemble configs")
    elif not run_id:
        ap.error("no checkpoint specified: pass -r <run_id> or set "
                 "'load_checkpoint' in the config")
    if args.mesh:
        import jax
        if args.mesh > len(jax.devices()):
            ap.error(f"--mesh {args.mesh} exceeds the {len(jax.devices())} "
                     "available devices; the artifact's device assignment "
                     "must be built on the target parallelism")
    trainer = Trainer(config)
    if not is_ensemble:
        trainer.load_checkpoint(args.which, run_id=run_id)

    out = args.out or (trainer.run_dir / f"serving_{args.which}{exp.SUFFIX}")
    platforms = args.platforms.split(",") if args.platforms else None
    mesh = None
    if args.mesh:
        from miccai2021_cataract_semantic_segmentation_tpu.parallel import make_mesh
        mesh = make_mesh(devices=jax.devices()[:args.mesh])
    path = exp.export_trainer(trainer, out, batch=args.batch,
                              platforms=platforms, tta=args.tta, mesh=mesh)
    print(f"exported {path} ({path.stat().st_size / 1e6:.1f} MB)")
    return path


if __name__ == "__main__":
    main()
