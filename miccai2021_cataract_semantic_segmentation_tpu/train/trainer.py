"""Trainer — the functional replacement for the reference's managers/.

One Trainer covers what OCRNetManager / DeepLabv3(Plus)Manager /
EncDecManager / FCNManager each re-implemented (SURVEY.md §2.2): epoch loop,
per-epoch loader schedule (default / repeat-factor / oversampling /
weighted-random / adaptive batching), validation with confusion-matrix
accumulation and best-mIoU / best-loss checkpointing, TensorBoard logging,
inference (with optional flip+multi-scale TTA), and streaming video
inference.

TPU-native structure: one jitted train step (augment+forward+loss+update+
metrics fused, inputs sharded over the mesh 'data' axis), device-side
metric accumulators fetched once per epoch, host-side prefetch of uint8
batches, orbax checkpoints.
"""
from __future__ import annotations

import datetime
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from miccai2021_cataract_semantic_segmentation_tpu import taxonomy
from miccai2021_cataract_semantic_segmentation_tpu.data import (
    ArrayDataset, RepeatFactorSampler, AdaptiveBatchSampler, SegDataset,
    DeviceAugmentSpec, build_transform_pipeline, load_frame_table, split_dataframes,
    oversample_indices, weighted_random_weights, weighted_random_epoch,
    epoch_iterator, pad_or_trim_batches, eval_batches, assemble_batch,
)
from miccai2021_cataract_semantic_segmentation_tpu.losses import build_loss
from miccai2021_cataract_semantic_segmentation_tpu.models import build_model
from miccai2021_cataract_semantic_segmentation_tpu.ops import (
    mask_to_colormap, mean_iou_breakdown, normalise_confusion_matrix,
    pixel_accuracy,
)
from miccai2021_cataract_semantic_segmentation_tpu.parallel import make_mesh, shard_batch
from miccai2021_cataract_semantic_segmentation_tpu.train import checkpoint as ckpt
from miccai2021_cataract_semantic_segmentation_tpu.train.loggers import (
    TBLogger, StepTimer, confusion_matrix_figure, index_histogram_figure,
)
from miccai2021_cataract_semantic_segmentation_tpu.train.lr_schedule import make_schedule
from miccai2021_cataract_semantic_segmentation_tpu.train.state import create_train_state
from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
    make_train_step, make_eval_step, make_eval_loss_step,
)


def _mask_tail_labels(labels, n_real: int):
    """Mask the padded (repeated) rows of an eval tail batch with 255 so
    they one-hot to zero rows in the confusion matrix (exact exclusion,
    ops/metrics.py:confusion_matrix). Done host-side: a device .at[].set
    would compile a one-off scatter program inside the timed loop (~2 s on
    the axon tunnel) — the tail batch's labels are a few MB, so a D2H/H2D
    round-trip is the cheaper path by three orders of magnitude."""
    lbl = np.asarray(labels).copy()
    lbl[n_real:] = 255
    return lbl


def _uses_bucket_lovasz(loss_cfg: dict) -> bool:
    """True when any nested loss config selects the fused bucket Lovász."""
    if not isinstance(loss_cfg, dict):
        return False
    if loss_cfg.get("lovasz_impl") == "bucket":
        return True
    return any(_uses_bucket_lovasz(v) for v in loss_cfg.values()
               if isinstance(v, dict))


class Trainer:
    def __init__(self, config: dict, datasets=None):
        """`datasets`: optional (train_dataset, valid_dataset, train_df,
        valid_df) override for synthetic/test runs."""
        self.config = config
        self.task = int(config["data"]["experiment"])
        self.mode = config.get("mode", "training")
        self.seed = int(config.get("seed", 0))
        self.rng = jax.random.PRNGKey(self.seed)

        run_name = config.get("name", "run")
        self.run_id = config.get("run_id") or "{}_e{}__{}".format(
            datetime.datetime.now().strftime("%Y%m%d_%H%M%S"), self.task, run_name)
        self.run_dir = pathlib.Path(config.get("log_path", "logs")) / self.run_id
        self.ckpt_dir = self.run_dir / "chkpts"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)

        # data -------------------------------------------------------------
        dcfg = config["data"]
        self.pipeline = build_transform_pipeline(
            dcfg.get("transforms", ["pad"]), dcfg.get("transform_values", {}),
            self.task)
        # semi-supervised mode: loss name SemiSupervisedLoss + an unlabeled
        # source (5th element of `datasets`, or the training split's surgery
        # videos under data_path). End-to-end wiring is an extension — the
        # reference ships the loss and the semi helpers but no path uses
        # them (COVERAGE.md extensions).
        self.semi = ((config.get("loss") or {}).get("name")
                     == "SemiSupervisedLoss" and self.mode == "training")
        self.unlabeled_set = None
        if datasets is not None:
            if len(datasets) == 5:
                (self.train_set, self.valid_set, self.train_df,
                 self.valid_df, self.unlabeled_set) = datasets
            else:
                self.train_set, self.valid_set, self.train_df, self.valid_df = datasets
        else:
            df = load_frame_table(dcfg.get("data_csv"), config.get("data_path"))
            self.train_df, self.valid_df = split_dataframes(
                df, dcfg.get("split", 1), mode=self.mode,
                use_relabeled=dcfg.get("use_relabeled", False),
                blacklist=dcfg.get("blacklist", True),
                random_split=dcfg.get("random_split"), seed=self.seed)
            self.train_set = SegDataset(self.train_df, self.task,
                                        config.get("data_path"),
                                        preload=dcfg.get("preload", False))
            self.valid_set = SegDataset(self.valid_df, self.task,
                                        config.get("data_path"))
        self.batch_size = int(dcfg.get("batch_size", 8))
        # reference default is bs=1 (BaseManager.py:663-669) — wasteful on a
        # TPU, where the eval step runs at ~68% MFU at bs 8. Batched eval is
        # metric-exact at any bs (tail padding + masking, see validate()),
        # so default to 8 on TPU backends; explicit configs still win.
        default_vbs = 8 if jax.default_backend() in ("tpu", "axon") else 1
        vbs_cfg = config.get("valid_batch_size")
        self.valid_batch_size = int(vbs_cfg) if vbs_cfg else default_vbs
        if self.semi:
            assert self.batch_size % 2 == 0, \
                "semi-supervised mode splits each batch half/half " \
                "(SemiSupervisedLoss.py:44-84); batch_size must be even"
            if self.unlabeled_set is None:
                from miccai2021_cataract_semantic_segmentation_tpu.data.semi import (
                    unlabeled_from_videos)
                self.unlabeled_set = unlabeled_from_videos(
                    config.get("data_path"), self.train_df)
            from miccai2021_cataract_semantic_segmentation_tpu.data.semi import (
                SemiSupervisedView)
            self._iter_set = SemiSupervisedView(
                self.train_set, self.unlabeled_set,
                taxonomy.TASK_NUM_CLASSES[self.task])
        else:
            self._iter_set = self.train_set
        # labeled samples per batch: the semi batch is [labeled | unlabeled]
        self.lab_batch_size = self.batch_size // 2 if self.semi \
            else self.batch_size

        # per-epoch loader schedule (BaseManager.py:202-213)
        epochs = int(config["train"].get("epochs", 50))
        self.epochs = epochs
        self.train_schedule = {e: "default" for e in range(epochs)}
        for loader in ("adaptive_batching", "oversampling", "weighted_random",
                       "repeat_factor"):
            rng_spec = list(dcfg.get(loader, [0, 0]))
            if len(rng_spec) == 1:
                rng_spec.append(epochs)
            for e in range(*rng_spec):
                if 0 <= e < epochs:
                    self.train_schedule[e] = loader

        self._samplers: dict = {}
        self.steps_per_epoch = max(1, len(self.train_set) // self.lab_batch_size)
        # Expected steps per epoch differs by loader: repeat-factor epochs
        # run ~sum r(I)/bs batches (repeat_factor_sampling.py:102-131),
        # oversampling epochs (n+extra)/bs (BaseManager.py:326-349); the LR
        # schedule and the epoch loop both honour the mode-natural length
        # rather than trimming to len(train)/bs.
        self.epoch_steps = [self._expected_steps(self.train_schedule[e])
                            for e in range(epochs)]

        # model / loss / optimiser ----------------------------------------
        dtype = jnp.bfloat16 if config.get("precision", "bf16") == "bf16" \
            else jnp.float32
        if config.get("graph", {}).get("model") == "Ensemble" or \
                config.get("manager") == "Ensemble":
            self._init_ensemble(config, dtype)
            return
        self.model = build_model(config.get("graph", {}), self.task, dtype=dtype)
        loss_cfg = dict(config.get("loss") or {"name": "CrossEntropyLoss"})
        if not loss_cfg.get("name"):
            loss_cfg["name"] = "CrossEntropyLoss"
        self.loss_fn = build_loss(loss_cfg, self.task)
        self.schedule = make_schedule(config["train"], self.epoch_steps)

        sample = self._sample_batch_shape()
        self.state = create_train_state(self.model, self.rng, sample,
                                        config["train"], self.schedule)
        self.num_params = int(sum(np.prod(v.shape)
                                  for v in jax.tree.leaves(self.state.params)))

        # MoCo-v2 self-supervised backbone init (BaseManager.py:532-571)
        if config.get("graph", {}).get("ss_pretrained"):
            self._load_ss_pretrained(config["graph"]["ss_pretrained"])

        # published PyTorch checkpoint -> flax (config {"torch_checkpoint":
        # "<run>/chkpts/chkpt_best.pt"}); the inference-parity path for the
        # reference's released weights (SURVEY.md §7.6)
        if config.get("torch_checkpoint"):
            self._load_torch_checkpoint(config["torch_checkpoint"])

        # parallelism ------------------------------------------------------
        # Data-parallel mesh over the largest device count that divides the
        # global batch (a 4-image batch on an 8-chip slice uses 4 chips).
        import math
        # semi mode shards by the LABELED half so each data shard holds an
        # equal labeled/unlabeled block (see steps.py semi layout)
        n_use = math.gcd(self.lab_batch_size, len(jax.devices()))
        self.mesh = make_mesh(devices=jax.devices()[:n_use]) if n_use > 1 else None

        has_points = config.get("graph", {}).get("model") == "PointRend" or \
            (config.get("graph", {}).get("decoder", {}) or {}).get("model") == "PointRend"
        # Train-metric confusion matrix source: with the fused stride-8
        # bucket loss, nothing else needs the full-res logit upsample, so
        # default the train-log metric to the s8 argmax and let XLA DCE the
        # upsample (~7 ms/step; COVERAGE.md deviations). Explicit
        # config["train_metrics"] ("full"/"s8") always wins.
        train_metrics = config.get("train_metrics") or \
            ("s8" if _uses_bucket_lovasz(loss_cfg) else "full")
        # `debugging` (reference EncDec_Manager.py:86-94, 201-206): dump
        # per-batch img|gt|pred triptychs under <run_dir>/debug/
        self.debugging = bool(config.get("debugging", False))
        semi_spec = None
        if self.semi:
            semi_spec = {
                "threshold": float(loss_cfg.get("pseudo_threshold", 0.9)),
                "ignore_id": taxonomy.TASK_NUM_CLASSES[self.task],
                "n_shards": (self.mesh.shape["data"]
                             if self.mesh is not None else 1)}
        self.train_step = make_train_step(
            self.loss_fn, self.pipeline.device, self.task,
            has_point_head=has_points, mesh=self.mesh,
            train_metrics=train_metrics, debug_pred=self.debugging,
            semi=semi_spec,
            # pallas outputs carry no varying-mesh-axes annotation, so the
            # bucket-Lovász path alone opts out of shard_map's vma check
            sharded_loss_check_vma=not _uses_bucket_lovasz(loss_cfg))
        eval_spec = self.pipeline.device if self.pipeline.valid_pad else None
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        self.eval_step = make_eval_step(eval_spec, num_classes)
        # Validation batches are fully labeled, so in semi mode the valid
        # loss uses the LABELED term alone — the semi loss would split the
        # GT batch half/half and mis-weight it (at valid_batch_size=1 the
        # labeled slice would even be empty).
        valid_loss_fn = self.loss_fn
        if self.semi:
            valid_loss_fn = build_loss(
                dict(loss_cfg.get("labeled", {"name": "CrossEntropyLoss"})),
                self.task)
        self.eval_loss_step = make_eval_loss_step(valid_loss_fn, eval_spec)

        # bookkeeping ------------------------------------------------------
        self.train_writer = TBLogger(self.run_dir / "train")
        self.valid_writer = TBLogger(self.run_dir / "valid")
        self.global_step = 0
        self.start_epoch = 0
        self.best_miou = 0.0
        self.best_loss = float("inf")
        self.metrics: dict = {}
        self.ind_counts = np.zeros(len(self.train_set), np.int64)
        self.adaptive_sampler: AdaptiveBatchSampler | None = None
        self.log_every_n_epochs = int(config.get("log_every_n_epochs", 100))
        self.log_every_n_steps = int(config.get("log_every_n_steps", 50))

    def _init_ensemble(self, config: dict, dtype):
        """Ensemble inference setup (reference Ensemble_Manager.py:7-16 +
        BaseManager.infer): members restored from their own run checkpoints,
        merged softmax probabilities drive the confusion matrix."""
        assert self.mode == "inference", "Ensemble supports inference only"
        from miccai2021_cataract_semantic_segmentation_tpu.models import (
            build_ensemble, ensemble_apply)
        from miccai2021_cataract_semantic_segmentation_tpu.ops.metrics import (
            confusion_matrix)
        from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
            eval_preprocess)
        graph = config.get("graph") or {k: config[k] for k in
                                        ("members", "merge") if k in config}
        members, merge = build_ensemble(graph, self.task,
                                        config.get("log_path", "logs"),
                                        dtype=dtype)
        # pad-only spec: members handle their own input normalisation
        spec = DeviceAugmentSpec(pad=True) if self.pipeline.valid_pad else None

        # single source for the eval step AND the serving export
        self.ensemble = (members, merge, spec)

        def step(state, images_u8, labels_u8):
            x, lbl = eval_preprocess(images_u8, spec, labels_u8)
            probs = ensemble_apply(members, x, merge)
            return probs, lbl, confusion_matrix(probs, lbl)

        self.eval_step = jax.jit(step)
        self.state = None
        self.mesh = None
        self.num_params = 0
        self.train_writer = TBLogger(self.run_dir / "train")
        self.valid_writer = TBLogger(self.run_dir / "valid")
        self.global_step = 0
        self.start_epoch = 0
        self.best_miou = 0.0
        self.best_loss = float("inf")
        self.metrics = {}
        self.adaptive_sampler = None
        self.log_every_n_epochs = int(config.get("log_every_n_epochs", 100))
        self.log_every_n_steps = int(config.get("log_every_n_steps", 50))

    def _load_torch_checkpoint(self, path: str):
        """Port a reference .pt checkpoint into the current model's trees."""
        from miccai2021_cataract_semantic_segmentation_tpu.train.port_torch import (
            load_torch_checkpoint, port_state_dict)
        name = self.config.get("graph", {}).get("model", "OCRNet")
        sd = load_torch_checkpoint(path)
        params, stats = port_state_dict(name, sd, self.state.params,
                                        self.state.batch_stats)
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, stats))
        print(f"[{self.run_id}] ported torch checkpoint {path} ({name})")

    def _load_ss_pretrained(self, kind: str):
        """Initialise the backbone from a MoCo-v2 self-supervised torch
        checkpoint (BaseManager.py:532-571): strip the 'module.encoder_q.'
        prefix, drop the fc head, port the resnet subtree."""
        assert kind == "moco", f"ss_pretrained '{kind}' not supported (moco only)"
        import pathlib as _pl

        from miccai2021_cataract_semantic_segmentation_tpu.train.port_torch import (
            load_torch_checkpoint, port_resnet_backbone, strip_moco_prefix, _apply)
        path = _pl.Path(self.config["ss_pretrained_path"]) / "moco" / \
            "moco_v2_800ep_pretrain.pth.tar"
        sd = strip_moco_prefix(load_torch_checkpoint(str(path)))
        prefix = "encoder" if self.config["graph"].get("model") == "EncDec" \
            else "backbone"
        p_up, s_up = port_resnet_backbone(sd, "", (prefix,))
        params, stats = _apply(self.state.params, self.state.batch_stats,
                               p_up, s_up)
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, stats))
        print(f"[{self.run_id}] initialised {prefix} from MoCo-v2 "
              f"({len(p_up)} params, {len(s_up)} stats)")

    # ---------------------------------------------------------------- data
    def _sample_batch_shape(self):
        img, lbl, _ = self.train_set[0]
        h, w = lbl.shape
        if self.pipeline.device.pad:
            h += 4
        return jnp.zeros((self.batch_size, h, w, 3), jnp.float32)

    def _get_rf_sampler(self) -> RepeatFactorSampler:
        s = self._samplers.get("repeat_factor")
        if s is None:
            s = self._samplers["repeat_factor"] = RepeatFactorSampler(
                self.train_df, self.config["data"]["repeat_factor_freq_thresh"],
                self.task, blacklist=self.config["data"].get("blacklist", True),
                seed=self.seed + 1)
        return s

    def _get_oversampling_extra(self) -> np.ndarray:
        extra = self._samplers.get("oversampling")
        if extra is None:
            extra = self._samplers["oversampling"] = oversample_indices(
                self.train_df, self.task,
                self.config["data"].get("oversampling_preset", "default"),
                self.config["data"].get("oversampling_frac", 0.2))
        return extra

    def _expected_steps(self, mode: str) -> int:
        """Expected batches for one epoch of the given loader mode. In semi
        mode an epoch covers the LABELED set at half the batch size (the
        other half is unlabeled, sampled with replacement)."""
        n, bs = len(self.train_set), self.lab_batch_size
        if mode == "repeat_factor":
            return max(1, int(self._get_rf_sampler().repeat_factors.sum()) // bs)
        if mode == "oversampling":
            return max(1, (n + len(self._get_oversampling_extra())) // bs)
        return max(1, n // bs)

    def _epoch_batches(self, epoch: int, np_rng) -> np.ndarray:
        mode = self.train_schedule.get(epoch, "default")
        n = len(self.train_set)
        bs = self.lab_batch_size
        if mode == "repeat_factor":
            batches = self._get_rf_sampler().epoch_batches(bs)
        elif mode == "oversampling":
            extra = self._get_oversampling_extra()
            idx = np.concatenate([np.arange(n), extra])
            idx = np_rng.permutation(idx)
            batches = idx[: (len(idx) // bs) * bs].reshape(-1, bs)
        elif mode == "weighted_random":
            w = self._samplers.get("weighted_random")
            if w is None:
                w = self._samplers["weighted_random"] = weighted_random_weights(
                    self.train_df, self.task,
                    self.config["data"].get("weighted_random_mode", "v1"))
            idx = weighted_random_epoch(w, n, np_rng)
            batches = idx[: (n // bs) * bs].reshape(-1, bs)
        elif mode == "adaptive_batching":
            if self.adaptive_sampler is None:
                self.adaptive_sampler = AdaptiveBatchSampler(
                    self.train_df, self.task, bs,
                    self.config["data"].get("adaptive_sel_size", 10),
                    dist_type=self.config["data"].get("adaptive_dist_type", "1-**2"),
                    iou_update=self.config["data"].get("adaptive_iou_update", 1),
                    seed=self.seed + 2)
            batches = self.adaptive_sampler.epoch_batches()
        else:
            idx = np_rng.permutation(n)
            batches = idx[: (n // bs) * bs].reshape(-1, bs)
        # Epoch lengths are mode-natural (repeat-factor epochs run their full
        # stochastic ~sum r(I)/bs batches, matching the reference's
        # drop_last=True DataLoader). Only guard against an empty epoch —
        # the batch *shape* stays static so the jitted step never recompiles.
        batches = pad_or_trim_batches(batches, None) if len(batches) else \
            pad_or_trim_batches(batches, 1)
        if self.semi:
            # unlabeled half: uniform-with-replacement indices into the
            # SemiSupervisedView's unlabeled range [n, n + n_unlab). Layout
            # is SHARD-BLOCKED — with S data shards each contiguous block of
            # batch/S columns is [labeled | unlabeled] so the per-shard loss
            # split and the step's static index sets line up (steps.py).
            u = n + np_rng.integers(0, len(self.unlabeled_set),
                                    size=(len(batches),
                                          self.batch_size - self.lab_batch_size))
            n_sh = self.mesh.shape["data"] if self.mesh is not None else 1
            lab = batches.reshape(len(batches), n_sh, -1)
            unlab = u.reshape(len(u), n_sh, -1)
            batches = np.concatenate([lab, unlab], axis=2).reshape(
                len(batches), self.batch_size)
        return batches

    def _count_inds(self, batches: np.ndarray) -> None:
        """ind_dist bookkeeping (EncDec_Manager.py:70-77) over the LABELED
        indices; semi-mode unlabeled indices (>= len(train_set)) are not
        tracked — the histogram describes labeled-sample usage."""
        flat = batches.reshape(-1)
        np.add.at(self.ind_counts, flat[flat < len(self.ind_counts)], 1)

    # --------------------------------------------------------------- train
    def train(self):
        cfg = self.config
        print(f"[{self.run_id}] training {cfg.get('graph', {}).get('model')} "
              f"task {self.task}: {self.num_params / 1e6:.1f}M params, "
              f"{self.steps_per_epoch} steps/epoch x {self.epochs} epochs")
        ckpt.write_info_json(self.run_dir, cfg, self.metrics)
        np_rng = np.random.default_rng(self.seed)
        timer = StepTimer()
        step_rng = jax.random.fold_in(self.rng, 17)

        # Resume fidelity (reference restores global_step,
        # BaseManager.py:520-525): epoch batch schedules are deterministic
        # functions of the seed, so replaying the index streams for already-
        # trained epochs leaves np_rng, the samplers' generators, and
        # ind_counts exactly where an uninterrupted run would have them —
        # the remaining epochs then see identical batches and TB steps stay
        # continuous. (The adaptive sampler's live-IoU state is training-
        # dependent and restarts from its uniform prior.)
        for epoch in range(self.start_epoch):
            replayed = self._epoch_batches(epoch, np_rng)
            self._count_inds(replayed)

        # config {"profile_epoch": N} captures a jax.profiler trace of epoch
        # N's steps under <run_dir>/profile (tracing subsystem; SURVEY.md §5)
        profile_epoch = cfg.get("profile_epoch")

        for epoch in range(self.start_epoch, self.epochs):
            batches = self._epoch_batches(epoch, np_rng)
            self._count_inds(batches)
            running_cm = None
            running_loss = jnp.zeros(())
            adaptive = self.train_schedule.get(epoch) == "adaptive_batching"
            # IoU feedback read-back cadence: the reference syncs the device
            # every step (to_numpy(iou), OCRNet_Manager.py:114-117); we
            # accumulate a device-side window confusion matrix and read it
            # back every N steps. Batches are pre-generated per epoch, so
            # within-epoch EMA granularity does not change the sampling.
            adaptive_sync = int(self.config.get("adaptive_sync_every", 8))
            adaptive_cm = None
            step_in_epoch = 0
            t_epoch = time.perf_counter()
            import contextlib
            from miccai2021_cataract_semantic_segmentation_tpu.train.loggers import profile_steps
            prof = contextlib.ExitStack()
            if profile_epoch == epoch:
                prof.enter_context(profile_steps(self.run_dir))
            for bi, (images, labels, idx) in enumerate(epoch_iterator(
                    self._iter_set, batches, self.pipeline,
                    seed=self.seed + epoch, prefetch=2,
                    num_workers=int(self.config["data"].get("num_workers", 0)),
                    sharding=None if self.mesh is None else
                    jax.sharding.NamedSharding(self.mesh,
                                               jax.sharding.PartitionSpec("data")))):
                self.state, m = self.train_step(self.state, images, labels,
                                                step_rng, epoch)
                if self.debugging:
                    self._dump_debug_batch(m, epoch, bi)
                running_cm = m["confusion_matrix"] if running_cm is None \
                    else running_cm + m["confusion_matrix"]
                running_loss = running_loss + m["loss"]
                timer.tick()
                if adaptive and self.adaptive_sampler is not None:
                    adaptive_cm = m["confusion_matrix"] if adaptive_cm is None \
                        else adaptive_cm + m["confusion_matrix"]
                    step_in_epoch += 1
                    if step_in_epoch % adaptive_sync == 0 or \
                            step_in_epoch == len(batches):
                        iou = mean_iou_breakdown(np.asarray(adaptive_cm),
                                                 self.task)["per_class"]
                        self.adaptive_sampler.update_iou(
                            np.asarray(iou)[: len(self.adaptive_sampler.iou_values)])
                        adaptive_cm = None
                if self.global_step % self.log_every_n_steps == 0:
                    self.train_writer.scalars(
                        {k: v for k, v in m.items() if k != "confusion_matrix"},
                        self.global_step, prefix="metrics/")
                    self.train_writer.scalar("parameters/learning_rate",
                                             self.schedule(self.state.step),
                                             self.global_step)
                self.global_step += 1

            prof.close()
            # epoch-level metrics (single device->host fetch)
            cm = np.asarray(running_cm)
            bd = mean_iou_breakdown(cm, self.task)
            pa, pac = pixel_accuracy(cm)
            epoch_s = time.perf_counter() - t_epoch
            fps = len(batches) * self.batch_size / epoch_s
            print(f"\r[{self.run_id}] epoch {epoch:03d}: "
                  f"loss {float(running_loss) / len(batches):.4f} "
                  f"miou {float(bd['miou']):.4f} pa {float(pa):.4f} "
                  f"{timer.mean_ms:.0f} ms/step {fps:.1f} fps")
            # train-mode epoch metrics (batch-stats BN), for callers that
            # track training progress separately from eval-mode validation
            self.train_metrics = {
                "epoch": epoch, "miou": float(bd["miou"]), "pa": float(pa),
                "loss": float(running_loss) / len(batches)}
            self.train_writer.scalar("metrics/epoch_miou", bd["miou"], epoch)
            self.train_writer.scalar("metrics/epoch_fps", fps, epoch)
            self.validate(epoch)
        # final checkpoint (managers save at last epoch); block until all
        # async saves are durable before returning
        ckpt.save_checkpoint(self.ckpt_dir, "last", self.state, self.epochs - 1,
                             self.best_miou, self.best_loss, blocking=True)
        self.train_writer.figure(
            "ind_dist", index_histogram_figure(self.ind_counts), self.global_step)
        np.savez(self.run_dir / "ind_dist.npz", ind_counts=self.ind_counts)
        self.train_writer.close()
        self.valid_writer.close()
        return self.metrics

    # ------------------------------------------------------------ validate
    def validate(self, epoch: int):
        """Full-coverage batched validation: every record contributes to the
        confusion matrix at ANY valid_batch_size. The tail batch (n % bs
        records) is padded by repeating the last record and the padded rows
        are masked out of the matrix exactly (label 255 one-hots to a zero
        row, ops/metrics.py:confusion_matrix), so mIoU/PA/PAC are identical
        at bs=1 and bs=8 (test_batched_validation.py). The validation LOSS
        is averaged over the full batches only: batching already changes
        loss aggregation semantics vs the reference's bs=1 loop (Lovász with
        per_image=False is a joint loss over the batch, BaseManager.py:
        663-669), so the <=bs-1 tail records are metric-only. When the set
        is smaller than valid_batch_size the batch size clamps to the set
        size so the loss is computed exactly (never on padded rows)."""
        cm_total = None
        loss_total, n_batches = 0.0, 0
        n = len(self.valid_set)
        # clamp to the set size: with bs > n the only batch would be padded
        # and its loss polluted by the repeated rows (CE clips the 255 mask
        # labels into class C-1 whenever ignore_index != 255) — at bs = n the
        # single batch is exact instead, for one extra compile in tiny runs
        bs = min(self.valid_batch_size, n)
        batches, n_pad = eval_batches(n, bs)
        max_imgs = int(self.config.get("max_valid_imgs", 10))
        logged = 0
        n_b = len(batches)
        for bi, (images, labels, idx) in enumerate(epoch_iterator(
                self.valid_set, batches, None, seed=0, prefetch=2)):
            if n_pad and bi == n_b - 1:
                # bs <= n, so a padded tail is never the only batch: the
                # loss average over the full batches stays uncontaminated
                labels = _mask_tail_labels(labels, bs - n_pad)
                logits, lbl, cm = self.eval_step(self.state, images, labels)
            else:
                logits, lbl, cm, loss = self.eval_loss_step(self.state, images,
                                                            labels, epoch)
                loss_total += float(loss)
                n_batches += 1
            # host-side int64 accumulation, same as infer(): immune to int32
            # overflow on multi-billion-pixel sets (the per-batch float(loss)
            # fetch above already syncs, so this D2H adds nothing new)
            cm = np.asarray(cm, dtype=np.int64)
            cm_total = cm if cm_total is None else cm_total + cm
            if logged < max_imgs:
                self._log_valid_image(np.asarray(images[0]),
                                      np.asarray(lbl[0]),
                                      np.asarray(jnp.argmax(logits[0], -1)),
                                      epoch, logged)
                logged += 1
        cm = np.asarray(cm_total)
        bd = mean_iou_breakdown(cm, self.task)
        pa, pac = pixel_accuracy(cm)
        valid_loss = loss_total / max(n_batches, 1)
        miou = float(bd["miou"])
        self.metrics = {
            "epoch": epoch, "valid_loss": valid_loss, "miou": miou,
            "miou_instruments": float(bd.get("miou_instruments", 0.0)),
            "miou_anatomies": float(bd.get("miou_anatomies", 0.0)),
            "miou_rare": float(bd.get("miou_rare", 0.0)),
            "pa": float(pa), "pac": float(pac),
            "per_class_iou": np.asarray(bd["per_class"]).tolist(),
        }
        self.valid_writer.scalars(
            {k: v for k, v in self.metrics.items() if isinstance(v, float)},
            self.global_step, prefix="metrics/")
        for mode in ("row", "col"):
            fig = confusion_matrix_figure(
                np.asarray(normalise_confusion_matrix(cm, mode)), self.task)
            self.valid_writer.figure(f"confusion_matrix/{mode}", fig,
                                     self.global_step)
        print(f"[{self.run_id}]   valid: loss {valid_loss:.4f} miou {miou:.4f} "
              f"(instr {self.metrics['miou_instruments']:.4f} "
              f"anat {self.metrics['miou_anatomies']:.4f} "
              f"rare {self.metrics['miou_rare']:.4f})")
        # best-mIoU / best-loss checkpointing (OCRNet_Manager.py:205-242)
        if miou > self.best_miou:
            self.best_miou = miou
            ckpt.save_checkpoint(self.ckpt_dir, "best", self.state, epoch,
                                 self.best_miou, self.best_loss)
        if valid_loss < self.best_loss:
            self.best_loss = valid_loss
        if (epoch + 1) % self.log_every_n_epochs == 0:
            ckpt.save_checkpoint(self.ckpt_dir, "last", self.state, epoch,
                                 self.best_miou, self.best_loss)
        ckpt.write_info_json(self.run_dir, self.config, self.metrics)

    def _log_valid_image(self, img_u8, lbl, pred, epoch, i):
        """img|gt|pred triptych (utils/utils.py:202-211 to_comb_image)."""
        h = min(img_u8.shape[0], lbl.shape[0])
        comb = np.concatenate([
            img_u8[:h], mask_to_colormap(lbl[:h], self.task),
            mask_to_colormap(pred[:h], self.task)], axis=1)
        self.valid_writer.image(f"valid_img_{i}", comb, epoch)
        if getattr(self, "debugging", False):
            self._write_debug_png(comb, f"valid_e{epoch:03d}_{i}.png")

    def _dump_debug_batch(self, m, epoch: int, bi: int):
        """Per-batch img|gt|pred triptych dumps under <run_dir>/debug/ in
        debugging mode (reference EncDec_Manager.py:86-94, 201-206)."""
        imgs = np.asarray(m["debug_img"])
        lbls = np.asarray(m["debug_lbl"])
        preds = np.asarray(m["debug_pred"])
        for k in range(imgs.shape[0]):
            comb = np.concatenate([
                imgs[k], mask_to_colormap(lbls[k], self.task),
                mask_to_colormap(preds[k], self.task)], axis=1)
            self._write_debug_png(comb, f"e{epoch:03d}_b{bi:04d}_{k}.png")

    def _write_debug_png(self, rgb: np.ndarray, name: str):
        dbg = self.run_dir / "debug"
        dbg.mkdir(exist_ok=True)
        try:
            import cv2
            cv2.imwrite(str(dbg / name), rgb[..., ::-1])  # RGB -> BGR
        except ImportError:  # pragma: no cover
            from PIL import Image
            Image.fromarray(rgb).save(dbg / name)

    # ------------------------------------------------------------ inference
    def load_checkpoint(self, which: str = "best", run_id: str | None = None):
        ckpt_dir = self.ckpt_dir if run_id is None else \
            pathlib.Path(self.config.get("log_path", "logs")) / run_id / "chkpts"
        self.state, meta = ckpt.restore_checkpoint(ckpt_dir, which, self.state)
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        self.best_miou = meta.get("best_miou", 0.0)
        self.best_loss = meta.get("best_loss", float("inf"))
        # state.step counts optimiser updates == train batches, so it IS the
        # global step — restoring it keeps TB scalars continuous across
        # resume instead of overwriting from step 0 (reference restores
        # global_step, BaseManager.py:520-525)
        self.global_step = int(jax.device_get(self.state.step))
        return meta

    def infer(self, tta: bool | None = None):
        """Test/validation inference (BaseManager.infer:640-688), optional
        flip + multi-scale TTA with mean merging."""
        tta = self.config.get("tta", False) if tta is None else tta
        num_classes = taxonomy.TASK_NUM_CLASSES[self.task]
        if tta:
            step = self._make_tta_step()
        else:
            step = self.eval_step
        cm_total = None
        n = len(self.valid_set)
        bs = self.valid_batch_size
        batches, n_pad = eval_batches(n, bs)
        n_b = len(batches)
        # sample-prediction triptychs at linspace record positions
        # (BaseManager.py:670-678)
        max_imgs = int(self.config.get("max_valid_imgs", 10))
        log_at = set(np.round(np.linspace(0, len(batches) - 1,
                                          max_imgs)).astype(int).tolist())
        # warmup on the first batch so `frames_per_sec` measures steady-state
        # throughput, not the one-off jit compile
        # dtypes must match epoch_iterator's batches exactly or the warmup
        # compiles a different program than the timed loop uses; the warmup
        # also exercises the triptych argmax so no one-off op compiles land
        # inside the timed window (each costs ~1-2 s over the axon tunnel)
        wi, wl, _ = assemble_batch(self.valid_set, batches[0])
        w_logits, _, w_cm = step(self.state, jnp.asarray(wi), jnp.asarray(wl))
        jax.block_until_ready(jnp.argmax(w_logits[0], -1))
        jax.block_until_ready(w_cm)
        t0 = time.perf_counter()
        for rec_num, (images, labels, idx) in enumerate(epoch_iterator(
                self.valid_set, batches, None, seed=0, prefetch=2)):
            if n_pad and rec_num == n_b - 1:
                # mask the repeated tail records out of the matrix exactly
                labels = _mask_tail_labels(labels, bs - n_pad)
            logits, lbl, cm = step(self.state, images, labels)
            # numpy int64 accumulation: no device add to compile mid-loop,
            # and immune to int32 overflow on multi-billion-pixel sets
            cm_total = (np.asarray(cm, dtype=np.int64) if cm_total is None
                        else cm_total + np.asarray(cm, dtype=np.int64))
            if rec_num in log_at:
                self._log_valid_image(np.asarray(images[0]),
                                      np.asarray(lbl[0]),
                                      np.asarray(jnp.argmax(logits[0], -1)),
                                      self.global_step, rec_num)
        dt = time.perf_counter() - t0
        cm = np.asarray(cm_total)
        bd = mean_iou_breakdown(cm, self.task)
        pa, pac = pixel_accuracy(cm)
        results = {
            "miou": float(bd["miou"]),
            "miou_instruments": float(bd.get("miou_instruments", 0.0)),
            "miou_anatomies": float(bd.get("miou_anatomies", 0.0)),
            "miou_rare": float(bd.get("miou_rare", 0.0)),
            "pa": float(pa), "pac": float(pac),
            "frames_per_sec": n / dt,   # real records, compile excluded
        }
        print(f"[{self.run_id}] infer: {results}")
        ckpt.write_info_json(self.run_dir, self.config, results)
        return results

    def _make_tta_step(self):
        """ttach-equivalent: Compose(HFlip, Scale([0.75,1,1.5,1.75,2])) =
        10 augmentations, mean merge (BaseManager.py:652-660)."""
        spec = self.pipeline.device if self.pipeline.valid_pad else None
        scales = self.config.get("tta_scales", (0.75, 1.0, 1.5, 1.75, 2.0))

        def step(state, images_u8, labels_u8):
            from miccai2021_cataract_semantic_segmentation_tpu.train.steps import (
                eval_preprocess, tta_merged_probs)
            x, lbl = eval_preprocess(images_u8, spec, labels_u8)

            def forward(xi):
                return state.apply_fn({"params": state.params,
                                       "batch_stats": state.batch_stats},
                                      xi, False)["logits"]

            probs = tta_merged_probs(forward, x, scales)
            from miccai2021_cataract_semantic_segmentation_tpu.ops.metrics import confusion_matrix
            cm = confusion_matrix(probs, lbl)
            return probs, lbl, cm

        return jax.jit(step)
