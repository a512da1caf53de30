"""Trainer runtime.

Re-creates the reference Trainer's full lifecycle and factory-override
surface (``train.py:41-439``): log-dir creation + config/entry-script
snapshot, logger + TensorBoard, seeding, data/model/criterion/optimizer/
scheduler factories, epoch loop with val-first option, best-model tracking
(epoch ≥ 5 gate, ``train.py:284-289``), periodic ``save_model`` by
``save_frequence``, checkpoint/resume, emergency save on crash
(``train.py:17-34``), and the config-gated epoch hooks (``train.py:397-434``).

TPU-first architecture (NOT a torch translation):
- ``train_step``/``eval_step`` are single jitted SPMD programs over a 1-D
  ``data`` mesh: batch sharded, params replicated, gradient all-reduce over
  ICI inserted by XLA. There is no DataParallel scatter/gather and no
  per-batch ``.item()`` sync — metrics come back as device scalars that are
  only pulled at logging boundaries.
- Learning rate is an injected optimizer hyperparameter fed per step, so the
  whole schedule zoo (cosine/step/plateau/per-step) never recompiles.
- All device randomness derives from a fold_in of (seed, step) inside the
  jitted step: deterministic, resumable, no host RNG traffic.
- Model forward/loss overrides happen at trace time: subclasses (Examples)
  override ``forward_train``/``forward_eval``/``compute_metrics`` with pure
  functions; the base class jits them once.
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import setup_config
from ..data import (
    DataLoader,
    FGDataset,
    RandomBatchSampler,
    SequentialBatchSampler,
    SyntheticDataset,
    build_transforms,
)
from ..losses import build_criterion
from ..parallel import make_mesh, replicate_tree, shard_batch
from ..registry import MODEL
from ..utils import AverageMeter, PerformanceMeter, Timer, get_logger, set_random_seed
from . import checkpoint as ckpt
from .optim import build_optimizer, build_scheduler


def emergency_save(func):
    """Crash-save wrapper (reference ``train.py:17-34``): on interrupt or any
    exception, log the traceback and write a full checkpoint."""

    def _wrapped(self):
        try:
            return func(self)
        except KeyboardInterrupt:
            self.logger.info("KeyboardInterrupt - saving emergency checkpoint ...")
            # drain queued async writes FIRST: a queued older write to the
            # same path must not land after (and clobber) the emergency write
            ckpt.wait_for_pending_writes()
            self.save_checkpoint(sync=True)
        except Exception as e:  # noqa: BLE001
            self.logger.error(repr(e))
            self.logger.error(traceback.format_exc())
            self.logger.info("saving emergency checkpoint ...")
            ckpt.wait_for_pending_writes()
            self.save_checkpoint(sync=True)
            raise

    return _wrapped


def pad_target(n, *, train, batch_size, n_devices, process_count=1):
    """Rows to pad a PER-PROCESS batch slice up to.

    Under multi-host, each process holds 1/P of the global batch
    (ProcessShardedBatchSampler yields equal-sized slices), so targets are
    per-process: round up to the LOCAL device multiple
    (``n_devices/process_count``), and size the stable eval shape at
    ``batch_size/P`` — not ``batch_size``, else every process would pad its
    slice to the full global size and the assembled batch would be P× too
    large. Train batches are fixed-size already (drop_last / balanced
    samplers); they only pad up to the device multiple."""
    local_devices = max(1, n_devices // max(process_count, 1))
    if train:
        return -((-n) // local_devices) * local_devices
    local_bs = -(-batch_size // max(process_count, 1))
    return -((-max(local_bs, n)) // local_devices) * local_devices


class TrainState(struct.PyTreeNode):
    params: dict
    batch_stats: dict
    extra_vars: dict  # non-gradient variable collections (e.g. ProtoTree leaves)
    opt_state: object
    step: jnp.ndarray


class Trainer:
    """Base trainer; Examples subclass and override the ``get_*`` factories
    or the pure ``forward_train``/``forward_eval`` functions."""

    def __init__(self, config=None):
        self.config = config if config is not None else setup_config()

        self.epoch = 0
        self.start_epoch = 0
        self.total_epoch = int(self.config.train.epoch)
        self.resume = (
            self.config.experiment.resume
            if "resume" in self.config.experiment and self.config.experiment.resume
            else None
        )
        self.debug = bool(self.config.experiment.get("debug", False))
        self.log_root = os.path.join(
            self.config.experiment.log_dir, self.config.experiment.name
        )

        # log root must not pre-exist (reference train.py:55) unless resuming
        if not self.resume and not self.debug:
            assert not os.path.exists(self.log_root), (
                f"Experiment log folder already exists: {self.log_root}"
            )
        os.makedirs(self.log_root, exist_ok=True)
        # snapshot config + entry script (reference train.py:59-62)
        with open(os.path.join(self.log_root, "train_config.yaml"), "w") as f:
            f.write(str(self.config))
        try:
            shutil.copyfile(
                sys.argv[0], os.path.join(self.log_root, os.path.basename(sys.argv[0]))
            )
        except (OSError, shutil.SameFileError):
            pass

        self.logger = self.get_logger()
        self.tb_writer = self.get_tb_writer()
        self.logger.info(f"Train Config:\n{self.config}")

        # seeding (reference train.py:77-82; XLA is deterministic given keys)
        self.seed = int(self.config.experiment.get("seed", 0) or 0)
        set_random_seed(self.seed)

        # device mesh (TPU-native replacement for experiment.cuda DataParallel)
        self.mesh = make_mesh()
        self.n_devices = self.mesh.devices.size
        self.logger.info(
            f"Devices: {self.n_devices} x {jax.devices()[0].platform}"
        )

        # data — pipeline mode: 'host' (PIL transforms, reference-faithful) or
        # 'device' (host decodes fixed uint8; augmentation runs inside the
        # jitted train step, SURVEY §7 step 2)
        self.pipeline = self.config.dataset.get("pipeline", "host")
        if self.pipeline == "device":
            from ..data.transforms_device import (
                make_eval_transform,
                make_train_augment,
            )

            tcfg = self.config.dataset.transformer
            size = int(tcfg.image_size)
            self.device_augment = make_train_augment(
                image_size=size,
                erase_prob=float(tcfg.get("random_erase", 0.1)),
                auto_augment=tcfg.get("auto_augment", "ta_wide"),
            )
            self.device_eval_prep = make_eval_transform(image_size=size)
        self.transformers = self.get_transformers(self.config.dataset.transformer)
        self.collate_fn = self.get_collate_fn()
        self.datasets = self.get_dataset(self.config.dataset)
        self.dataloaders = self.get_dataloader(self.config.dataset)

        # model
        self.logger.info(f"Building model {self.config.model.name} ...")
        self.model = self.get_model(self.config.model)
        self.variables = self.init_model_variables()
        # optional ImageNet/iNat backbone init from a LOCAL checkpoint
        # (torch.hub downloads are impossible here; reference equivalent:
        # model/backbone/resnet.py:16-26 URL loading)
        pretrain_path = None
        bb_cfg = self.config.model.get("backbone")
        if hasattr(bb_cfg, "get"):
            pretrain_path = bb_cfg.get("pretrain")
        pretrain_path = self.config.model.get("pretrain", pretrain_path)
        if pretrain_path:
            from ..models.weights import load_pretrained_backbone

            kind = self.config.model.get("pretrain_kind", "resnet")
            self.variables = load_pretrained_backbone(
                self.variables, pretrain_path, kind, logger=self.logger)
        if "load" in self.config.model and self.config.model.load:
            self.logger.info(f"Loading model weights from {self.config.model.load}")
            self.variables = ckpt.load_model(
                self.config.model.load, self.variables, logger=self.logger
            )
        self.logger.info(f"Building model {self.config.model.name} OK!")

        # criterion / optimizer / scheduler
        self.criterion = self.get_criterion(self.config.train.criterion)
        labels, mults = self.get_param_groups()
        self.tx, base_lr = build_optimizer(
            self.config.train.optimizer, labels, mults
        )
        self.scheduler = self.get_scheduler(self.config.train.get("scheduler"))
        self.state = self.create_state()

        if self.resume:
            self.logger.info(f"Resuming from `{self.resume}`")
            self.load_checkpoint(self.resume)

        self.performance_meters = self.get_performance_meters()
        self.average_meters = self.get_average_meters()
        self.timer = Timer()

        # jitted programs; train.steps_per_dispatch > 1 runs K steps per
        # device dispatch via lax.scan (single-host only: the multi-host
        # global-batch assembly path keeps per-step dispatch)
        self.steps_per_dispatch = int(
            self.config.train.get("steps_per_dispatch", 1) or 1)
        if jax.process_count() > 1:
            self.steps_per_dispatch = 1
        # train.remat: rematerialization of the loss forward in the backward.
        # false (default) = off; "conv" = save conv/dot outputs, recompute
        # the elementwise chains (cuts activation HBM traffic); true = full
        # remat (largest batches, most recompute).
        self.remat = self.config.train.get("remat", False)
        self.rebuild_jitted_steps()

        self.logger.info("Training Preparation Done!")

    def __del__(self):
        # close the TB event writer's background thread (reference
        # train.py:112-114)
        if getattr(self, "tb_writer", None) is not None:
            try:
                self.tb_writer.close()
            except Exception:
                pass

    # ------------------------------------------------------------------
    # factories (the reference's override surface, train.py:134-218)
    # ------------------------------------------------------------------
    def get_logger(self):
        return get_logger("hawkeye", log_dir=self.log_root)

    def get_tb_writer(self):
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(self.log_root)
        except ImportError:
            return None

    def get_transformers(self, transformer_config):
        if self.pipeline == "device":
            return {"train": None, "val": None}  # host side only decodes
        train_t, eval_t = build_transforms(transformer_config)
        return {"train": train_t, "val": eval_t}

    def get_collate_fn(self):
        from ..data.loader import default_collate

        return {"train": default_collate, "val": default_collate}

    def get_dataset(self, ds_config):
        name = ds_config.get("name", "cub")
        decode = None
        if self.pipeline == "device":
            decode = int(ds_config.transformer.get(
                "resize_size", ds_config.transformer.image_size * 8 // 7))
        if name == "synthetic":
            size = ds_config.transformer.image_size
            n = ds_config.get("length", 256)
            ncls = ds_config.get("num_classes",
                                 self.config.model.get("num_classes", 200))
            return {
                "train": SyntheticDataset(n, ncls, size,
                                          transform=self.transformers["train"],
                                          decode_size=decode),
                "val": SyntheticDataset(max(n // 4, 1), ncls, size,
                                        transform=self.transformers["val"],
                                        decode_size=decode),
            }
        root = ds_config.root_dir
        meta = ds_config.meta_dir
        # optional label granularity (aircraft variant/family/manufacturer
        # metadata splits: metadata/aircraft/train_variant.txt etc.)
        suffix = ds_config.get("split")
        suffix = f"_{suffix}" if suffix else ""
        return {
            "train": FGDataset(root, os.path.join(meta, f"train{suffix}.txt"),
                               transform=self.transformers["train"],
                               decode_size=decode),
            "val": FGDataset(root, os.path.join(meta, f"val{suffix}.txt"),
                             transform=self.transformers["val"],
                             decode_size=decode),
        }

    def get_sampler(self, split, ds_config):
        n = len(self.datasets[split])
        bs = int(ds_config.batch_size)
        if split == "train":
            return RandomBatchSampler(n, bs, drop_last=True, seed=self.seed)
        return SequentialBatchSampler(n, bs, drop_last=False)

    def get_dataloader(self, ds_config):
        workers = int(ds_config.get("num_workers", 4))
        # Multi-host SPMD (SURVEY §2.7: "host data loading sharded per
        # process"): each process loads only its slice of every global batch.
        # num_processes/process_index config keys exist so the slicing logic
        # is testable on a single host; real runs default to jax.process_*.
        n_proc = int(ds_config.get("num_processes", jax.process_count()))
        proc_idx = int(ds_config.get("process_index", jax.process_index()))
        # pad_batch must size per-process slices with the SAME resolved
        # process count the sharded samplers use (config override included)
        self._process_count = n_proc
        loaders = {}
        for split in self.datasets:
            dataset = self.datasets[split]
            sampler = self.get_sampler(split, ds_config)
            if n_proc > 1:
                from ..parallel import (
                    PaddingAwareDataset,
                    ProcessShardedBatchSampler,
                )

                sampler = ProcessShardedBatchSampler(
                    sampler, process_index=proc_idx, process_count=n_proc)
                dataset = PaddingAwareDataset(dataset)
            loaders[split] = DataLoader(
                dataset,
                sampler,
                num_workers=workers,
                collate_fn=self.collate_fn[split],
            )
        return loaders

    def get_model(self, model_config):
        return MODEL.get(model_config.name)(model_config)

    def get_criterion(self, criterion_config):
        return build_criterion(criterion_config)

    def get_param_groups(self):
        """Override to return (labels_pytree_or_fn, {label: lr multiplier})."""
        return None, None

    def get_scheduler(self, scheduler_config):
        return build_scheduler(scheduler_config, float(self.config.train.optimizer.lr))

    def get_performance_meters(self):
        return {
            "train": {m: PerformanceMeter() for m in ("acc", "loss")},
            "val": {m: PerformanceMeter() for m in ("acc", "loss")},
        }

    def get_average_meters(self):
        return {m: AverageMeter(m) for m in ("acc", "loss")}

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------
    def example_input(self):
        size = int(self.config.dataset.transformer.image_size)
        return jnp.zeros((2, size, size, 3), jnp.float32)

    def init_model_kwargs(self):
        """Extra kwargs for the init forward (e.g. APINet needs labels)."""
        return {}

    def init_model_variables(self):
        rng = jax.random.PRNGKey(self.seed)
        x = self.example_input()
        with jax.default_device(jax.devices()[0]):
            # init through the TRAIN path so train-only submodules (pair
            # heads, gates, ...) create their parameters
            variables = self.model.init(
                {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
                x, train=True, **self.init_model_kwargs()
            )
        return variables

    def create_state(self):
        params = self.variables["params"]
        batch_stats = self.variables.get("batch_stats", {})
        extra = {
            k: v
            for k, v in self.variables.items()
            if k not in ("params", "batch_stats")
        }
        opt_state = self.tx.init(params)
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            extra_vars=extra,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )
        return replicate_tree(self.mesh, state)

    def model_variables(self, state=None):
        state = state if state is not None else self.state
        v = {"params": state.params, **state.extra_vars}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    # ------------------------------------------------------------------
    # pure step functions (trace-time override points)
    # ------------------------------------------------------------------
    def apply_model(self, variables, batch, train, rng, mutable):
        """One forward pass; subclasses change call signature here."""
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if mutable:
            out, mut = self.model.apply(
                variables, batch["img"], train=train, mutable=mutable, **kwargs
            )
            return out, mut
        out = self.model.apply(variables, batch["img"], train=train, **kwargs)
        return out, {}

    def device_prepare_train(self, rng, batch):
        """Device-pipeline train-batch prep (trace-time override point).

        Default: run the standard augmentation stack on ``img`` only.
        Methods with their own batch law (e.g. DCL's 2x jigsaw collate)
        override this to rebuild the whole batch in-graph.
        """
        batch = dict(batch)
        batch["img"] = self.device_augment(rng, batch["img"])
        return batch

    def device_prepare_eval(self, batch):
        """Device-pipeline eval-batch prep (trace-time override point)."""
        batch = dict(batch)
        batch["img"] = self.device_eval_prep(batch["img"])
        return batch

    def forward_train(self, params, state, batch, rng):
        """Returns (loss, outputs, mutated_collections dict).

        Expects an already device-prepared batch (the step functions run
        ``device_prepare_train`` first so metrics see the same batch).
        """
        variables = {"params": params, **state.extra_vars}
        mutable = []
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        outputs, mutated = self.apply_model(variables, batch, True, rng, mutable)
        loss = self.criterion(outputs, batch)
        return loss, outputs, mutated

    def forward_eval(self, state, batch):
        variables = self.model_variables(state)
        outputs, _ = self.apply_model(variables, batch, False, None, [])
        loss = self.criterion(outputs, batch)
        return loss, outputs

    def compute_metrics(self, outputs, batch):
        """In-graph metrics; returns dict of scalars. 'weight' masks padding."""
        logits = outputs["logits"]
        labels = batch["label"]
        if labels.ndim == 2:
            labels = jnp.argmax(labels, -1)
        pred = jnp.argmax(logits, -1)
        w = batch.get("weight")
        if w is None:
            w = jnp.ones_like(labels, jnp.float32)
        correct = (pred == labels).astype(jnp.float32) * w
        return {"correct": correct.sum(), "count": w.sum()}

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------
    def step_extras(self):
        """Loop-invariant extra device inputs threaded into the jitted train
        step (e.g. ProtoTree's per-epoch leaf snapshot + freeze gate).
        Returned values are passed positionally after (state, batch, lr)."""
        return ()

    def train_step_body(self):
        """The pure (state, batch, lr, *extras) -> (state, metrics) function.
        Jitted as-is for single-step dispatch and scanned K times per
        dispatch by ``build_train_block``. Subclasses with custom step math
        override THIS (not build_train_step) so both paths stay in sync."""
        base_key = jax.random.PRNGKey(self.seed)

        def train_step(state, batch, lr, *extras):
            rng = jax.random.fold_in(base_key, state.step)
            if self.pipeline == "device":
                batch = self.device_prepare_train(
                    jax.random.fold_in(rng, 1), batch)

            def loss_fn(params):
                loss, outputs, mutated = self.forward_train(params, state, batch, rng)
                return loss, (outputs, mutated)

            if self.remat == "conv":
                def _save_convs(prim, *_, **__):
                    return prim.name in ("conv_general_dilated",
                                         "dot_general")

                loss_fn = jax.checkpoint(loss_fn, policy=_save_convs)
            elif self.remat:
                loss_fn = jax.checkpoint(loss_fn)

            (loss, (outputs, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            grads = self.transform_grads(grads, batch)

            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt_state = self.tx.update(
                grads, opt_state, state.params
            )
            new_params = jax.tree.map(
                lambda p, u: p + u, state.params, updates
            )
            new_state = state.replace(
                params=new_params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                extra_vars={
                    k: mutated.get(k, v) for k, v in state.extra_vars.items()
                },
                opt_state=new_opt_state,
                step=state.step + 1,
            )
            metrics = {"loss": loss, **self.compute_metrics(outputs, batch)}
            return new_state, metrics

        return train_step

    def build_train_step(self):
        return jax.jit(self.train_step_body(), donate_argnums=(0,))

    def build_train_block(self):
        """K train steps per device dispatch: ``lax.scan`` over stacked
        batches [K, B, ...] and lrs [K]. Amortizes host dispatch overhead
        (the dominant cost for small-batch recipes on a remote TPU: the
        whole state pytree's dispatch bookkeeping is paid once per K steps).
        Returns per-step metrics stacked on a leading [K] axis."""
        body = self.train_step_body()

        @partial(jax.jit, donate_argnums=(0,))
        def train_block(state, batches, lrs, *extras):
            def scan_body(st, xs):
                b, lr = xs
                st, m = body(st, b, lr, *extras)
                return st, m

            return jax.lax.scan(scan_body, state, (batches, lrs))

        return train_block

    def rebuild_jitted_steps(self):
        """(Re)build every jitted program. Phase-coupled trainers (S3N) call
        this at the phase transition; both dispatch paths stay in sync."""
        self._train_step = self.build_train_step()
        self._eval_step = self.build_eval_step()
        self._train_block = (
            self.build_train_block() if self.steps_per_dispatch > 1 else None)

    def build_eval_step(self):
        @jax.jit
        def eval_step(state, batch):
            if self.pipeline == "device":
                batch = self.device_prepare_eval(batch)
            loss, outputs = self.forward_eval(state, batch)
            metrics = {"loss": loss, **self.compute_metrics(outputs, batch)}
            return metrics

        return eval_step

    # ------------------------------------------------------------------
    # batch prep
    # ------------------------------------------------------------------
    def pad_batch(self, batch, train):
        """Pad a host batch to ONE stable device-divisible shape.

        Every batch (including the val tail) is padded to the configured
        batch size rounded up to a device multiple, so each of train/eval
        compiles exactly once; pad rows carry weight 0.
        """
        n = batch["label"].shape[0]
        target = pad_target(
            n, train=train, batch_size=int(self.config.dataset.batch_size),
            n_devices=self.n_devices,
            process_count=getattr(self, "_process_count",
                                  jax.process_count()))
        pad = target - n
        # respect pre-existing per-row weights (multi-host padding rows
        # arrive already weighted 0 by PaddingAwareDataset)
        existing = batch.get("weight")
        weight = (np.ones((n,), np.float32) if existing is None
                  else np.asarray(existing, np.float32))
        if pad:
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                if getattr(v, "ndim", 0) >= 1
                else v
                for k, v in batch.items()
            }
            weight = np.concatenate([weight, np.zeros((pad,), np.float32)])
        batch = dict(batch)
        batch["weight"] = weight
        batch["img"] = np.ascontiguousarray(batch["img"])
        return batch

    def prepare_batch(self, batch, train):
        """Host → device: pad + shard over the data mesh."""
        batch = self.pad_batch(batch, train)
        if jax.process_count() > 1:
            from ..parallel import global_batch_from_local

            return global_batch_from_local(self.mesh, batch)
        return shard_batch(self.mesh, batch)

    # ------------------------------------------------------------------
    # the training loop (reference train.py:240-308)
    # ------------------------------------------------------------------
    @emergency_save
    def train(self):
        self.on_start_train()
        if bool(self.config.train.get("val_first", False)):
            self.logger.info("validate before training (val_first)")
            self.validate()

        saved_this_epoch = False
        for epoch in range(self.start_epoch, self.total_epoch):
            self.epoch = epoch
            self.on_start_epoch()
            self.timer.tick()

            lr = self.scheduler.epoch_lr(epoch)
            train_metrics = self.train_epoch(lr)
            train_time = self.timer.tick()

            self.performance_meters["train"]["acc"].update(train_metrics["acc"])
            self.performance_meters["train"]["loss"].update(train_metrics["loss"])

            val_metrics = self.validate()
            val_time = self.timer.tick()

            images_per_sec = train_metrics["count"] / max(train_time, 1e-9)
            self.logger.info(
                f"Epoch {epoch}: lr {lr:.2e} | "
                f"train acc {train_metrics['acc']:.2f} loss {train_metrics['loss']:.4f} "
                f"({train_time:.1f}s, {images_per_sec:.1f} img/s) | "
                f"val acc {val_metrics['acc']:.2f} loss {val_metrics['loss']:.4f} "
                f"({val_time:.1f}s)"
            )
            self.report(epoch, lr, train_metrics, val_metrics, images_per_sec)

            # best tracking: reference records best only from epoch >= 5
            # (train.py:284-289); for very short runs we drop the gate.
            gate = 5 if self.total_epoch > 5 else 0
            is_best = False
            if epoch >= gate:
                best = self.performance_meters["val"]["acc"].best_value
                if best is None or val_metrics["acc"] >= best:
                    is_best = True
            self.performance_meters["val"]["acc"].update(val_metrics["acc"])
            self.performance_meters["val"]["loss"].update(val_metrics["loss"])
            if is_best:
                self.save_model(os.path.join(self.log_root, "best_model.msgpack"))
                self.logger.info(
                    f"best model saved (val acc {val_metrics['acc']:.2f})"
                )

            self.scheduler.step_metric(val_metrics["acc"])

            save_freq = int(self.config.train.get("save_frequence", 0) or 0)
            saved_this_epoch = False
            if save_freq and (epoch + 1) % save_freq == 0:
                self.save_model(
                    os.path.join(self.log_root, f"model_epoch_{epoch}.msgpack")
                )
                self.save_checkpoint()
                saved_this_epoch = True

            self.on_end_epoch()

        if not saved_this_epoch:
            self.save_checkpoint()
        ckpt.wait_for_pending_writes()  # join async checkpoint writers
        self.on_end_train()
        best = self.performance_meters["val"]["acc"].best_value
        if best is not None:
            self.logger.info(
                f"Training done. best val acc {best:.2f} @ epoch "
                f"{self.performance_meters['val']['acc'].best_epoch}"
            )

    def train_epoch(self, lr):
        for m in self.average_meters.values():
            m.reset()
        loader = self.dataloaders["train"]
        loader.set_epoch(self.epoch)
        totals = {"correct": 0.0, "count": 0.0, "loss": 0.0, "n": 0}
        pending = None  # overlap: pull metrics one dispatch late
        # tracing subsystem: experiment.profile captures a device trace of a
        # few steady-state steps in epoch 0 (replaces the reference's
        # wall-clock-only Timer, SURVEY §5)
        profile = bool(self.config.experiment.get("profile", False)) and self.epoch == 0
        profile_dir = os.path.join(self.log_root, "profile")
        step_in_epoch = 0
        try:
            from tqdm import tqdm

            iterator = tqdm(loader, total=len(loader), leave=False,
                            desc=f"epoch {self.epoch}", mininterval=1.0)
        except ImportError:
            iterator = loader

        def accumulate(m):
            # works for single-step scalars and [K]-stacked block metrics
            totals["correct"] += float(np.sum(m["correct"]))
            totals["count"] += float(np.sum(m["count"]))
            totals["loss"] += float(np.sum(m["loss"]))
            totals["n"] += int(np.size(np.asarray(m["loss"])))
            if hasattr(iterator, "set_postfix") and totals["n"] % 10 < 2:
                iterator.set_postfix(
                    loss=f"{totals['loss'] / totals['n']:.3f}",
                    acc=f"{100 * totals['correct'] / max(totals['count'], 1):.1f}",
                    refresh=False)

        k = self.steps_per_dispatch
        block_buf = []
        for batch in iterator:
            if profile and step_in_epoch == 3:
                jax.profiler.start_trace(profile_dir)
            if profile and step_in_epoch == 8:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                self.logger.info(f"profiler trace written to {profile_dir}")
                profile = False
            step_in_epoch += 1
            self.on_start_batch(batch)
            if k > 1:
                block_buf.append(self.pad_batch(batch, train=True))
                if len(block_buf) < k:
                    continue
                metrics = self._dispatch_block(block_buf, lr)
                block_buf = []
            else:
                device_batch = self.prepare_batch(batch, train=True)
                lr_arr = jnp.asarray(self.batch_lr(lr), jnp.float32)
                self.state, metrics = self.train_step_call(device_batch, lr_arr)
            if pending is not None:
                accumulate(pending)
            pending = metrics
            self.on_end_batch(metrics)
        # tail shorter than K: dispatch the leftover batches one step each
        for host_batch in block_buf:
            device_batch = self.prepare_batch(host_batch, train=True)
            lr_arr = jnp.asarray(self.batch_lr(lr), jnp.float32)
            self.state, metrics = self.train_step_call(device_batch, lr_arr)
            if pending is not None:
                accumulate(pending)
            pending = metrics
            self.on_end_batch(metrics)
        if pending is not None:
            accumulate(pending)
        acc = 100.0 * totals["correct"] / max(totals["count"], 1.0)
        return {
            "acc": acc,
            "loss": totals["loss"] / max(totals["n"], 1),
            "count": totals["count"],
        }

    def _dispatch_block(self, host_batches, epoch_lr):
        """Stack K padded host batches to [K, B, ...], shard the per-step
        batch axis, and run one K-step scan dispatch."""
        from ..parallel import shard_stacked_batch

        stacked = {
            key: np.stack([b[key] for b in host_batches])
            for key in host_batches[0]
        }
        device_batches = shard_stacked_batch(self.mesh, stacked)
        lrs = jnp.asarray([self.batch_lr(epoch_lr) for _ in host_batches],
                          jnp.float32)
        self.state, metrics = self.train_block_call(device_batches, lrs)
        return metrics

    def batch_lr(self, epoch_lr):
        """Per-step LR hook (per-batch cosine recipes override this)."""
        return epoch_lr

    def transform_grads(self, grads, batch):
        """In-graph gradient hook (epoch-gated freezes pass gate scalars in
        via prepare_batch; e.g. APINet's epoch-0 conv freeze)."""
        return grads

    def train_step_call(self, device_batch, lr_arr):
        """Dispatch one jitted train step."""
        return self._train_step(self.state, device_batch, lr_arr,
                                *self.step_extras())

    def train_block_call(self, device_batches, lr_arrs):
        """Dispatch one K-step train block (stacked batches [K, B, ...])."""
        return self._train_block(self.state, device_batches, lr_arrs,
                                 *self.step_extras())

    def validate(self):
        loader = self.dataloaders.get("val")
        if loader is None:
            return {"acc": 0.0, "loss": 0.0}
        total_correct = total_count = total_loss = 0.0
        n_batches = 0
        for batch in loader:
            device_batch = self.prepare_batch(batch, train=False)
            metrics = self._eval_step(self.state, device_batch)
            total_correct += float(metrics["correct"])
            total_count += float(metrics["count"])
            total_loss += float(metrics["loss"])
            n_batches += 1
        return {
            "acc": 100.0 * total_correct / max(total_count, 1.0),
            "loss": total_loss / max(n_batches, 1),
        }

    def report(self, epoch, lr, train_metrics, val_metrics, images_per_sec):
        if self.tb_writer is None:
            return
        self.tb_writer.add_scalar("train/acc", train_metrics["acc"], epoch)
        self.tb_writer.add_scalar("train/loss", train_metrics["loss"], epoch)
        self.tb_writer.add_scalar("val/acc", val_metrics["acc"], epoch)
        self.tb_writer.add_scalar("val/loss", val_metrics["loss"], epoch)
        self.tb_writer.add_scalar("lr", lr, epoch)
        self.tb_writer.add_scalar("perf/images_per_sec", images_per_sec, epoch)

    # ------------------------------------------------------------------
    # checkpointing (reference train.py:369-395)
    # ------------------------------------------------------------------
    @property
    def _async_ckpt(self):
        """``train.async_checkpoint: true`` moves checkpoint serialization +
        disk IO to a background thread (the device->host snapshot stays
        synchronous); writes are joined at end-of-train and before resume
        reads (``checkpoint.wait_for_pending_writes``)."""
        return bool(self.config.train.get("async_checkpoint", False))

    def save_model(self, path):
        ckpt.save_model(path, self.model_variables(),
                        async_write=self._async_ckpt)

    def save_checkpoint(self, path=None, sync=False):
        """``sync=True`` forces a synchronous write even under
        ``train.async_checkpoint`` (the emergency-save path uses it: a
        daemon writer thread dies with the process)."""
        path = path or os.path.join(
            self.log_root, f"checkpoint_epoch_{self.epoch}.msgpack"
        )
        ckpt.save_checkpoint(
            path,
            epoch=self.epoch,
            variables=self.model_variables(),
            opt_state=self.state.opt_state,
            scheduler_state=self.scheduler.state_dict(),
            extra={"step": int(self.state.step)},
            async_write=self._async_ckpt and not sync,
        )
        self.logger.info(f"checkpoint saved: {path}")

    def load_checkpoint(self, path):
        ckpt.wait_for_pending_writes()  # same-process save->resume ordering
        epoch, variables, opt_state, sched_state, extra = ckpt.load_checkpoint(
            path,
            variables_like=self.model_variables(),
            opt_state_like=self.state.opt_state,
        )
        self.state = self.state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            extra_vars={
                k: v
                for k, v in variables.items()
                if k not in ("params", "batch_stats")
            },
            opt_state=opt_state,
            step=jnp.asarray(extra.get("step", 0), jnp.int32),
        )
        self.state = replicate_tree(self.mesh, self.state)
        self.scheduler.load_state_dict(sched_state)
        self.start_epoch = epoch + 1
        self.logger.info(f"resumed at epoch {self.start_epoch}")

    # ------------------------------------------------------------------
    # hooks (reference train.py:397-434)
    # ------------------------------------------------------------------
    def on_start_train(self):
        pass

    def on_end_train(self):
        pass

    def on_start_epoch(self):
        pass

    def on_end_epoch(self):
        pass

    def on_start_batch(self, batch):
        pass

    def on_end_batch(self, metrics):
        pass
