"""The training loop: config + data -> trained embedding model.

Orchestrates what ``tools/train.py:52-181`` does in the reference —
callbacks, generators, compile, ``fit_generator`` — as an explicit host
loop around jitted device steps. One ``Trainer`` instance handles both
modes (triplet with in-step online mining / siamese with contrastive
pairs), optional softmax pretraining, checkpoint/resume, and encodings
export.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from embeddingnet_tpu.data import BatchLoader, PairSampler, PKSampler, \
    SimpleSampler, TripletSampler
from embeddingnet_tpu.models.registry import (ArcFaceModule, EmbeddingModule,
                                              SiameseModule, SoftmaxModule,
                                              backbone_param_mask,
                                              transfer_backbone_params)
from embeddingnet_tpu.train import callbacks as cb
from embeddingnet_tpu.train import checkpoint as ckpt
from embeddingnet_tpu.train import optim, steps
from embeddingnet_tpu.train.state import TrainState


def host_copy(a):
    """Host numpy copy of an array leaf, multi-process safe.

    A cross-process (non-fully-addressable) replicated array's local
    replica IS the full value; a genuinely sharded leaf (TP'd params)
    needs the cross-process gather.  Single-process / host leaves pass
    through ``np.asarray``.
    """
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        if a.sharding.is_fully_replicated:
            return np.asarray(a.addressable_data(0))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


class Trainer:
    def __init__(self, params, data_loader, log_fn: Callable = print):
        self.params = params
        self.data_loader = data_loader
        # Multi-process (multi-host) launches: every process runs this
        # same loop in lockstep — identical sampler seeds, per-process
        # batch feeding (_put_batch), collective checkpoint saves — and
        # only process 0 logs/exports (docs/SCALING.md "Multi-host").
        self._n_proc = jax.process_count()
        self._proc0 = jax.process_index() == 0
        self.log = log_fn if self._proc0 else (lambda *a, **k: None)
        self.mode = params.model.mode
        self.paths = ckpt.create_save_folders(params.general)

        self.compute_dtype = (jnp.bfloat16
                              if params.performance.compute_dtype == "bfloat16"
                              else jnp.float32)
        if params.performance.debug_nans:
            # sanitizer mode: fail fast on NaNs inside jitted steps
            jax.config.update("jax_debug_nans", True)
        self.mesh = self._build_mesh()
        cache_mb = params.performance.decode_cache_mb
        from embeddingnet_tpu.data.pipeline import DecodeCache
        self._decode_cache = DecodeCache(cache_mb) if cache_mb > 0 else None
        self.augment_fn = self._build_augment()
        self._build_module()
        if params.performance.params_dtype == "bfloat16":
            # bf16 master weights: halves param HBM; fine for inference-
            # oriented finetunes, NOT recommended for long from-scratch
            # runs (Adam update quantization)
            self.variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "astype") and x.dtype == jnp.float32 else x,
                self.variables)
        self._build_optimizer()
        self._place_state()
        self._build_steps()

        self.history = cb.History()
        self.plateau = cb.ReduceLROnPlateau(
            monitor=self._monitor(), factor=params.train.plateau_factor,
            patience=params.train.plateau_patience)
        self.early_stop = cb.EarlyStopping(
            monitor=self._monitor(),
            patience=params.train.early_stopping_patience)
        self.ckpt_mgr = ckpt.CheckpointManager(
            self.paths["weights"], save_best_only=True,
            monitor=self._monitor(), mode=cb.monitor_mode(self._monitor()),
            async_save=params.performance.async_checkpoint)
        self.start_epoch = 0

        from embeddingnet_tpu.utils.logging import MetricsLogger
        self.metrics_logger = MetricsLogger(
            self.paths["tensorboard"],
            tensorboard=params.general.tensorboard_callback,
            wandb_enabled=params.general.wandb_callback)

    # -- construction ------------------------------------------------------

    def _monitor(self) -> str:
        # TRAIN.monitor overrides; reference default: val_loss when
        # validating else loss (train.py:73-76); arcface has no
        # pair/triplet val generator -> monitor train loss
        if self.params.train.monitor:
            return self.params.train.monitor
        if self.mode == "arcface":
            return "loss"
        return "val_loss" if self.data_loader.validate else "loss"

    def _build_mesh(self):
        """Device mesh from the MESH config; None when effectively
        single-device (plain jit is leaner than a 1-device mesh)."""
        mc = self.params.mesh
        n = len(jax.devices())
        data = n // mc.model if mc.data == -1 else mc.data
        if data * mc.model <= 1:
            if self._n_proc > 1:
                from embeddingnet_tpu.config import ConfigError
                raise ConfigError(
                    "multi-process launch needs a >1-device mesh: set "
                    "MESH.data: -1 (all devices) so every process's "
                    "devices participate")
            return None
        from embeddingnet_tpu.parallel import build_mesh
        mesh = build_mesh(data=mc.data, model=mc.model)
        g = self.params.generator
        batch = (g.k_classes * g.k_samples
                 if self.params.model.mode == "triplet" else g.batch_size)
        if batch % mesh.shape["data"]:
            from embeddingnet_tpu.config import ConfigError
            raise ConfigError(
                f"global batch {batch} must divide by MESH data axis "
                f"{mesh.shape['data']}")
        return mesh

    def _build_augment(self):
        name = self.params.generator.augmentations
        if not name:
            return None
        from embeddingnet_tpu.ops.augment import get_aug
        return get_aug(name, self.params.model.input_shape)

    def _build_module(self):
        m = self.params.model
        rng = jax.random.PRNGKey(self.params.general.seed)
        dummy = jnp.zeros((2,) + tuple(m.input_shape), jnp.float32)
        fast_conv = self.params.performance.pallas_conv
        if fast_conv and self.mesh is not None:
            # under a mesh, use the custom_partitioning-wrapped kernels:
            # conv/dgrad stay batch-sharded, wgrad psums over the batch
            # axes (ops/fused_conv.py "SPMD variants")
            self.log("PERFORMANCE.pallas_conv on a >1-device mesh: "
                     "using the SPMD-partitioned Pallas conv path")
            fast_conv = "spmd"
        self._fast_conv = fast_conv
        if self.mode == "siamese":
            self.module = SiameseModule(
                backbone_name=m.backbone_name,
                encodings_len=m.encodings_len,
                embeddings_normalization=m.embeddings_normalization,
                distance_type=m.distance_type, fast_conv=fast_conv,
                dtype=self.compute_dtype)
            self.variables = self.module.init(
                {"params": rng, "dropout": rng}, (dummy, dummy), train=False)
            # the encoder view used for encodings export / eval
            self.encoder_module = EmbeddingModule(
                backbone_name=m.backbone_name,
                encodings_len=m.encodings_len,
                embeddings_normalization=m.embeddings_normalization,
                bn_momentum=self.params.performance.bn_momentum,
                fast_conv=fast_conv, dtype=self.compute_dtype)
        elif self.mode == "arcface":
            self.module = ArcFaceModule(
                backbone_name=m.backbone_name,
                encodings_len=m.encodings_len,
                n_classes=self.data_loader.n_classes,
                embeddings_normalization=False, fast_conv=fast_conv,
                dtype=self.compute_dtype)
            self.variables = self.module.init(
                {"params": rng, "dropout": rng}, dummy, train=False)
            # eval/export view normalizes: ArcFace optimizes cosine
            # structure only, so retrieval lives on the hypersphere —
            # raw-L2 recall collapses as the margin loss saturates and
            # norms drift (measured; see models/api.py). Param-free op,
            # same tree as the training encoder.
            self.encoder_module = EmbeddingModule(
                backbone_name=m.backbone_name,
                encodings_len=m.encodings_len,
                embeddings_normalization=True,
                bn_momentum=self.params.performance.bn_momentum,
                fast_conv=fast_conv, dtype=self.compute_dtype)
        else:
            self.module = EmbeddingModule(
                backbone_name=m.backbone_name,
                encodings_len=m.encodings_len,
                embeddings_normalization=m.embeddings_normalization,
                bn_momentum=self.params.performance.bn_momentum,
                fast_conv=fast_conv, dtype=self.compute_dtype)
            self.variables = self.module.init(
                {"params": rng, "dropout": rng}, dummy, train=False,
                method="init_all")
            self.encoder_module = self.module
        self._load_backbone_weights()

    def _load_backbone_weights(self):
        """Apply MODEL.backbone_weights to the freshly initialized tree.

        Named presets resolve through ``$EMBEDDINGNET_WEIGHTS_DIR`` or fail
        loudly (``pretrained.resolve_weights``) — the reference downloads
        them at build (``backbones.py:96-104``); silently training from
        random init is not an acceptable stand-in.
        """
        m = self.params.model
        from embeddingnet_tpu.models import pretrained
        path = pretrained.resolve_weights(m.backbone_weights,
                                          m.backbone_name)
        if path is None:
            return
        if self.mode in ("siamese", "arcface"):
            # weights files use the standalone-encoder layout; the encoder
            # nests under 'encoder' in these modes
            view = {"params": self.variables["params"]["encoder"]}
            bs = self.variables.get("batch_stats")
            if bs and "encoder" in bs:
                view["batch_stats"] = bs["encoder"]
            loaded = pretrained.load_into(view, path)
            params = dict(self.variables["params"])
            params["encoder"] = loaded["params"]
            self.variables = dict(self.variables)
            self.variables["params"] = params
            if "batch_stats" in loaded and bs is not None:
                new_bs = dict(bs)
                new_bs["encoder"] = loaded["batch_stats"]
                self.variables["batch_stats"] = new_bs
        else:
            self.variables = pretrained.load_into(self.variables, path)
        self.log(f"loaded backbone weights from {path}")

    def _build_optimizer(self):
        t = self.params.train
        g = self.params.generator
        steps_per_epoch = g.n_batches
        schedule = optim.step_decay_schedule(
            t.learning_rate, t.decay_factor, t.step_size, steps_per_epoch,
            warmup_epochs=t.warmup_epochs)
        opt_kwargs = ({"weight_decay": t.weight_decay}
                      if t.optimizer == "adamw" else {})
        base = optim.get_optimizer(t.optimizer, schedule, **opt_kwargs)
        if self.params.model.freeze_backbone:
            mask = backbone_param_mask(self.variables["params"],
                                       self.params.model.freeze_backbone)
            base = optim.masked(base, mask)
        base = optim.scaled_by_plateau(base)
        ema = self.params.performance.ema_decay
        if ema > 0.0:
            base = optax.chain(base, optim.track_param_ema(ema))
        self.optimizer = base
        self.state = TrainState.create(
            self.variables, self.optimizer,
            rng=jax.random.PRNGKey(self.params.general.seed + 1))

    def _place_state(self):
        """Commit the train state to the global mesh.

        Multi-process only: each process builds the state locally from
        the same seed, and a cross-process jit cannot consume local
        arrays — ``jax.device_put`` to the replicated (or TP) sharding
        turns the per-process copies into one global array with no
        comms (every process already holds the full value).  Re-run
        after anything that splices local arrays back into the state
        (softmax-pretraining handoff); single-process is a no-op — the
        jitted step's in_shardings place local state on first call.
        """
        if self.mesh is None or self._n_proc == 1:
            return
        if self.mesh.shape.get("model", 1) > 1:
            from embeddingnet_tpu.parallel import device_put_state
            self.state = device_put_state(self.state, self.mesh)
        else:
            from embeddingnet_tpu.parallel import replicated
            self.state = jax.device_put(self.state, replicated(self.mesh))

    def _mining_mode_for_epoch(self, epoch: int) -> str:
        """Active negatives-selection mode for an epoch. With
        TRAIN.mining_warmup_epochs: N the first N epochs run
        TRAIN.mining_warmup_mode (semihard warm start before hard mining
        — the collapse-free staging recipe, docs/BENCHMARKS.md "Config
        2"); a pure function of the epoch so ``--resume_from`` lands in
        the right stage with no extra checkpoint state."""
        t = self.params.train
        if self.mode == "triplet" and epoch < t.mining_warmup_epochs:
            return t.mining_warmup_mode
        return self.params.generator.negatives_selection_mode

    def _build_steps(self, mining_mode: Optional[str] = None):
        g = self.params.generator
        m = self.params.model
        self._mining_mode = mining_mode or self._mining_mode_for_epoch(0)
        reg_rules = optim.reg_rules_for(m.backbone_name)
        donate = (0,) if self.params.performance.donate_state else ()
        # Single-device packing decides the step LAYOUT, so resolve it
        # before building the step. Preferred path: the flat hooks —
        # the state stays packed THROUGH the optimizer (adam as a few
        # fused ops on the flat buffers, train/packing.py). Fallback for
        # structure-keyed optimizers (freeze_backbone's masked labels):
        # wrap_step, which unpacks/repacks around the ordinary step.
        self._packer = None
        hooks = {}
        if self.mesh is None and self.params.performance.param_packing:
            from embeddingnet_tpu.train.packing import StatePacker
            self._packer = StatePacker(self.state)
            self._pack_jit = jax.jit(self._packer.pack_state)
            self._unpack_jit = jax.jit(self._packer.unpack_state)
            if self._packer.flat_optimizer_ok(self.state, self.optimizer):
                hooks = self._packer.flat_step_hooks(self.optimizer)
        if self.mode == "siamese":
            train_step = steps.make_siamese_train_step(
                self.module, self.optimizer,
                distance_type=m.distance_type,
                augment_fn=self.augment_fn, reg_rules=reg_rules,
                compute_dtype=self.compute_dtype, **hooks)
            eval_step = steps.make_siamese_eval_step(
                self.module, compute_dtype=self.compute_dtype)
        elif self.mode == "arcface":
            train_step = steps.make_arcface_train_step(
                self.module, self.optimizer,
                n_classes=self.data_loader.n_classes, margin=g.margin,
                augment_fn=self.augment_fn,
                compute_dtype=self.compute_dtype, **hooks)
            eval_step = None
        else:
            if self.params.performance.use_pallas_mining:
                self.log("PERFORMANCE.use_pallas_mining was removed in r2 "
                         "(measured slower than the jnp miner at scale -- "
                         "docs/MINING.md); ignoring")
            train_step = steps.make_triplet_train_step(
                self.module, self.optimizer, margin=g.margin,
                mode=self._mining_mode,
                augment_fn=self.augment_fn, reg_rules=reg_rules,
                compute_dtype=self.compute_dtype,
                remat=self.params.performance.remat,
                # P-K batches bound positives per anchor; enables the
                # compare-reduce fast paths. All modes ASSERT the grouped
                # layout when armed (r4: batch-all dropped its lax.cond
                # fallback too) — PKSampler guarantees it and
                # _check_pk_layout guards custom loaders host-side.
                # k_samples=1 has no positives: claim nothing.
                max_positives=(g.k_samples - 1 if g.k_samples >= 2
                               else None), **hooks)
            eval_step = steps.make_triplet_eval_step(
                self.module, margin=g.margin,
                compute_dtype=self.compute_dtype)
        if self.mesh is not None:
            # GSPMD over the mesh: batch args sharded on 'data'; with
            # MESH.model > 1 parameters additionally shard over 'model'
            # (Megatron-style TP via sharding rules, parallel/tp.py);
            # XLA inserts the distance-matrix all-gather + TP collectives.
            n_batch = 3 if self.mode == "siamese" else 2
            if self.mesh.shape.get("model", 1) > 1:
                from embeddingnet_tpu.parallel import shard_train_step_tp
                self.train_step = shard_train_step_tp(
                    train_step, self.mesh, self.state,
                    donate=self.params.performance.donate_state,
                    n_batch_args=n_batch)
            else:
                from embeddingnet_tpu.parallel import shard_train_step
                self.train_step = shard_train_step(
                    train_step, self.mesh,
                    donate=self.params.performance.donate_state,
                    n_batch_args=n_batch)
            self.eval_step = (jax.jit(eval_step)
                              if eval_step is not None else None)
        else:
            if self._packer is not None and not hooks:
                # incompatible-optimizer fallback: unpack/repack around
                # the ordinary step. self.state stays in the ordinary
                # layout at rest either way — the epoch loop packs on
                # entry and unpacks on exit, so eval/checkpoint/export
                # always see plain pytrees.
                train_step = self._packer.wrap_step(train_step)
            self.train_step = jax.jit(train_step, donate_argnums=donate)
            self.eval_step = (jax.jit(eval_step)
                              if eval_step is not None else None)

    # -- data --------------------------------------------------------------

    def _train_loader(self):
        g = self.params.generator
        # Epoch-dependent seed: a fresh sampler is built per epoch, and
        # with a fixed seed every epoch would replay the SAME random batch
        # sequence (the reference reshuffles per epoch,
        # datagenerators.py:121-127). Offsetting by the epoch keeps runs
        # reproducible AND epochs distinct; resume picks up the right
        # sequence because the offset is the epoch number, not a counter.
        seed = (self.params.general.seed
                + 9973 * getattr(self, "_current_epoch", 0))
        if self.mode == "siamese":
            sampler = PairSampler(self.data_loader.train_data,
                                  self.data_loader.class_names,
                                  batch_size=g.batch_size, seed=seed)
        elif self.mode == "arcface":
            sampler = SimpleSampler(self.data_loader.train_data,
                                    self.data_loader.class_names,
                                    batch_size=g.batch_size, seed=seed)
        else:
            sampler = PKSampler(self.data_loader.train_data,
                                self.data_loader.class_names,
                                k_classes=g.k_classes,
                                k_samples=g.k_samples, seed=seed)
        sampler = self._wrap_process_shard(sampler, pk_check=True)
        return BatchLoader(sampler, self.params.model.input_shape,
                           n_batches=g.n_batches,
                           fast_decode=self.params.performance.fast_decode,
                           cache=self._decode_cache)

    def _val_loader(self):
        if self.mode == "arcface":
            return None
        if not self.data_loader.validate or not self.data_loader.val_data:
            return None
        g = self.params.generator
        seed = self.params.general.seed + 1000
        if self.mode == "siamese":
            sampler = PairSampler(self.data_loader.val_data,
                                  self.data_loader.class_names,
                                  batch_size=g.batch_size, seed=seed)
        else:
            # reference validates triplet mode with offline random triplets
            # (tools/train.py:148-150)
            sampler = TripletSampler(self.data_loader.val_data,
                                     self.data_loader.class_names,
                                     batch_size=g.batch_size, seed=seed)
        sampler = self._wrap_process_shard(sampler)
        return BatchLoader(sampler, self.params.model.input_shape,
                           n_batches=g.n_batches_val,
                           cache=self._decode_cache)

    def _wrap_process_shard(self, sampler, pk_check: bool = False):
        """Multi-process: every process draws the identical global batch
        (same seeds) and this wrapper keeps only its contiguous row
        block; ``_put_batch`` reassembles the global array.  The P-K
        layout guard moves here — it must see GLOBAL labels (the miner
        asserts the global layout; groups may straddle process blocks).
        Single-process: pass-through."""
        if self.mesh is None or self._n_proc == 1:
            return sampler
        from embeddingnet_tpu.data.samplers import ProcessShardSampler
        from embeddingnet_tpu.parallel.mesh import process_row_block
        lo, hi = process_row_block(self.mesh, sampler.batch_size)
        check = (self._validate_pk_labels
                 if pk_check and self._pk_armed() else None)
        return ProcessShardSampler(sampler, lo, hi, global_check=check)

    # -- resume ------------------------------------------------------------

    def restore_best(self) -> bool:
        """Load the best-monitored checkpoint into the live state (the
        manager is save_best_only, so its latest step IS the best epoch).
        Returns False when nothing was saved. Used by the train CLI so
        the exported encoder is the best-epoch model, not wherever early
        stopping halted."""
        if self.ckpt_mgr.latest_epoch() is None:
            return False
        state, host = self.ckpt_mgr.restore(self.state, None)
        self.state = state
        self.log(f"restored best checkpoint (epoch {host.get('epoch')}, "
                 f"{self.ckpt_mgr.monitor}={host.get('best')})")
        return True

    def resume(self, epoch: Optional[int] = None):
        """Restore train state + callback state (``--resume_from``,
        ``tools/train.py:27,156-157`` — but full-state, not weights-only)."""
        state, host = self.ckpt_mgr.restore(self.state, epoch)
        self.state = state
        self.start_epoch = int(host.get("epoch", 0)) + 1
        if "plateau" in host:
            self.plateau.load_state_dict(host["plateau"])
        if "early_stop" in host:
            self.early_stop.load_state_dict(host["early_stop"])
        self.log(f"resumed from epoch {self.start_epoch - 1}")
        return self

    # -- epochs ------------------------------------------------------------

    def _device_prefetch(self, loader):
        """Double-buffered host->device transfer: enqueue batch N+1's
        (async) device_put while step N computes, instead of transferring
        synchronously inside the dispatch (ROADMAP r1 item). Yields
        batches already resident on device. ``PERFORMANCE.device_prefetch:
        false`` degrades to synchronous per-batch transfer (debug aid)."""
        if not self.params.performance.device_prefetch:
            for images, targets in loader:
                if isinstance(images, tuple):
                    yield (tuple(self._put_batch(x) for x in images),
                           self._put_batch(targets))
                else:
                    yield self._put_batch(images), self._put_batch(targets)
            return
        prev = None
        for batch in loader:
            images, targets = batch
            if isinstance(images, tuple):
                cur = (tuple(self._put_batch(x) for x in images),
                       self._put_batch(targets))
            else:
                cur = (self._put_batch(images), self._put_batch(targets))
            if prev is not None:
                yield prev
            prev = cur
        if prev is not None:
            yield prev

    def _check_pk_layout(self, loader):
        """Host-side guard for the asserted-layout miner paths — EVERY batch.

        With ``max_positives`` armed, `ops/mining.py` POISONS loss/grad/
        stats with NaN on a non-grouped batch instead of branching (the
        lax.cond fallback blew TPU compile time — docs/BENCHMARKS.md).
        PKSampler guarantees the layout; a custom loader might not, and
        NaN-poisoning is the worst failure mode to debug. The check runs
        on every batch (r5, ADVICE r4: a remainder batch late in a
        custom loader's epoch used to slip past the old batch-0-only
        guard) — it is O(B) on a tiny int array that is still
        host-resident pre-prefetch: contiguous groups of k identical
        labels + all group labels distinct ⟺ the miner's asserted
        layout, no [B,B] comparison needed.
        """
        # Multi-process: the ProcessShardSampler wrapper already ran
        # _validate_pk_labels on the GLOBAL labels (the miner asserts the
        # global layout; local blocks may split groups mid-batch).
        armed = self._pk_armed() and self._n_proc == 1
        for batch in loader:
            if armed:
                self._validate_pk_labels(batch[1])
            yield batch

    def _pk_armed(self) -> bool:
        # parity modes and batch_all poison when k_samples is armed (r4:
        # batch_all dropped its lax.cond fallback — the cond was a
        # ~0.8 ms/step fusion barrier); batch_hard ignores k_samples and
        # is safe on any layout
        return (self.mode == "triplet"
                and self.params.generator.k_samples >= 2
                and self._mining_mode != "batch_hard")

    def _validate_pk_labels(self, labels):
        k = self.params.generator.k_samples
        labels = np.asarray(labels)
        b = labels.shape[0]
        if not (1 < k < b and b % k == 0):
            return
        blocks = labels.reshape(b // k, k)
        grouped = bool(np.all(blocks == blocks[:, :1]))
        heads = blocks[:, 0]
        distinct = len(np.unique(heads)) == heads.shape[0]
        if not (grouped and distinct):
            raise ValueError(
                "triplet train batch is not grouped P-K: with "
                f"GENERATOR.k_samples={k} the miner asserts "
                "contiguous groups of k_samples same-class "
                "images with no class split across groups "
                "(PKSampler produces this). A custom loader "
                "must either honor that layout or unset "
                "k_samples (slower dense mining).")

    def _run_train_epoch(self) -> dict:
        totals_dev, count = None, 0
        images_seen = 0
        t0 = time.perf_counter()
        if self._packer is not None:
            # packed layout for the hot loop only; everything outside
            # (eval, checkpoints, export, callbacks) sees plain pytrees —
            # the finally guarantees that even when the loop raises
            # (e.g. the P-K layout guard)
            self.state = self._pack_jit(self.state)
        try:
            for batch in self._device_prefetch(
                    self._check_pk_layout(self._train_loader())):
                self.state, metrics = self._dispatch_train(batch)
                # accumulate ON DEVICE: a per-step float() sync would add
                # a host round-trip per step and serialize decode with
                # compute; a bounded periodic sync keeps the dispatch
                # queue shallow
                totals_dev = metrics if totals_dev is None else \
                    jax.tree_util.tree_map(jnp.add, totals_dev, metrics)
                count += 1
                images_seen += self._batch_images(batch)
                if count % 32 == 0:
                    float(totals_dev["loss"])
        finally:
            if self._packer is not None:
                self.state = self._unpack_jit(self.state)
        elapsed = time.perf_counter() - t0
        out = {k: float(v) / max(count, 1)
               for k, v in (totals_dev or {}).items()}
        out["images_per_sec"] = images_seen / max(elapsed, 1e-9)
        return out

    def _dispatch_train(self, batch):
        """Batch arrays arrive device-resident via _device_prefetch."""
        images, targets = batch
        if self.mode == "siamese":
            (im1, im2) = images
            return self.train_step(self.state, im1, im2, targets)
        return self.train_step(self.state, images, targets)

    def _put_batch(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        x = np.asarray(x)
        if self._n_proc > 1:
            # x is this process's contiguous row block of the logical
            # global batch (ProcessShardSampler); assemble the global
            # sharded array — no cross-host data movement, each
            # process's rows land on its own devices.
            from embeddingnet_tpu.parallel.mesh import \
                put_process_local_batch
            return put_process_local_batch(
                x, self.mesh, x.shape[0] * self._n_proc)
        from embeddingnet_tpu.parallel import batch_sharding
        return jax.device_put(x, batch_sharding(self.mesh))

    def _batch_images(self, batch) -> int:
        # shape metadata only — np.asarray here would fetch device-
        # resident batches back to host
        images, _ = batch
        if isinstance(images, tuple):
            return sum(int(x.shape[0]) for x in images)
        return int(images.shape[0])

    def _run_val_epoch(self) -> dict:
        loader = self._val_loader()
        if loader is None:
            return {}
        totals_dev, count = None, 0
        for batch in loader:
            images, targets = batch
            # _put_batch: plain transfer single-device; mesh-sharded
            # global arrays under a mesh (required in multi-process —
            # local arrays cannot feed a cross-process computation)
            if self.mode == "siamese":
                (im1, im2) = images
                metrics = self.eval_step(self.state, self._put_batch(im1),
                                         self._put_batch(im2),
                                         self._put_batch(targets))
            else:
                a, p, n = images
                metrics = self.eval_step(self.state, self._put_batch(a),
                                         self._put_batch(p),
                                         self._put_batch(n))
            # device-side accumulation (same rationale as the train epoch)
            totals_dev = metrics if totals_dev is None else \
                jax.tree_util.tree_map(jnp.add, totals_dev, metrics)
            count += 1
            if count % 32 == 0:
                float(totals_dev["loss"])
        return {f"val_{k}": float(v) / max(count, 1)
                for k, v in (totals_dev or {}).items()}

    def fit(self, n_epochs: Optional[int] = None) -> cb.History:
        import os as _os
        n_epochs = n_epochs or self.params.train.n_epochs
        # re-place in case a pretraining handoff or manual param surgery
        # spliced process-local arrays into the global state (no-op
        # single-process / already-placed)
        self._place_state()
        profile_dir = _os.environ.get("EMBEDDINGNET_PROFILE")
        for epoch in range(self.start_epoch, n_epochs):
            self._current_epoch = epoch   # epoch-distinct sampler seeds
            want_mode = self._mining_mode_for_epoch(epoch)
            if want_mode != self._mining_mode:
                # staged mining (TRAIN.mining_warmup_epochs): rebuild the
                # jitted step for the new selection mode — one extra
                # compile at the stage boundary, params/opt state carry
                # over untouched
                self.log(f"epoch {epoch}: mining mode "
                         f"{self._mining_mode} -> {want_mode} "
                         f"(TRAIN.mining_warmup_epochs="
                         f"{self.params.train.mining_warmup_epochs})")
                self._build_steps(mining_mode=want_mode)
            if profile_dir and epoch == self.start_epoch:
                # jax.profiler trace of the first epoch -> TensorBoard /
                # Perfetto (SURVEY.md §5 tracing subsystem)
                jax.profiler.start_trace(profile_dir)
            train_metrics = self._run_train_epoch()
            if profile_dir and epoch == self.start_epoch:
                jax.profiler.stop_trace()
            val_metrics = self._run_val_epoch()
            every = self.params.train.eval_recall_every
            if every and (epoch + 1) % every == 0:
                t_ev = time.perf_counter()
                rec = self.evaluate_recall()
                if rec:
                    # wall observability: warm evals should show the
                    # decode-cache win (cold decodes, warm only encodes)
                    rec["recall_eval_s"] = time.perf_counter() - t_ev
                val_metrics.update(rec)
            metrics = {**train_metrics, **val_metrics}
            self.history.append(metrics)
            if self._proc0:
                # metric FILES are process-0's; decisions below (plateau,
                # early stop, checkpoint-best) use replicated metric
                # values identical on every process, so the loop stays
                # in lockstep and the collective Orbax save agrees
                self.metrics_logger.log(epoch, metrics)

            scale = self.plateau.update(metrics)
            self.state = self.state.replace(
                opt_state=optim.set_plateau_scale(self.state.opt_state,
                                                  scale))
            self.ckpt_mgr.save(epoch, self.state, metrics,
                               host_state={
                                   "plateau": self.plateau.state_dict(),
                                   "early_stop":
                                       self.early_stop.state_dict()})
            self.log(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()))
            if self.early_stop.update(metrics):
                break
        return self.history

    def evaluate_recall(self):
        """recall@1/@5: encode a capped train DB + all val images with the
        current encoder, jitted kNN on device."""
        import jax.numpy as jnp2
        from embeddingnet_tpu.data.images import get_images
        from embeddingnet_tpu.ops import knn as knn_ops

        dl = self.data_loader
        if not dl.val_data:
            return {}
        cap = self.params.train.eval_recall_max_per_class
        variables = self.encoder_variables()
        if self._n_proc > 1:
            # Recall eval is a host-driven loop over decoded chunks; in
            # multi-process it runs PER PROCESS on host copies of the
            # (replicated) encoder weights — every process computes the
            # identical result locally with zero cross-process traffic,
            # keeping the callback/checkpoint lockstep without turning
            # each 256-image chunk into a collective.
            variables = jax.tree_util.tree_map(host_copy, variables)
        # cache the jitted encoder across epochs (a fresh jax.jit per
        # eval recompiled every call) and pad the tail chunk so one
        # [256, H, W, C] program serves every DB size
        if not hasattr(self, "_recall_enc_jit"):
            self._recall_enc_jit = jax.jit(
                lambda v, x: self.encoder_module.apply(v, x, train=False))
        enc = self._recall_enc_jit

        def decoded(paths, tag):
            """Decoded uint8 batch for the whole path list, cached across
            evals: the DB/query lists are fixed per run while params
            change every eval, so only the ENCODE needs re-running —
            host decode was the eval wall (r4 verdict weak #6). Cached
            only when complete (no dropped files — a ragged decode would
            misalign labels on reuse) and under the configured cap."""
            cap_mb = self.params.performance.eval_decode_cache_mb
            shape = self.params.model.input_shape
            cache = getattr(self, "_recall_decoded", None)
            if cache is None:
                cache = self._recall_decoded = {}
            hit = cache.get(tag)
            if hit is not None and hit[0] == paths:
                return hit[1]
            imgs = get_images(paths, shape)
            if (cap_mb > 0 and imgs.shape[0] == len(paths)
                    and imgs.nbytes <= cap_mb * 1e6):
                cache[tag] = (list(paths), imgs)
            return imgs

        def encode_paths(paths, tag):
            all_imgs = decoded(paths, tag)
            out = []
            for s in range(0, len(all_imgs), 256):
                imgs = all_imgs[s:s + 256]
                if imgs.size == 0:
                    continue
                n = imgs.shape[0]
                if n < 256:
                    imgs = np.concatenate(
                        [imgs, np.zeros((256 - n,) + imgs.shape[1:],
                                        imgs.dtype)])
                x = jnp2.asarray(imgs, jnp2.float32) / 255.0
                out.append(np.asarray(enc(variables, x))[:n])
            return np.concatenate(out) if out else np.zeros((0, 1))

        db_paths, db_labels = [], []
        for cls, ps in dl.train_data.items():
            ps = list(ps)[:cap]
            db_paths.extend(ps)
            db_labels.extend([cls] * len(ps))
        val_paths, val_labels = dl.flat("val")
        classes = sorted({*db_labels, *val_labels})
        cid = {c: i for i, c in enumerate(classes)}

        db_emb = encode_paths(db_paths, "db")
        q_emb = encode_paths(val_paths, "val")
        if not len(db_emb) or not len(q_emb):
            return {}
        k5 = min(5, len(db_labels))
        d_axis = (self.mesh.shape["data"]
                  if self.mesh is not None and self._n_proc == 1 else 1)
        if d_axis > 1 and len(db_labels) >= 2 * d_axis:
            # Mesh-sharded encodings-database kNN (BASELINE configs[3]):
            # DB rows shard over the data axis, queries replicate, two-stage
            # exact top-k rides ICI (parallel/sharded_knn.py). Pad the DB to
            # a multiple of the axis with far-away rows (label -1 one-hots
            # to a zero vote row and can never enter the top-k).
            from embeddingnet_tpu.parallel.sharded_knn import sharded_knn
            lab_ids = np.array([cid[l] for l in db_labels], np.int32)
            pad = (-len(db_labels)) % d_axis
            db_p = np.concatenate(
                [db_emb, np.full((pad, db_emb.shape[1]), 1e6, np.float32)]
            ) if pad else db_emb
            lab_p = np.concatenate(
                [lab_ids, np.full((pad,), -1, np.int32)]) if pad else lab_ids
            if not hasattr(self, "_sharded_knn_jit") or \
                    self._sharded_knn_shape != (k5, len(classes)):
                self._sharded_knn_jit = jax.jit(sharded_knn(
                    self.mesh, k=k5, n_classes=len(classes)))
                self._sharded_knn_shape = (k5, len(classes))
            _, _, idx5 = self._sharded_knn_jit(
                jnp2.asarray(db_p), jnp2.asarray(lab_p), jnp2.asarray(q_emb))
            idx5 = np.asarray(idx5)
            pred = lab_ids[idx5[:, 0]]          # nearest neighbor = top-1
            top1 = np.mean([classes[pred[i]] == val_labels[i]
                            for i in range(len(val_labels))])
            top5 = np.mean([val_labels[i] in {db_labels[j] for j in idx5[i]}
                            for i in range(len(val_labels))])
            return {"val_recall1": float(top1), "val_recall5": float(top5)}
        pred, _ = knn_ops.knn_classify(
            jnp2.asarray(db_emb),
            jnp2.asarray(np.array([cid[l] for l in db_labels], np.int32)),
            jnp2.asarray(q_emb), k=1, n_classes=len(classes))
        _, idx5 = knn_ops.knn_neighbors(jnp2.asarray(db_emb),
                                        jnp2.asarray(q_emb), k=k5)
        pred = np.asarray(pred)
        idx5 = np.asarray(idx5)
        top1 = np.mean([classes[pred[i]] == val_labels[i]
                        for i in range(len(val_labels))])
        top5 = np.mean([val_labels[i] in {db_labels[j] for j in idx5[i]}
                        for i in range(len(val_labels))])
        return {"val_recall1": float(top1), "val_recall5": float(top5)}

    # -- softmax pretraining ----------------------------------------------

    def pretrain_softmax(self):
        """Softmax pretraining phase (``backbones.py:128-204``): trains a
        SoftmaxModule sharing the backbone subtree, then transfers the
        backbone params into the main model (``tools/train.py:164-170``)."""
        sp = self.params.softmax
        if sp is None:
            return
        m = self.params.model
        n_classes = self.data_loader.n_classes
        module = SoftmaxModule(backbone_name=m.backbone_name,
                               n_classes=n_classes,
                               encodings_len=m.encodings_len,
                               dtype=self.compute_dtype)
        rng = jax.random.PRNGKey(self.params.general.seed + 7)
        dummy = jnp.zeros((2,) + tuple(m.input_shape), jnp.float32)
        variables = module.init({"params": rng, "dropout": rng}, dummy,
                                train=False)
        # seed the softmax backbone from the current model backbone
        variables = dict(variables)
        variables["params"] = transfer_backbone_params(
            {"backbone": self._encoder_params()["backbone"]},
            variables["params"])

        schedule = optim.step_decay_schedule(
            sp.learning_rate, sp.decay_factor, sp.step_size,
            sp.steps_per_epoch)
        # plateau-scalable LR, same mechanism as the main loop — the
        # reference's pretraining ReduceLROnPlateau really lowers the LR
        # (backbones.py:183-196), so must this one
        optimizer = optim.scaled_by_plateau(
            optim.get_optimizer(sp.optimizer, schedule))
        state = TrainState.create(variables, optimizer, rng=rng)
        train_step = jax.jit(steps.make_softmax_train_step(
            module, optimizer, n_classes=n_classes,
            augment_fn=self.augment_fn, compute_dtype=self.compute_dtype))
        eval_step = jax.jit(steps.make_softmax_eval_step(
            module, n_classes=n_classes, compute_dtype=self.compute_dtype))

        sampler = SimpleSampler(self.data_loader.train_data,
                                self.data_loader.class_names,
                                batch_size=sp.batch_size,
                                seed=self.params.general.seed + 11)
        validate = bool(self.data_loader.validate
                        and self.data_loader.val_data and sp.val_steps > 0)
        val_sampler = SimpleSampler(
            self.data_loader.val_data, self.data_loader.class_names,
            batch_size=sp.batch_size,
            seed=self.params.general.seed + 12) if validate else None
        monitor = "val_loss" if validate else "loss"
        plateau = cb.ReduceLROnPlateau(monitor=monitor, patience=4)
        early = cb.EarlyStopping(monitor=monitor, patience=10)
        # EarlyStopping(restore_best_weights=True) parity
        # (backbones.py:183-196): keep the best-monitored snapshot
        best_value, best_snapshot = float("inf"), None
        for epoch in range(sp.n_epochs):
            state, epoch_metrics = self._pretrain_epoch(
                state, train_step, eval_step, sampler, val_sampler, sp)
            if epoch_metrics.get(monitor, float("inf")) < best_value:
                best_value = epoch_metrics[monitor]
                best_snapshot = (state.params, state.batch_stats)
            scale = plateau.update(epoch_metrics)
            state = state.replace(
                opt_state=optim.set_plateau_scale(state.opt_state, scale))
            self.log(f"softmax-pretrain epoch {epoch}: " + " ".join(
                f"{k}={v:.4f}" for k, v in epoch_metrics.items()))
            if early.update(epoch_metrics):
                break
        if best_snapshot is not None:
            state = state.replace(params=best_snapshot[0],
                                  batch_stats=best_snapshot[1])

        # checkpoint the pretrained backbone (reference keeps a separate
        # pretraining weights dir, backbones.py:177-181)
        from flax import serialization as _ser
        import os as _os
        with open(_os.path.join(self.paths["pretraining_weights"],
                                "backbone.msgpack"), "wb") as f:
            f.write(_ser.to_bytes({"params": state.params,
                                   "batch_stats": state.batch_stats}))

        # hand the pretrained backbone to the embedding model
        new_params = self._with_encoder_params(transfer_backbone_params(
            state.params, self._encoder_params()))
        return self._finish_pretrain(state, new_params)

    def _pretrain_epoch(self, state, train_step, eval_step, sampler,
                        val_sampler, sp):
        """One pretraining epoch: train steps + optional val pass.
        Returns (state, metrics). Separated so tests can drive the
        callback stack with scripted metrics."""
        m = self.params.model
        totals, count = {}, 0
        loader = BatchLoader(sampler, m.input_shape,
                             n_batches=sp.steps_per_epoch)
        for images, labels in loader:
            state, metrics = train_step(state, jnp.asarray(images),
                                        jnp.asarray(labels))
            count += 1
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        epoch_metrics = {k: v / max(count, 1) for k, v in totals.items()}
        if val_sampler is not None:
            vt, vc = {}, 0
            val_loader = BatchLoader(val_sampler, m.input_shape,
                                     n_batches=sp.val_steps)
            for images, labels in val_loader:
                metrics = eval_step(state, jnp.asarray(images),
                                    jnp.asarray(labels))
                vc += 1
                for k, v in metrics.items():
                    vt[k] = vt.get(k, 0.0) + float(v)
            epoch_metrics.update({f"val_{k}": v / max(vc, 1)
                                  for k, v in vt.items()})
        return state, epoch_metrics

    def _finish_pretrain(self, state, new_params):
        self.state = self.state.replace(params=new_params)
        # carry over batch stats of the shared backbone
        if state.batch_stats:
            bs = dict(self.state.batch_stats or {})
            src = state.batch_stats.get("backbone")
            if src is not None:
                if self.mode in ("siamese", "arcface"):
                    # encoder is a named submodule -> stats nest under it
                    enc = dict(bs.get("encoder", {}))
                    enc["backbone"] = src
                    bs["encoder"] = enc
                else:
                    bs["backbone"] = src
            self.state = self.state.replace(batch_stats=bs)
        return state

    def _encoder_params(self):
        if self.mode in ("siamese", "arcface"):
            return self.state.params["encoder"]
        return self.state.params

    def _with_encoder_params(self, encoder_params):
        # siamese/arcface param trees nest the encoder beside sibling
        # leaves (distance head / class_weights) that must be preserved
        if self.mode in ("siamese", "arcface"):
            p = dict(self.state.params)
            p["encoder"] = encoder_params
            return p
        return encoder_params

    # -- export ------------------------------------------------------------

    def host_encoder_variables(self):
        """:meth:`encoder_variables` as host numpy — the multi-process-
        safe export view (cross-process device arrays can't feed the
        local-jit export/serving paths)."""
        return jax.tree_util.tree_map(host_copy, self.encoder_variables())

    def encoder_variables(self):
        """Variables dict for the encoder view (encodings export, eval).
        Uses EMA weights when PERFORMANCE.ema_decay is on."""
        if self.params.performance.ema_decay > 0.0:
            full = optim.get_ema_params(self.state.opt_state)
            params = full["encoder"] if self.mode in (
                "siamese", "arcface") else full
        else:
            params = self._encoder_params()
        v = {"params": params}
        bs = self.state.batch_stats
        if bs:
            v["batch_stats"] = bs["encoder"] if (
                self.mode in ("siamese", "arcface") and "encoder" in bs) \
                else bs
        return v
