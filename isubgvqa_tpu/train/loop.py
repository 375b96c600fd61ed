"""Epoch-level training loop.

Equivalent of ``train`` (``training/train_loop.py:14-132``) +
``train_epoch`` / ``validate_epoch``: pre-eval / eval-only
short-circuit, per-epoch train + validation with meters, and the
three-checkpoint policy.  The reference's explicit ``dist.barrier()`` /
``cuda.synchronize()`` pairs (``train_loop.py:55-82``) have no
equivalent — SPMD program order is the barrier.
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..data.batching import (group_multistep, iterate_batches,
                             iterate_batches_bucketed, prefetch)
from ..data.build import DataBundle
from .distributed_metrics import reduce_dict
from ..parallel.mesh import (batch_sharding, is_main_process, make_mesh,
                             put_batch, shard_state, stacked_batch_sharding)
from ..utils.profiling import StepProfiler, trace
from .checkpoint import CheckpointManager
from .metrics import AverageMeter, ProgressMeter, StepTimer
from .schedule import make_optimizer
from .state import TrainState, create_train_state
from .steps import (make_eval_step, make_multistep_train_step,
                    make_train_step)

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, cfg: Config, model, data: DataBundle,
                 mesh=None, state: Optional[TrainState] = None):
        self.cfg = cfg
        self.model = model
        self.data = data
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.num_data_shards, num_model=cfg.model_parallel)
        # per-host input sharding (DistributedSampler parity,
        # datasets/build.py:44-49: the reference wraps *both* train and
        # valid in DistributedSampler, so validation shards too)
        self.shard_index = jax.process_index()
        self.num_shards = jax.process_count()

        steps_per_epoch = max(
            len(data.datasets["train"]) // max(cfg.batch_size, 1), 1)
        # flat (single-vector) optimizer unless TP needs the state to
        # mirror per-table shardings — see make_optimizer
        self.optimizer = make_optimizer(
            cfg.lr, steps_per_epoch, cfg.warmup_epochs, cfg.warmup_start_lr,
            cfg.lr_gamma, cfg.grad_clip_norm,
            flat=cfg.model_parallel <= 1)

        if state is None:
            sample_batch, _ = next(iterate_batches(
                data.datasets["train"], data.collators["train"]))
            state = create_train_state(self.model, self.optimizer,
                                       sample_batch, cfg)
        # replicated everywhere except the TP-ruled tables when
        # cfg.model_parallel > 1 (identical to full replication at 1)
        self.state = shard_state(state, self.mesh)

        donate = (0,) if cfg.donate_state else ()
        # pin the output state to the input placement: without this the
        # partitioner may re-replicate the TP-sharded tables after the
        # update, silently degrading model_parallel > 1 to DP after one
        # step (pinned by test_tp_sharded_step_matches_replicated)
        state_shardings = jax.tree_util.tree_map(lambda x: x.sharding,
                                                 self.state)
        self.train_step = jax.jit(make_train_step(self.model, self.optimizer, cfg),
                                  donate_argnums=donate,
                                  out_shardings=(state_shardings, None))
        # K optimizer updates per dispatch (cfg.multistep > 1): a
        # lax.scan of the same step body over stacked same-bucket
        # batches — trajectory-identical, one host dispatch per K steps
        self.multistep = max(int(cfg.multistep or 1), 1)
        if self.multistep > 1:
            self.multi_train_step = jax.jit(
                make_multistep_train_step(self.model, self.optimizer, cfg),
                donate_argnums=donate,
                out_shardings=(state_shardings, None))
        self.eval_step = jax.jit(make_eval_step(self.model, cfg))
        self.ckpt = CheckpointManager(cfg.output_dir)
        self.rng = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------ epochs

    def _iter_split(self, split: str, shuffle: bool, seed: int,
                    drop_last: bool, multistep: int = 1):
        """Batch iterator for a split: size-bucketed when the bundle
        carries more than one bucket (one jit specialization per
        bucket), else fixed-shape; always sharded per process.

        Multi-host runs bucket too: the bucketed iterator computes the
        same global bucket schedule on every host from the full index
        list and stride-shards *within* it, so all hosts issue
        identical batch-shape sequences and equal step counts — the
        lock-step requirement of SPMD steps that carry cross-host
        collectives (``data/batching.py:iterate_batches_bucketed``)."""
        ds = self.data.datasets[split]
        buckets = self.data.bucket_collators.get(split)
        if buckets and len(buckets) > 1:
            it = iterate_batches_bucketed(
                ds, buckets, shuffle=shuffle, seed=seed,
                drop_last=drop_last, shard_index=self.shard_index,
                num_shards=self.num_shards)
        else:
            it = iterate_batches(
                ds, self.data.collators[split], shuffle=shuffle, seed=seed,
                drop_last=drop_last, shard_index=self.shard_index,
                num_shards=self.num_shards)
        # overlap host collation AND the host→device copy with device
        # compute (DataLoader-worker + pin_memory parity,
        # datasets/build.py:70-90): the producer thread places each
        # batch data-sharded on the mesh before queueing it
        if multistep > 1:
            it = group_multistep(it, multistep)
            multi_sh = stacked_batch_sharding(self.mesh)
            single_sh = batch_sharding(self.mesh)

            def place(item):
                tag, batch, meta = item
                sh = multi_sh if tag == "multi" else single_sh
                return (tag, put_batch(batch, sh), meta)

            return prefetch(it, depth=2, device=place)
        single_sh = batch_sharding(self.mesh)

        def place_single(item):
            batch, meta = item
            return put_batch(batch, single_sh), meta

        return prefetch(it, depth=2, device=place_single)

    def train_epoch(self, epoch: int) -> float:
        cfg = self.cfg
        ds = self.data.datasets["train"]
        batches = self._iter_split("train", shuffle=True,
                                   seed=cfg.seed + epoch, drop_last=True,
                                   multistep=self.multistep)
        # estimate only: bucketed iteration drops each bucket's own
        # tail under drop_last (true count lower), while multi-host
        # wrap-padded rounds can exceed it when many buckets hold just
        # over one batch each — the meter prefix says "~N" and the
        # final display(i+1) after the loop reports the exact count
        n_batches = len(ds) // self.num_shards // cfg.batch_size

        batch_time = AverageMeter("Time", ":4.2f")
        data_time = AverageMeter("Data", ":4.2f")
        losses = AverageMeter("Loss", ":.2e")
        grad_norm = AverageMeter("GradNorm", ":4.2f")
        ans_short = AverageMeter("Acc@Short-MGat", ":4.2f")
        buckets = self.data.bucket_collators.get("train")
        bucketed = bool(buckets and len(buckets) > 1)
        progress = ProgressMeter(
            n_batches, [batch_time, data_time, losses, grad_norm, ans_short],
            prefix=f"Epoch: [{epoch}]", estimate=bucketed)
        timer = StepTimer()
        profiler = StepProfiler(enabled=bool(cfg.profile_dir))

        steps = 0
        shown = -1                       # display on the first dispatch
        for item in batches:
            data_time.update(timer.lap())
            if self.multistep > 1:
                tag, batch, meta = item
            else:
                tag, (batch, meta) = "single", item
            if tag == "multi":
                self.state, metrics = self.multi_train_step(
                    self.state, batch, self.rng)
                stacked = jax.device_get(metrics)
                n_inner = len(meta)
                per_step = [{k: v[j] for k, v in stacked.items()}
                            for j in range(n_inner)]
            else:
                self.state, metrics = self.train_step(
                    self.state, batch, self.rng)
                per_step = [jax.device_get(metrics)]
            t = timer.lap()
            for m in per_step:
                count = max(float(m["count"]), 1.0)
                loss = float(m["loss_sum"]) / count
                acc = float(m["correct"]) / count * 100.0
                if np.isfinite(loss):                 # train_epoch.py:123-126
                    losses.update(loss, count)
                else:
                    logger.info("loss is %s", loss)
                grad_norm.update(float(m["grad_norm"]))
                ans_short.update(acc, count)
            batch_time.update(t / len(per_step), len(per_step))
            profiler.step()
            steps += len(per_step)
            if is_main_process() and steps // cfg.print_freq > shown:
                progress.display(steps - 1)
                shown = steps // cfg.print_freq
        if is_main_process():
            progress.display(steps)
            if profiler.enabled:
                logger.info("step profile epoch %d: %s", epoch,
                            profiler.summary())
        return losses.avg

    def validate_epoch(self, epoch: int, split: str = "dev"):
        """Validation, sharded across processes like the reference
        (``datasets/build.py:44-49`` wraps valid in DistributedSampler
        too); partial sums are reduced across hosts.  Eval noise is
        drawn fresh per batch, as the reference's samplers do."""
        cfg = self.cfg
        loss_sum = correct = count = 0.0
        self.rng, eval_rng = jax.random.split(self.rng)
        batches = self._iter_split(split, shuffle=False, seed=cfg.seed,
                                   drop_last=False)
        for b_idx, (batch, meta) in enumerate(batches):
            batch_rng = jax.random.fold_in(eval_rng, b_idx)
            m = jax.device_get(self.eval_step(self.state, batch, batch_rng))
            loss_sum += float(m["loss_sum"])
            correct += float(m["correct"])
            count += float(m["count"])
        totals = reduce_dict({"loss_sum": loss_sum, "correct": correct,
                              "count": count}, average=False)
        count = max(totals["count"], 1.0)
        acc = totals["correct"] / count * 100.0
        loss = totals["loss_sum"] / count
        if is_main_process():
            msg = f"Val epoch [{epoch}] {split}: Acc@Short {acc:4.2f} Loss {loss:.2e}"
            print(msg, flush=True)
            logger.info(msg)
        return acc, loss

    # ------------------------------------------------------------ driver

    def fit(self) -> float:
        """train_loop.py:40-132.  With ``cfg.profile_dir`` set, the
        whole run is captured as a jax.profiler trace (SURVEY §5) and
        each epoch logs a step-time/device-memory summary."""
        cfg = self.cfg
        if cfg.evaluate or cfg.pre_eval:
            self.validate_epoch(-1)
            if cfg.evaluate:
                return 0.0
        top_accuracy = 0.0
        loss_lowest = float(sys.maxsize)
        with trace(cfg.profile_dir or None):
            for epoch in range(cfg.start_epoch, cfg.epochs):
                self.train_epoch(epoch)
                val_acc, val_loss = self.validate_epoch(epoch)
                loss_lowest, top_accuracy = self.ckpt.save_policy(
                    self.state, epoch, cfg, val_loss, val_acc,
                    loss_lowest, top_accuracy)
                if is_main_process():
                    print(f"Top validation accuracy so far was "
                          f"{top_accuracy}", flush=True)
        return top_accuracy

    def resume(self, path: str, model_only: bool = False):
        """main.py:124-139 (config comes from the checkpoint meta;
        model-only when evaluating, main.py:131)."""
        state, start_epoch, ckpt_cfg = self.ckpt.restore(
            path, jax.device_get(self.state), model_only=model_only)
        self.state = shard_state(state, self.mesh)
        return start_epoch, ckpt_cfg
