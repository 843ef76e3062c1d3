"""Trainer — host-side epoch loop driving jitted TPU steps.

Rebuild of the reference Trainer (ccml/trainer.py:19-795) as a functional
core: the mutable torch loop (model.to(cuda), DDP wrap, GradScaler, in-place
optimizer) becomes ONE jitted, donated ``train_step`` over a TrainState
pytree, with the host loop handling only data feeding, callbacks, logging,
checkpointing and LR plateau logic.

Feature parity map (reference → here):
- AMP autocast/GradScaler (trainer.py:121,514-545)  → bf16 model dtype; no scaler
- grad accumulation + DDP no_sync (:505-532)        → optax.MultiSteps
- grad clip 20 (:541)                               → optax.clip_by_global_norm in tx
- DDP/SyncBN/fp16 hook (:358-437)                   → jit over a Mesh: batch sharded on
  the 'data' axis, state replicated; XLA inserts the gradient all-reduce
  (bf16 grads ≈ the fp16 compression hook); batch-norm over the global batch
- DistributedSampler (:274-278)                     → per-process feeder sharding
- SWA (:419-425,574-580,647-665)                    → TrainState.swa_update + BN pass
- train_data_factor epoch truncation (:498-499)     → same
- eval every eval_interval (:591)                   → same
- resume (:699-748)                                 → restore_state + meta
- freeze schedules via requires_grad                → trainable-mask pytree from
  module.before_train_loop, masking grads, updates AND optimizer-state
  deltas (frozen elements keep their adam moments exactly, matching torch's
  skip-untracked-params semantics)
"""

from __future__ import annotations

import logging
import math
import os
import time
from functools import partial
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speechlid_tpu.core.callbacks.base import Callback
from speechlid_tpu.core.callbacks.ckpt import CkptCallback
from speechlid_tpu.core.checkpoint import load_checkpoint, restore_state
from speechlid_tpu.core.loggers.multiplexer import Logger
from speechlid_tpu.core.module import TaskModule
from speechlid_tpu.core.profile import _time_cost_recoder
from speechlid_tpu.core.seed import seed_everything
from speechlid_tpu.core.state import TrainState


def _all_ones_like(tree):
    # host-side numpy scalars: building the mask must NOT issue a storm of
    # tiny eager device ops (destabilizes the axon worker for later train
    # graphs — docs/runs/CHIP_FINDINGS_r2.md); jit device_puts them on use
    return jax.tree_util.tree_map(lambda x: np.ones((), np.float32), tree)


class Trainer:
    def __init__(
        self,
        total_epoch: int = 10,
        accum_grad: int = 1,
        eval_interval: int = 1,
        train_data_factor: float = 1.0,
        use_swa: bool = False,
        swa_start_ratio: float = 0.7,
        lr_exec_mode: str = "step",  # 'step' | 'epoch' (plateau on eval loss)
        seed: int = 0,
        callbacks: Optional[Sequence[Callback]] = None,
        loggers: Optional[Logger] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        data_axis: str = "data",
        param_rules: Optional[Sequence] = None,  # (regex, PartitionSpec)
        checkpoint_path: Optional[str] = None,  # resume source
        use_progress_bar: bool = True,
        log_interval: int = 10,
        profile_dir: Optional[str] = None,  # jax.profiler trace output
        profile_epochs: int = 1,  # capture the first N train epochs
    ) -> None:
        self.total_epoch = total_epoch
        self.accum_grad = accum_grad
        self.eval_interval = eval_interval
        self.train_data_factor = train_data_factor
        self.use_swa = use_swa
        self.swa_start_ratio = swa_start_ratio
        self.lr_exec_mode = lr_exec_mode
        self.seed = seed
        self.callbacks = list(callbacks or [])
        self.logger = loggers or Logger()
        self.mesh = mesh
        self.data_axis = data_axis
        self.param_rules = param_rules
        self.checkpoint_path = checkpoint_path
        self.use_progress_bar = use_progress_bar
        self.log_interval = log_interval
        self.profile_dir = profile_dir
        self.profile_epochs = profile_epochs

        self.module: Optional[TaskModule] = None
        self.state: Optional[TrainState] = None
        self.start_epoch = 0
        self.global_step = 0
        self.plateau = None
        self._mask = None
        self._freeze_sig = ()
        self._train_step = None
        self._eval_step = None
        self._moving_eval_loss: Optional[float] = None

    # ------------------------------------------------------------------ setup
    def trainer_prepare(self, module: TaskModule, sample_batch) -> None:
        """Init model variables, optimizer, jitted steps (reference
        trainer_prepare, trainer.py:135-239)."""
        self.module = module
        module.trainer = self
        root = seed_everything(self.seed)
        init_rng, state_rng = jax.random.split(root)

        variables = module.init_variables(init_rng, sample_batch)
        params = variables.pop("params")
        model_state = dict(variables)

        tx, self.plateau = module.config_optim()
        if self.accum_grad > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accum_grad)
        self.tx = tx
        # CPU-backend opt init: an eager tx.init is ~a-few-hundred tiny
        # zeros_like device ops — the same eager-op storm that destabilizes
        # the axon worker for later train graphs; one small CPU program
        # instead, placed on the target device with the rest of the state
        opt_state = jax.jit(tx.init, backend="cpu")(params)

        self.state = TrainState.create(
            params, model_state, opt_state, state_rng, swa=self.use_swa
        )
        self._mask = _all_ones_like(params)
        self._freeze_sig = ()
        self._build_steps()
        self._place_state()

        if self.checkpoint_path:
            self._resume(self.checkpoint_path)

        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(self.state.params)
        )
        logging.info("model parameters: %.2f M", n_params / 1e6)

    def _build_steps(self) -> None:
        module = self.module
        tx = self.tx
        rng_names = tuple(module.rng_keys)
        params_treedef = jax.tree_util.tree_structure(self.state.params)

        def keep_frozen_opt_state(new_opt, old_opt, mask):
            """Preserve optimizer moments for frozen (mask==0) elements.

            torch's Adam never touches state for requires_grad=False params
            (the reference's freeze schedules, LidModule_ASR.py:279-304);
            without this, zeroed grads still decay mu/nu every step and a
            long-frozen encoder resumes with stale second moments.  Any
            opt-state subtree shaped like the params pytree (adam mu/nu,
            MultiSteps grad accumulators, …) gets element-wise select; other
            leaves (step counters) pass through.
            """
            is_params_like = (
                lambda x: jax.tree_util.tree_structure(x) == params_treedef
            )

            def sel(new_sub, old_sub):
                if is_params_like(new_sub):
                    return jax.tree_util.tree_map(
                        lambda n, o, m: (n * m + o * (1.0 - m)).astype(n.dtype),
                        new_sub, old_sub, mask,
                    )
                return new_sub

            return jax.tree_util.tree_map(
                sel, new_opt, old_opt, is_leaf=is_params_like
            )

        def stop_by_sig(params, freeze_sig):
            """Apply ``lax.stop_gradient`` to the fully-frozen top-level
            subtrees named in the STATIC ``freeze_sig`` tuple.  Unlike the
            mask multiply (traced, so the backward is still computed then
            zeroed), this is compile-time structure: XLA prunes the whole
            frozen-subtree backward — frozen-featurizer epochs skip the
            encoder backward's FLOPs entirely.  The jit retraces only when
            the freeze signature changes (a few epoch gates per run)."""
            if not freeze_sig:
                return params
            out = dict(params)
            for name in freeze_sig:
                if name in out:
                    out[name] = jax.tree_util.tree_map(
                        jax.lax.stop_gradient, out[name]
                    )
            return out

        # Routing-aware optimizer path: the module declares hard routing
        # (per-batch expert masks with torch grad=None-skip semantics —
        # core/optim/routed.routed_adam) by setting ``routed_optim=True``
        # and providing ``route_mask(params, batch)``.  The route mask is
        # TRACED (depends on the batch's language), unlike the host-built
        # epoch freeze mask; both compose multiplicatively.
        routed = bool(getattr(module, "routed_optim", False)) and callable(
            getattr(module, "route_mask", None)
        )

        def train_step(state: TrainState, batch, mask, freeze_sig=()):
            rng, step_rng = jax.random.split(state.rng)
            rngs = {
                name: jax.random.fold_in(step_rng, i)
                for i, name in enumerate(rng_names)
            }

            def loss_fn(params):
                variables = {
                    "params": stop_by_sig(params, freeze_sig),
                    **(state.model_state or {}),
                }
                loss, metrics, mutated = module.train_loop(variables, batch, rngs)
                return loss, (metrics, mutated)

            (loss, (metrics, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if routed:
                route = module.route_mask(state.params, batch)
                mask = jax.tree_util.tree_map(
                    lambda m, r: jnp.asarray(m, jnp.float32) * r, mask, route
                )
            grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
            if routed:
                # routed_adam consumes the mask itself and freezes mu/nu/count
                # where mask==0 — keep_frozen_opt_state would double-apply
                # (and its params-treedef probe trips on the vector counts).
                updates, new_opt = tx.update(
                    grads, state.opt_state, state.params, mask=mask
                )
            else:
                updates, new_opt = tx.update(
                    grads, state.opt_state, state.params
                )
            updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)
            if not routed:
                new_opt = keep_frozen_opt_state(new_opt, state.opt_state, mask)
            new_params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                model_state=mutated if mutated else state.model_state,
                rng=rng,
            )
            return new_state, metrics

        def eval_step(state: TrainState, batch):
            variables = {"params": state.params, **(state.model_state or {})}
            return module.val_loop(variables, batch)

        def test_step(state: TrainState, batch):
            variables = {"params": state.params, **(state.model_state or {})}
            return module.test_loop(variables, batch)

        self._train_step = jax.jit(
            train_step, donate_argnums=(0,), static_argnums=(3,)
        )
        self._eval_step = jax.jit(eval_step)
        self._test_step = jax.jit(test_step)

    @staticmethod
    def _mask_freeze_sig(mask) -> tuple:
        """Top-level param groups whose ENTIRE mask subtree is zero —
        the static freeze signature for backward pruning (sorted tuple so
        equal sets hash equal across epochs)."""
        sig = []
        for name, sub in mask.items():
            leaves = jax.tree_util.tree_leaves(sub)
            if leaves and all(float(l) == 0.0 for l in leaves):
                sig.append(name)
        return tuple(sorted(sig))

    # ----------------------------------------------------------- distribution
    def _place_state(self) -> None:
        """Place state across the mesh: data-parallel replication by
        default; with ``param_rules`` (regex → PartitionSpec, e.g.
        ``CONFORMER_TP_RULES + EP_RULES``) matching leaves — params AND
        their optimizer moments, whose tree paths embed the param paths —
        lay out tensor/expert-parallel on the 'model' axis, the rest
        replicate."""
        if self.mesh is None:
            return
        if self.param_rules:
            from speechlid_tpu.parallel.sharding import make_param_sharder

            self.state = make_param_sharder(self.mesh, self.param_rules)(
                self.state
            )
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, replicated)

    def _place_batch(self, batch):
        """Host numpy batch → device, sharded on the leading axis over the
        data mesh axis (the DistributedSampler + H2D copy analog,
        trainer.py:274,777)."""
        with _time_cost_recoder.measure("batch_to_device"):
            if self.mesh is None:
                return jax.tree_util.tree_map(jnp.asarray, batch)
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_size = self.mesh.shape[self.data_axis]
            sharded = NamedSharding(self.mesh, P(self.data_axis))
            replicated = NamedSharding(self.mesh, P())
            multihost = jax.process_count() > 1

            def place(x):
                x = np.asarray(x)
                # scalars (e.g. n_valid) and odd leading dims replicate
                ok = x.ndim >= 1 and x.shape[0] % data_size == 0
                if not ok:
                    return jax.device_put(x, replicated)
                if multihost:
                    # each process feeds its LOCAL sampler shard; a global
                    # device_put would treat every process's (different)
                    # array as the same global value
                    return jax.make_array_from_process_local_data(sharded, x)
                return jax.device_put(x, sharded)

            return jax.tree_util.tree_map(place, batch)

    # ------------------------------------------------------------------ train
    def fit(
        self,
        ccml_module: TaskModule,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
    ) -> None:
        """Reference Trainer.fit (trainer.py:439-665)."""
        # feeders expose peek() (no prefetch thread, no epoch advance);
        # plain iterables fall back to one consumed iterator
        first_batch = (train_loader.peek() if hasattr(train_loader, "peek")
                       else next(iter(train_loader)))
        self.trainer_prepare(ccml_module, first_batch)
        for cb in self.callbacks:
            cb.add_trainer(self)
        self.logger.init(
            run_name=type(ccml_module).__name__,
            config=ccml_module.hyper_parameters,
        )

        swa_start = int(self.total_epoch * self.swa_start_ratio)
        for epoch in range(self.start_epoch, self.total_epoch):
            for cb in self.callbacks:
                cb.before_train_epoch(epoch)
            new_mask = self.module.before_train_loop(epoch)
            if new_mask is not None:
                self._mask = new_mask
                self._freeze_sig = self._mask_freeze_sig(new_mask)

            # SURVEY.md §5.1: the reference only has a host wall-clock
            # registry — here the first N epochs can additionally capture a
            # jax.profiler device trace (xprof/tensorboard viewable)
            from speechlid_tpu.core.profile import device_trace

            trace_dir = (
                self.profile_dir
                if self.profile_dir and epoch - self.start_epoch < self.profile_epochs
                else None
            )
            with device_trace(trace_dir):
                train_metrics = self._run_train_epoch(epoch, train_loader)

            if self.use_swa and epoch >= swa_start:
                self.state = self.state.swa_update()

            for cb in self.callbacks:
                cb.after_train_epoch(epoch, train_metrics)
            self.logger.log(train_metrics, step=self.global_step)

            if val_loader is not None and (epoch + 1) % self.eval_interval == 0:
                eval_metrics = self._run_eval_epoch(val_loader)
                self.logger.log(eval_metrics, step=self.global_step)
                self._epoch_lr_update(eval_metrics)
                for cb in self.callbacks:
                    cb.after_eval_epoch(epoch, eval_metrics)

        if self.use_swa:
            self._finalize_swa(train_loader)
        from speechlid_tpu.core.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # settle async ckpt writes before returning

    def _run_train_epoch(self, epoch: int, loader: Iterable) -> Dict[str, float]:
        outputs: List[Dict] = []
        n_batches = None
        if hasattr(loader, "__len__"):
            n_batches = max(1, int(len(loader) * self.train_data_factor))
        it = iter(loader)
        bar = None
        if self.use_progress_bar and jax.process_index() == 0:
            from tqdm import tqdm

            bar = tqdm(total=n_batches, desc=f"epoch {epoch}", leave=False)
        i = 0
        pending = None  # overlap host metric fetch with next device step
        while True:
            if n_batches is not None and i >= n_batches:
                break
            with _time_cost_recoder.measure("get_batch"):
                try:
                    batch = next(it)
                except StopIteration:
                    break
            batch = self._place_batch(batch)
            with _time_cost_recoder.measure("train_step_dispatch"):
                self.state, metrics = self._train_step(
                    self.state, batch, self._mask, self._freeze_sig
                )
            if pending is not None:
                self._collect_train_metrics(pending, outputs, bar)
            pending = metrics
            self.global_step += 1
            i += 1
        if pending is not None:
            self._collect_train_metrics(pending, outputs, bar)
        if bar is not None:
            bar.close()
        return self.module.train_loop_end(outputs)

    def _collect_train_metrics(self, metrics, outputs, bar) -> None:
        host = {}
        for k, v in jax.device_get(metrics).items():
            arr = np.asarray(v)
            host[k] = float(arr) if arr.ndim == 0 else arr
        outputs.append(host)
        scalars = {k: v for k, v in host.items() if np.isscalar(v)}
        if bar is not None:
            bar.update(1)
            if len(outputs) % self.log_interval == 0:
                bar.set_postfix(
                    {k: f"{v:.4g}" for k, v in scalars.items() if np.isfinite(v)}
                )
        for cb in self.callbacks:
            cb.after_train_loop(self.global_step, scalars)
        self.logger.log(scalars, step=self.global_step, is_train=True)

    def _run_eval_epoch(self, loader: Iterable) -> Dict[str, float]:
        outputs: List[Dict] = []
        for batch in loader:
            batch = self._place_batch(batch)
            metrics = self._eval_step(self.state, batch)
            host = {
                k: np.asarray(v) for k, v in jax.device_get(metrics).items()
            }
            host = {
                k: (float(v) if v.ndim == 0 else v) for k, v in host.items()
            }
            outputs.append(host)
            for cb in self.callbacks:
                cb.after_eval_loop(host)
        return self.module.val_loop_end(outputs)

    # ------------------------------------------------------------------- test
    def test(self, ccml_module: TaskModule, test_loader: Iterable) -> Dict:
        """Reference Trainer.test (trainer.py:668-697)."""
        if self.module is None:
            first_batch = (test_loader.peek()
                           if hasattr(test_loader, "peek")
                           else next(iter(test_loader)))
            self.trainer_prepare(ccml_module, first_batch)
        outputs: List[Dict] = []
        for batch in test_loader:
            batch = self._place_batch(batch)
            metrics = self._test_step(self.state, batch)
            host = {
                k: np.asarray(v) for k, v in jax.device_get(metrics).items()
            }
            outputs.append(
                {k: (float(v) if v.ndim == 0 else v) for k, v in host.items()}
            )
        result = self.module.test_loop_end(outputs)
        for cb in self.callbacks:
            cb.test_loop_end(result)
        self.logger.log(result, step=self.global_step)
        return result

    # --------------------------------------------------------------------- lr
    def current_lr(self) -> float:
        if self.plateau is not None:
            return self.plateau.lr
        # schedule-driven: report from the schedule at the current step
        try:
            sched = getattr(self.module, "lr_schedule", None)
            if sched is not None:
                return float(sched(int(self.state.step)))
        except Exception:
            pass
        # constant-lr fallback: the module's configured base lr
        lr = getattr(self.module, "lr", None)
        return float(lr) if lr is not None else float("nan")

    def _epoch_lr_update(self, eval_metrics: Dict[str, float]) -> None:
        """Plateau mode: reduce lr on the eval moving-average loss
        (trainer.py:620-634)."""
        if self.lr_exec_mode != "epoch" or self.plateau is None:
            return
        loss = eval_metrics.get("avg_val_loss")
        if loss is None or not math.isfinite(loss):
            return
        if self._moving_eval_loss is None:
            self._moving_eval_loss = loss
        else:
            self._moving_eval_loss = 0.9 * self._moving_eval_loss + 0.1 * loss
        new_lr = self.plateau.step(self._moving_eval_loss)
        self.state = self.state.replace(
            opt_state=self._set_injected_lr(self.state.opt_state, new_lr)
        )

    @staticmethod
    def _set_injected_lr(opt_state, lr: float):
        """Walk the optax state tree and set any InjectHyperparamsState lr."""

        def visit(node):
            if hasattr(node, "hyperparams") and "learning_rate" in getattr(
                node, "hyperparams", {}
            ):
                hp = dict(node.hyperparams)
                hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
                return node._replace(hyperparams=hp)
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return node._replace(
                    **{f: visit(getattr(node, f)) for f in node._fields}
                )
            if isinstance(node, tuple):
                return tuple(visit(x) for x in node)
            return node

        return visit(opt_state)

    # -------------------------------------------------------------------- swa
    def _finalize_swa(self, train_loader: Iterable) -> None:
        """Swap in averaged weights and re-estimate BN statistics with one
        pass over training data (trainer.py:647-665)."""
        logging.info("SWA: swapping averaged weights, re-estimating BN stats")
        self.state = self.state.replace(params=self.state.swa_params)
        bn_fn = getattr(self.module, "bn_update_loop", None)
        has_bn = bool(self.state.model_state) and "batch_stats" in (
            self.state.model_state or {}
        )
        if has_bn and bn_fn is not None:
            jit_bn = jax.jit(
                lambda state, batch, seed: bn_fn(
                    {"params": state.params, **state.model_state}, batch,
                    seed,
                )
            )
            # the hook updates stats through each layer's EMA (decay m),
            # starting from the PRE-SWAP stats; torch's update_bn resets
            # and averages exactly.  Approximate that by re-passing the
            # loader until the stale mass m^N is negligible (one pass
            # already suffices for loaders with ≥60 batches).
            seed = 0
            for _ in range(5):
                n_batches = 0
                for batch in train_loader:
                    batch = self._place_batch(batch)
                    new_stats = jit_bn(self.state, batch, seed)
                    seed += 1
                    n_batches += 1
                    ms = dict(self.state.model_state)
                    ms["batch_stats"] = new_stats
                    self.state = self.state.replace(model_state=ms)
                if n_batches == 0 or 0.9 ** seed < 5e-3:
                    break
        # the averaged weights must land on disk even without a BN
        # re-estimation pass — otherwise the whole SWA result of the run
        # only ever existed in process memory
        for cb in self.callbacks:
            if isinstance(cb, CkptCallback):
                cb.save_swa(self.total_epoch, {})

    # ----------------------------------------------------------------- resume
    def checkpoint_meta(self, epoch: int, metrics: Dict) -> Dict:
        return {
            "epoch": epoch,
            "global_step": self.global_step,
            "metrics": {k: v for k, v in metrics.items() if np.isscalar(v)},
            "hyper_parameters": self.module.hyper_parameters
            if self.module
            else {},
            "logger": self.logger.state_dict(),
            "plateau": self.plateau.state_dict() if self.plateau else None,
            "moving_eval_loss": self._moving_eval_loss,
        }

    def _resume(self, path: str) -> None:
        """Training resume (reference trainer.py:699-748): restore state +
        epoch + logger counters + plateau."""
        payload = load_checkpoint(path)
        template = self.state  # fresh-init state: the canonical dtypes
        restored = restore_state(template, payload)
        # canonicalize the restored (numpy) leaves through one CPU-backend
        # program so dtypes/devices exactly match the fresh-init state the
        # train step was compiled against — msgpack round-trips change
        # scalar dtypes (int32→int64), forcing a retrace, and an explicit
        # many-leaf device_put here faulted the axon worker (phase-2
        # resume bisect, docs/runs/CHIP_FINDINGS_r2.md)
        self.state = jax.jit(
            lambda s: jax.tree_util.tree_map(
                lambda x, t: jnp.asarray(x, t.dtype), s, template
            ),
            backend="cpu",
        )(restored)
        self._place_state()
        meta = payload.get("meta", {})
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.global_step = int(meta.get("global_step", 0))
        if meta.get("logger"):
            self.logger.load_state_dict(meta["logger"])
        if self.plateau is not None and meta.get("plateau"):
            self.plateau.load_state_dict(meta["plateau"])
        self._moving_eval_loss = meta.get("moving_eval_loss")
        logging.info("resumed from %s at epoch %d", path, self.start_epoch)
