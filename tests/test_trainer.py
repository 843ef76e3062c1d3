"""End-to-end Trainer tests on a toy classification task (the mnist-smoke
analog, reference mnist/) — fit, eval, checkpointing, resume, freeze masks,
SWA, plateau LR, and 8-device data parallelism on the CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from speechlid_tpu.core import TaskModule, Trainer
from speechlid_tpu.core.callbacks import CkptCallback, LrCallback
from speechlid_tpu.core.checkpoint import load_checkpoint
from speechlid_tpu.core.loggers import JsonlLogger, Logger
from speechlid_tpu.core.optim import make_optimizer
from speechlid_tpu.parallel import make_mesh


class TinyNet(nn.Module):
    n_classes: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(32)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        return nn.Dense(self.n_classes)(x)


class ToyTask(TaskModule):
    rng_keys = ("dropout",)

    def __init__(self, lr=0.05, schedule=None, optimizer="adam", **kw):
        super().__init__()
        self.save_hyper_parameters(lr=lr, schedule=schedule, optimizer=optimizer)
        self.lr = lr
        self.schedule = schedule
        self.optimizer = optimizer
        self.model = TinyNet()

    def build_model(self):
        return self.model

    def init_variables(self, rng, sample_batch):
        x, _ = sample_batch
        return self.model.init({"params": rng}, jnp.asarray(x[:1]))

    def config_optim(self):
        return make_optimizer(self.optimizer, lr=self.lr, clip_norm=20.0,
                              schedule=self.schedule,
                              schedule_conf={"factor": 0.5, "patience": 0}
                              if self.schedule == "plateau" else None)

    def train_loop(self, variables, batch, rngs):
        x, y = batch
        logits = self.model.apply(variables, x, deterministic=False, rngs=rngs)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return loss, {"acc": acc}, {}

    def val_loop(self, variables, batch):
        x, y = batch
        logits = self.model.apply(variables, x)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return {"loss": loss, "acc": jnp.mean(jnp.argmax(logits, -1) == y)}


def _make_data(n=256, d=16, classes=4, seed=0, batch=32):
    rng = np.random.RandomState(seed)
    w = rng.randn(d, classes)
    x = rng.randn(n, d).astype(np.float32)
    y = (x @ w).argmax(-1).astype(np.int32)
    return [
        (x[i : i + batch], y[i : i + batch]) for i in range(0, n, batch)
    ]


class TestTrainerFit:
    def test_fit_learns_and_checkpoints(self, tmp_path):
        data = _make_data()
        task = ToyTask(lr=0.05)
        ckpt_cb = CkptCallback(str(tmp_path / "ckpt"), monitor="avg_val_loss",
                               mode="min", save_topk=2)
        logger = Logger([JsonlLogger(str(tmp_path / "m.jsonl"))])
        tr = Trainer(total_epoch=5, callbacks=[ckpt_cb, LrCallback()],
                     loggers=logger, use_progress_bar=False)
        tr.fit(task, data, data)
        final = tr._run_eval_epoch(data)
        assert final["avg_val_acc"] > 0.9
        files = os.listdir(tmp_path / "ckpt")
        assert "last.ckpt" in files
        assert sum(f.startswith("epoch_") for f in files) <= 2
        # metrics jsonl written
        assert (tmp_path / "m.jsonl").stat().st_size > 0

    def test_resume_restores_step_and_params(self, tmp_path):
        data = _make_data()
        ckpt_dir = str(tmp_path / "ckpt")
        task = ToyTask(lr=0.05)
        tr = Trainer(total_epoch=2, callbacks=[CkptCallback(ckpt_dir)],
                     use_progress_bar=False)
        tr.fit(task, data, data)
        step_after_2 = tr.global_step
        params_after_2 = jax.device_get(tr.state.params)

        task2 = ToyTask(lr=0.05)
        tr2 = Trainer(total_epoch=4,
                      checkpoint_path=os.path.join(ckpt_dir, "last.ckpt"),
                      use_progress_bar=False)
        tr2.fit(task2, data, data)
        assert tr2.start_epoch == 2
        assert tr2.global_step > step_after_2
        # params actually moved on from the restored point
        moved = jax.tree_util.tree_map(
            lambda a, b: not np.allclose(a, b),
            params_after_2, jax.device_get(tr2.state.params),
        )
        assert any(jax.tree_util.tree_leaves(moved))

    def test_checkpoint_meta_has_hparams(self, tmp_path):
        data = _make_data(n=64)
        ckpt_dir = str(tmp_path / "ckpt")
        tr = Trainer(total_epoch=1, callbacks=[CkptCallback(ckpt_dir)],
                     use_progress_bar=False)
        tr.fit(ToyTask(lr=0.07), data, data)
        payload = load_checkpoint(os.path.join(ckpt_dir, "last.ckpt"))
        assert payload["meta"]["hyper_parameters"]["lr"] == 0.07

    def test_freeze_mask_keeps_params_fixed(self):
        data = _make_data(n=64)

        class FrozenFirst(ToyTask):
            def before_train_loop(self, epoch):
                def mask_fn(path, leaf):
                    frozen = "Dense_0" in "/".join(str(p) for p in path)
                    return jnp.asarray(0.0 if frozen else 1.0)

                return jax.tree_util.tree_map_with_path(
                    mask_fn, self.trainer.state.params
                )

        task = FrozenFirst(lr=0.1)
        tr = Trainer(total_epoch=2, use_progress_bar=False)
        tr.fit(task, data, data)
        p0 = jax.device_get(tr.state.params)
        # Dense_0 (frozen) unchanged from init
        task2 = FrozenFirst(lr=0.1)
        tr2 = Trainer(total_epoch=0, use_progress_bar=False)
        tr2.trainer_prepare(task2, data[0])
        init_params = jax.device_get(tr2.state.params)
        np.testing.assert_allclose(
            p0["Dense_0"]["kernel"], init_params["Dense_0"]["kernel"]
        )
        assert not np.allclose(
            p0["Dense_1"]["kernel"], init_params["Dense_1"]["kernel"]
        )

    def test_freeze_sig_prunes_backward_structurally(self):
        """A fully-zero top-level mask subtree becomes a static freeze
        signature → lax.stop_gradient on that subtree, so XLA prunes its
        backward; training result must match the mask-only semantics
        (frozen stays at init, rest learns)."""
        data = _make_data(n=64)

        class FrozenFirst(ToyTask):
            def before_train_loop(self, epoch):
                def mask_fn(path, leaf):
                    frozen = "Dense_0" in "/".join(str(p) for p in path)
                    return jnp.asarray(0.0 if frozen else 1.0)

                return jax.tree_util.tree_map_with_path(
                    mask_fn, self.trainer.state.params
                )

        task = FrozenFirst(lr=0.1)
        tr = Trainer(total_epoch=1, use_progress_bar=False)
        tr.fit(task, data, data)
        assert tr._freeze_sig == ("Dense_0",)
        p = jax.device_get(tr.state.params)
        tr0 = Trainer(total_epoch=0, use_progress_bar=False)
        tr0.trainer_prepare(FrozenFirst(lr=0.1), data[0])
        init = jax.device_get(tr0.state.params)
        np.testing.assert_allclose(
            p["Dense_0"]["kernel"], init["Dense_0"]["kernel"]
        )
        assert not np.allclose(p["Dense_1"]["kernel"], init["Dense_1"]["kernel"])
        # partial freeze (not the whole subtree) must NOT enter the sig
        sig = Trainer._mask_freeze_sig({
            "a": {"k": jnp.asarray(0.0), "b": jnp.asarray(1.0)},
            "c": {"k": jnp.asarray(0.0)},
        })
        assert sig == ("c",)

    def test_freeze_mask_preserves_optimizer_moments(self):
        """Frozen leaves' adam mu/nu must be bit-identical across a frozen
        epoch (torch skips state for requires_grad=False params; reference
        freeze schedule LidModule_ASR.py:279-304)."""
        data = _make_data(n=64)

        class FrozenFirst(ToyTask):
            def before_train_loop(self, epoch):
                def mask_fn(path, leaf):
                    frozen = "Dense_0" in "/".join(str(p) for p in path)
                    return jnp.asarray(0.0 if frozen else 1.0)

                return jax.tree_util.tree_map_with_path(
                    mask_fn, self.trainer.state.params
                )

        task = FrozenFirst(lr=0.1)
        tr = Trainer(total_epoch=0, use_progress_bar=False)
        tr.trainer_prepare(task, data[0])
        tr._mask = task.before_train_loop(0)
        opt0 = jax.device_get(tr.state.opt_state)
        for batch in data:
            tr.state, _ = tr._train_step(tr.state, tr._place_batch(batch),
                                         tr._mask)
        opt1 = jax.device_get(tr.state.opt_state)

        def leaves_named(opt, key):
            flat, _ = jax.tree_util.tree_flatten_with_path(opt)
            return {
                "/".join(str(p) for p in path): leaf
                for path, leaf in flat
                if key in "/".join(str(p) for p in path)
            }

        frozen0 = leaves_named(opt0, "Dense_0")
        frozen1 = leaves_named(opt1, "Dense_0")
        assert frozen0, "expected Dense_0 leaves inside adam state"
        for name, leaf in frozen0.items():
            np.testing.assert_array_equal(
                leaf, frozen1[name], err_msg=f"frozen moment changed: {name}"
            )
        # and the live leaves' moments DID move
        live0 = leaves_named(opt0, "Dense_1")
        live1 = leaves_named(opt1, "Dense_1")
        assert any(
            not np.allclose(live0[n], live1[n]) for n in live0
        ), "live moments should update"

    def test_swa_average_tracked(self, tmp_path):
        from speechlid_tpu.core.callbacks import CkptCallback

        data = _make_data(n=64)
        tr = Trainer(total_epoch=4, use_swa=True, swa_start_ratio=0.5,
                     use_progress_bar=False,
                     callbacks=[CkptCallback(str(tmp_path))])
        tr.fit(ToyTask(lr=0.05), data, data)
        # after fit, params were swapped to the SWA average
        assert tr.state.swa_count is not None
        assert int(tr.state.swa_count) == 2  # epochs 2,3
        # and the averaged weights landed on disk even though ToyTask has
        # no batch_stats/bn_update_loop (self-review r3: the early return
        # used to skip save_swa, losing the SWA result of the run)
        import os

        assert os.path.exists(str(tmp_path / "swa_final.ckpt"))

    def test_plateau_lr_reduced(self):
        data = _make_data(n=64)
        task = ToyTask(lr=0.05, schedule="plateau")
        tr = Trainer(total_epoch=4, lr_exec_mode="epoch",
                     use_progress_bar=False)
        # constant-loss val set → plateau triggers (patience 0)
        tr.fit(task, data, [(np.zeros((8, 16), np.float32),
                             np.zeros(8, np.int32))])
        assert tr.plateau.lr < 0.05

    def test_accum_grad(self):
        data = _make_data(n=128)
        tr = Trainer(total_epoch=3, accum_grad=2, use_progress_bar=False)
        tr.fit(ToyTask(lr=0.05), data, data)
        final = tr._run_eval_epoch(data)
        assert final["avg_val_acc"] > 0.8


class TestDataParallel:
    def test_8_device_mesh_matches_single_device(self):
        assert jax.device_count() >= 8, "conftest should give 8 CPU devices"
        data = _make_data(n=128, batch=32, seed=1)

        tr1 = Trainer(total_epoch=3, use_progress_bar=False, seed=7)
        tr1.fit(ToyTask(lr=0.05), data, data)
        single = jax.device_get(tr1.state.params)

        mesh = make_mesh(data=8, model=1)
        tr8 = Trainer(total_epoch=3, mesh=mesh, use_progress_bar=False, seed=7)
        tr8.fit(ToyTask(lr=0.05), data, data)
        multi = jax.device_get(tr8.state.params)

        # identical data + seed → numerically equal training trajectories
        for a, b in zip(jax.tree_util.tree_leaves(single),
                        jax.tree_util.tree_leaves(multi)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_test_loop(self):
        data = _make_data(n=64)
        tr = Trainer(total_epoch=1, use_progress_bar=False)
        task = ToyTask(lr=0.05)
        tr.fit(task, data, None)
        res = tr.test(task, data)
        assert "avg_val_acc" in res
