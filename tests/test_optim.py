"""Optimizer/schedule parity tests vs the reference formulas (and torch for
Novograd, via a minimal re-execution of the published update rule)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speechlid_tpu.core.optim import (
    ReduceLROnPlateau,
    cosine_annealing_warmup_restarts,
    make_optimizer,
    novograd,
    tristage_schedule,
)


class TestTriStage:
    def test_stage_values(self):
        lr = 1e-3
        s = tristage_schedule(lr=lr, warmup_steps=10, hold_steps=5,
                              decay_steps=10, init_lr_scale=0.01,
                              final_lr_scale=0.01)
        # warmup start
        np.testing.assert_allclose(float(s(0)), 0.01 * lr, rtol=1e-6)
        # linear warmup midpoint: init + rate*5
        rate = (lr - 0.01 * lr) / 10
        np.testing.assert_allclose(float(s(5)), 0.01 * lr + 5 * rate, rtol=1e-6)
        # hold
        np.testing.assert_allclose(float(s(12)), lr, rtol=1e-6)
        # decay: lr * exp(-decay_factor * steps_in_decay)
        df = -math.log(0.01) / 10
        np.testing.assert_allclose(
            float(s(20)), lr * math.exp(-df * 5), rtol=1e-5
        )
        # final flat
        np.testing.assert_allclose(float(s(100)), 0.01 * lr, rtol=1e-5)

    def test_phase_ratio(self):
        s = tristage_schedule(lr=1.0, phase_ratio=(0.1, 0.4, 0.5),
                              max_update=100)
        np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)  # hold starts
        np.testing.assert_allclose(float(s(49)), 1.0, rtol=1e-6)  # hold ends


class TestCosineRestarts:
    def test_warmup_and_restart(self):
        s = cosine_annealing_warmup_restarts(
            first_cycle_steps=20, max_lr=1.0, min_lr=0.1, warmup_steps=5
        )
        np.testing.assert_allclose(float(s(0)), 0.1, atol=1e-6)
        np.testing.assert_allclose(float(s(5)), 1.0, atol=1e-6)  # peak
        # cosine end of cycle ≈ min
        np.testing.assert_allclose(float(s(19)), 0.1, atol=0.02)
        # restart
        np.testing.assert_allclose(float(s(20)), 0.1, atol=1e-6)
        np.testing.assert_allclose(float(s(25)), 1.0, atol=1e-6)

    def test_gamma_decay(self):
        s = cosine_annealing_warmup_restarts(
            first_cycle_steps=10, max_lr=1.0, min_lr=0.0, warmup_steps=2,
            gamma=0.5,
        )
        np.testing.assert_allclose(float(s(12)), 0.5, atol=1e-6)  # 2nd peak


class TestPlateau:
    def test_reduces_after_patience(self):
        p = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
        assert p.step(1.0) == 1.0  # best
        assert p.step(1.0) == 1.0  # bad 1
        assert p.step(1.0) == 1.0  # bad 2
        assert p.step(1.0) == 0.5  # bad 3 > patience → reduce
        assert p.step(0.5) == 0.5  # improvement resets


class TestNovograd:
    def _torch_novograd_steps(self, w0, grads, lr, beta1, beta2, eps, wd,
                              grad_avg, luc):
        """Reference update rule re-executed in numpy (novograd.py:75-145)."""
        w = w0.copy()
        mu = np.zeros_like(w)
        nu = 0.0
        out = []
        for g in grads:
            norm = float((g.astype(np.float64) ** 2).sum())
            nu = norm if nu == 0.0 else beta2 * nu + (1 - beta2) * norm
            d = g / (np.sqrt(nu) + eps)
            if wd:
                d = d + wd * w
            if grad_avg:
                d = d * (1 - beta1)
            mu = beta1 * mu + d
            if luc:
                factor = min(1e-3 * np.linalg.norm(w) /
                             (np.linalg.norm(mu) + 1e-8), lr)
                w = w - factor * mu
            else:
                w = w - lr * mu
            out.append(w.copy())
        return out

    @pytest.mark.parametrize("wd,grad_avg,luc", [
        (0.0, False, False), (0.01, False, False),
        (0.0, True, False), (0.0, False, True),
    ])
    def test_matches_reference_rule(self, wd, grad_avg, luc):
        rng = np.random.RandomState(0)
        w0 = rng.randn(4, 3).astype(np.float32)
        grads = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]
        lr, b1, b2, eps = 0.01, 0.95, 0.98, 1e-8

        tx = novograd(lr, b1, b2, eps, weight_decay=wd,
                      grad_averaging=grad_avg, luc=luc)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        got = []
        for g in grads:
            updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
            got.append(np.asarray(params["w"]))
        ref = self._torch_novograd_steps(w0, grads, lr, b1, b2, eps, wd,
                                         grad_avg, luc)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_converges_on_quadratic(self):
        tx = novograd(0.05)
        params = {"w": jnp.asarray([5.0, -3.0])}
        state = tx.init(params)
        for _ in range(200):
            grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert float(jnp.abs(params["w"]).max()) < 0.1


class TestFactory:
    def test_plateau_injection(self):
        tx, plateau = make_optimizer("adam", lr=0.1, schedule="plateau",
                                     schedule_conf={"factor": 0.5, "patience": 0})
        assert plateau is not None
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        # find injected lr in state
        import optax as _o
        found = []

        def walk(node):
            if hasattr(node, "hyperparams"):
                found.append(float(node.hyperparams["learning_rate"]))
            if isinstance(node, tuple):
                for x in node:
                    walk(x)

        walk(state)
        assert found and abs(found[0] - 0.1) < 1e-6  # f32 storage

    def test_clip_applied(self):
        tx, _ = make_optimizer("sgd", lr=1.0, clip_norm=1.0)
        params = {"w": jnp.zeros(3)}
        state = tx.init(params)
        big = {"w": jnp.asarray([100.0, 0.0, 0.0])}
        updates, _ = tx.update(big, state, params)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(updates["w"])), 1.0, rtol=1e-5
        )


class TestWeightDecaySemantics:
    """torch Adam weight_decay is L2 added to the grad INSIDE step — after
    the trainer-level clip, and independent of the LR schedule (it used to
    be silently DROPPED with schedule='plateau')."""

    def test_plateau_keeps_weight_decay(self):
        import jax.numpy as jnp

        from speechlid_tpu.core.optim import make_optimizer

        params = {"w": jnp.ones((4,))}
        grads = {"w": jnp.zeros((4,))}
        for schedule in (None, "plateau"):
            tx, _ = make_optimizer("adam", lr=0.1, weight_decay=0.5,
                                   clip_norm=20.0, schedule=schedule)
            state = tx.init(params)
            updates, _ = tx.update(grads, state, params)
            # zero grads + wd>0 → nonzero update pulled toward 0
            assert float(jnp.abs(updates["w"]).sum()) > 0, schedule

    def test_decay_not_scaled_by_clip(self):
        import jax.numpy as jnp

        from speechlid_tpu.core.optim import make_optimizer

        params = {"w": jnp.full((4,), 100.0)}
        huge = {"w": jnp.full((4,), 1e6)}  # forces clipping
        tx, _ = make_optimizer("adam", lr=0.1, weight_decay=1.0,
                               clip_norm=1.0)
        s = tx.init(params)
        u_clip, _ = tx.update(huge, s, params)
        tx2, _ = make_optimizer("adam", lr=0.1, weight_decay=1.0,
                                clip_norm=None)
        u_raw, _ = tx2.update({"w": huge["w"] * 0 + 1e-12}, tx2.init(params),
                              params)
        # with decay applied AFTER clip, the decay term (wd*p = 100)
        # dominates the clipped grad (≤1): sign matches pure-decay update
        assert jnp.all(jnp.sign(u_clip["w"]) == jnp.sign(u_raw["w"]))


class TestRoutedAdam:
    """core/optim/routed.routed_adam: torch grad=None-skip semantics for
    hard-routed (vmap-stacked) expert rows — reference heads are a
    ModuleDict where only the batch's own head runs
    (lid/ConformerLangModel.py:275-280), so torch Adam never touches the
    other heads' moments or step counts."""

    def _torch_route(self, steps, lr=0.1):
        """Oracle: L separate torch params, each updated ONLY on its own
        routed steps (grad=None → torch Adam skips the param)."""
        import torch

        torch.manual_seed(0)
        ps = [torch.nn.Parameter(torch.full((3,), 1.0 + i))
              for i in range(2)]
        opts = [torch.optim.Adam([p], lr=lr) for p in ps]
        for t, (route, gval) in enumerate(steps):
            g = torch.full((3,), gval)
            opts[route].zero_grad()
            ps[route].grad = g
            opts[route].step()
        return np.stack([p.detach().numpy() for p in ps])

    def test_matches_torch_route_skip(self):
        torch = pytest.importorskip("torch")  # noqa: F841
        from speechlid_tpu.core.optim import routed_adam

        # routes: head 0, head 0, head 1, head 0 — head 1 idles 3 of 4 steps
        steps = [(0, 0.5), (0, -1.0), (1, 2.0), (0, 0.25)]
        want = self._torch_route(steps)

        params = {"heads": {"w": jnp.stack(
            [jnp.full((3,), 1.0), jnp.full((3,), 2.0)])}}
        tx = routed_adam(0.1)
        state = tx.init(params)
        for route, gval in steps:
            onehot = (jnp.arange(2) == route).astype(jnp.float32)
            grads = {"heads": {"w": onehot[:, None] * gval}}
            mask = {"heads": {"w": onehot[:, None]}}
            upd, state = tx.update(grads, state, params, mask=mask)
            params = optax.apply_updates(params, upd)
        got = np.asarray(params["heads"]["w"])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        # idle-row state froze: head-1 count is 1 (its single routed step)
        assert float(state.count["heads"]["w"][1]) == 1.0
        assert float(state.count["heads"]["w"][0]) == 3.0

    def test_no_mask_is_plain_adam(self):
        from speechlid_tpu.core.optim import routed_adam

        params = {"w": jnp.ones((4,))}
        grads = {"w": jnp.full((4,), 0.3)}
        tx, ref = routed_adam(0.05), optax.adam(0.05)
        s, rs = tx.init(params), ref.init(params)
        p1, p2 = params, params
        for _ in range(3):
            u, s = tx.update(grads, s, p1)
            p1 = optax.apply_updates(p1, u)
            ru, rs = ref.update(grads, rs, p2)
            p2 = optax.apply_updates(p2, ru)
        np.testing.assert_allclose(
            np.asarray(p1["w"]), np.asarray(p2["w"]), rtol=1e-6)

    def test_clip_folded_in(self):
        from speechlid_tpu.core.optim import routed_adam

        params = {"w": jnp.ones((2, 3))}
        huge = {"w": jnp.full((2, 3), 1e6)}
        tx = routed_adam(0.1, clip_norm=1.0)
        s = tx.init(params)
        u, _ = tx.update(huge, s, params)
        # clipped: first-step adam update magnitude is lr regardless, but
        # the internal mu reflects the clipped grad, |g| = 1/sqrt(6)
        ref = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(0.1))
        ru, _ = ref.update(huge, ref.init(params), params)
        np.testing.assert_allclose(
            np.asarray(u["w"]), np.asarray(ru["w"]), rtol=1e-5)
