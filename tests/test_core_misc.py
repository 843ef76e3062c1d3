"""Core utilities: hydra-compatible config loader, TTL cache, profiler,
serve handler logic (stubbed device fns, no TPU needed)."""

import io
import json
import os
import time
import urllib.request

import numpy as np
import pytest

from speechlid_tpu.core import ConfigDict, load_config
from speechlid_tpu.core.cache import TimeUnit, cacheable
from speechlid_tpu.core.profile import TimeCostRecoder, register_cost_statistic


class TestConfig:
    @pytest.fixture()
    def tree(self, tmp_path):
        (tmp_path / "base").mkdir()
        (tmp_path / "base" / "custom.yaml").write_text(
            "log_level: INFO\nexp_dir: exp/${experiment_name}\n"
        )
        (tmp_path / "main.yaml").write_text(
            "defaults:\n  - base/custom\n  - _self_\n"
            "model_name: conformer\n"
            "experiment_name: ${model_name}_run\n"
            "trainer:\n  total_epoch: 10\n  lr: 1.0e-3\n"
        )
        return str(tmp_path)

    def test_defaults_and_interpolation(self, tree):
        conf = load_config(tree, "main")
        assert conf.log_level == "INFO"
        assert conf.experiment_name == "conformer_run"
        assert conf.exp_dir == "exp/conformer_run"
        assert conf.trainer.total_epoch == 10

    def test_overrides_typed(self, tree):
        conf = load_config(
            tree, "main",
            ["trainer.total_epoch=3", "trainer.lr=5e-4",
             "model_name=xvector", "trainer.new_flag=true"],
        )
        assert conf.trainer.total_epoch == 3
        assert abs(conf.trainer.lr - 5e-4) < 1e-12  # sci-notation coerced
        assert conf.trainer.new_flag is True
        assert conf.experiment_name == "xvector_run"  # re-interpolated

    def test_interpolation_cycle_detected(self, tmp_path):
        (tmp_path / "c.yaml").write_text("a: ${b}\nb: ${a}\n")
        with pytest.raises(ValueError, match="cycle"):
            load_config(str(tmp_path), "c")

    def test_to_dict_roundtrip(self, tree):
        conf = load_config(tree, "main")
        d = conf.to_dict()
        assert isinstance(d, dict) and not isinstance(d, ConfigDict)
        assert d["trainer"]["total_epoch"] == 10


class TestCache:
    def test_memoizes_by_kwarg(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SPEECHLID_CACHE_DIR", str(tmp_path))
        monkeypatch.delenv("SPEECHLID_CACHE_DISABLE", raising=False)
        calls = []

        @cacheable(cache_key="path", project="t", duration=1,
                   time_unit=TimeUnit.HOUR)
        def scan(path=None):
            calls.append(path)
            return {"n": len(calls)}

        assert scan(path="a") == {"n": 1}
        assert scan(path="a") == {"n": 1}  # cached
        assert scan(path="b") == {"n": 2}  # different key
        assert calls == ["a", "b"]

    def test_disable_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SPEECHLID_CACHE_DIR", str(tmp_path))
        monkeypatch.setenv("SPEECHLID_CACHE_DISABLE", "1")
        calls = []

        @cacheable(cache_key="path", project="t2")
        def scan(path=None):
            calls.append(path)
            return 1

        scan(path="a"); scan(path="a")
        assert len(calls) == 2


class TestCompileCacheSeed:
    """seed_cache copies entries from an OPT-IN external seed directory.

    No seed is committed to the repo (pre-baked compiled artifacts would be
    an unauditable supply-chain surface); seeding only happens when
    SPEECHLID_CACHE_SEED_DIR points at a captured snapshot, entries are
    copied (never hard-linked, so XLA rewriting a runtime entry can't
    mutate the source), and only cache-entry-shaped names are touched.
    """

    def test_seeds_missing_cache_entries_only(self, tmp_path):
        from speechlid_tpu.core.compile_cache import seed_cache

        seed = tmp_path / "seed"
        cache = tmp_path / "cache"
        seed.mkdir()
        cache.mkdir()
        (seed / "aa-cache").write_bytes(b"x" * 10)
        (seed / "bb-cache").write_bytes(b"y" * 20)
        (seed / "README.md").write_bytes(b"docs never seed")
        (cache / "bb-cache").write_bytes(b"already-there")
        (seed / "subdir-cache").mkdir()  # non-files are skipped

        n = seed_cache(str(cache), seed_dir=str(seed))
        assert n == 1
        assert (cache / "aa-cache").read_bytes() == b"x" * 10
        assert (cache / "bb-cache").read_bytes() == b"already-there"
        assert not (cache / "README.md").exists()
        # copies, not hard links: mutating the runtime entry must not
        # touch the seed source
        assert (
            os.stat(cache / "aa-cache").st_ino
            != os.stat(seed / "aa-cache").st_ino
        )
        # idempotent
        assert seed_cache(str(cache), seed_dir=str(seed)) == 0

    def test_no_env_means_noop(self, tmp_path, monkeypatch):
        from speechlid_tpu.core.compile_cache import seed_cache

        monkeypatch.delenv("SPEECHLID_CACHE_SEED_DIR", raising=False)
        assert seed_cache(str(tmp_path)) == 0

    def test_missing_seed_dir_is_noop(self, tmp_path):
        from speechlid_tpu.core.compile_cache import seed_cache

        assert seed_cache(str(tmp_path), seed_dir=str(tmp_path / "no")) == 0

    def test_env_opt_in(self, tmp_path, monkeypatch):
        from speechlid_tpu.core.compile_cache import seed_cache

        seed = tmp_path / "s"
        cache = tmp_path / "c"
        seed.mkdir()
        cache.mkdir()
        (seed / "zz-cache").write_bytes(b"z")
        monkeypatch.setenv("SPEECHLID_CACHE_SEED_DIR", str(seed))
        assert seed_cache(str(cache)) == 1


class TestProfiler:
    def test_accumulates(self):
        rec = TimeCostRecoder()
        rec.remove_recoder()

        @register_cost_statistic()
        def slow():
            time.sleep(0.01)
            return 42

        assert slow() == 42
        snap = rec.snapshot()
        key = next(k for k in snap if "slow" in k)
        total, count = snap[key]
        assert count == 1 and total >= 0.01
        assert "slow" in rec.pretty_table()
        rec.remove_recoder()


class TestServeSELoad:
    """The real SE checkpoint-load path (serve.build_se_fn) for BOTH SE
    model types — a raw `(B, T)` model.init in serve once crashed
    FaSNet-TAC, whose input is (B, nmic, T); only the task contract knows
    the shaping."""

    @pytest.mark.parametrize("kw", [
        {"model_type": "dprnn", "enc_dim": 16, "win": 8, "chunk": 25,
         "n_blocks": 1, "hidden": 16},
        # ~49 s cold: fasnet_tac load covered slow; dprnn is the fast rep
        pytest.param(
            {"model_type": "fasnet_tac", "enc_dim": 16, "hidden": 16,
             "n_blocks": 1, "chunk": 50},
            marks=pytest.mark.slow),
    ])
    def test_build_se_fn_roundtrip(self, kw, tmp_path):
        import jax
        import jax.numpy as jnp

        from speechlid_tpu.cli.serve import build_se_fn
        from speechlid_tpu.core.checkpoint import save_checkpoint
        from speechlid_tpu.tasks.se import SETask

        task = SETask(lr=1e-3, **kw)
        v = task.init_variables(
            jax.random.PRNGKey(0), {"noisy": np.zeros((1, 16000), np.float32)}
        )
        ckpt = str(tmp_path / "se.ckpt")
        save_checkpoint(ckpt, {"params": v["params"]},
                        {"hyper_parameters": task.hyper_parameters})
        fn = build_se_fn(ckpt)
        wav = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
        out = fn(wav)
        assert out.shape == wav.shape and np.isfinite(out).all()
        # restored params must reproduce the in-memory task's output
        ref = np.asarray(task._apply(
            {"params": v["params"]}, jnp.asarray(wav[None]))[0])
        # jit-vs-jit graphs may fuse FFT correlations differently
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestServeHandlers:
    @pytest.fixture()
    def server(self):
        import threading

        from http.server import ThreadingHTTPServer

        from speechlid_tpu.cli.serve import InferenceState, make_handler

        def fake_lid(w, l):
            # serve-path contract: lid_fn returns ONLY the (B, L) score
            # matrix (cli/serve.py build_lid_fn); pred is host argmax
            import jax.numpy as jnp

            return jnp.asarray([[0.5, 0.2]])

        def fake_se(w):
            return w * 0.5

        state = InferenceState(fake_lid, fake_se, {0: "aa", 1: "bb"})
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        # device loop must run for requests; use a thread here (CPU tests)
        threading.Thread(target=state._device.run_forever,
                         daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def test_lid_endpoint(self, server):
        wav = np.random.RandomState(0).randn(16000).astype(np.float32)
        req = urllib.request.Request(
            server + "/lid", data=wav.tobytes(), method="POST"
        )
        out = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert out["lang"] == "aa"
        assert set(out["scores"]) == {"aa", "bb"}

    def test_se_endpoint(self, server):
        wav = np.ones(8000, np.float32)
        req = urllib.request.Request(
            server + "/se", data=wav.tobytes(), method="POST"
        )
        out = np.frombuffer(
            urllib.request.urlopen(req, timeout=30).read(), np.float32
        )
        assert out.shape == (8000,)

    def test_bad_body_400(self, server):
        req = urllib.request.Request(
            server + "/lid", data=b"abc", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

    def test_stats_endpoint(self, server):
        # after >=1 /lid request the phase percentiles must be populated
        wav = np.random.RandomState(0).randn(16000).astype(np.float32)
        req = urllib.request.Request(
            server + "/lid", data=wav.tobytes(), method="POST"
        )
        urllib.request.urlopen(req, timeout=30).read()
        out = json.loads(
            urllib.request.urlopen(server + "/stats", timeout=30).read()
        )
        for phase in ("pad", "queue", "device", "total"):
            assert out[phase]["n"] >= 1
            assert out[phase]["p50_ms"] >= 0.0
        assert out["bucket_hits"].get("1s", 0) >= 1
        assert out["packed_io"] is False

    def test_lid_packed_io(self):
        """Packed single-upload path: the (1, T+1) array must carry the
        true length in its trailing slot and route through lid_packed_fn."""
        import threading

        from speechlid_tpu.cli.serve import InferenceState

        seen = {}

        def fake_packed(p):
            import jax.numpy as jnp

            p = np.asarray(p)
            seen["shape"] = p.shape
            seen["length"] = int(p[0, -1])
            return jnp.asarray([[0.1, 0.9]])

        state = InferenceState(
            lid_fn=None, index2lang={0: "aa", 1: "bb"},
            lid_packed_fn=fake_packed,
        )
        threading.Thread(target=state._device.run_forever,
                         daemon=True).start()
        time.sleep(0.05)
        wav = np.random.RandomState(0).randn(12000).astype(np.float32)
        out = state.lid(wav)
        assert out["lang"] == "bb"
        # 12000 samples pad to the 1 s (16000) bucket, +1 packed slot
        assert seen["shape"] == (1, 16001)
        assert seen["length"] == 12000
        assert state.stats_summary()["packed_io"] is True

    def test_health(self, server):
        out = json.loads(
            urllib.request.urlopen(server + "/healthz", timeout=30).read()
        )
        assert out == {"status": "ok"}
