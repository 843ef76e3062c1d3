"""Multi-host wrapper arg plumbing + LM corpus prep CLI
(VERDICT r1: §2.5 multi-host row was unverified; lm prep was manual)."""

import os

import pytest

from speechlid_tpu.parallel.mesh import initialize_multihost


class TestInitializeMultihost:
    """Can't rendezvous for real on one host — assert the wrapper forwards
    exactly the reference (init_method, world_size, rank) triple analogs to
    ``jax.distributed.initialize`` (ccml/trainer.py:67-80 semantics)."""

    def test_forwards_explicit_triple(self, monkeypatch):
        seen = {}

        def fake_init(**kwargs):
            seen.update(kwargs)

        import jax.distributed

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        initialize_multihost("10.0.0.1:8476", num_processes=4, process_id=2)
        assert seen == {
            "coordinator_address": "10.0.0.1:8476",
            "num_processes": 4,
            "process_id": 2,
        }

    def test_autodetect_passes_nothing(self, monkeypatch):
        seen = {"called": False}

        def fake_init(**kwargs):
            seen["called"] = True
            assert kwargs == {}

        import jax.distributed

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        initialize_multihost()
        assert seen["called"]


_WORKER_SRC = '''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from speechlid_tpu.parallel.mesh import initialize_multihost
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
initialize_multihost(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
assert jax.process_count() == nproc
devs, local = jax.devices(), jax.local_devices()
mesh = Mesh(np.asarray(devs).reshape(-1), ("data",))
x = jnp.ones((len(local), 4)) * (pid + 1)
arr = jax.make_array_from_single_device_arrays(
    (len(devs), 4), NamedSharding(mesh, P("data")),
    [jax.device_put(x[i:i + 1], d) for i, d in enumerate(local)])
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(arr)
print(f"RESULT {pid} {len(devs)} {float(total)}", flush=True)
'''


class TestMultiProcessRendezvous:
    def test_two_process_collective(self, tmp_path):
        """REAL multi-process rendezvous on one host: 2 processes × 2
        virtual CPU devices each, `jax.distributed.initialize` over
        127.0.0.1 (the reference's env:// MASTER_ADDR/PORT analog,
        ccml/trainer.py:67-80 / mnist/main.py:89-90 mp.spawn), then one
        cross-process collective sum over the global mesh."""
        import socket
        import subprocess
        import sys

        worker = tmp_path / "worker.py"
        worker.write_text(_WORKER_SRC)
        with socket.socket() as s:  # free port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in (
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                env.get("PYTHONPATH", ""),
            ) if p and "axon" not in p
        )
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", str(port)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=240) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-2000:]
        results = [
            ln for out, _ in outs for ln in out.splitlines()
            if ln.startswith("RESULT")
        ]
        assert len(results) == 2
        for ln in results:
            _, pid, ndev, total = ln.split()
            assert ndev == "4"  # 2 procs × 2 local devices, global view
            # rows: procs 0,1 contribute (pid+1)·ones(2,4) → Σ = 24
            assert float(total) == 24.0


_METRIC_WORKER_SRC = '''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from speechlid_tpu.parallel.mesh import initialize_multihost
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
initialize_multihost(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
import numpy as np
from speechlid_tpu.metrics import Accuracy, CAvg, CharErrorRate, EER

rng = np.random.RandomState(0)
N, L = 40, 3
scores = rng.rand(N, L)
targets = rng.randint(0, L, size=N)
texts = ["hello world", "speech lid", "quick brown fox", "jumps over"]
hyps = ["hello word", "speech lid", "quick crown fox", "jump over"]
# UNEVEN shard split: proc 0 gets 24 trials, proc 1 gets 16
cut = 24
sl = slice(0, cut) if pid == 0 else slice(cut, N)
tsl = slice(0, 3) if pid == 0 else slice(3, 4)

eer, cavg, acc, cer = EER(L), CAvg(L), Accuracy(), CharErrorRate()
eer.update(scores[sl], targets[sl])
cavg.update(scores[sl], targets[sl])
acc.update(scores[sl], targets[sl])
cer.update(hyps[tsl], texts[tsl])
for m in (eer, cavg, acc, cer):
    m.sync()
# per-batch losses are also uneven per process: the checkpoint-monitor
# avg_val_loss must be the GLOBAL mean (tasks/lid_asr.py val_loop_end)
from speechlid_tpu.metrics.dist import allreduce_sum_counts
losses = [1.0, 2.0, 3.0] if pid == 0 else [10.0]
ls, ln_ = allreduce_sum_counts(float(np.sum(losses)), len(losses))
print(f"RESULT {pid} {eer.compute():.12f} {cavg.compute():.4f} "
      f"{acc.compute():.12f} {cer.compute():.12f} {ls / ln_:.12f}",
      flush=True)
'''


class TestMultiProcessMetricSync:
    def test_two_process_metric_state_equals_single_process(self, tmp_path):
        """VERDICT-r2 item 4 (reference lid/eer.py:47-48,74
        dist_reduce_fx="cat"): two processes each score an UNEVEN shard of
        a synthetic trial set; after ``sync()`` every process's
        EER/CAvg/accuracy/CER must equal the single-process values on the
        full set exactly."""
        import socket
        import subprocess
        import sys

        import numpy as np

        from speechlid_tpu.metrics import Accuracy, CAvg, CharErrorRate, EER

        worker = tmp_path / "metric_worker.py"
        worker.write_text(_METRIC_WORKER_SRC)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in (
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                env.get("PYTHONPATH", ""),
            ) if p and "axon" not in p
        )
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", str(port)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=240) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-2000:]
        results = [
            ln for out, _ in outs for ln in out.splitlines()
            if ln.startswith("RESULT")
        ]
        assert len(results) == 2

        # single-process ground truth on the full set (same synthetic data)
        rng = np.random.RandomState(0)
        N, L = 40, 3
        scores = rng.rand(N, L)
        targets = rng.randint(0, L, size=N)
        texts = ["hello world", "speech lid", "quick brown fox", "jumps over"]
        hyps = ["hello word", "speech lid", "quick crown fox", "jump over"]
        eer, cavg, acc, cer = EER(L), CAvg(L), Accuracy(), CharErrorRate()
        eer.update(scores, targets)
        cavg.update(scores, targets)
        acc.update(scores, targets)
        cer.update(hyps, texts)
        expect = (
            f"{eer.compute():.12f} {cavg.compute():.4f} "
            f"{acc.compute():.12f} {cer.compute():.12f} "
            f"{np.mean([1.0, 2.0, 3.0, 10.0]):.12f}"
        )
        for ln in results:
            assert ln.split(None, 2)[2] == expect


_TRAIN_WORKER_SRC = '''
"""4-process sharded-training worker (or 1-process ground truth).

mode=dist: rendezvous 4 procs x 1 CPU device -> 2x2 (data, model) mesh,
dp batch sharding + tp (Megatron conformer rules) + ep (stacked language
heads) param sharding; 3 train steps, checkpoint (gather-to-replicated,
rank-0 writes, barrier), restore into FRESH sharded state, 2 more steps.
mode=local: same program on 4 local devices of one process, NO checkpoint
-- the uninterrupted trajectory the dist run must reproduce exactly.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

mode, port, ckpt_dir = sys.argv[1], sys.argv[2], sys.argv[3]
if mode == "dist":
    pid, nproc = int(sys.argv[4]), 4
    from speechlid_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(f"127.0.0.1:{port}", num_processes=nproc,
                         process_id=pid)
else:
    pid = 0

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from __graft_entry__ import _flagship
from speechlid_tpu.models.multilang import MutiLangModel
from speechlid_tpu.ops.ctc import ctc_loss
from speechlid_tpu.parallel.sharding import (
    CONFORMER_TP_RULES, EP_RULES, make_param_sharder)
from speechlid_tpu.core.checkpoint import load_checkpoint, save_checkpoint

devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
mesh = Mesh(devs, ("data", "model"))
B, T, V, NLANG = 8, 64, 8, 4
model = _flagship(n_lang=NLANG, tiny=True)
rng = jax.random.PRNGKey(0)
variables = model.init(
    {"params": rng, "dropout": rng},
    jnp.zeros((2, T, 80), jnp.float32) + 1e-3,
    jnp.full((2,), T, jnp.int32), method=MutiLangModel.infer)
# host numpy before cross-process placement
params = jax.device_get(variables["params"])
batch_stats = jax.device_get(variables.get("batch_stats", {}))
tx = optax.adam(1e-3)
opt_state = jax.tree_util.tree_map(np.asarray, jax.device_get(
    tx.init(params)))

shard = make_param_sharder(mesh, CONFORMER_TP_RULES + EP_RULES)


def shard_state(p, o, bs):
    p = shard(p)
    o = jax.tree_util.tree_map(
        lambda l: shard({"x": np.asarray(l)})["x"],
        o, is_leaf=lambda l: hasattr(l, "shape"))
    bs = jax.device_put(bs, NamedSharding(mesh, P()))
    return p, o, bs


params, opt_state, batch_stats = shard_state(params, opt_state, batch_stats)
repl = NamedSharding(mesh, P())
dsh = NamedSharding(mesh, P("data"))


def put_batch(i):
    r = np.random.RandomState(1000 + i)
    mel = r.randn(B, T, 80).astype(np.float32) * 0.1
    texts = r.randint(0, V, (B, 6)).astype(np.int32)
    langs = r.randint(0, NLANG, (B,)).astype(np.int32)

    def mk(x):
        return jax.make_array_from_callback(x.shape, dsh,
                                            lambda idx: x[idx])

    return mk(mel), mk(texts), mk(langs)


flens = jnp.full((B,), T, jnp.int32)
tlens = jnp.full((B,), 6, jnp.int32)


def loss_fn(params, batch_stats, mel, texts, langs):
    (logits, feat_lens), mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        mel, flens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(7)}, mutable=["batch_stats"])
    own = jnp.take_along_axis(logits, langs[None, :, None, None], axis=0)[0]
    lp = jax.nn.log_softmax(own, axis=-1)
    return (ctc_loss(lp, texts, feat_lens, tlens, blank=-1,
                     reduction="none").mean(), mut["batch_stats"])


@jax.jit
def step(params, opt_state, batch_stats, mel, texts, langs):
    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch_stats, mel, texts, langs)
    updates, opt_state = tx.update(grads, opt_state, params)
    return (optax.apply_updates(params, updates), opt_state, new_bs, loss)


gather = jax.jit(lambda t: t, out_shardings=repl)
losses = []
for i in range(3):
    params, opt_state, batch_stats, loss = step(
        params, opt_state, batch_stats, *put_batch(i))
    losses.append(float(np.asarray(jax.device_get(gather(loss)))))

if mode == "dist":
    host_state = jax.device_get({
        "params": gather(params), "opt_state": gather(opt_state),
        "batch_stats": gather(batch_stats)})
    path = os.path.join(ckpt_dir, "mh4.ckpt")
    if jax.process_index() == 0:
        save_checkpoint(path, host_state)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ckpt_written")
    from flax import serialization
    payload = load_checkpoint(path)["state"]
    restored = serialization.from_state_dict(host_state, payload)
    params, opt_state, batch_stats = shard_state(
        restored["params"], restored["opt_state"], restored["batch_stats"])

for i in range(3, 5):
    params, opt_state, batch_stats, loss = step(
        params, opt_state, batch_stats, *put_batch(i))
    losses.append(float(np.asarray(jax.device_get(gather(loss)))))

print("LOSSES", pid, " ".join(f"{l:.6f}" for l in losses), flush=True)
'''


@pytest.mark.slow
class TestFourProcessShardedTraining:
    def test_2x2_mesh_tp_ep_ckpt_restore_matches_single_process(
        self, tmp_path
    ):
        """VERDICT-r3 item 8: four processes rendezvous into a 2x2
        (data x model) mesh and train a tiny joint-LID model with dp batch
        sharding composed with tp (Megatron conformer rules) and ep
        (expert-sharded language heads); mid-run the sharded state is
        checkpointed (gather -> rank-0 write -> barrier) and RESTORED into
        fresh sharded arrays before continuing.  The full 5-step loss
        trajectory must match a single-process, no-checkpoint run of the
        same program — proving dist parity AND restore continuity at once.
        (reference analog: ccml/trainer.py:358-380 DDP rendezvous +
        resume_from)."""
        import socket
        import subprocess
        import sys

        import numpy as np

        worker = tmp_path / "train_worker.py"
        worker.write_text(_TRAIN_WORKER_SRC)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        def env_with(n_dev):
            env = dict(os.environ)
            env.pop("JAX_PLATFORMS", None)
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={n_dev}"
            )
            env["PYTHONPATH"] = os.pathsep.join(
                p for p in (repo, env.get("PYTHONPATH", ""))
                if p and "axon" not in p
            )
            return env

        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), "dist", str(port),
                 str(tmp_path), str(i)],
                env=env_with(1), stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            )
            for i in range(4)
        ]
        # single-process ground truth runs AFTER the fleet (this box has
        # one core; overlapping five compiles thrashes it)
        outs = [p.communicate(timeout=1500) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-2500:]
        local = subprocess.run(
            [sys.executable, str(worker), "local", "0", str(tmp_path)],
            env=env_with(4), capture_output=True, text=True, timeout=900,
        )
        assert local.returncode == 0, local.stderr[-2500:]

        def losses_of(text):
            for ln in text.splitlines():
                if ln.startswith("LOSSES"):
                    return [float(x) for x in ln.split()[2:]]
            raise AssertionError(f"no LOSSES line in: {text[-500:]}")

        want = losses_of(local.stdout)
        assert len(want) == 5
        for p, (out, _) in zip(procs, outs):
            got = losses_of(out)
            # different partitionings reduce in different orders; restore
            # roundtrips exact msgpack bytes, so tolerances stay tight
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


class TestPrepareText:
    def test_prepares_splits_and_vocab(self, tmp_path):
        from speechlid_tpu.cli.prepare_text import main

        root = tmp_path / "wikitext"
        root.mkdir()
        lines = [
            " = Heading = ",  # filtered: heading
            "",  # filtered: blank
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "tiny",  # filtered: < min_words
        ]
        (root / "wiki.train.raw").write_text("\n".join(lines))
        (root / "wiki.valid.raw").write_text(
            "sphinx of black quartz judge my vow\n"
        )
        out = tmp_path / "out"
        main(["--root", str(root), "--out", str(out)])
        train = (out / "train.txt").read_text().splitlines()
        assert len(train) == 2
        assert (out / "valid.txt").exists()
        assert not (out / "test.txt").exists()  # split absent → skipped
        vocab = (out / "vocab.txt").read_text().splitlines()
        assert "fox" in vocab and "jugs" in vocab

    def test_missing_train_raises(self, tmp_path):
        from speechlid_tpu.cli.prepare_text import main

        with pytest.raises(FileNotFoundError, match="no egress"):
            main(["--root", str(tmp_path), "--out", str(tmp_path / "o")])
