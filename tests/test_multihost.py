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
