"""Callback base (reference: ccml/train_callback.py:6-41).

Hooks fire on the host at step/epoch boundaries with materialized metric
dicts; the Trainer dispatches by direct method call (the reference used a
string-``eval`` dispatcher, ccml/trainer.py:750-760 — dropped as unsafe)."""

from __future__ import annotations

from typing import Dict, List, Optional


class Callback:
    interval: int = 1  # epochs between activations (reference Callback.interval)

    def __init__(self, interval: int = 1) -> None:
        self.interval = interval
        self.trainer = None

    def add_trainer(self, trainer) -> None:
        self.trainer = trainer

    # lifecycle hooks (names match the reference)
    def before_train_epoch(self, epoch: int) -> None: ...

    def after_train_loop(self, step: int, metrics: Dict) -> None: ...

    def after_train_epoch(self, epoch: int, metrics: Dict) -> None: ...

    def after_eval_loop(self, metrics: Dict) -> None: ...

    def after_eval_epoch(self, epoch: int, metrics: Dict) -> None: ...

    def test_loop_end(self, metrics: Dict) -> None: ...
