"""Logger multiplexer: fan metric dicts out to N backends, process-0 gated,
with train-interval throttling and checkpointable per-key step counters
(reference: ccml/loggers/logger.py:9-135)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax

from speechlid_tpu.core.loggers.base import BaseLogger


class Logger:
    def __init__(
        self,
        backends: Optional[Sequence[BaseLogger]] = None,
        train_interval: int = 1,
        rank0_only: bool = True,
    ) -> None:
        self.backends: List[BaseLogger] = list(backends or [])
        self.train_interval = train_interval
        self.rank0_only = rank0_only
        self._counts: Dict[str, int] = {}  # per-key log-call counters

    def _gated(self) -> bool:
        return self.rank0_only and jax.process_index() != 0

    def init(self, run_name: str, config: Optional[Dict] = None) -> None:
        if self._gated():
            return
        for b in self.backends:
            b.init(run_name, config)

    def log(
        self, data: Dict[str, Any], step: int, is_train: bool = False
    ) -> None:
        """Throttle train-time keys to every ``train_interval`` calls
        (logger.py:32-58)."""
        if self._gated() or not data:
            return
        out = {}
        for k, v in data.items():
            self._counts[k] = self._counts.get(k, 0) + 1
            if is_train and self.train_interval > 1:
                if (self._counts[k] - 1) % self.train_interval != 0:
                    continue
            out[k] = v
        if not out:
            return
        for b in self.backends:
            b.log(out, step)

    def watch_model(self, params) -> None:
        if self._gated():
            return
        for b in self.backends:
            b.watch_model(params)

    def remove_key(self, keys: Sequence[str]) -> None:
        for k in keys:
            self._counts.pop(k, None)

    def state_dict(self) -> Dict:
        return {
            "counts": dict(self._counts),
            "backends": [b.state_dict() for b in self.backends],
        }

    def load_state_dict(self, state: Dict) -> None:
        self._counts = dict(state.get("counts", {}))
        for b, s in zip(self.backends, state.get("backends", [])):
            b.load_state_dict(s)

    def finish(self) -> None:
        if self._gated():
            return
        for b in self.backends:
            b.finish()
