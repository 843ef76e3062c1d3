"""Logger backend interface (reference: ccml/loggers/base_logger.py)."""

from __future__ import annotations

from typing import Any, Dict, Optional


class BaseLogger:
    def init(self, run_name: str, config: Optional[Dict] = None) -> None: ...

    def log(self, data: Dict[str, Any], step: int) -> None:
        raise NotImplementedError

    def watch_model(self, params) -> None: ...

    def state_dict(self) -> Dict:
        return {}

    def load_state_dict(self, state: Dict) -> None: ...

    def finish(self) -> None: ...
