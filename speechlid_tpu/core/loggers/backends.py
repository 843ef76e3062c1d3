"""Logger backends (reference: ccml/loggers/{wandb,comet,tensorboard}_logger.py).

wandb / comet / tensorboard are optional in this image — each backend
degrades to a no-op with a warning if its package is missing.  JsonlLogger
is the always-available durable record (one JSON object per log call).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

from speechlid_tpu.core.loggers.base import BaseLogger


class ConsoleLogger(BaseLogger):
    def __init__(self, level: int = logging.INFO) -> None:
        self.level = level

    def log(self, data: Dict[str, Any], step: int) -> None:
        msg = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in data.items()
        )
        logging.log(self.level, "[step %d] %s", step, msg)


class JsonlLogger(BaseLogger):
    def __init__(self, path: str = "exp/metrics.jsonl") -> None:
        self.path = path
        self._fh = None

    def init(self, run_name: str, config: Optional[Dict] = None) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        self._fh = open(self.path, "a")
        self._fh.write(
            json.dumps({"run": run_name, "config": config, "ts": time.time()})
            + "\n"
        )

    def log(self, data: Dict[str, Any], step: int) -> None:
        if self._fh is None:
            self.init("default")
        rec = {"step": step, "ts": time.time()}
        for k, v in data.items():
            try:  # scalars (incl. 0-d arrays); arrays → lists; else repr
                rec[k] = float(v)
            except (TypeError, ValueError):
                tolist = getattr(v, "tolist", None)
                rec[k] = tolist() if tolist else v
        try:
            self._fh.write(json.dumps(rec) + "\n")
        except TypeError:  # some non-serializable metric: degrade, don't die
            rec = {k: (v if isinstance(v, (int, float, str, list, dict))
                       else repr(v)) for k, v in rec.items()}
            self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def finish(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


class TensorboardLogger(BaseLogger):
    """Per-metric step counters that survive resume via state_dict
    (reference tensorboard_logger.py:36-54)."""

    def __init__(self, log_dir: str = "exp/tb") -> None:
        self.log_dir = log_dir
        self._writer = None
        self._steps: Dict[str, int] = {}

    def init(self, run_name: str, config: Optional[Dict] = None) -> None:
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(os.path.join(self.log_dir, run_name))
        except Exception as e:  # tensorboard not installed
            logging.warning("TensorboardLogger disabled: %s", e)

    def log(self, data: Dict[str, Any], step: int) -> None:
        if self._writer is None:
            return
        for k, v in data.items():
            self._steps[k] = self._steps.get(k, 0) + 1
            try:
                self._writer.add_scalar(k, float(v), self._steps[k])
            except (TypeError, ValueError):
                pass

    def state_dict(self) -> Dict:
        return {"steps": dict(self._steps)}

    def load_state_dict(self, state: Dict) -> None:
        self._steps = dict(state.get("steps", {}))

    def finish(self) -> None:
        if self._writer:
            self._writer.close()


class CometLogger(BaseLogger):
    """comet_ml backend (reference ccml/loggers/comet_logger.py) — no-op
    when the package is absent."""

    def __init__(self, project: str = "speechlid_tpu", **kwargs) -> None:
        self.project = project
        self.kwargs = kwargs
        self._exp = None

    def init(self, run_name: str, config: Optional[Dict] = None) -> None:
        try:
            import comet_ml

            self._exp = comet_ml.Experiment(
                project_name=self.project, **self.kwargs
            )
            self._exp.set_name(run_name)
            if config:
                self._exp.log_parameters(config)
        except Exception as e:
            logging.warning("CometLogger disabled: %s", e)

    def log(self, data, step: int) -> None:
        if self._exp is not None:
            import numpy as _np

            self._exp.log_metrics(
                {k: v for k, v in data.items() if _np.isscalar(v)}, step=step
            )

    def finish(self) -> None:
        if self._exp is not None:
            self._exp.end()


class WandbLogger(BaseLogger):
    def __init__(self, project: str = "speechlid_tpu", **kwargs) -> None:
        self.project = project
        self.kwargs = kwargs
        self._run = None

    def init(self, run_name: str, config: Optional[Dict] = None) -> None:
        try:
            import wandb

            self._run = wandb.init(
                project=self.project, name=run_name, config=config, **self.kwargs
            )
        except Exception as e:
            logging.warning("WandbLogger disabled: %s", e)

    def log(self, data: Dict[str, Any], step: int) -> None:
        if self._run is not None:
            self._run.log(data, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
