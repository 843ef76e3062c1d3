"""Core training framework (TPU-native rebuild of the reference's ccml/).

The reference ccml is a mutable-state epoch/step Trainer around torch DDP
(`ccml/trainer.py`). Here the equivalent is a functional core:

- :class:`speechlid_tpu.core.state.TrainState` — immutable pytree carrying
  params / opt_state / step / rng (+ optional EMA/SWA average).
- :class:`speechlid_tpu.core.module.TaskModule` — the user contract
  (reference: `ccml/ccml_module.py`): build model, loss, metrics, optimizer.
- :class:`speechlid_tpu.core.trainer.Trainer` — host-side epoch loop driving
  a single jitted train step; callbacks fire on host at step/epoch
  boundaries on already-materialised metric dicts.
"""

from speechlid_tpu.core.seed import seed_everything
from speechlid_tpu.core.profile import TimeCostRecoder, register_cost_statistic
from speechlid_tpu.core.cache import cacheable, TimeUnit
from speechlid_tpu.core.config import load_config, ConfigDict
from speechlid_tpu.core.state import TrainState
from speechlid_tpu.core.module import TaskModule
from speechlid_tpu.core.trainer import Trainer
from speechlid_tpu.core.checkpoint import (
    load_checkpoint,
    restore_params,
    restore_state,
    save_checkpoint,
)
