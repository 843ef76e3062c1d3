"""Optimizers & LR schedules (reference: ccml/optim/)."""

from speechlid_tpu.core.optim.novograd import novograd
from speechlid_tpu.core.optim.schedules import (
    ReduceLROnPlateau,
    cosine_annealing_warmup_restarts,
    tristage_schedule,
)
from speechlid_tpu.core.optim.factory import make_optimizer
from speechlid_tpu.core.optim.routed import RoutedAdamState, routed_adam
