"""Metric logging (reference: ccml/loggers/)."""

from speechlid_tpu.core.loggers.base import BaseLogger
from speechlid_tpu.core.loggers.multiplexer import Logger
from speechlid_tpu.core.loggers.backends import (
    CometLogger,
    ConsoleLogger,
    JsonlLogger,
    TensorboardLogger,
    WandbLogger,
)
