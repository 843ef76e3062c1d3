"""Trainer lifecycle callbacks (reference: ccml/train_callback.py,
ccml/callbacks/)."""

from speechlid_tpu.core.callbacks.base import Callback
from speechlid_tpu.core.callbacks.ckpt import CkptCallback
from speechlid_tpu.core.callbacks.lr import LrCallback
from speechlid_tpu.core.callbacks.profiler import ProfileCallback
