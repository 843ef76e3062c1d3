"""Checkpoint serialization: one file = msgpack of {state, meta}.

Replaces the reference's ``torch.save`` dict checkpoints
(ccml/callbacks/ckpt_callback.py:76-93: model + hyper_parameters + epoch +
optimizer + scaler + lr_scheduler + logger state).  Pytrees (params,
model_state, opt_state) are flattened with flax.serialization; host metadata
(epoch, hparams, logger counters, plateau state) rides in ``meta``.

Restoring needs a template TrainState (the functional analog of
``load_state_dict``): build the fresh state first, then
``restore_state(template, payload)``.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

_pending_writes: list = []


def save_checkpoint(
    path: str, state: Any, meta: Optional[Dict] = None,
    async_write: bool = False,
) -> None:
    """Write {state, meta} as msgpack.  With ``async_write`` the D2H fetch
    happens synchronously (so training can donate/overwrite device buffers)
    but serialization + disk I/O run on a background thread — the
    orbax-async analog (SURVEY.md §5.4); call :func:`wait_for_checkpoints`
    before process exit."""
    payload = {
        "state": serialization.to_state_dict(jax.device_get(state)),
        "meta": meta or {},
    }

    def write():
        data = serialization.msgpack_serialize(payload)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    if async_write:
        t = threading.Thread(target=write, daemon=True)
        t.start()
        _pending_writes.append(t)
        # opportunistic reaping
        _pending_writes[:] = [w for w in _pending_writes if w.is_alive()]
    else:
        write()


def wait_for_checkpoints() -> None:
    """Block until all async checkpoint writes have landed."""
    for t in list(_pending_writes):
        t.join()
    _pending_writes.clear()


def load_checkpoint(path: str) -> Dict:
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_state(template: Any, payload: Dict) -> Any:
    """Rehydrate a TrainState (or any pytree) from a loaded payload."""
    return serialization.from_state_dict(template, payload["state"])


def restore_params(template_params: Any, payload: Dict) -> Any:
    """Load only model params (inference restore path, reference
    ccml_module.py:165-168)."""
    return serialization.from_state_dict(
        template_params, payload["state"]["params"]
    )
