"""Train-time waveform augmentation applied at batch-assembly time.

Rebuild of the reference's ``wav_augment`` chain (lid/audio_processor.py:
125-167: dither → preemphasis → sox speed {0.9,1,1.1} → sox pitch
±{20..80} cents → WavAugment reverb), recast for static shapes: the feeder
picks this batch's (speed, pitch, reverb) variant with host RNG, then runs
the corresponding jitted device graph — a bounded set of compiled programs
(3 speeds × pitch set × reverb on/off) shared across epochs.

SpecAugment stays inside the task's jitted step (frequency/time masks are
shape-static); only the variant *choice* lives here.
"""

from __future__ import annotations

import functools
import random
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechlid_tpu.ops.augment import (
    dither,
    fir_reverb,
    pitch_shift,
    synthetic_rir,
)
from speechlid_tpu.ops.frontend import preemphasis
from speechlid_tpu.ops.resample import speed_perturb

SPEEDS = (0.9, 1.0, 1.1)
PITCH_CENTS = (-80, -60, -40, -20, 0, 0, 20, 40, 60, 80)


class WavAugmentor:
    def __init__(
        self,
        sample_rate: int = 16000,
        speed: bool = False,
        pitch: bool = False,
        reverb: bool = False,
        use_dither: bool = True,
        use_preemphasis: bool = True,
        reverb_prob: float = 0.5,
        seed: int = 0,
        device: str = "cpu",
    ):
        # default to HOST CPU execution: augmentation is cheap, runs inside
        # the prefetch thread overlapping TPU compute (like the reference's
        # DataLoader-worker sox chain), and avoids one TPU compile per
        # (speed, pitch, reverb) variant — on remote-compile TPU setups that
        # compile storm stalls the first epoch for minutes.
        try:
            self._device = jax.devices(device)[0]
        except RuntimeError:
            self._device = jax.devices()[0]
        self.sample_rate = sample_rate
        self.speed = speed
        self.pitch = pitch
        self.reverb = reverb
        self.use_dither = use_dither
        self.use_preemphasis = use_preemphasis
        self.reverb_prob = reverb_prob
        self.rng = random.Random(seed)
        self._key = jax.random.PRNGKey(seed)

    @functools.lru_cache(maxsize=None)
    def _graph(self, t: int, speed: float, cents: int, reverb: bool):
        sr = self.sample_rate
        use_dither = self.use_dither
        use_preemph = self.use_preemphasis

        @jax.jit
        def fn(key, wavs):
            k1, k2 = jax.random.split(key)
            x = wavs
            if use_dither:
                x = dither(k1, x)
            if use_preemph:
                x = preemphasis(x)
            if speed != 1.0:
                x = speed_perturb(x, sr, speed, output_len=t)
            if cents != 0:
                x = pitch_shift(x, sr, float(cents))
            if reverb:
                rir = synthetic_rir(k2, sr, rt60=0.3)
                x = fir_reverb(x, rir)
            return x

        return fn

    def __call__(
        self, wavs: np.ndarray, lengths: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        t = wavs.shape[1]
        speed = self.rng.choice(SPEEDS) if self.speed else 1.0
        cents = self.rng.choice(PITCH_CENTS) if self.pitch else 0
        use_reverb = self.reverb and self.rng.random() < self.reverb_prob
        with jax.default_device(self._device):
            self._key, sub = jax.random.split(self._key)
            out = np.asarray(
                self._graph(t, speed, int(cents), bool(use_reverb))(
                    sub, jnp.asarray(wavs)
                )
            )
        if speed != 1.0:
            lengths = np.minimum(
                (lengths / speed).astype(np.int32), t
            )
        return out, lengths
