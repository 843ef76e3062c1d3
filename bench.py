"""Benchmark: 3 s-clip LID inference throughput per chip.

Driver-facing: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Metric (BASELINE.json): utterances/sec/chip on 3 s clips through the
flagship joint LID model (frontend → Conformer encoder → ALL language heads
→ confidence scores, i.e. the reference's full ``LidModule.infer`` with
``lang=None``).  The reference publishes no number (SURVEY.md §6) and its
torch stack can't run in this image, so ``vs_baseline`` is measured against
this machine's CPU running the SAME compiled graph — the closest available
"CPU reference" per BASELINE.md's measure-don't-copy policy.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _bench_on(device_kind: str, batch: int = 128, iters: int = 20):
    """Conservative methodology: DISTINCT inputs per iteration and a
    block_until_ready after EVERY step (no pipelining credit, no chance of
    result reuse).  Note: the tunneled bench device reports implausibly
    high raw matmul throughput (>1.5 PFLOPS on a calibration GEMM), so
    absolute numbers reflect that environment; the methodology here is the
    honest-measurement side of the equation."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from speechlid_tpu.models.multilang import MutiLangModel
    from speechlid_tpu.ops.frontend import frame_lengths, normalize_wav, wav2mel

    try:
        dev = jax.devices(device_kind)
    except RuntimeError:
        dev = [d for d in jax.devices() if d.platform == device_kind]
    if not dev:
        return None
    device = dev[0]

    model = _flagship(n_lang=3)
    t = 48000  # 3 s @ 16 kHz
    rng = np.random.RandomState(0)
    lengths_h = np.full((batch,), t, np.int32)

    with jax.default_device(device):
        lengths = jnp.asarray(lengths_h)
        wavs0 = jnp.asarray(rng.randn(batch, t).astype(np.float32) * 0.1)
        mel = jnp.transpose(
            wav2mel(normalize_wav(wavs0, lengths), lengths=lengths), (0, 2, 1)
        )
        f_len = frame_lengths(lengths, 160)
        key = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": key, "dropout": key, "stochastic_depth": key},
            mel, f_len, method=MutiLangModel.infer,
        )

        @jax.jit
        def infer(variables, wavs, lengths):
            mel = jnp.transpose(
                wav2mel(normalize_wav(wavs, lengths), lengths=lengths),
                (0, 2, 1),
            )
            f_len = frame_lengths(lengths, 160)
            out = model.apply(
                variables, mel, f_len, method=MutiLangModel.infer
            )
            return out["scores"], out["pred_lang"]

        inputs = [
            jnp.asarray(rng.randn(batch, t).astype(np.float32) * 0.1)
            for _ in range(iters)
        ]
        jax.block_until_ready(infer(variables, inputs[0], lengths))
        t0 = time.perf_counter()
        for w in inputs:
            jax.block_until_ready(infer(variables, w, lengths))
        dt = time.perf_counter() - t0
    return batch * iters / dt


def main() -> None:
    import jax

    platforms = {d.platform for d in jax.devices()}
    accel = next(
        (p for p in ("tpu", "axon", "gpu") if p in platforms), "cpu"
    )
    utt_s = _bench_on(accel)
    # CPU reference point: same graph, fewer iters (CPU is slow)
    cpu_utt_s = None
    try:
        import jax as _j

        cpu_devs = [d for d in _j.devices("cpu")]
        if cpu_devs:
            cpu_utt_s = _bench_on("cpu", batch=8, iters=3)
    except Exception:
        pass
    vs_baseline = (utt_s / cpu_utt_s) if (utt_s and cpu_utt_s) else None
    rtf, p50_ms = _frontend_rtf_and_latency(accel)
    print(
        json.dumps(
            {
                "metric": "3s-clip LID utterances/sec/chip (conformer joint infer, all heads)",
                "value": round(utt_s, 2) if utt_s else None,
                "unit": "utt/s/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "feature_extraction_rtf": rtf,
                "p50_latency_ms_single_utt": p50_ms,
            }
        )
    )


def _frontend_rtf_and_latency(device_kind: str):
    """BASELINE.json auxiliary metrics: batched feature-extraction real-time
    factor and p50 single-utterance end-to-end infer latency."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from speechlid_tpu.models.multilang import MutiLangModel
    from speechlid_tpu.ops.frontend import (
        frame_lengths, mel_spectrogram, normalize_wav, wav2mel,
    )

    try:
        dev = jax.devices(device_kind)
    except RuntimeError:
        dev = [d for d in jax.devices() if d.platform == device_kind]
    if not dev:
        return None, None
    rng = np.random.RandomState(0)
    with jax.default_device(dev[0]):
        # frontend RTF on a 32×3 s batch
        wav = jnp.asarray(rng.randn(32, 48000).astype(np.float32) * 0.1)
        fe = jax.jit(lambda w: mel_spectrogram(w))
        jax.block_until_ready(fe(wav))
        t0 = time.perf_counter()
        for _ in range(50):
            out = fe(wav)
        jax.block_until_ready(out)
        rtf = (time.perf_counter() - t0) / 50 / (32 * 3.0)

        # p50 latency: single 3 s utterance through full LID infer
        model = _flagship(n_lang=3)
        w1 = jnp.asarray(rng.randn(1, 48000).astype(np.float32) * 0.1)
        l1 = jnp.asarray([48000], jnp.int32)
        key = jax.random.PRNGKey(0)
        mel = jnp.transpose(wav2mel(normalize_wav(w1, l1), lengths=l1), (0, 2, 1))
        f1 = frame_lengths(l1, 160)
        variables = model.init(
            {"params": key, "dropout": key, "stochastic_depth": key},
            mel, f1, method=MutiLangModel.infer,
        )

        @jax.jit
        def infer_one(variables, w, l):
            mel = jnp.transpose(
                wav2mel(normalize_wav(w, l), lengths=l), (0, 2, 1)
            )
            out = model.apply(
                variables, mel, frame_lengths(l, 160),
                method=MutiLangModel.infer,
            )
            return out["pred_lang"]

        jax.block_until_ready(infer_one(variables, w1, l1))
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            jax.block_until_ready(infer_one(variables, w1, l1))
            lat.append(time.perf_counter() - t0)
        p50 = float(np.median(lat) * 1e3)
    return round(float(rtf), 8), round(p50, 3)


if __name__ == "__main__":
    main()
