"""Per-head confidence diagnostic for a trained supervised LID checkpoint.

For each val utterance: every head's (confidence score, non-blank evidence
frame count, greedy decode) plus the true label — quantifies WHY the raw
confidence argmax mispredicts (e.g. a wrong-language head decoding the
few shared-alphabet tones at high per-frame confidence outranking the
true head's many-token decode; the reference formula averages only over
non-blank frames, WavLMMutiLangModel.py:410-427, so evidence COUNT does
not weigh in).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/score_diagnostic.py <root>
where <root> is a trained_lid_artifact work root (corpus + conf/ + exp/).
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    root = sys.argv[1]
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from speechlid_tpu.core import load_config
    from speechlid_tpu.core.checkpoint import load_checkpoint, restore_params
    from speechlid_tpu.cli.main_lid import build_data, build_feeder
    from speechlid_tpu.tasks import LidASRTask

    conf = load_config(os.path.join(root, "conf"), "trained_lid")
    data = build_data(conf)
    ckpt = os.path.join(root, "exp", "ckpt", "last.ckpt")
    payload = load_checkpoint(ckpt)
    hparams = dict(payload["meta"].get("hyper_parameters", {}))
    module_conf = conf.module.to_dict()
    module_conf.pop("task", None)
    hparams.update(module_conf)
    task = LidASRTask(tokenizers=data["tokenizers"], **hparams)

    feeder = build_feeder(conf, data["val_dataset"] or data["dataset"],
                          train=False)
    sample = next(iter(feeder))
    variables = task.init_variables(jax.random.PRNGKey(0), sample)
    params = restore_params(variables["params"], payload)
    model_state = payload["state"].get("model_state") or {}
    restored = {"params": params}
    for k, v in variables.items():
        if k != "params":
            restored[k] = serialization.from_state_dict(
                v, model_state.get(k, serialization.to_state_dict(v)))

    infer = jax.jit(task.infer_fn())
    blank = int(max(task.vocab_sizes))
    index2lang = task.index2lang

    n = n_ok = 0
    confusion = Counter()
    # margin + evidence stats: mean evidence frames for true vs wrong heads,
    # true-head rank distribution
    ev_true, ev_wrong_top = [], []
    margins = []
    examples = []
    for batch in feeder:
        out = infer(restored, jnp.asarray(batch["wavs"]),
                    jnp.asarray(batch["wav_lengths"]))
        scores = np.asarray(out["scores"])          # (B, L)
        logits = np.asarray(out["logits"])          # (L, B, T, V+1)
        feat_lens = np.asarray(out["feat_lengths"])
        nv = int(batch.get("n_valid", 0)) or len(scores)
        am = logits.argmax(-1)                      # (L, B, T)
        for i in range(nv):
            t_ok = np.arange(am.shape[2]) < int(feat_lens[i])
            cnts = ((am[:, i, :] != blank) & t_ok).sum(-1)   # (L,)
            true = int(batch["langs"][i])
            pred = int(scores[i].argmax())
            srt = np.sort(scores[i])
            margins.append(float(srt[-1] - srt[-2]))
            ev_true.append(int(cnts[true]))
            wrong = [c for li, c in enumerate(cnts) if li != true]
            ev_wrong_top.append(int(max(wrong)))
            n += 1
            n_ok += int(pred == true)
            confusion[(index2lang[true], index2lang[pred])] += 1
            if pred != true and len(examples) < 10:
                decs = {}
                for li in range(len(task.vocab_sizes)):
                    lg = index2lang[li]
                    decs[lg] = task.tokenizers[lg].ctc_decode(
                        am[li, i:i + 1], [int(feat_lens[i])],
                        blank_id=blank)[0]
                examples.append({
                    "true": index2lang[true], "pred": index2lang[pred],
                    "scores": [round(float(s), 4) for s in scores[i]],
                    "evidence_frames": cnts.tolist(),
                    "decodes": decs,
                })
    print(json.dumps({
        "acc_raw_argmax": n_ok / max(n, 1), "n": n,
        "mean_evidence_frames_true_head": float(np.mean(ev_true)),
        "mean_evidence_frames_best_wrong_head": float(np.mean(ev_wrong_top)),
        "median_top2_margin": float(np.median(margins)),
        "frac_margin_lt_0.15": float(np.mean(np.asarray(margins) < 0.15)),
        "confusion": {f"{a}->{b}": c for (a, b), c in confusion.items()},
        "examples": examples,
    }, indent=1))


if __name__ == "__main__":
    main()
