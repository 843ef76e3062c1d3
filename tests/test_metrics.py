"""Metric parity tests: EER vs sklearn+scipy (the reference's exact recipe,
lid/eer.py:33-36), Cavg vs an independent loop implementation of the
published Kaldi/Tsinghua formula, CER/WER vs hand-computed cases."""

import numpy as np
import pytest
from scipy.interpolate import interp1d
from scipy.optimize import brentq
from sklearn.metrics import roc_curve as sk_roc_curve

from speechlid_tpu.metrics import (
    Accuracy,
    CAvg,
    CharErrorRate,
    EER,
    WordErrorRate,
    compute_cavg,
    compute_eer,
    edit_distance,
)
from speechlid_tpu.metrics.eer import roc_curve


def _reference_eer(labels, scores):
    fpr, tpr, _ = sk_roc_curve(labels, scores)
    return brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0, 1.0)


def _loop_cavg(pairs, lang_num, bins=20, p_target=0.5):
    """Independent straight-loop implementation of the published formula."""
    scores = [p[2] for p in pairs]
    mn, mx = min(scores), max(scores)
    step = (mx - mn) / bins
    cavgs = []
    for s in range(bins + 1):
        thr = mn + s * step
        per_lang = []
        for lang in range(lang_num):
            lta = ltm = 0
            lna = [0] * lang_num
            lnf = [0] * lang_num
            for claimed, true, sc in pairs:
                if claimed != lang:
                    continue
                if true == lang:
                    lta += 1
                    ltm += sc < thr
                else:
                    lna[true] += 1
                    lnf[true] += sc >= thr
            p_miss = ltm / lta if lta else 0.0
            p_fa = sum((lnf[i] / lna[i] if lna[i] else 0.0) for i in range(lang_num))
            per_lang.append(p_target * p_miss + (1 - p_target) / (lang_num - 1) * p_fa)
        cavgs.append(sum(per_lang) / lang_num)
    return round(min(cavgs), 4)


class TestEER:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_roc_matches_sklearn(self, seed):
        rng = np.random.RandomState(seed)
        labels = rng.randint(0, 2, 200)
        scores = rng.rand(200) + 0.5 * labels
        f1, t1, th1 = roc_curve(labels, scores)
        f2, t2, th2 = sk_roc_curve(labels, scores)
        np.testing.assert_allclose(f1, f2)
        np.testing.assert_allclose(t1, t2)
        np.testing.assert_allclose(th1, th2)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_eer_matches_reference_recipe(self, seed):
        rng = np.random.RandomState(seed)
        labels = rng.randint(0, 2, 300)
        scores = rng.rand(300) + 0.8 * labels
        got = compute_eer(labels, scores)
        ref = _reference_eer(labels, scores)
        assert abs(got - ref) < 1e-9

    def test_streaming_accumulator(self):
        rng = np.random.RandomState(0)
        metric = EER(num_class=3)
        all_scores, all_labels = [], []
        for _ in range(10):
            scores = rng.rand(4, 3)
            target = rng.randint(0, 3, 4)
            metric.update(scores, target)
            for row, tgt in zip(scores, target):
                for j, s in enumerate(row):
                    all_scores.append(s)
                    all_labels.append(int(j == tgt))
        assert abs(metric.compute() - _reference_eer(all_labels, all_scores)) < 1e-9

    def test_perfect_separation_is_zero(self):
        labels = [1, 1, 0, 0]
        scores = [0.9, 0.8, 0.2, 0.1]
        assert compute_eer(labels, scores) < 1e-9

    def test_argmax_target_blind_to_systematic_errors(self):
        """Why the rebuild adds eer_true/cavg_true next to the
        reference-faithful argmax-target EER (LidModule_ASR.py:357-358):
        a model that confidently mislabels every class-0 utterance as
        class 1 scores a PERFECT argmax-target EER while the ground-truth
        EER sees the systematic error."""
        rng = np.random.RandomState(0)
        eer_argmax = EER(num_class=2)
        eer_true = EER(num_class=2)
        for _ in range(16):
            true = rng.randint(0, 2, 8)
            # confident scores, but always for the WRONG class of label 0:
            # label 0 → predicts 1, label 1 → predicts 1 (all mass on 1)
            scores = np.zeros((8, 2)) + 0.05
            scores[:, 1] = 0.95
            pred = scores.argmax(-1)
            eer_argmax.update(scores, pred)
            eer_true.update(scores, true)
        assert eer_argmax.compute() < 1e-9  # self-consistent → looks perfect
        assert eer_true.compute() > 0.3  # ground truth sees the failure


class TestCAvg:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_loop_formula(self, seed):
        rng = np.random.RandomState(seed)
        pairs = [
            (int(rng.randint(3)), int(rng.randint(3)), float(rng.rand()))
            for _ in range(300)
        ]
        assert compute_cavg(pairs, 3) == _loop_cavg(pairs, 3)

    def test_streaming_matches_functional(self):
        rng = np.random.RandomState(1)
        metric = CAvg(num_class=3)
        pairs = []
        for _ in range(8):
            scores = rng.rand(4, 3)
            target = rng.randint(0, 3, 4)
            metric.update(scores, target)
            for row, tgt in zip(scores, target):
                for j, s in enumerate(row):
                    pairs.append((j, int(tgt), float(s)))
        assert metric.compute() == compute_cavg(pairs, 3)

    def test_perfect_classifier_is_zero(self):
        pairs = []
        for lang in range(3):
            for claimed in range(3):
                pairs.append((claimed, lang, 1.0 if claimed == lang else 0.0))
        assert compute_cavg(pairs, 3) == 0.0


class TestErrorRates:
    def test_edit_distance(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance("", "abc") == 3
        assert edit_distance("abc", "") == 3
        assert edit_distance("abc", "abc") == 0

    def test_cer_corpus_level(self):
        m = CharErrorRate()
        m.update(["abcd", "xy"], ["abce", "xy"])  # 1 error / 6 ref chars
        assert abs(m.compute() - 1 / 6) < 1e-12

    def test_wer(self):
        m = WordErrorRate()
        m.update("the quick brown fox", "the slow brown fox jumps")
        # 1 sub + 1 del vs 5 ref words
        assert abs(m.compute() - 2 / 5) < 1e-12

    def test_accuracy_with_logits(self):
        m = Accuracy()
        m.update(np.asarray([[0.1, 0.9], [0.8, 0.2]]), np.asarray([1, 1]))
        assert m.compute() == 0.5
