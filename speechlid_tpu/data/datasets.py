"""Merged multi-language dataset + language-homogeneous batch sampler.

Reference semantics (lid/raw_datasets.py:187-441):
- ``MergedDataset`` concatenates per-language manifests with global indices;
  ``__getitem__`` loads audio and tokenizes the transcript with that
  language's tokenizer.  (Reference also ran sox augment + fbank here on
  CPU workers — that moved to device, ops/.)
- ``MultiBatchSampler`` draws each batch from ONE language, choosing the
  language with probability proportional to its dataset size
  (raw_datasets.py:374-441 ``MutiBatchSampler``/``get_weight_rand_index``),
  so CTC heads always see single-language batches while LID still sees all.

Multi-process sharding: pass (shard_id, num_shards) and each process visits
a disjoint strided slice of every language — the DistributedSampler analog
(ccml/trainer.py:274-278).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from speechlid_tpu.data.audio_io import read_wav
from speechlid_tpu.data.manifest import RawManifest
from speechlid_tpu.data.tokenizer import CTCTokenizer


class MergedDataset:
    def __init__(
        self,
        manifests: Sequence[RawManifest],
        tokenizers: Dict[str, CTCTokenizer],
        lang2index: Dict[str, int],
        sample_rate: int = 16000,  # expected corpus rate; mismatches
        #                            host-resample (linear) with a warning
    ) -> None:
        self.manifests = list(manifests)
        self.tokenizers = tokenizers
        self.lang2index = lang2index
        self.sample_rate = sample_rate
        self._sr_warned = set()
        self.offsets = []
        total = 0
        for m in self.manifests:
            self.offsets.append(total)
            total += len(m)
        self.total = total

    def __len__(self) -> int:
        return self.total

    def lang_of_global(self, idx: int) -> str:
        for off, m in zip(reversed(self.offsets), reversed(self.manifests)):
            if idx >= off:
                return m.lang()
        raise IndexError(idx)

    def __getitem__(self, idx: int) -> Dict:
        for off, m in zip(reversed(self.offsets), reversed(self.manifests)):
            if idx >= off:
                item = m[idx - off]
                lang = item["locale"]
                tok = self.tokenizers[lang]
                wav, sr = read_wav(item["path"])
                if sr != self.sample_rate:
                    # a wrong-rate wav silently treated as 16 kHz would
                    # stretch features ~2x; resample on the host and warn
                    # once per rate (torchaudio pipelines resample too)
                    if sr not in self._sr_warned:
                        self._sr_warned.add(sr)
                        import logging

                        logging.warning(
                            "resampling %d Hz audio to %d Hz (e.g. %s)",
                            sr, self.sample_rate, item["path"],
                        )
                    n_out = int(round(len(wav) * self.sample_rate / sr))
                    wav = np.interp(
                        np.arange(n_out) * (len(wav) - 1) / max(n_out - 1, 1),
                        np.arange(len(wav)), wav,
                    ).astype(np.float32)
                    sr = self.sample_rate
                ids = tok.encoder(item["sentence"])
                return {
                    "wav": wav,
                    "sr": sr,
                    "ids": ids,
                    "path": item["path"],
                    "lang": lang,
                    "lang_idx": self.lang2index[lang],
                    "sentence": item["sentence"],
                }
        raise IndexError(idx)

    def export_dict(self) -> Dict[str, List[str]]:
        return {m.lang(): m.export_vocab() for m in self.manifests}

    def lang_sizes(self) -> List[int]:
        return [len(m) for m in self.manifests]


class MultiBatchSampler:
    """Yields language-homogeneous batches of *global* indices.

    Each ``__iter__`` reshuffles per-language index pools (seeded by
    ``set_epoch`` for multi-process determinism) and repeatedly: pick a
    language ~ its remaining pool size, emit one batch from it.
    """

    def __init__(
        self,
        dataset: MergedDataset,
        batch_size: int,
        drop_last: bool = False,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.shard_id = shard_id
        self.num_shards = num_shards

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _pools(self) -> List[List[int]]:
        rng = random.Random(self.seed + self.epoch)
        pools = []
        for off, m in zip(self.dataset.offsets, self.dataset.manifests):
            idxs = list(range(off, off + len(m)))
            rng.shuffle(idxs)
            if self.num_shards > 1:
                # DistributedSampler invariant: wrap-pad so EVERY shard
                # holds ceil(n/num_shards) items per language — pool
                # sizes (hence the weighted language schedule and the
                # number of batches) are then IDENTICAL on all processes;
                # unequal counts would desync the SPMD step loop (one
                # host exits its epoch while another blocks in the grad
                # all-reduce).
                per = -(-len(idxs) // self.num_shards) if idxs else 0
                shard = idxs[self.shard_id :: self.num_shards]
                shard += idxs[: per - len(shard)]
                idxs = shard
            pools.append(idxs)
        return pools

    def __iter__(self):
        rng = random.Random(self.seed + self.epoch + 7919)
        pools = self._pools()
        cursors = [0] * len(pools)
        while True:
            remaining = [len(p) - c for p, c in zip(pools, cursors)]
            total = sum(remaining)
            if total == 0:
                break
            # weighted language pick (reference get_weight_rand_index)
            r = rng.randrange(total)
            lang_i = 0
            while r >= remaining[lang_i]:
                r -= remaining[lang_i]
                lang_i += 1
            take = min(self.batch_size, remaining[lang_i])
            if take < self.batch_size and self.drop_last:
                cursors[lang_i] = len(pools[lang_i])
                continue
            batch = pools[lang_i][cursors[lang_i] : cursors[lang_i] + take]
            cursors[lang_i] += take
            yield batch

    def __len__(self) -> int:
        # wrap-padded shards: every process holds ceil(n/num_shards)
        sizes = [
            -(-len(m) // self.num_shards) if len(m) else 0
            for m in self.dataset.manifests
        ]
        if self.drop_last:
            return sum(s // self.batch_size for s in sizes)
        return sum(
            (s + self.batch_size - 1) // self.batch_size for s in sizes
        )
