"""Batch samplers over a Dataset.

Capability parity with the reference samplers
(speechflow/data_pipeline/samplers/): SimpleSampler (sequential with optional
length-sorted combing and last-batch epoch signal), RandomSampler (epoch
shuffle), WeightedSampler (inverse-frequency sampling over one or more sample
fields with chunks_ratio mixing and fixed epoch_size), FillingSampler
(least-seen label filling). All samplers expose ``sampling(batch_size) ->
(samples, is_last)`` and per-epoch ``reset()``; state is picklable so the data
server can ship per-loader copies (DDP-synchronized sampling).
"""

from __future__ import annotations

import random
import typing as tp

import numpy as np

from speechflow_tpu.data.core.dataset import Dataset

__all__ = ["SimpleSampler", "RandomSampler", "WeightedSampler", "FillingSampler", "SAMPLERS"]


class BaseSampler:
    def __init__(self):
        self.dataset: tp.Optional[Dataset] = None
        self.epoch = 0

    def set_dataset(self, dataset: Dataset) -> "BaseSampler":
        self.dataset = dataset
        self.reset()
        return self

    def reset(self) -> None:
        pass

    def __len__(self) -> int:
        return len(self.dataset) if self.dataset else 0

    def sampling(self, batch_size: int) -> tp.Tuple[list, bool]:
        raise NotImplementedError


class SimpleSampler(BaseSampler):
    """Sequential sampler. ``tokens_per_batch`` enables dynamic batching by
    total sample length (reference: simple_sampler.py:21 use_dynamic_batch):
    a batch greedily accumulates items until the summed length would exceed
    the budget, so short utterances pack into bigger batches instead of
    wasting padding FLOPs. ``batch_size`` then acts as the item-count cap."""

    def __init__(self, comb_by_len: bool = False, seed: int = 0,
                 tokens_per_batch: tp.Optional[int] = None):
        super().__init__()
        self.comb_by_len = comb_by_len
        self.seed = seed
        self.tokens_per_batch = tokens_per_batch
        self._order: tp.List[int] = []
        self._pos = 0

    def reset(self) -> None:
        n = len(self.dataset)
        self._order = list(range(n))
        if self.comb_by_len:
            lens = [self.dataset.item(i).length for i in self._order]
            self._order = [i for _, i in sorted(zip(lens, self._order))]
        self._pos = 0
        self.epoch += 1

    def sampling(self, batch_size: int) -> tp.Tuple[list, bool]:
        n = len(self._order)
        if self.tokens_per_batch is None:
            take = self._order[self._pos : self._pos + batch_size]
            self._pos += batch_size
        else:
            take, total = [], 0
            while self._pos < n and len(take) < batch_size:
                i = self._order[self._pos]
                length = self.dataset.item(i).length or 1
                if take and total + length > self.tokens_per_batch:
                    break
                take.append(i)
                total += length
                self._pos += 1
        is_last = self._pos >= n
        samples = [self.dataset[i] for i in take]
        if is_last:
            self.reset()
        return samples, is_last


class RandomSampler(SimpleSampler):
    def reset(self) -> None:
        super().reset()
        rng = random.Random(self.seed + self.epoch)
        if self.comb_by_len:
            # shuffle within length-sorted blocks to keep buckets tight
            block = 64
            blocks = [self._order[i : i + block] for i in range(0, len(self._order), block)]
            for b in blocks:
                rng.shuffle(b)
            rng.shuffle(blocks)
            self._order = [i for b in blocks for i in b]
        else:
            rng.shuffle(self._order)


class WeightedSampler(BaseSampler):
    """Inverse-frequency sampling over sample fields (reference: weighted_sampler.py:23).

    ``fields`` names DataSample attributes (e.g. ["lang", "speaker_name"]);
    each field contributes a weight ∝ 1/freq(value)^alpha; ``chunks_ratio``
    splits each epoch between the fields. ``epoch_size`` fixes the number of
    draws per epoch independent of dataset size.
    """

    def __init__(self, fields: tp.Sequence[str] = ("speaker_name",),
                 alpha: float = 1.0, epoch_size: tp.Optional[int] = None,
                 chunks_ratio: tp.Optional[tp.Sequence[float]] = None, seed: int = 0):
        super().__init__()
        self.fields = list(fields)
        self.alpha = alpha
        self.epoch_size = epoch_size
        self.chunks_ratio = list(chunks_ratio) if chunks_ratio else [1.0 / len(self.fields)] * len(self.fields)
        self.seed = seed
        self._weights: tp.List[np.ndarray] = []
        self._drawn = 0

    def set_dataset(self, dataset: Dataset) -> "WeightedSampler":
        self.dataset = dataset
        self._weights = []
        for fld in self.fields:
            vals = [getattr(dataset[i], fld, None) for i in range(len(dataset))]
            freq: tp.Dict[tp.Any, int] = {}
            for v in vals:
                freq[v] = freq.get(v, 0) + 1
            w = np.asarray([1.0 / (freq[v] ** self.alpha) for v in vals], dtype=np.float64)
            self._weights.append(w / w.sum())
        self.reset()
        return self

    def reset(self) -> None:
        self._drawn = 0
        self.epoch += 1

    @property
    def _epoch_len(self) -> int:
        return self.epoch_size or len(self.dataset)

    def probabilities(self, field: str) -> np.ndarray:
        return self._weights[self.fields.index(field)]

    def sampling(self, batch_size: int) -> tp.Tuple[list, bool]:
        rng = np.random.default_rng(self.seed + self.epoch * 100003 + self._drawn)
        # pick the field for this batch according to chunks_ratio
        u = rng.uniform()
        acc, fi = 0.0, 0
        for i, r in enumerate(self.chunks_ratio):
            acc += r
            if u <= acc:
                fi = i
                break
        idx = rng.choice(len(self.dataset), size=batch_size, p=self._weights[fi])
        self._drawn += batch_size
        is_last = self._drawn >= self._epoch_len
        if is_last:
            self.reset()
        return [self.dataset[int(i)] for i in idx], is_last


class FillingSampler(BaseSampler):
    """Prefers the least-seen label combinations (reference: filling sampler)."""

    def __init__(self, fields: tp.Sequence[str] = ("speaker_name",), seed: int = 0):
        super().__init__()
        self.fields = list(fields)
        self.seed = seed
        self._seen: tp.Dict[tp.Any, int] = {}
        self._by_key: tp.Dict[tp.Any, tp.List[int]] = {}
        self._drawn = 0

    def set_dataset(self, dataset: Dataset) -> "FillingSampler":
        self.dataset = dataset
        self._by_key = {}
        for i in range(len(dataset)):
            s = dataset[i]
            key = tuple(getattr(s, f, None) for f in self.fields)
            self._by_key.setdefault(key, []).append(i)
        self._seen = {k: 0 for k in self._by_key}
        self.reset()
        return self

    def reset(self) -> None:
        self._drawn = 0
        self.epoch += 1

    def sampling(self, batch_size: int) -> tp.Tuple[list, bool]:
        rng = np.random.default_rng(self.seed + self.epoch * 7919 + self._drawn)
        out = []
        for _ in range(batch_size):
            key = min(self._seen, key=lambda k: (self._seen[k], rng.uniform()))
            self._seen[key] += 1
            out.append(self.dataset[int(rng.choice(self._by_key[key]))])
        self._drawn += batch_size
        is_last = self._drawn >= len(self.dataset)
        if is_last:
            self.reset()
        return out, is_last


SAMPLERS = {
    "SimpleSampler": SimpleSampler,
    "RandomSampler": RandomSampler,
    "WeightedSampler": WeightedSampler,
    "FillingSampler": FillingSampler,
}


class TripletSampler(BaseSampler):
    """Anchor/positive/negative batches for metric learning
    (reference: tests/test_triplet_sampler.py pattern; examples/biometric):
    each draw returns batch_size triplets flattened as [anchors, positives,
    negatives] with positives sharing the anchor's label field."""

    def __init__(self, field: str = "speaker_name", seed: int = 0):
        super().__init__()
        self.field = field
        self.seed = seed
        self._by_label: tp.Dict[tp.Any, tp.List[int]] = {}
        self._drawn = 0

    def set_dataset(self, dataset: Dataset) -> "TripletSampler":
        self.dataset = dataset
        self._by_label = {}
        for i in range(len(dataset)):
            lab = getattr(dataset[i], self.field, None)
            self._by_label.setdefault(lab, []).append(i)
        self._labels = [l for l, idxs in self._by_label.items() if len(idxs) >= 2]
        assert len(self._labels) >= 2, "triplet sampling needs >=2 labels with >=2 samples"
        self.reset()
        return self

    def reset(self) -> None:
        self._drawn = 0
        self.epoch += 1

    def sampling(self, batch_size: int) -> tp.Tuple[list, bool]:
        rng = np.random.default_rng(self.seed + self.epoch * 31337 + self._drawn)
        anchors, positives, negatives = [], [], []
        for _ in range(batch_size):
            lab = self._labels[int(rng.integers(0, len(self._labels)))]
            a, p = rng.choice(self._by_label[lab], size=2, replace=False)
            other = lab
            while other == lab:
                other = list(self._by_label)[int(rng.integers(0, len(self._by_label)))]
            n = int(rng.choice(self._by_label[other]))
            anchors.append(self.dataset[int(a)])
            positives.append(self.dataset[int(p)])
            negatives.append(self.dataset[n])
        self._drawn += batch_size
        is_last = self._drawn >= len(self.dataset)
        if is_last:
            self.reset()
        return anchors + positives + negatives, is_last


SAMPLERS["TripletSampler"] = TripletSampler
