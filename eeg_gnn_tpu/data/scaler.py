"""Z-score standardization wrt train-set statistics.

Parity: reference ``utils.StandardScaler`` (utils.py:393-428). The shipped
statistics pickles are scalar float64 means/stds (verified in SURVEY.md
§2.3), loaded per task/clip-length by each ``load_dataset_*``.
"""

from __future__ import annotations

import pickle

import numpy as np


class StandardScaler:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean)
        self.std = np.asarray(std)

    def transform(self, data):
        return (data - self.mean) / self.std

    def inverse_transform(self, data):
        return data * self.std + self.mean

    @classmethod
    def from_pickles(cls, means_path: str, stds_path: str) -> "StandardScaler":
        with open(means_path, "rb") as f:
            means = pickle.load(f)
        with open(stds_path, "rb") as f:
            stds = pickle.load(f)
        return cls(mean=means, std=stds)

    @classmethod
    def fit(cls, arrays) -> "StandardScaler":
        """Fit scalar statistics over an iterable of arrays (tooling for new
        datasets; the reference ships precomputed pickles)."""
        count, total, total_sq = 0, 0.0, 0.0
        for a in arrays:
            a = np.asarray(a, dtype=np.float64)
            count += a.size
            total += a.sum()
            total_sq += (a**2).sum()
        mean = total / count
        var = total_sq / count - mean**2
        return cls(mean=mean, std=max(var, 0.0) ** 0.5)
