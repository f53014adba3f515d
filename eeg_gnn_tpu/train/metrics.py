"""Evaluation metrics and dev-threshold search.

Parity: reference ``utils.eval_dict`` (utils.py:285-319) and
``utils.thresh_max_f1`` (utils.py:322-343). sklearn is used exactly like the
reference so metric semantics (binary vs weighted averaging, PR-curve
threshold enumeration) match bit-for-bit.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def eval_dict(y_pred, y, y_prob=None, file_names=None, average="macro"):
    """Accuracy / F1 / precision / recall (+AUROC for binary) score dict."""
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    scores = {}
    pred_dict = defaultdict(list)
    true_dict = defaultdict(list)
    if file_names is not None:
        for idx, f_name in enumerate(file_names):
            pred_dict[f_name] = y_pred[idx]
            true_dict[f_name] = y[idx]
    if y is not None:
        scores["acc"] = accuracy_score(y_true=y, y_pred=y_pred)
        scores["F1"] = f1_score(y_true=y, y_pred=y_pred, average=average)
        scores["precision"] = precision_score(y_true=y, y_pred=y_pred, average=average)
        scores["recall"] = recall_score(y_true=y, y_pred=y_pred, average=average)
        if (
            y_prob is not None
            and len(set(np.asarray(y).tolist())) <= 2
            and np.asarray(y_prob).ndim == 1
        ):
            # binary case only; the reference reaches this branch solely
            # with 1-D detection probabilities (train.py:380,414-418)
            scores["auroc"] = roc_auc_score(y_true=y, y_score=y_prob)
    return scores, pred_dict, true_dict


def thresh_max_f1(y_true, y_prob):
    """F1-maximizing decision threshold from the PR curve (binary only)."""
    from sklearn.metrics import precision_recall_curve

    if len(set(np.asarray(y_true).tolist())) > 2:
        raise NotImplementedError

    precision, recall, thresholds = precision_recall_curve(y_true, y_prob)
    fscore, thresh_filt = [], []
    for idx in range(len(thresholds)):
        denom = precision[idx] + recall[idx]
        curr_f1 = (2 * precision[idx] * recall[idx]) / denom if denom else np.nan
        if not np.isnan(curr_f1):
            fscore.append(curr_f1)
            thresh_filt.append(thresholds[idx])
    return thresh_filt[int(np.argmax(np.asarray(fscore)))]


class AverageMeter:
    """Running average (reference utils.py:178-202)."""

    def __init__(self):
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def reset(self):
        self.__init__()

    def update(self, val, num_samples=1):
        self.count += num_samples
        self.sum += val * num_samples
        self.avg = self.sum / self.count
