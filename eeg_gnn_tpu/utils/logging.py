"""Logging + metrics observability.

Parity: reference ``utils.get_logger`` (utils.py:258-275: file + stdout
handlers) and its TensorboardX scalar stream (train.py:284-287,324-326).
TensorBoard events are written when ``tensorboardX`` is importable;
otherwise metrics land in a JSONL file with the same (tag, value, step)
triples — machine-readable without any torch dependency.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def get_logger(log_dir: str, name: str, log_filename: str = "info.log",
               level=logging.INFO):
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    file_handler = logging.FileHandler(os.path.join(log_dir, log_filename))
    file_handler.setFormatter(formatter)
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(
        logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
    logger.addHandler(file_handler)
    logger.addHandler(console)
    logger.info("Log directory: %s", log_dir)
    return logger


class MetricsWriter:
    """Scalar metrics sink: tensorboardX if present, JSONL always."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tbx = None
        try:
            from tensorboardX import SummaryWriter  # optional

            self._tbx = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "ts": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tbx is not None:
            self._tbx.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tbx is not None:
            self._tbx.close()
