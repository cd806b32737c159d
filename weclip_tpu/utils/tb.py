"""Scalar logging: TensorBoard when available, JSONL always.

The reference writes loss scalars to TensorBoard (dist_clip_voc.py:198,282);
here every scalar also lands in ``scalars.jsonl`` so runs are inspectable
without TF."""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class ScalarWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def add_scalars(self, tag: str, values: Dict[str, float], step: int):
        rec = {"tag": tag, "step": step, "time": time.time(), **values}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in values.items():
                    tf.summary.scalar(f"{tag}/{k}", v, step=step)

    def close(self):
        self._jsonl.close()
