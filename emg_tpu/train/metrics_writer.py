"""Scalar metric writer: TensorBoard event files + JSONL mirror.

The reference logs scalars with the exact tags Loss{,_Decoder,_Encoder}/
{Training,Evaluation}, PhonemeErrorRate{,_Epoch}/{Training,Evaluation} and
Accuracy_Epoch/* under logs/run/<timestamp> (recognition_model.py:177-251,
397). Same tags here; the JSONL mirror keeps metrics greppable without
TensorBoard."""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from flax.metrics.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.scalar(tag, float(value), step)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "time": time.time()})
            + "\n"
        )

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class NullMetricsWriter:
    """Drop-in no-op writer for non-primary processes in multi-host runs:
    only process 0 owns the TensorBoard/metrics files (the scalars are
    identical everywhere — the jitted steps reduce globally)."""

    log_dir = ""

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


def default_log_dir(base: str = "logs/run") -> str:
    import datetime

    return os.path.join(base, datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))
