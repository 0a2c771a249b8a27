"""Structured metrics + logging.

The reference logs free-form text (results.txt accumulated string,
train_classifier.py:84,173-174) and a timestamped file logger
(lms/src/utils.py:180-193).  We keep those artifact surfaces (so outputs
stay diffable) and add a structured JSONL metrics stream.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Dict, List, Optional


def create_logger(log_file_base: str, verbose: bool = False) -> logging.Logger:
    """Timestamped file logger, mirroring lms/src/utils.py:180-193."""
    now_str = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    handlers: List[logging.Handler] = [logging.FileHandler(f"{log_file_base}_{now_str}")]
    if verbose:
        handlers.append(logging.StreamHandler(sys.stdout))
    logger = logging.getLogger(f"loco_asr_tpu.{os.path.basename(log_file_base)}")
    logger.setLevel(logging.INFO)
    logger.handlers = []
    fmt = logging.Formatter("%(asctime)s %(message)s", datefmt="%d-%m-%Y %H:%M:%S")
    for h in handlers:
        h.setFormatter(fmt)
        logger.addHandler(h)
    return logger


@dataclass
class MetricsWriter:
    """Append-only JSONL metrics stream + in-memory history for plots."""

    path: Optional[str] = None
    history: List[Dict[str, Any]] = field(default_factory=list)

    def log(self, **kv: Any) -> Dict[str, Any]:
        rec = {"time": time.time(), **kv}
        self.history.append(rec)
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec, default=float) + "\n")
        return rec

    def series(self, key: str) -> List[Any]:
        return [r[key] for r in self.history if key in r]


class Stopwatch:
    """Wall-clock timer with RTFx helper (audio-seconds / wall-seconds)."""

    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def rtfx(self, audio_seconds: float) -> float:
        dt = self.elapsed()
        return audio_seconds / dt if dt > 0 else float("inf")
