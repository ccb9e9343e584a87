"""Structured metric logging.

Replaces the mmcv logger-hook stack (TextLoggerHook writing
`{work_dir}/*.log.json` + the optional TensorboardLoggerHook from the
reference's runner config): a JSONL scalar stream that downstream tooling
can tail, plus an optional TensorBoard event writer when the (torch)
tensorboard package happens to be importable — never required.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    """Append-only scalar logger: one JSON object per `write` call.

    File format (one line each):
      {"step": 120, "epoch": 1, "time": 1723800000.0, "loss_binocc": 0.41, ...}
    """

    def __init__(self, work_dir: str, filename: str = "train.log.jsonl",
                 tensorboard: bool = False):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, filename)
        self._fh = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:  # optional; absent in this image -> silently JSONL-only
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, scalars: Dict[str, float], step: int,
              epoch: Optional[int] = None) -> None:
        rec = {"step": int(step), "time": time.time()}
        if epoch is not None:
            rec["epoch"] = int(epoch)
        for k, v in scalars.items():
            rec[k] = float(v)
        self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def summarize_log(path: str) -> Dict[str, object]:
    """Training-log analysis (`tools/analysis_tools/analyze_logs.py`
    counterpart for the JSONL format): average iteration time and the
    per-scalar first/last/min values across the run."""
    recs = [json.loads(line) for line in open(path)]
    out: Dict[str, object] = {"num_records": len(recs)}
    if not recs:
        return out
    skip = {"step", "time", "epoch"}
    keys = [k for k in recs[-1] if k not in skip]
    for k in keys:
        vals = [r[k] for r in recs if k in r]
        out[k] = {"first": vals[0], "last": vals[-1], "min": min(vals)}
    if "sec_per_iter" in recs[-1]:
        out["avg_sec_per_iter"] = sum(
            r["sec_per_iter"] for r in recs if "sec_per_iter" in r
        ) / max(sum(1 for r in recs if "sec_per_iter" in r), 1)
    return out
