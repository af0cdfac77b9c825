"""Tracing / profiling / metrics — first-class observability.

The reference has none (SURVEY.md §5: tqdm only). Here:
- `trace(dir)` context manager wrapping jax.profiler (XLA trace viewable in
  TensorBoard / xprof)
- `StageTimer` for named host-side stage timings (preprocess, compile,
  per-clip device time, IO)
- `MetricsLogger`: JSONL metrics stream + optional tensorboardX scalars
  (the mlflow-equivalent; reference logs train_loss per step to mlflow,
  train_stage1.py:306-308,687)
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock stage timers with a summary dict."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Any]:
        return {
            name: {
                "total_s": round(total, 4),
                "count": self.counts[name],
                "mean_s": round(total / self.counts[name], 4),
            }
            for name, total in self.totals.items()
        }


def summarize_hlo_stats(trace_dir: str, top_n: int = 12) -> Dict[str, Any]:
    """Parse an xprof trace (written by `trace(...)`) into per-category and
    per-op device-time breakdowns — the tooling the reference lacked
    entirely (SURVEY.md §5: tqdm only).

    Requires tensorflow's profiler plugin (present in this image)."""
    import glob
    import json as _json
    from collections import defaultdict

    from tensorflow.python.profiler.internal import (  # type: ignore
        _pywrap_profiler_plugin as plugin,
    )

    xplanes = sorted(glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"),
                               recursive=True))
    if not xplanes:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data, _ = plugin.xspace_to_tools_data([xplanes[-1]], "hlo_stats")
    table = _json.loads(data)
    cols = [c["label"] for c in table["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    by_cat: Dict[str, float] = defaultdict(float)
    by_op: Dict[str, float] = defaultdict(float)
    total = 0.0
    for row in table["rows"]:
        cells = [c.get("v") if c else None for c in row["c"]]
        t = float(cells[idx["Total self time (us)"]] or 0.0)
        total += t
        by_cat[cells[idx["HLO op category"]]] += t
        by_op[(cells[idx["HLO op name"]] or "")[:60]] += t
    return {
        "total_ms": total / 1e3,
        "by_category_ms": dict(
            sorted(((k, v / 1e3) for k, v in by_cat.items()),
                   key=lambda kv: -kv[1])
        ),
        "top_ops_ms": dict(
            sorted(((k, v / 1e3) for k, v in by_op.items()),
                   key=lambda kv: -kv[1])[:top_n]
        ),
    }


class MetricsLogger:
    """JSONL + optional TensorBoard scalars."""

    def __init__(self, out_dir: str, use_tensorboard: bool = True) -> None:
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, "metrics.jsonl")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, **scalars: float) -> None:
        record = {"step": step, "ts": time.time()}
        for key, value in scalars.items():
            record[key] = float(value)
            if self._tb is not None:
                self._tb.add_scalar(key, float(value), step)
        with open(self._path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
