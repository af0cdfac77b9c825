"""Observability utilities: stage timers and metrics logger."""

import json
import os
import time

from hallo_tpu.utils.profiling import MetricsLogger, StageTimer


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("io"):
        time.sleep(0.01)
    with t.stage("io"):
        time.sleep(0.01)
    with t.stage("compute"):
        pass
    s = t.summary()
    assert s["io"]["count"] == 2 and s["io"]["total_s"] >= 0.02
    assert "compute" in s


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log(1, loss=0.5, lr=1e-4)
    logger.log(2, loss=0.25)
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["loss"] == 0.25
