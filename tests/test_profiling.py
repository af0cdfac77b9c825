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


def test_retry_transient_classification():
    """utils/retry.py: transient runtime faults retry; deterministic OOMs
    and code bugs propagate immediately (CLAUDE.md r3/r4 measured rules)."""
    import pytest

    from hallo_tpu.utils.retry import is_transient, retry_transient

    class FakeXlaRuntimeError(RuntimeError):
        pass

    assert is_transient(FakeXlaRuntimeError("INTERNAL: kernel fault"))
    assert is_transient(RuntimeError("UNAVAILABLE: connection dropped"))
    assert not is_transient(
        FakeXlaRuntimeError("RESOURCE_EXHAUSTED: out of memory allocating")
    )
    assert not is_transient(ValueError("bad shape"))

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise FakeXlaRuntimeError("INTERNAL: kernel fault")
        return "ok"

    assert retry_transient(flaky, wait_s=0.0) == "ok"
    assert calls["n"] == 2

    def oom():
        raise FakeXlaRuntimeError("RESOURCE_EXHAUSTED: 24.0G vs 15.75G")

    with pytest.raises(FakeXlaRuntimeError):
        retry_transient(oom, wait_s=0.0)

    def always_bad():
        raise RuntimeError("INTERNAL: kernel fault")

    with pytest.raises(RuntimeError):
        retry_transient(always_bad, retries=1, wait_s=0.0)
