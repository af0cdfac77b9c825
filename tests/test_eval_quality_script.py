"""The speed/quality matrix SCRIPT exercised end-to-end at tiny scale:
multi-seed aggregation and the LPIPS column running on a synthetic weight
file (VERDICT r3 item 5 — the plumbing that will score real weights must
be demonstrated, not just unit-tested).

Runs scripts/eval_cache_quality.py in a subprocess (its own CPU backend
bootstrap) with HALLO_LPIPS_WEIGHTS pointing at a randomly-initialized but
structurally-exact lpips-alex .pth (the same torch oracle class the LPIPS
unit tests convert), then checks the emitted JSON: per-mode rows carry
numeric psnr/ssim/LPIPS values with mean/min/max spread over the seeds.
"""

import json
import os
import subprocess
import sys

import pytest
import torch

from tests.test_lpips import _TorchLPIPSAlex

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_eval_cache_quality_tiny_with_synthetic_lpips(tmp_path):
    torch.manual_seed(0)
    with torch.no_grad():
        sd = _TorchLPIPSAlex().eval().lpips_state_dict()
    pth = tmp_path / "lpips_alex.pth"
    torch.save({k: v.detach() for k, v in sd.items()}, pth)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        HALLO_EVAL_SCALE="tiny",
        HALLO_EVAL_STEPS="4",
        HALLO_EVAL_THRESHOLDS="0.10",
        HALLO_EVAL_SEEDS="0,1",
        HALLO_LPIPS_WEIGHTS=str(pth),
        HALLO_PARAM_CACHE=env.get("HALLO_PARAM_CACHE", str(tmp_path / "pc")),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_cache_quality.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["metric"] == "step_cache_quality_audit"
    assert report["lpips"].startswith("loaded"), report["lpips"]
    (section,) = report["sections"]
    assert section["seeds"] == [0, 1]
    assert len(section["modes"]) >= 5
    for row in section["modes"]:
        for col in ("psnr_vs_exact_db", "ssim_vs_exact", "lpips_vs_exact"):
            val = row[col]
            # two seeds -> spread dicts
            assert isinstance(val, dict) and "mean" in val, (row["mode"], col, val)
            assert val["min"] <= val["mean"] <= val["max"]
        assert isinstance(row["lpips_vs_exact"]["mean"], float)
