"""Stage-2 training step on the virtual 8-device mesh (via the driver's
dryrun entry point — exercises batch sharding + ZeRO-style optimizer-state
sharding) and the stage-1 StaticPipeline."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as entry

    entry.dryrun_multichip(8)  # asserts finite loss internally


@pytest.mark.slow
def test_static_pipeline_tiny():
    from hallo_tpu.config import SchedulerConfig
    from hallo_tpu.pipelines.static import StaticPipeline
    from hallo_tpu.utils.factory import build_models

    h = 64
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=h,
        clip_length=1, n_motion_frames=0,
    )
    pipe = StaticPipeline(models, SchedulerConfig(), num_inference_steps=2)
    rng = np.random.default_rng(0)
    img = pipe(
        rng.uniform(-1, 1, (1, h, h, 3)).astype(np.float32),
        rng.normal(size=(1, 16)).astype(np.float32),
        np.ones((1, h, h, 3), np.float32),
    )
    assert img.shape == (1, h, h, 3)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
