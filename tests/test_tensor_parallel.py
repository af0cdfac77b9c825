"""Tensor parallelism over the "model" mesh axis (parallel/tp.py):
spec-rule unit tests + a full stage-2 train-step numerics test on the
virtual 8-device CPU mesh — TP-sharded params must produce the same loss
and updated params as the replicated run (GSPMD inserts the collectives;
the math must not change). VERDICT r2 item 8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hallo_tpu.parallel.mesh import make_mesh
from hallo_tpu.parallel.tp import (
    count_sharded, tp_param_specs, tp_shardings,
)


def test_megatron_pattern_on_ff_pair():
    """(C -> 4C -> C) FeedForward: column- then row-parallel, bias follows
    the column kernel only."""
    params = {
        "ff": {
            "net_0": {"kernel": np.zeros((16, 64)), "bias": np.zeros(64)},
            "net_2": {"kernel": np.zeros((64, 16)), "bias": np.zeros(16)},
        },
        "norm": {"scale": np.zeros(16), "bias": np.zeros(16)},
    }
    specs = tp_param_specs(params, n_model=4, min_dim=64)
    assert specs["ff"]["net_0"]["kernel"] == P(None, "model")
    assert specs["ff"]["net_0"]["bias"] == P("model")
    assert specs["ff"]["net_2"]["kernel"] == P("model", None)
    assert specs["ff"]["net_2"]["bias"] == P()
    assert specs["norm"]["scale"] == P() and specs["norm"]["bias"] == P()
    assert count_sharded(specs) == 3


def test_narrow_and_indivisible_stay_replicated():
    params = {
        "small": {"kernel": np.zeros((8, 32)), "bias": np.zeros(32)},
        "odd": {"kernel": np.zeros((8, 130)), "bias": np.zeros(130)},
        "conv": {"kernel": np.zeros((3, 3, 64, 64)), "bias": np.zeros(64)},
    }
    specs = tp_param_specs(params, n_model=4, min_dim=64)
    assert count_sharded(specs) == 0  # 32 < min, 130 % 4 != 0, conv is 4-D


def test_full_width_dims_shard_at_default_min():
    """The production 1280-ch FF pair shards at the default threshold; the
    320-ch level-0 layers stay replicated (MXU-tile rationale in tp.py)."""
    params = {
        "mid_ff": {
            "net_0": {"kernel": np.zeros((1280, 5120)), "bias": np.zeros(5120)},
            "net_2": {"kernel": np.zeros((5120, 1280)), "bias": np.zeros(1280)},
        },
        "l0_ff": {
            "net_0": {"kernel": np.zeros((320, 1280)), "bias": np.zeros(1280)},
        },
    }
    specs = tp_param_specs(params, n_model=2)
    assert specs["mid_ff"]["net_0"]["kernel"] == P(None, "model")
    assert specs["mid_ff"]["net_2"]["kernel"] == P("model", None)
    # 320 -> 1280 qualifies on its out dim (part of a column/row pair)
    assert specs["l0_ff"]["net_0"]["kernel"] == P(None, "model")


@pytest.mark.slow
def test_tp_train_step_matches_replicated():
    from hallo_tpu.train.state import (
        OptimizerConfig, TrainState, label_params, make_optimizer,
        stage2_trainable,
    )
    from hallo_tpu.train.step import TrainConfig, make_train_step
    from hallo_tpu.utils.factory import build_models

    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_data=2, n_model=4)
    h = w = 64
    f, m = 2, 2
    b = 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m,
    )
    labels = label_params(models.params, stage2_trainable)
    tx = make_optimizer(OptimizerConfig(), labels)
    step_fn = jax.jit(make_train_step(models, tx, TrainConfig(stage=2)))

    ip = models.image_proj.config
    ap = models.audio_proj.config
    hl = h // 8
    rng = np.random.default_rng(0)
    batch = dict(
        pixel_values=rng.uniform(-1, 1, (b, f, h, w, 3)).astype(np.float32),
        ref_pixels=rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        motion_pixels=rng.uniform(-1, 1, (b, m, h, w, 3)).astype(np.float32),
        audio_windows=rng.normal(
            size=(b, f, ap.seq_len, ap.blocks, ap.channels)
        ).astype(np.float32),
        face_emb=rng.normal(size=(b, ip.clip_embeddings_dim)).astype(np.float32),
        face_region=np.ones((b, h, w, 3), np.float32),
        masks=tuple(
            tuple(np.ones((b, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        ),
    )
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    dev_batch = jax.tree.map(lambda x: jax.device_put(x, data_sh), batch)

    def run(param_sharding):
        params = jax.device_put(models.params, param_sharding)
        state = TrainState.create(params, tx)
        new_state, metrics = step_fn(state, dev_batch, jax.random.PRNGKey(7))
        return float(metrics["loss"]), jax.tree.map(np.asarray, new_state.params)

    loss_ref, params_ref = run(jax.tree.map(lambda _: repl, models.params))

    shardings = tp_shardings(models.params, mesh, min_dim=32)
    n_sharded = count_sharded(tp_param_specs(models.params, 4, min_dim=32))
    assert n_sharded > 0, "tiny model must have TP-eligible denses at min 32"
    loss_tp, params_tp = run(shardings)

    assert loss_tp == pytest.approx(loss_ref, rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6),
        params_ref, params_tp,
    )


def test_production_full_width_shards_wide_denses_via_eval_shape():
    """VERDICT r3 item 6: at the PRODUCTION default min_dim (1280), the
    full-width denoiser/ReferenceNet param trees must expose many
    TP-shardable denses over n_model=8 — checked via jax.eval_shape so no
    full-width params are ever materialized (shape-only trace)."""
    from hallo_tpu.parallel.tp import DEFAULT_MIN_DIM
    from hallo_tpu.utils.factory import build_models

    models = build_models("full")
    shapes = jax.eval_shape(
        lambda key: models.init_params(key, height=512, width=512),
        jax.random.PRNGKey(0),
    )
    assert DEFAULT_MIN_DIM == 1280
    n_den = count_sharded(tp_param_specs(shapes["denoising_net"], n_model=8))
    n_ref = count_sharded(tp_param_specs(shapes["reference_net"], n_model=8))
    # The 1280-wide FF pairs + qkv/out projections at UNet levels 2-3.
    assert n_den >= 100, n_den
    assert n_ref >= 50, n_ref
