"""Hoisted reference-KV projections (`unet_denoise.spatial_ref_kv`).

The spatial attention's K/V over the ReferenceNet tokens is step-invariant
across the sampling loop, and to_k/to_v have no bias, so
`to_k(concat([self, ref])) == concat([to_k(self), to_k(ref)])` row-wise.
These tests pin that the precomputed-KV path is numerically identical to
the concat-then-project formulation on every branch the denoiser has
(cfg_split fast path, bias-masked path, cond-only path).

The e2e golden test (test_e2e_golden.py) additionally pins that the
pipeline's default hoist-ON output matches the pre-hoist checked-in golden.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallo_tpu.models.unet_denoise import spatial_ref_kv


@pytest.fixture(scope="module")
def setup():
    from hallo_tpu.utils.factory import build_models

    h = w = 64
    f, m, b = 4, 2, 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m,
    )
    den = models.denoising_net
    p = models.params["denoising_net"]
    ip = models.image_proj.config
    ap = models.audio_proj.config
    cfgd = den.config
    hl = wl = h // 8

    rng = np.random.default_rng(5)
    feat_shapes = jax.eval_shape(
        lambda pr: models.reference_net.apply(
            pr, jnp.zeros((b, hl, wl, 4)), jnp.zeros(()),
            jnp.zeros((b, ip.clip_extra_context_tokens, cfgd.cross_attention_dim)),
        )[1],
        models.params["reference_net"],
    )
    ref_feats = jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape), jnp.float32),
        feat_shapes,
    )
    args = dict(
        sample=jnp.asarray(rng.standard_normal((b, f, hl, wl, 4)), jnp.float32),
        t=jnp.asarray(300.0),
        context=jnp.asarray(
            rng.standard_normal(
                (b, ip.clip_extra_context_tokens, cfgd.cross_attention_dim)
            ),
            jnp.float32,
        ),
        audio=jnp.asarray(
            rng.standard_normal((b, f, ap.context_tokens, cfgd.audio_attention_dim)),
            jnp.float32,
        ),
        masks=tuple(
            tuple(
                jnp.asarray(
                    rng.uniform(0, 1, (b * f, (hl // 2**d) * (wl // 2**d))),
                    jnp.float32,
                )
                for _ in range(3)
            )
            for d in range(4)
        ),
    )
    ref_kv = spatial_ref_kv(p, ref_feats, jnp.float32)
    return den, p, ref_feats, ref_kv, args


def _run(den, p, ref_feats, args, **kw):
    return den.apply(
        p, args["sample"], args["t"], args["context"], ref_feats, None,
        args["audio"], None, args["masks"], jnp.ones(3), **kw
    )


def test_ref_kv_structure(setup):
    _, _, ref_feats, ref_kv, _ = setup
    assert set(ref_kv) == set(ref_feats)
    for key, feats in ref_feats.items():
        assert len(ref_kv[key]) == len(feats)
        for feat, (k, v) in zip(feats, ref_kv[key]):
            assert k.shape[:2] == feat.shape[:2] and v.shape == k.shape


def test_cfg_split_path_exact(setup):
    den, p, ref_feats, ref_kv, args = setup
    base = _run(den, p, ref_feats, args, cfg_split=True)
    hoist = _run(den, p, ref_feats, args, cfg_split=True, ref_kv=ref_kv)
    np.testing.assert_allclose(np.asarray(hoist), np.asarray(base), atol=2e-5)


def test_bias_masked_path_exact(setup):
    den, p, ref_feats, ref_kv, args = setup
    um = jnp.asarray([1.0, 0.0])
    base = _run(den, p, ref_feats, args, uncond_mask=um)
    hoist = _run(den, p, ref_feats, args, uncond_mask=um, ref_kv=ref_kv)
    np.testing.assert_allclose(np.asarray(hoist), np.asarray(base), atol=2e-5)


def test_cond_only_path_exact(setup):
    den, p, ref_feats, ref_kv, args = setup
    base = _run(den, p, ref_feats, args)
    hoist = _run(den, p, ref_feats, args, ref_kv=ref_kv)
    np.testing.assert_allclose(np.asarray(hoist), np.asarray(base), atol=2e-5)
