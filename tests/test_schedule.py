"""Scheduler numerics: trailing spacing, zero-SNR rescale, DDIM roundtrip."""

import jax.numpy as jnp
import numpy as np

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion import ddim, schedule


def test_trailing_timesteps_40():
    cfg = SchedulerConfig()
    ts = schedule.inference_timesteps(cfg, 40)
    assert ts[0] == 999 and ts[-1] == 24 and len(ts) == 40
    assert np.all(np.diff(ts) == -25)


def test_zero_snr_terminal_alpha():
    cfg = SchedulerConfig()
    ac = schedule.alphas_cumprod(cfg)
    assert ac[-1] < 1e-10  # exactly-zero terminal SNR
    assert ac[0] > 0.99
    # Without rescale the terminal alpha is positive.
    cfg2 = SchedulerConfig(rescale_betas_zero_snr=False)
    assert schedule.alphas_cumprod(cfg2)[-1] > 1e-4


def test_ddim_perfect_v_recovers_x0():
    # If the model always outputs the exact v for a fixed x0, the DDIM chain
    # must land on x0. One jitted fori_loop — the same control-flow shape the
    # real sampler uses (1-core CPU host: eager loops recompile per step).
    import jax

    cfg = SchedulerConfig()
    state = ddim.make_state(cfg, 40)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))

    @jax.jit
    def run(x0, noise):
        # start from t=999 (terminal SNR zero -> x_T == noise)
        sample = ddim.add_noise(state.alphas_cumprod, x0, noise, jnp.asarray([999]))

        def body(i, sample):
            t = state.timesteps[i]
            a = state.alphas_cumprod[t]
            # true eps consistent with the current sample
            eps = (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
            return ddim.ddim_step(state, i, v, sample)

        return jax.lax.fori_loop(0, 40, body, sample)

    sample = run(x0, noise)
    # set_alpha_to_one=False (diffusers default the reference relies on):
    # the final step targets alpha_cumprod[0] ~= 0.99915, not 1, so the
    # result retains sqrt(1-a0) ~= 0.029 of the terminal eps.
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=0.12)
    err = np.abs(np.asarray(sample) - np.asarray(x0)).mean()
    assert err < 0.03, err


def test_velocity_definition_consistent():
    # predict_x0_eps(get_velocity(...)) must invert exactly.
    cfg = SchedulerConfig(rescale_betas_zero_snr=False)
    ac = jnp.asarray(schedule.alphas_cumprod(cfg))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    t = jnp.asarray([10, 500])
    xt = ddim.add_noise(ac, x0, noise, t)
    v = ddim.get_velocity(ac, x0, noise, t)
    a = ac[t][:, None]
    got_x0, got_eps = ddim.predict_x0_eps(v, xt, a, "v_prediction")
    np.testing.assert_allclose(np.asarray(got_x0), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_eps), np.asarray(noise), atol=1e-4)


def test_step_cache_skip_mask():
    from hallo_tpu.diffusion.cache import make_skip_mask

    m = make_skip_mask(40, warmup=6, cooldown=4, stride=2)
    assert m.shape == (40,)
    assert not m[:6].any() and not m[-4:].any()
    assert not m[0]
    # no two consecutive skips at stride 2
    assert not (m[:-1] & m[1:]).any()
    assert m.sum() >= 10  # meaningful savings


def test_pipeline_step_cache_close_to_exact():
    """Cached-step pipeline output stays close to the exact path on a tiny
    model (sanity: the machinery skips forwards without derailing DDIM)."""
    import jax
    import numpy as np

    from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline
    from hallo_tpu.utils.factory import build_models

    h = w = 64
    f, m = 4, 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m,
    )
    rng = np.random.default_rng(0)
    ref = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    ap = models.audio_proj.config
    audio = rng.normal(size=(f, ap.seq_len, ap.blocks, ap.channels)).astype(np.float32)
    emb = rng.normal(size=(1, models.image_proj.config.clip_embeddings_dim)).astype(np.float32)
    region = np.ones((1, h, w, 3), np.float32)
    hl = h // 8
    masks = tuple(
        tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
        for d in range(4)
    )
    kwargs = dict(num_inference_steps=8, clip_length=f, n_motion_frames=m)
    exact = FaceAnimatePipeline(models, **kwargs)(
        ref, audio, emb, region, masks, seed=3
    )
    cached = FaceAnimatePipeline(models, step_cache="uniform", **kwargs)(
        ref, audio, emb, region, masks, seed=3
    )
    assert cached.shape == exact.shape
    assert np.isfinite(cached).all()
    # random-init models drift more than trained ones; just require the
    # trajectories to stay in the same neighborhood
    assert np.mean(np.abs(cached - exact)) < 0.15


def test_logsnr_timesteps_properties():
    """logsnr schedule: same endpoints as trailing, strictly decreasing,
    and a MUCH smaller first log-SNR interval (the order-1 warmup interval
    that dominates low-eval global error under the zero-SNR clamp)."""
    from hallo_tpu.diffusion import schedule

    cfg = SchedulerConfig()
    for n in (10, 12, 14):
        trail = schedule.inference_timesteps(cfg, n)
        ls = schedule.logsnr_timesteps(cfg, n, rho=1.0)
        assert ls[0] == trail[0] and ls[-1] == trail[-1]
        assert np.all(np.diff(ls) < 0), ls

        acp = schedule.alphas_cumprod(cfg).astype(np.float64)
        acp[-1] = max(acp[-1], 2.0 ** -24)
        lam = 0.5 * np.log(acp / np.maximum(1 - acp, 1e-12))
        gap = lambda ts: np.abs(np.diff(lam[ts]))  # noqa: E731
        # trailing's first interval is the giant one; logsnr splits it
        assert gap(ls)[0] < 0.5 * gap(trail)[0], (gap(ls)[0], gap(trail)[0])
        # rho curves the interior: rho > 1 shrinks the first interval more
        ls2 = schedule.logsnr_timesteps(cfg, n, rho=2.0)
        assert gap(ls2)[0] <= gap(ls)[0]


def test_make_cfg_plan():
    from hallo_tpu.diffusion.cache import make_cfg_plan, make_uncond_mask

    # 40 steps: explicit legacy warmup/cooldown reproduce make_uncond_mask
    mask, gw = make_cfg_plan(40, 3, 3.5, warmup=6, cooldown=4)
    np.testing.assert_array_equal(mask, make_uncond_mask(40, 3, 6, 4))
    assert np.all(gw == 3.5)

    # 12 steps: the adaptive default (warmup 2 / cooldown 1) leaves the
    # stride actually effective (the 40-step 6/4 default left 2 skips)
    mask, _ = make_cfg_plan(12, 3, 3.5)
    assert (~mask).sum() >= 5, mask

    # tail: last N steps never eval uncond and run at guidance weight 1
    mask, gw = make_cfg_plan(12, 1, 3.5, tail=3)
    assert not mask[-3:].any() and mask[:-3].all()
    assert np.all(gw[-3:] == 1.0) and np.all(gw[:-3] == 3.5)
    assert mask[0]

    # degenerate: tail covering everything -> no uncond evals at all
    mask, gw = make_cfg_plan(4, 1, 3.5, tail=4)
    assert not mask.any() and np.all(gw == 1.0)


def test_fast_profile_grids_nest_into_exact_grid():
    """The r5 fast/turbo profiles (unipc@10 / unipc@8) rely on GRID
    NESTING: every knot of the S-step trailing schedule must lie ON the
    40-step exact grid whenever 1000/S is a multiple of 1000/40 = 25
    (BASELINE.md r5 — this alignment is worth ~1 dB PSNR-vs-exact and is
    why the profiles run pure UniPC with no caching). Pins the property
    against SchedulerConfig default drift and keeps the PROFILE_DEFAULTS
    step counts honest."""
    from hallo_tpu.diffusion import schedule

    cfg = SchedulerConfig()
    exact = set(schedule.inference_timesteps(cfg, 40).tolist())
    for s in (5, 8, 10, 20):
        ts = schedule.inference_timesteps(cfg, s)
        assert set(ts.tolist()) <= exact, (s, sorted(set(ts) - exact))
    # and the profile definitions actually use nested counts
    from scripts.inference import PROFILE_DEFAULTS

    for name in ("fast", "turbo"):
        s = PROFILE_DEFAULTS[name]["inference_steps"]
        assert 1000 % s == 0 and (1000 // s) % 25 == 0, (name, s)
