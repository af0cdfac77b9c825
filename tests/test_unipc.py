"""UniPC (order-2, bh2) sampler numerics.

Mirrors tests/test_dpm.py's triangulation:
1. perfect-model recovery (exact-v model must land on x0),
2. analytic Gaussian probability-flow ODE: the corrector must beat plain
   DPM-Solver++ (2M) at equal model evals — the whole point of UniPC,
3. a generic float64 numpy oracle transcribing diffusers'
   UniPCMultistepScheduler (predict_x0, solver_order=2, bh2,
   lower_order_final, final_sigmas_type="zero") with the explicit R/b
   matrix construction and linalg.solve — cross-checking the folded
   per-step tables in hallo_tpu/diffusion/unipc.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion import schedule, unipc
from hallo_tpu.diffusion.sampler import make_sampler


def test_unipc_state_tables():
    cfg = SchedulerConfig()
    st = unipc.make_state(cfg, 12)
    assert st.num_steps == 12
    # corrector off at i=0, on elsewhere; order-1 corrector at i=1
    assert float(st.gate[0]) == 0.0 and (np.asarray(st.gate[1:]) == 1.0).all()
    assert float(st.c_hist[1]) == 0.0 and float(st.c_dt[1]) == 0.5
    assert (np.asarray(st.c_hist[2:]) != 0.0).all()
    # predictor tables match DPM-Solver++ 2M exactly (same algebra)
    from hallo_tpu.diffusion import dpm

    dst = dpm.make_state(cfg, 12)
    np.testing.assert_allclose(np.asarray(st.coef_x), np.asarray(dst.coef_x))
    np.testing.assert_allclose(np.asarray(st.coef_d), np.asarray(dst.coef_d))
    np.testing.assert_allclose(np.asarray(st.c2), np.asarray(dst.c2))


def test_unipc_perfect_v_recovers_x0_exactly():
    cfg = SchedulerConfig()
    st = unipc.make_state(cfg, 10)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))

    @jax.jit
    def run(x0, noise):
        def body(i, carry):
            sample, sc = carry
            a, s = st.alpha_s[i], st.sigma_s[i]
            eps = (sample - a * x0) / jnp.maximum(s, 1e-20)
            v = a * eps - s * x0
            return unipc.unipc_step(st, i, v, sample, sc)

        return jax.lax.fori_loop(
            0, st.num_steps, body, (noise, unipc.init_carry(noise))
        )[0]

    out = run(x0, noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=2e-5)


def _gaussian_ode_error(sampler_name: str, num_steps: int) -> float:
    """Same analytic probability-flow ODE as test_dpm._gaussian_ode_error:
    Gaussian data N(0, s^2 I), exact eps-prediction model, trajectories
    scale as std_tot(t)."""
    s2 = 0.25
    cfg = SchedulerConfig(
        prediction_type="epsilon",
        rescale_betas_zero_snr=False,
        timestep_spacing="trailing",
    )
    samp = make_sampler(cfg, sampler_name, num_steps)
    acp = jnp.asarray(schedule.alphas_cumprod(cfg))
    rng = np.random.default_rng(1)
    x_init = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    @jax.jit
    def run(x):
        def body(i, carry):
            x, sc = carry
            t = samp.timesteps[i]
            a = acp[t]
            std_tot2 = a * s2 + (1.0 - a)
            eps = jnp.sqrt(1.0 - a) * x / std_tot2
            return samp.step(i, eps, x, sc)

        return jax.lax.fori_loop(
            0, samp.num_steps, body, (x, samp.init_carry(x))
        )[0]

    out = np.asarray(run(x_init))
    acp_np = schedule.alphas_cumprod(cfg)
    t0 = int(np.asarray(samp.timesteps)[0])
    std0 = np.sqrt(acp_np[t0] * s2 + (1.0 - acp_np[t0]))
    std_end = np.sqrt(1.0 * s2)  # both dpm and unipc integrate to clean data
    exact = np.asarray(x_init) * std_end / std0
    return float(np.abs(out - exact).mean() / np.abs(exact).mean())


def test_unipc_gaussian_ode_beats_dpm2m():
    """The corrector buys accuracy at equal evals. Measured on this toy the
    margin is small (~2-3% at 8-20 evals): the GLOBAL error of both
    samplers is dominated by the order-1 warmup step over the largest
    log-SNR interval (trailing spacing), which the corrector can only
    partially repair (its step-1 order is 1 too — diffusers parity). The
    real-network value at low evals is measured on-chip by
    scripts/eval_cache_quality.py, not asserted here."""
    for n in (8, 10, 15, 20):
        err_dpm = _gaussian_ode_error("dpm++2m", n)
        err_uni = _gaussian_ode_error("unipc", n)
        assert err_uni < err_dpm * 1.001, (n, err_uni, err_dpm)
    # and the error keeps shrinking with evals
    assert _gaussian_ode_error("unipc", 30) < 0.5 * _gaussian_ode_error(
        "unipc", 15
    )


def _oracle_unipc(cfg, n, fields, x_start, order=2):
    """Generic diffusers UniPCMultistepScheduler transcription (float64,
    sigma-space parametrization, explicit R/b solve), fake model
    v = 0.3*x + fields[i] evaluated at the step's incoming sample."""
    acp = schedule.alphas_cumprod(cfg).astype(np.float64)
    if cfg.rescale_betas_zero_snr:
        acp[-1] = max(acp[-1], 2.0**-24)
    ts = schedule.inference_timesteps(cfg, n)
    sig_d = np.sqrt((1.0 - acp[ts]) / acp[ts])
    sig_d = np.concatenate([sig_d, [0.0]])  # final_sigmas_type="zero"
    alpha_t = 1.0 / np.sqrt(1.0 + sig_d**2)
    sigma_t = sig_d * alpha_t
    with np.errstate(divide="ignore"):
        lam = np.log(alpha_t) - np.log(sigma_t)  # +inf at the end

    def rb(hh, rks, order):
        h_phi_1 = np.expm1(hh)
        b_h = np.expm1(hh)  # bh2
        h_phi_k = h_phi_1 / hh - 1.0
        R, b, fact = [], [], 1
        for k in range(1, order + 1):
            R.append(np.power(rks, k - 1))
            b.append(h_phi_k * fact / b_h)
            fact *= k + 1
            h_phi_k = h_phi_k / hh - 1.0 / fact
        return np.array(R), np.array(b), h_phi_1, b_h

    def uni_c(i, model_t, last_sample, model_outputs, order):
        m0 = model_outputs[-1]
        h = lam[i] - lam[i - 1]
        rks, d1s = [], []
        for k in range(1, order):
            si = i - 1 - k
            mi = model_outputs[-(k + 1)]
            rk = (lam[si] - lam[i - 1]) / h
            rks.append(rk)
            d1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, b_h = rb(-h, np.array(rks), order)
        rhos_c = np.array([0.5]) if order == 1 else np.linalg.solve(R, b)
        x_t_ = (sigma_t[i] / sigma_t[i - 1]) * last_sample \
            - alpha_t[i] * h_phi_1 * m0
        corr = sum(rhos_c[k] * d1s[k] for k in range(order - 1))
        d1_t = model_t - m0
        return x_t_ - alpha_t[i] * b_h * (corr + rhos_c[-1] * d1_t)

    def uni_p(i, x, model_outputs, order):
        m0 = model_outputs[-1]
        with np.errstate(invalid="ignore"):
            h = lam[i + 1] - lam[i]
            rks, d1s = [], []
            for k in range(1, order):
                si = i - k
                mi = model_outputs[-(k + 1)]
                rk = (lam[si] - lam[i]) / h
                rks.append(rk)
                d1s.append((mi - m0) / rk)
            rks.append(1.0)
            R, b, h_phi_1, b_h = rb(-h, np.array(rks), order)
        if order == 1:
            rhos_p = None
        elif order == 2:
            rhos_p = np.array([0.5])  # diffusers hardcodes at order 2
        else:
            rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
        x_t_ = (sigma_t[i + 1] / sigma_t[i]) * x - alpha_t[i + 1] * h_phi_1 * m0
        pred = sum(rhos_p[k] * d1s[k] for k in range(order - 1)) \
            if order > 1 else 0.0
        return x_t_ - alpha_t[i + 1] * b_h * pred

    x = x_start.copy()
    model_outputs = []
    last_sample = None
    this_order_prev = None
    lower_order_nums = 0
    for i in range(n):
        v = 0.3 * x + fields[i]
        x0 = alpha_t[i] * x - sigma_t[i] * v  # v-pred conversion
        if i > 0 and last_sample is not None:
            x = uni_c(i, x0, last_sample, model_outputs, this_order_prev)
        model_outputs.append(x0)
        this_order = min(order, n - i)  # lower_order_final
        this_order = min(this_order, lower_order_nums + 1)  # warmup
        last_sample = x
        x = uni_p(i, x, model_outputs, this_order)
        if lower_order_nums < order:
            lower_order_nums += 1
        this_order_prev = this_order
    return x


def test_unipc_matches_diffusers_oracle():
    cfg = SchedulerConfig()  # v-pred, trailing, zero-SNR (reference parity)
    n = 8
    st = unipc.make_state(cfg, n)

    rng = np.random.default_rng(2)
    shape = (2, 3, 4)
    fields = rng.normal(size=(n,) + shape).astype(np.float64)
    x_start = rng.normal(size=shape).astype(np.float64)

    want = _oracle_unipc(cfg, n, fields, x_start)

    fields_j = jnp.asarray(fields, jnp.float32)

    @jax.jit
    def run(x):
        def body(i, carry):
            x, sc = carry
            v = 0.3 * x + fields_j[i]
            return unipc.unipc_step(st, i, v, x, sc)

        return jax.lax.fori_loop(
            0, n, body, (x, unipc.init_carry(x))
        )[0]

    ours = np.asarray(run(jnp.asarray(x_start, jnp.float32)))
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_unipc_oracle_n2_edge():
    """n=2: corrector runs once at order 1, both predictor steps are
    order 1 (warmup + lower_order_final)."""
    cfg = SchedulerConfig()
    n = 2
    st = unipc.make_state(cfg, n)
    rng = np.random.default_rng(3)
    shape = (5,)
    fields = rng.normal(size=(n,) + shape).astype(np.float64)
    x_start = rng.normal(size=shape).astype(np.float64)
    want = _oracle_unipc(cfg, n, fields, x_start)

    fields_j = jnp.asarray(fields, jnp.float32)
    x = jnp.asarray(x_start, jnp.float32)
    sc = unipc.init_carry(x)
    for i in range(n):
        v = 0.3 * x + fields_j[i]
        x, sc = unipc.unipc_step(st, jnp.int32(i), v, x, sc)
    np.testing.assert_allclose(np.asarray(x), want, rtol=3e-4, atol=3e-4)


def test_sampler_factory_unipc():
    cfg = SchedulerConfig()
    s = make_sampler(cfg, "unipc", 12)
    assert s.num_steps == 12 and s.name == "unipc"
    z = jnp.zeros((2, 3))
    carry = s.init_carry(z)
    assert isinstance(carry, unipc.UniPCCarry)
    assert carry.prev_x0.shape == (2, 3)
