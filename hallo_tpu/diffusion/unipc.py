"""UniPC (order-2, bh2) multistep predictor-corrector sampler.

Zhao et al. 2023, "UniPC: A Unified Predictor-Corrector Framework for Fast
Sampling of Diffusion Models". Semantics follow diffusers'
UniPCMultistepScheduler with predict_x0=True, solver_order=2,
solver_type="bh2", lower_order_final=True, final_sigmas_type="zero" — for
the reference's scheduler config (v-prediction, trailing spacing, zero-SNR
rescale; /root/reference/configs/inference/default.yaml:77-90. The
reference itself ships DDIM; like dpm.py this sampler is the TPU rebuild's
eval-reduction path).

Why it exists: the UniP-bh2 order-2 *predictor* is algebraically identical
to DPM-Solver++ (2M) (dpm.dpm_step — the B(h)=e^{-h}-1 variant), but the
UniC *corrector* re-uses each step's model evaluation to correct the
CURRENT point before advancing, lifting local accuracy one order at ZERO
extra model evals. Measured honestly: on the analytic Gaussian
probability-flow ODE the equal-eval margin over 2M is small (~2-3% at
8-20 evals; tests/test_unipc.py) because both samplers' global error is
dominated by the order-1 warmup step over the largest trailing-spacing
log-SNR interval. Whether the corrector buys visible quality on the real
network at 10-15 evals is measured by scripts/eval_cache_quality.py
(HALLO_EVAL_UNIPC=1) — keep it only if that says so.

TPU shape: as in dpm.py, every step coefficient is precomputed on host in
float64 into (S,) tables looked up by loop index, so the device step is a
handful of fused multiply-adds inside `lax.fori_loop`; the carry is
(prev_x0, prev2_x0, last_corrected_sample) — three latents-sized f32
arrays (~6 MB at the production 2x16x64x64x4 latent shape, negligible).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion import schedule
from hallo_tpu.diffusion.dpm import to_x0


class UniPCState(NamedTuple):
    """Static per-step coefficient tables, device-resident.

    Step i: (1) UniC-correct the current sample x_i (gate[i]=0 disables at
    i=0), using the model eval AT x_i, the previous corrected sample and
    the x0 history; (2) UniP-advance the corrected x_i to the next
    boundary (identical algebra to dpm.dpm_step). x0 history is always the
    estimate from the UNCORRECTED sample (diffusers parity).
    """

    timesteps: jax.Array  # (S,) int32, descending
    alpha_s: jax.Array  # (S,) sqrt(alpha_cumprod) at the eval point
    sigma_s: jax.Array  # (S,) sqrt(1 - alpha_cumprod) at the eval point
    # predictor (== DPM-Solver++ 2M; see dpm.make_state for the derivation)
    coef_x: jax.Array  # (S,) sigma_next / sigma_s (0 at the last step)
    coef_d: jax.Array  # (S,) alpha_next * (1 - exp(-h)) (1 at the last step)
    c2: jax.Array  # (S,) h_i / (2 h_{i-1}); 0 at i=0 and i=S-1
    # corrector (x_{i-1} -> corrected x_i), all 0 at i=0
    gate: jax.Array  # (S,) 1.0 where the corrector applies (i >= 1)
    c_x: jax.Array  # (S,) sigma_i / sigma_{i-1}
    c_k: jax.Array  # (S,) alpha_i * (1 - exp(-h_{i-1}))
    c_hist: jax.Array  # (S,) weight on (x0_{i-2} - x0_{i-1}); 0 if order<2
    c_dt: jax.Array  # (S,) weight on D1_t = (x0_i - x0_{i-1})
    prediction_type: str = "v_prediction"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_state(cfg: SchedulerConfig, num_inference_steps: int,
               timesteps=None) -> UniPCState:
    acp = schedule.alphas_cumprod(cfg).astype(np.float64)
    if cfg.rescale_betas_zero_snr:
        # keep log-SNR finite at the last trained timestep (diffusers clamp)
        acp[-1] = max(acp[-1], 2.0**-24)
    ts = (np.asarray(timesteps) if timesteps is not None
          else schedule.inference_timesteps(cfg, num_inference_steps))
    n = len(ts)

    alpha = np.sqrt(acp[ts])
    sigma = np.sqrt(1.0 - acp[ts])
    lam = np.log(alpha / sigma)

    alpha_next = np.concatenate([alpha[1:], [1.0]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])

    coef_x = np.zeros(n)
    coef_d = np.zeros(n)
    c2 = np.zeros(n)
    h = np.zeros(n)  # h[i] = lambda(next boundary) - lambda(eval i)
    for i in range(n):
        if i == n - 1:
            h[i] = np.inf
            coef_x[i] = 0.0
            coef_d[i] = 1.0
        else:
            h[i] = np.log(alpha_next[i] / sigma_next[i]) - lam[i]
            coef_x[i] = sigma_next[i] / sigma[i]
            coef_d[i] = alpha_next[i] * -np.expm1(-h[i])
        if 0 < i < n - 1:  # predictor warmup at i=0; lower_order_final
            c2[i] = h[i] / (2.0 * h[i - 1])

    gate = np.zeros(n)
    c_x = np.zeros(n)
    c_k = np.zeros(n)
    c_hist = np.zeros(n)
    c_dt = np.zeros(n)
    for i in range(1, n):
        # Corrector from x_{i-1} to x_i spans h_c = lam[i] - lam[i-1].
        h_c = lam[i] - lam[i - 1]
        hh = -h_c  # predict_x0 sign convention (diffusers uni_c: hh = -h)
        b_h = np.expm1(hh)  # bh2: B(h) = e^{hh} - 1
        gate[i] = 1.0
        c_x[i] = sigma[i] / sigma[i - 1]
        c_k[i] = alpha[i] * -np.expm1(hh)  # = -alpha_i * h_phi_1
        # Corrector order at step i = the predictor order chosen at step
        # i-1 (diffusers: uni_c uses the previous step's this_order), which
        # with the order-2 warmup is 1 at i=1 and 2 for i >= 2.
        if i == 1:
            c_dt[i] = 0.5  # diffusers hardcodes rhos_c = [0.5] at order 1
        else:
            # order 2: solve [[1, 1], [rk0, 1]] @ rhos = [b0, b1]
            rk0 = (lam[i - 2] - lam[i - 1]) / h_c  # negative
            h_phi_1 = np.expm1(hh)
            h_phi_k1 = h_phi_1 / hh - 1.0
            b0 = h_phi_k1 / b_h
            h_phi_k2 = h_phi_k1 / hh - 0.5
            b1 = 2.0 * h_phi_k2 / b_h
            rho0 = (b0 - b1) / (1.0 - rk0)
            rho1 = b0 - rho0
            # D1s[0] = (x0_{i-2} - x0_{i-1}) / rk0; fold 1/rk0 into the
            # table so the device step is a plain difference.
            c_hist[i] = rho0 / rk0
            c_dt[i] = rho1

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return UniPCState(
        timesteps=jnp.asarray(ts, jnp.int32),
        alpha_s=f32(alpha),
        sigma_s=f32(sigma),
        coef_x=f32(coef_x),
        coef_d=f32(coef_d),
        c2=f32(c2),
        gate=f32(gate),
        c_x=f32(c_x),
        c_k=f32(c_k),
        c_hist=f32(c_hist),
        c_dt=f32(c_dt),
        prediction_type=cfg.prediction_type,
    )


class UniPCCarry(NamedTuple):
    prev_x0: jax.Array  # x0 estimate at step i-1 (from the uncorrected x)
    prev2_x0: jax.Array  # x0 estimate at step i-2
    last_sample: jax.Array  # corrected sample at step i-1


def init_carry(latents: jax.Array) -> UniPCCarry:
    z = jnp.zeros(latents.shape, jnp.float32)
    return UniPCCarry(z, z, z)


def unipc_step(
    state: UniPCState,
    step_index: jax.Array,
    model_output: jax.Array,
    sample: jax.Array,
    carry: UniPCCarry,
) -> Tuple[jax.Array, UniPCCarry]:
    """One UniC+UniP update: x_i -> x_{i+1}. Returns (new_sample, carry).

    `sample` is the UNCORRECTED x_i the model was just evaluated at; the
    x0 history entering the carry is likewise uncorrected-based (diffusers
    parity — convert_model_output runs before the corrector).
    """
    i = step_index
    outf = model_output.astype(jnp.float32)
    samplef = sample.astype(jnp.float32)
    x0 = to_x0(
        outf, samplef, state.alpha_s[i], state.sigma_s[i],
        state.prediction_type,
    )

    # --- UniC: correct x_i from x_{i-1} using the eval at x_i ---
    corrected = state.c_x[i] * carry.last_sample + state.c_k[i] * (
        carry.prev_x0
        + state.c_hist[i] * (carry.prev2_x0 - carry.prev_x0)
        + state.c_dt[i] * (x0 - carry.prev_x0)
    )
    x_i = jnp.where(state.gate[i] > 0, corrected, samplef)

    # --- UniP (== DPM-Solver++ 2M) from the corrected x_i ---
    d = x0 + state.c2[i] * (x0 - carry.prev_x0)
    new = state.coef_x[i] * x_i + state.coef_d[i] * d
    return new.astype(sample.dtype), UniPCCarry(x0, carry.prev_x0, x_i)
