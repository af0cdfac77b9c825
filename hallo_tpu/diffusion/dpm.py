"""DPM-Solver++ (2M) multistep sampler as a pure function (scan-friendly).

Higher-order ODE solver for the probability-flow ODE (Lu et al. 2022,
"DPM-Solver++: Fast Solver for Guided Sampling of Diffusion Probabilistic
Models"). Replaces the 40-step DDIM loop with 15-20 model evaluations at
comparable quality: the data-prediction (x0) parametrization integrates the
semi-linear ODE exactly in its linear part, and the 2M (two-step multistep)
correction cancels the leading local error term using the PREVIOUS step's
x0 estimate — no extra model evaluations per step.

Semantics follow diffusers' DPMSolverMultistepScheduler with
algorithm_type="dpmsolver++", solver_order=2, lower_order_final=True, for
the reference's scheduler configuration (v-prediction, trailing spacing,
zero-SNR rescale — /root/reference/configs/inference/default.yaml:77-90;
the reference itself ships DDIM, this sampler is the TPU rebuild's
eval-reduction path). Zero-terminal-SNR handling matches diffusers: the
final cumulative alpha is clamped to 2**-24 so log-SNR stays finite.

All step coefficients are precomputed on host in float64 and looked up by
step index, so the device step is a handful of fused multiply-adds — the
whole sampler works inside `lax.fori_loop` with a single (prev_x0) carry.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion import schedule


class DPMState(NamedTuple):
    """Static per-step coefficient tables, device-resident.

    For step i the model is evaluated at `timesteps[i]` and the sample is
    advanced to the next boundary (the final boundary is (alpha=1, sigma=0),
    i.e. the last update returns the x0 estimate, diffusers parity).
    """

    timesteps: jax.Array  # (S,) int32, descending
    alpha_s: jax.Array  # (S,) sqrt(alpha_cumprod) at the eval point
    sigma_s: jax.Array  # (S,) sqrt(1 - alpha_cumprod) at the eval point
    coef_x: jax.Array  # (S,) sigma_next / sigma_s   (0 at the last step)
    coef_d: jax.Array  # (S,) alpha_next * (1 - exp(-h))  (1 at the last step)
    c2: jax.Array  # (S,) second-order weight h_i / (2 h_{i-1}); 0 at i=0 and i=S-1
    prediction_type: str = "v_prediction"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_state(cfg: SchedulerConfig, num_inference_steps: int,
               timesteps=None) -> DPMState:
    acp = schedule.alphas_cumprod(cfg).astype(np.float64)
    if cfg.rescale_betas_zero_snr:
        # Zero terminal SNR makes lambda = log(alpha/sigma) -> -inf at the
        # last trained timestep; diffusers clamps it (scheduling_dpmsolver_
        # multistep: alphas_cumprod[-1] = 2**-24).
        acp[-1] = max(acp[-1], 2.0**-24)
    ts = (np.asarray(timesteps) if timesteps is not None
          else schedule.inference_timesteps(cfg, num_inference_steps))
    n = len(ts)

    alpha = np.sqrt(acp[ts])  # (S,)
    sigma = np.sqrt(1.0 - acp[ts])
    lam = np.log(alpha / sigma)

    # Boundaries: step i advances from timesteps[i] to timesteps[i+1]; the
    # final boundary is clean data (alpha=1, sigma=0, lambda=+inf).
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])

    coef_x = np.zeros(n)
    coef_d = np.zeros(n)
    c2 = np.zeros(n)
    h = np.zeros(n)
    for i in range(n):
        if i == n - 1:
            h[i] = np.inf
            coef_x[i] = 0.0
            coef_d[i] = 1.0  # alpha_next=1, (1 - exp(-inf)) = 1
        else:
            h[i] = np.log(alpha_next[i] / sigma_next[i]) - lam[i]
            coef_x[i] = sigma_next[i] / sigma[i]
            coef_d[i] = alpha_next[i] * -np.expm1(-h[i])
        if 0 < i < n - 1:  # first step has no history; last is first-order
            c2[i] = h[i] / (2.0 * h[i - 1])

    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return DPMState(
        timesteps=jnp.asarray(ts, jnp.int32),
        alpha_s=f32(alpha),
        sigma_s=f32(sigma),
        coef_x=f32(coef_x),
        coef_d=f32(coef_d),
        c2=f32(c2),
        prediction_type=cfg.prediction_type,
    )


def to_x0(
    model_output: jax.Array,
    sample: jax.Array,
    alpha_s: jax.Array,
    sigma_s: jax.Array,
    prediction_type: str,
) -> jax.Array:
    """Convert the raw model output at (sample, t) to a clean-data estimate."""
    if prediction_type == "v_prediction":
        return alpha_s * sample - sigma_s * model_output
    if prediction_type == "epsilon":
        return (sample - sigma_s * model_output) / alpha_s
    if prediction_type == "sample":
        return model_output
    raise ValueError(prediction_type)


def dpm_step(
    state: DPMState,
    step_index: jax.Array,
    model_output: jax.Array,
    sample: jax.Array,
    prev_x0: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One 2M update: x_i -> x_{i+1}. Returns (new_sample, x0_estimate).

    Carry `x0_estimate` into the next call's `prev_x0`; pass zeros at i=0
    (its weight c2[0] is 0, so the value is ignored).
    """
    outf = model_output.astype(jnp.float32)
    samplef = sample.astype(jnp.float32)
    x0 = to_x0(
        outf, samplef, state.alpha_s[step_index], state.sigma_s[step_index],
        state.prediction_type,
    )
    d = x0 + state.c2[step_index] * (x0 - prev_x0)
    prev = state.coef_x[step_index] * samplef + state.coef_d[step_index] * d
    return prev.astype(sample.dtype), x0
