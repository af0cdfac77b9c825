"""DDIM sampling step as a pure function (scan-friendly).

Replaces diffusers DDIMScheduler.step for the reference's configuration
(v-prediction, eta=0, clip_sample=False, no thresholding; the zero-SNR /
trailing choices live in hallo_tpu.diffusion.schedule).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion import schedule


class DDIMState(NamedTuple):
    """Static sampling tables, device-resident."""

    timesteps: jax.Array  # (S,) int32, descending
    alphas_cumprod: jax.Array  # (T,) float32
    final_alpha_cumprod: jax.Array  # () float32
    prediction_type: str = "v_prediction"

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_state(cfg: SchedulerConfig, num_inference_steps: int,
               timesteps=None) -> DDIMState:
    ac = schedule.alphas_cumprod(cfg)
    ts = (np.asarray(timesteps) if timesteps is not None
          else schedule.inference_timesteps(cfg, num_inference_steps))
    # set_alpha_to_one=False default in the reference config -> the "final"
    # alpha used when stepping past t=0 is alphas_cumprod[0].
    return DDIMState(
        timesteps=jnp.asarray(ts, jnp.int32),
        alphas_cumprod=jnp.asarray(ac),
        final_alpha_cumprod=jnp.asarray(ac[0]),
        prediction_type=cfg.prediction_type,
    )


def predict_x0_eps(
    model_output: jax.Array,
    sample: jax.Array,
    alpha_prod_t: jax.Array,
    prediction_type: str,
):
    sqrt_a = jnp.sqrt(alpha_prod_t)
    sqrt_1ma = jnp.sqrt(1.0 - alpha_prod_t)
    if prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_1ma * model_output
        eps = sqrt_a * model_output + sqrt_1ma * sample
    elif prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sqrt_1ma * eps) / sqrt_a
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_1ma
    else:
        raise ValueError(prediction_type)
    return x0, eps


def ddim_step(
    state: DDIMState,
    step_index: jax.Array,
    model_output: jax.Array,
    sample: jax.Array,
) -> jax.Array:
    """x_t -> x_{t-step_ratio} with eta=0 (deterministic DDIM)."""
    t = state.timesteps[step_index]
    num_train = state.alphas_cumprod.shape[0]
    step_ratio = num_train // state.num_steps
    prev_t = t - step_ratio

    alpha_t = state.alphas_cumprod[t]
    alpha_prev = jnp.where(
        prev_t >= 0, state.alphas_cumprod[jnp.maximum(prev_t, 0)],
        state.final_alpha_cumprod,
    )
    outf = model_output.astype(jnp.float32)
    samplef = sample.astype(jnp.float32)
    x0, eps = predict_x0_eps(outf, samplef, alpha_t, state.prediction_type)
    prev = jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps
    return prev.astype(sample.dtype)


def add_noise(
    alphas_cumprod: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
    timesteps: jax.Array,
) -> jax.Array:
    """Forward diffusion q(x_t | x_0) (training)."""
    a = alphas_cumprod[timesteps].astype(jnp.float32)
    while a.ndim < sample.ndim:
        a = a[..., None]
    return (
        jnp.sqrt(a) * sample.astype(jnp.float32)
        + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    ).astype(sample.dtype)


def get_velocity(
    alphas_cumprod: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
    timesteps: jax.Array,
) -> jax.Array:
    """v-prediction training target (diffusers get_velocity)."""
    a = alphas_cumprod[timesteps].astype(jnp.float32)
    while a.ndim < sample.ndim:
        a = a[..., None]
    return (
        jnp.sqrt(a) * noise.astype(jnp.float32)
        - jnp.sqrt(1.0 - a) * sample.astype(jnp.float32)
    ).astype(sample.dtype)


def compute_snr(alphas_cumprod: jax.Array, timesteps: jax.Array) -> jax.Array:
    """SNR(t) for Min-SNR-gamma loss weighting (reference util.py:822-851)."""
    a = alphas_cumprod[timesteps].astype(jnp.float32)
    return a / (1.0 - a)
