"""Uniform sampler interface over DDIM, DPM-Solver++ (2M), and UniPC.

Both pipelines run their denoise loop inside `lax.fori_loop`, so a sampler
is exposed as a (state, init_carry, step) triple where `step` is a pure
function of the loop index. DDIM is stateless across steps (empty carry);
DPM-Solver++ 2M carries the previous step's x0 estimate (the multistep
history that buys second-order accuracy for free — no extra model evals);
UniPC additionally carries the previous corrected sample and one more x0
for its corrector. Carries are opaque pytrees to the pipelines.

The reference ships only DDIM (hallo scripts/inference.py:193 +
configs/inference/default.yaml:77-90); "dpm++2m" is the TPU rebuild's
eval-reduction path: 15-20 evals targeting 40-step-DDIM quality.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion import ddim, dpm, unipc
from hallo_tpu.diffusion import schedule as schedule_mod

SAMPLERS = ("ddim", "dpm++2m", "unipc")


class Sampler(NamedTuple):
    """Scan-friendly sampler handle.

    - `timesteps` (S,) int32 descending: the model is evaluated at
      timesteps[i] on loop step i.
    - `init_carry(latents)` builds the per-trajectory carry (history).
    - `step(i, model_output, sample, carry) -> (new_sample, new_carry)`.
    """

    name: str
    state: Union[ddim.DDIMState, dpm.DPMState, unipc.UniPCState]
    init_carry: Callable[[jax.Array], Any]  # latents -> carry pytree
    step: Callable[
        [jax.Array, jax.Array, jax.Array, Any],
        Tuple[jax.Array, Any],
    ]

    @property
    def timesteps(self) -> jax.Array:
        return self.state.timesteps

    @property
    def num_steps(self) -> int:
        return self.state.timesteps.shape[0]


def make_sampler(
    cfg: SchedulerConfig,
    name: str,
    num_inference_steps: int,
    timestep_schedule: str = "trailing",
    schedule_rho: float = 1.0,
) -> Sampler:
    """`timestep_schedule="logsnr"` replaces the trailing-uniform eval grid
    with knots spaced in log-SNR (schedule.logsnr_timesteps; rho curves the
    spacing) — same endpoints, redistributed interior knots. "trailing" is
    reference parity (default.yaml:90)."""
    name = (name or "ddim").lower()
    if timestep_schedule in (None, "", "trailing", "default"):
        ts = None
    elif timestep_schedule == "logsnr":
        ts = schedule_mod.logsnr_timesteps(
            cfg, num_inference_steps, rho=schedule_rho
        )
    else:
        raise ValueError(
            f"timestep_schedule={timestep_schedule!r}: 'trailing' or 'logsnr'"
        )
    if name == "ddim":
        state = ddim.make_state(cfg, num_inference_steps, timesteps=ts)

        def init_carry(latents: jax.Array) -> jax.Array:
            del latents
            return jnp.zeros((), jnp.float32)  # no history

        def step(i, model_output, sample, carry):
            return ddim.ddim_step(state, i, model_output, sample), carry

        return Sampler("ddim", state, init_carry, step)

    if name in ("dpm++2m", "dpm", "dpmsolver++"):
        state = dpm.make_state(cfg, num_inference_steps, timesteps=ts)

        def init_carry(latents: jax.Array) -> jax.Array:
            # prev_x0 history; step 0's second-order weight is 0 so the
            # zeros are never read.
            return jnp.zeros(latents.shape, jnp.float32)

        def step(i, model_output, sample, carry):
            return dpm.dpm_step(state, i, model_output, sample, carry)

        return Sampler("dpm++2m", state, init_carry, step)

    if name == "unipc":
        state = unipc.make_state(cfg, num_inference_steps, timesteps=ts)

        def step(i, model_output, sample, carry):
            return unipc.unipc_step(state, i, model_output, sample, carry)

        return Sampler("unipc", state, unipc.init_carry, step)

    raise ValueError(f"sampler={name!r}: expected one of {SAMPLERS}")
