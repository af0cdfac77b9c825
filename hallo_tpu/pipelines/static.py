"""Static (single-image) pipeline — the stage-1 validation path.

Reference: hallo/animate/face_animate_static.py:76-481 (StaticPipeline):
same skeleton as the video pipeline with a single frame, no motion frames,
no audio — exercises config -> weights -> ReferenceNet injection -> CFG
denoise -> decode with the fewest parts (SURVEY.md §7.2 step 5)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion.sampler import make_sampler
from hallo_tpu.models.unet_denoise import spatial_ref_kv
from hallo_tpu.pipelines.face_animate import HalloModels


class StaticPipeline:
    """One reference portrait -> one generated image (identity transfer)."""

    def __init__(
        self,
        models: HalloModels,
        scheduler: SchedulerConfig = SchedulerConfig(),
        num_inference_steps: int = 20,
        guidance_scale: float = 3.5,
        sampler: str = "ddim",
    ):
        self.models = models
        self.guidance_scale = float(guidance_scale)
        self._samp = make_sampler(scheduler, sampler, num_inference_steps)
        self._run = jax.jit(self._sample_fn)

    def _sample_fn(
        self,
        params: Dict[str, Any],
        ref_pixels: jax.Array,   # (B, H, W, 3) in [-1, 1]
        latents: jax.Array,      # (B, 1, H/8, W/8, 4)
        face_emb: jax.Array,     # (B, 512)
        face_region: jax.Array,  # (B, H, W, 3)
    ) -> jax.Array:
        m = self.models
        b = ref_pixels.shape[0]

        ref_latents = m.vae.apply(params["vae"], ref_pixels, method=m.vae.encode_mean)
        ref_latents = jnp.tile(ref_latents, (2, 1, 1, 1))

        tokens_c = m.image_proj.apply(params["image_proj"], face_emb)
        tokens_u = m.image_proj.apply(params["image_proj"], jnp.zeros_like(face_emb))
        context = jnp.concatenate([tokens_u, tokens_c], axis=0)

        _, feats = m.reference_net.apply(
            params["reference_net"], ref_latents, jnp.zeros(()), context
        )
        ref_feats = feats  # single ref frame: bank is the whole batch
        # Step-invariant ref K/V can hoist out of the denoise loop (exact
        # math; see unet_denoise.spatial_ref_kv / tests/test_ref_kv_hoist.py)
        # but measured slower at 512² (r4 A/B in BASELINE.md) — default OFF.
        ref_kv = (
            spatial_ref_kv(params["denoising_net"], ref_feats, m.denoising_net.dtype)
            if os.environ.get("HALLO_HOIST_REF_KV", "0") == "1"
            else None
        )

        mask_video = face_region[:, None]
        face_cond = m.face_locator.apply(params["face_locator"], mask_video)
        face_cond = jnp.concatenate([jnp.zeros_like(face_cond), face_cond], axis=0)

        uncond_mask = jnp.concatenate([jnp.ones((b,)), jnp.zeros((b,))])

        samp = self._samp

        def body(i, carry):
            lat, sc = carry
            t = samp.timesteps[i]
            model_in = jnp.tile(lat, (2, 1, 1, 1, 1))
            out = m.denoising_net.apply(
                params["denoising_net"],
                model_in,
                t,
                context,
                ref_feats,
                None,
                None,
                face_cond,
                None,
                None,
                uncond_mask,
                ref_kv=ref_kv,
            )
            un, co = out[:b], out[b:]
            guided = un + self.guidance_scale * (co - un)
            return samp.step(i, guided, lat, sc)

        latents, _ = jax.lax.fori_loop(
            0, samp.num_steps, body, (latents, samp.init_carry(latents))
        )
        img = m.vae.apply(params["vae"], latents[:, 0], method=m.vae.decode)
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    def __call__(
        self,
        ref_image: np.ndarray,
        face_emb: np.ndarray,
        face_region: np.ndarray,
        seed: int = 42,
    ) -> np.ndarray:
        b, h, w, _ = ref_image.shape
        latents = jax.random.normal(
            jax.random.PRNGKey(seed), (b, 1, h // 8, w // 8, 4), jnp.float32
        )
        return np.asarray(
            self._run(
                self.models.params,
                jnp.asarray(ref_image, jnp.float32),
                latents,
                jnp.asarray(face_emb, jnp.float32),
                jnp.asarray(face_region, jnp.float32),
            )
        )
