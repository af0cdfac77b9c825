"""Audio-driven portrait animation pipeline.

TPU-first re-design of hallo/animate/face_animate.py:58-442 +
scripts/inference.py:285-343:

- The entire per-clip generation (VAE-encode refs -> ReferenceNet ->
  40-step CFG denoise loop -> batched VAE decode) is ONE jitted program with
  a lax.fori_loop; the reference's per-frame VAE decode loop
  (face_animate.py:238-241) becomes a single batched decode.
- The sliding window over clips stays a (short) Python loop that re-invokes
  the compiled program, carrying `n_motion_frames` tail frames
  (scripts/inference.py:291-339).
- CFG batch layout is [uncond | cond] like the reference; the uncond half's
  spatial self-attention masks out reference tokens via an additive bias
  (mutual_self_attention.py:264-284 equivalence).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hallo_tpu.config import (
    AudioProjConfig,
    FaceLocatorConfig,
    ImageProjConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from hallo_tpu.diffusion.sampler import make_sampler
from hallo_tpu.models.face_locator import FaceLocator
from hallo_tpu.models.projections import AudioProj, ImageProj
from hallo_tpu.models.unet_denoise import DenoisingUNet, spatial_ref_kv
from hallo_tpu.models.unet_ref import ReferenceNet
from hallo_tpu.models.vae import AutoencoderKL


@dataclasses.dataclass
class HalloModels:
    """Module definitions + parameters for the five networks
    (reference `Net`, scripts/inference.py:51-94)."""

    vae: AutoencoderKL
    reference_net: ReferenceNet
    denoising_net: DenoisingUNet
    face_locator: FaceLocator
    image_proj: ImageProj
    audio_proj: AudioProj
    params: Dict[str, Any]  # keys: vae, reference_net, denoising_net, ...

    def init_params(
        self,
        key: jax.Array,
        height: int = 512,
        width: int = 512,
        clip_length: int = 16,
        n_motion_frames: int = 2,
        param_dtype=None,
    ) -> Dict[str, Any]:
        """Random-initialize all six parameter trees with consistent shapes
        (converted pretrained weights replace these in production).
        param_dtype (e.g. bf16 for inference benches) casts each module's
        params right after its init so fp32+bf16 copies never coexist for
        more than one module (16 GB HBM budget)."""
        ip = self.image_proj.config
        ap = self.audio_proj.config
        den = self.denoising_net.config
        hl, wl = height // 8, width // 8
        f, m = clip_length, n_motion_frames
        keys = jax.random.split(key, 6)
        params: Dict[str, Any] = {}

        def _cast(tree):
            if param_dtype is None:
                return tree
            return jax.tree.map(
                lambda x: x.astype(param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        params["vae"] = _cast(
            jax.jit(self.vae.init)(keys[0], jnp.zeros((1, height, width, 3)))
        )
        ref_b = 1 + m
        ctx_dim = den.cross_attention_dim
        params["reference_net"] = _cast(
            jax.jit(self.reference_net.init)(
                keys[1],
                jnp.zeros((ref_b, hl, wl, 4)),
                jnp.zeros(()),
                jnp.zeros((ref_b, ip.clip_extra_context_tokens, ctx_dim)),
            )
        )
        params["face_locator"] = _cast(
            jax.jit(self.face_locator.init)(
                keys[2], jnp.zeros((1, f, height, width, 3))
            )
        )
        params["image_proj"] = _cast(
            jax.jit(self.image_proj.init)(keys[3], jnp.zeros((1, ip.clip_embeddings_dim)))
        )
        params["audio_proj"] = _cast(
            jax.jit(self.audio_proj.init)(
                keys[4], jnp.zeros((1, f, ap.seq_len, ap.blocks, ap.channels))
            )
        )
        feat_shapes = jax.eval_shape(
            lambda p: self.reference_net.apply(
                p,
                jnp.zeros((2 * ref_b, hl, wl, 4)),
                jnp.zeros(()),
                jnp.zeros((2 * ref_b, ip.clip_extra_context_tokens, ctx_dim)),
            )[1],
            params["reference_net"],
        )
        ref_feats = jax.tree.map(
            lambda s: jnp.zeros((2,) + s.shape[1:], s.dtype), feat_shapes
        )
        motion_feats = jax.tree.map(
            lambda s: jnp.zeros((2, m) + s.shape[1:], s.dtype), feat_shapes
        )
        masks = tuple(
            tuple(jnp.ones((2 * f, (hl // 2**d) * (wl // 2**d))) for _ in range(3))
            for d in range(4)
        )
        params["denoising_net"] = _cast(
            jax.jit(self.denoising_net.init)(
                keys[5],
                jnp.zeros((2, f, hl, wl, 4)),
                jnp.zeros(()),
                jnp.zeros((2, ip.clip_extra_context_tokens, ctx_dim)),
                ref_feats,
                motion_feats,
                jnp.zeros((2, f, ap.context_tokens, den.audio_attention_dim)),
                jnp.zeros((2, f, hl, wl, den.block_out_channels[0])),
                masks,
                jnp.ones(3),
                jnp.asarray([1.0, 0.0]),
            )
        )
        self.params = params
        return params

    @classmethod
    def create(
        cls,
        ref_config: UNetConfig,
        denoise_config: UNetConfig,
        params: Dict[str, Any],
        vae_config: VAEConfig = VAEConfig(),
        face_locator_config: FaceLocatorConfig = FaceLocatorConfig(),
        image_proj_config: ImageProjConfig = ImageProjConfig(),
        audio_proj_config: AudioProjConfig = AudioProjConfig(),
        dtype=jnp.float32,
    ) -> "HalloModels":
        return cls(
            vae=AutoencoderKL(vae_config, dtype),
            reference_net=ReferenceNet(ref_config, dtype),
            denoising_net=DenoisingUNet(denoise_config, dtype),
            face_locator=FaceLocator(face_locator_config, dtype),
            image_proj=ImageProj(image_proj_config, dtype),
            audio_proj=AudioProj(audio_proj_config, dtype),
            params=params,
        )


def window_audio_embeddings(audio_emb: np.ndarray, margin: int = 2) -> np.ndarray:
    """(T, blocks, C) -> (T, 2*margin+1, blocks, C) edge-padded windows
    (reference scripts/inference.py:95-116 process_audio_emb)."""
    t = audio_emb.shape[0]
    pads = np.concatenate(
        [np.repeat(audio_emb[:1], margin, axis=0), audio_emb,
         np.repeat(audio_emb[-1:], margin, axis=0)],
        axis=0,
    )
    idx = np.arange(t)[:, None] + np.arange(2 * margin + 1)[None, :]
    return pads[idx]


class FaceAnimatePipeline:
    """Callable video generator. Heavy state (params) is captured by the
    jitted clip program once; repeated calls reuse the compiled executable."""

    def __init__(
        self,
        models: HalloModels,
        scheduler: SchedulerConfig = SchedulerConfig(),
        num_inference_steps: int = 40,
        guidance_scale: float = 3.5,
        clip_length: int = 16,
        n_motion_frames: int = 2,
        legacy_context_tiling: bool = True,
        mesh: Optional[jax.sharding.Mesh] = None,
        seq_axis: str = "seq",
        step_cache: Optional[str] = None,
        step_cache_threshold: float = 0.10,
        cfg_cache_stride: int = 1,
        sampler: str = "ddim",
        cfg_tail: int = 0,
        cfg_cache_warmup: Optional[int] = None,
        cfg_cache_cooldown: Optional[int] = None,
        timestep_schedule: str = "trailing",
        schedule_rho: float = 1.0,
    ):
        """With `mesh` (containing a >1-sized `seq_axis`), each denoise step
        runs clip-parallel: the 16-frame window's frame axis is sharded over
        the seq devices (motion modules all_to_all frames<->sites, inflated
        GroupNorm moments psum — models/motion.py); everything else in the
        clip program is frame-local and sharded by GSPMD.

        `step_cache="uniform"` enables cached-prediction step skipping
        (diffusion/cache.py — TeaCache/DeepCache lineage, see PAPERS.md):
        ~1.5x fewer denoiser forwards for a small fidelity trade.
        `step_cache="dynamic"` decides per step ON DEVICE: reuse while the
        accumulated relative latent change since the last recompute stays
        under `step_cache_threshold` (TeaCache-style; adapts to content —
        smooth trajectories skip more, fast motion recomputes). Off by
        default; the exact path is the quality-parity reference.

        `cfg_cache_stride > 1` enables CFG-uncond caching (adaptive-
        guidance family): the unconditional prediction drifts slowly, so
        between warmup/cooldown it is recomputed only every stride-th
        step; the conditional half always runs and the guidance combine
        uses the cached uncond. Composes with step_cache None or
        'dynamic'. A cond-only step costs ~half a full CFG step.

        `sampler="dpm++2m"` swaps the DDIM update for DPM-Solver++ (2M)
        (diffusion/dpm.py): a second-order multistep ODE solver reaching
        40-step-DDIM quality at 15-20 model evaluations. Composes with
        both cache modes (the caches gate MODEL evals; the sampler is the
        update rule)."""
        self.models = models
        self.scheduler = scheduler
        self.num_inference_steps = num_inference_steps
        self.guidance_scale = float(guidance_scale)
        self.clip_length = clip_length
        self.n_motion_frames = n_motion_frames
        # The reference tiles identity tokens over the ReferenceNet batch in a
        # frame-major-mismatched way (mutual_self_attention.py:341-349,
        # "TODO: repeat这个地方需要斟酌一下"). True reproduces the trained
        # checkpoint's behavior; False uses the aligned per-frame repeat.
        self.legacy_context_tiling = legacy_context_tiling
        self.mesh = mesh
        self.seq_axis = seq_axis
        if mesh is not None and mesh.shape.get(seq_axis, 1) > 1:
            assert clip_length % mesh.shape[seq_axis] == 0, (
                clip_length, mesh.shape[seq_axis]
            )
        else:
            self.mesh = None
        if step_cache in ("", "off", "none", "exact"):
            step_cache = None
        if step_cache not in (None, "uniform", "dynamic"):
            raise ValueError(
                f"step_cache={step_cache!r}: expected None/'off', 'uniform' "
                "or 'dynamic'"
            )
        self.step_cache = step_cache
        self.step_cache_threshold = float(step_cache_threshold)
        self.cfg_cache_stride = int(cfg_cache_stride)
        if self.cfg_cache_stride < 1:
            raise ValueError(f"cfg_cache_stride={cfg_cache_stride} must be >= 1")
        # Guidance-interval truncation: the last `cfg_tail` steps run
        # conditional-only with guidance weight 1.0 (diffusion/cache.py
        # make_cfg_plan) — saves the uncond eval where the cond/uncond
        # predictions have already converged.
        self.cfg_tail = int(cfg_tail)
        self.cfg_cache_warmup = cfg_cache_warmup
        self.cfg_cache_cooldown = cfg_cache_cooldown
        if (self.cfg_cache_stride > 1 or self.cfg_tail > 0) and (
            step_cache == "uniform"
        ):
            raise ValueError(
                "cfg_cache_stride/cfg_tail compose with step_cache None or "
                "'dynamic', not 'uniform'"
            )
        self._samp = make_sampler(
            scheduler, sampler, num_inference_steps,
            timestep_schedule=timestep_schedule, schedule_rho=schedule_rho,
        )
        self._generate_clip = jax.jit(self._clip_fn)

    # ------------------------------------------------------------------
    def _clip_fn(
        self,
        params: Dict[str, Any],     # the five parameter trees (jit argument,
                                    # NOT a closure — closures bake params
                                    # into the lowered program as constants)
        ref_pixels: jax.Array,      # (B, 1+M, H, W, 3) in [-1, 1]
        latents: jax.Array,         # (B, F, H/8, W/8, 4) ~ N(0, 1)
        audio_windows: jax.Array,   # (B, F, 2*margin+1, blocks, C)
        face_emb: jax.Array,        # (B, 512)
        face_region: jax.Array,     # (B, H, W, 3) binary face-region mask
        masks: Tuple[Tuple[jax.Array, jax.Array, jax.Array], ...],  # 4 x (full, face, lip) each (B, L_d)
        motion_scale: jax.Array,    # (3,)
    ) -> jax.Array:
        m = self.models
        p = params
        b, one_m = ref_pixels.shape[0], ref_pixels.shape[1]
        f = latents.shape[1]
        cfg2 = 2 * b

        # --- VAE-encode reference + motion frames (posterior mean) ---
        flat_ref = ref_pixels.reshape((b * one_m,) + ref_pixels.shape[2:])
        ref_latents = m.vae.apply(p["vae"], flat_ref, method=m.vae.encode_mean)
        ref_latents = jnp.tile(ref_latents, (2, 1, 1, 1))  # CFG-major

        # --- identity tokens (uncond = zero embedding) ---
        tokens_c = m.image_proj.apply(p["image_proj"], face_emb)
        tokens_u = m.image_proj.apply(p["image_proj"], jnp.zeros_like(face_emb))
        context = jnp.concatenate([tokens_u, tokens_c], axis=0)  # (2B, T, D)
        if self.legacy_context_tiling:
            ref_context = jnp.tile(context, (one_m, 1, 1))
        else:
            ref_context = jnp.repeat(context, one_m, axis=0)

        # --- ReferenceNet at t=0 -> feature pytrees ---
        _, feats = m.reference_net.apply(
            p["reference_net"], ref_latents, jnp.zeros(()), ref_context
        )
        split = jax.tree.map(lambda x: x.reshape(cfg2, one_m, *x.shape[1:]), feats)
        ref_feats = jax.tree.map(lambda x: x[:, 0], split)
        motion_feats = jax.tree.map(lambda x: x[:, 1:], split)

        # Step-invariant spatial-attention ref K/V CAN hoist out of the
        # denoise loop (exact math — see unet_denoise.spatial_ref_kv), but
        # the r4 A/B measured it SLOWER at 512² (0.7731 vs 0.7760 fps): the
        # theoretical matmul saving is only ~4.5 ms/step while the hoisted
        # path pays a per-step K/V output concat that re-copies the
        # invariant ref half (the un-hoisted input concat fuses into the
        # projection matmuls). Default OFF; HALLO_HOIST_REF_KV=1 re-enables.
        ref_kv = (
            spatial_ref_kv(
                p["denoising_net"], ref_feats, self.models.denoising_net.dtype
            )
            if os.environ.get("HALLO_HOIST_REF_KV", "0") == "1"
            else None
        )

        # --- face locator conditioning (uncond half zeroed) ---
        mask_video = jnp.repeat(face_region[:, None], f, axis=1)  # (B, F, H, W, 3)
        face_cond = m.face_locator.apply(p["face_locator"], mask_video)
        face_cond = jnp.concatenate([jnp.zeros_like(face_cond), face_cond], axis=0)

        # --- audio tokens (uncond = zeros, face_animate.py:377-378) ---
        audio_tokens = m.audio_proj.apply(p["audio_proj"], audio_windows)
        audio_tokens = jnp.concatenate(
            [jnp.zeros_like(audio_tokens), audio_tokens], axis=0
        )

        # --- mask pyramid: (B, L) -> (2B, F, L), CFG-major; frames fold to
        # the denoiser's (2B*F, L) at the call site (keeping F explicit lets
        # the clip-parallel path shard it) ---
        def expand(mask_b_l: jax.Array) -> jax.Array:
            per_frame = jnp.repeat(mask_b_l[:, None, :], f, axis=1)
            return jnp.tile(per_frame, (2, 1, 1))

        masks_cfg = tuple(tuple(expand(x) for x in level) for level in masks)

        def fold_masks(mk):
            return jax.tree.map(lambda z: z.reshape(-1, z.shape[-1]), mk)

        # --- denoise step (cfg_split: the [uncond | cond] batch layout is
        # static here, so the uncond half runs plain self-attention instead
        # of bias-masked attention over the ref-KV concat — same math, half
        # the uncond KV work) ---
        def denoise_halves(params_, t, lat, ctx, rf, mf, audio_t, fc, mk,
                           ms, rkv=None, seq_ax=None):
            model_in = jnp.tile(lat, (2, 1, 1, 1, 1))
            out = m.denoising_net.apply(
                params_,
                model_in,
                t,
                ctx,
                rf,
                mf,
                audio_t,
                fc,
                fold_masks(mk),
                ms,
                None,
                cfg_split=True,
                seq_axis=seq_ax,
                ref_kv=rkv,
            )
            return out[:b], out[b:]

        def denoise_step(params_, t, lat, ctx, rf, mf, audio_t, fc, mk,
                         ms, rkv=None, seq_ax=None):
            un, co = denoise_halves(
                params_, t, lat, ctx, rf, mf, audio_t, fc, mk, ms, rkv, seq_ax
            )
            if self.guidance_scale > 1.0:
                return un + self.guidance_scale * (co - un)
            return co

        def denoise_cond(params_, t, lat, ctx, rf, mf, audio_t, fc, mk,
                         ms, rkv=None, seq_ax=None):
            # Conditional half only (CFG-cache steps): every conditioning
            # tensor arrives pre-sliced to the cond half; cfg_split=False +
            # uncond_mask=None means all samples take the conditional path
            # (ref-KV concat + audio branches).
            return m.denoising_net.apply(
                params_,
                lat,
                t,
                ctx,
                rf,
                mf,
                audio_t,
                fc,
                fold_masks(mk),
                ms,
                None,
                cfg_split=False,
                seq_axis=seq_ax,
                ref_kv=rkv,
            )

        use_cfg_cache = (
            self.cfg_cache_stride > 1 or self.cfg_tail > 0
        ) and self.guidance_scale > 1.0
        if use_cfg_cache:
            _half = lambda tr: jax.tree.map(lambda x: x[b:], tr)  # noqa: E731
            context_c, ref_feats_c, motion_feats_c = (
                _half(context), _half(ref_feats), _half(motion_feats)
            )
            audio_tokens_c, face_cond_c = audio_tokens[b:], face_cond[b:]
            masks_c = _half(masks_cfg)
            ref_kv_c = _half(ref_kv)

        if self.mesh is not None:
            # Clip parallelism: frame-axis tensors shard over the seq mesh
            # axis; params/context/reference features replicate.
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # jax < 0.8
                from jax.experimental.shard_map import shard_map

            s = self.seq_axis
            sharded_halves = shard_map(
                lambda pr, t, lat, au, fc, mk: denoise_halves(
                    pr, t, lat, context, ref_feats, motion_feats, au, fc, mk,
                    motion_scale, ref_kv, s,
                ),
                mesh=self.mesh,
                in_specs=(P(), P(), P(None, s), P(None, s), P(None, s), P(None, s)),
                out_specs=(P(None, s), P(None, s)),
            )

            def run_halves(t, lat):
                return sharded_halves(
                    p["denoising_net"], t, lat, audio_tokens, face_cond, masks_cfg
                )

            if use_cfg_cache:
                sharded_cond = shard_map(
                    lambda pr, t, lat, au, fc, mk: denoise_cond(
                        pr, t, lat, context_c, ref_feats_c, motion_feats_c,
                        au, fc, mk, motion_scale, ref_kv_c, s,
                    ),
                    mesh=self.mesh,
                    in_specs=(
                        P(), P(), P(None, s), P(None, s), P(None, s), P(None, s)
                    ),
                    out_specs=P(None, s),
                )

                def run_cond(t, lat):
                    return sharded_cond(
                        p["denoising_net"], t, lat, audio_tokens_c,
                        face_cond_c, masks_c,
                    )

        else:

            def run_halves(t, lat):
                return denoise_halves(
                    p["denoising_net"], t, lat, context, ref_feats, motion_feats,
                    audio_tokens, face_cond, masks_cfg, motion_scale, ref_kv,
                )

            if use_cfg_cache:

                def run_cond(t, lat):
                    return denoise_cond(
                        p["denoising_net"], t, lat, context_c, ref_feats_c,
                        motion_feats_c, audio_tokens_c, face_cond_c, masks_c,
                        motion_scale, ref_kv_c,
                    )

        def combine(un, co):
            if self.guidance_scale > 1.0:
                return un + self.guidance_scale * (co - un)
            return co

        def run_step(t, lat):
            return combine(*run_halves(t, lat))

        # The sampler update (DDIM or DPM-Solver++ 2M) is orthogonal to the
        # caching modes: caches gate MODEL evaluations, the sampler carry
        # (`sc` — empty for DDIM, prev-x0 history for DPM) threads through
        # every loop variant unchanged.
        samp = self._samp

        if use_cfg_cache:
            from hallo_tpu.diffusion.cache import make_cfg_plan

            un_mask_np, guid_w_np = make_cfg_plan(
                samp.num_steps, self.cfg_cache_stride, self.guidance_scale,
                warmup=self.cfg_cache_warmup, cooldown=self.cfg_cache_cooldown,
                tail=self.cfg_tail,
            )
            un_mask = jnp.asarray(un_mask_np)
            guid_w = jnp.asarray(guid_w_np, jnp.float32)

            def run_cached_cfg(i, t, lat, u_prev):
                """(pred, new_u_prev): full CFG step when un_mask[i], else
                conditional-only with the cached uncond prediction; the
                guidance weight is per-step (1.0 in the cfg_tail steps =
                guidance off, the stale uncond cancels out)."""

                def full(_):
                    un, co = run_halves(t, lat)
                    return un.astype(jnp.float32), co.astype(jnp.float32)

                def cond_only(_):
                    return u_prev, run_cond(t, lat).astype(jnp.float32)

                un, co = jax.lax.cond(un_mask[i], full, cond_only, None)
                return un + guid_w[i] * (co - un), un

        if self.step_cache is None and use_cfg_cache:

            def body_g(i, carry):
                lat, sc, u_prev = carry
                t = samp.timesteps[i]
                pred, u_prev = run_cached_cfg(i, t, lat, u_prev)
                lat, sc = samp.step(i, pred, lat, sc)
                return lat, sc, u_prev

            latents, _, _ = jax.lax.fori_loop(
                0, samp.num_steps, body_g,
                (latents, samp.init_carry(latents), jnp.zeros_like(latents)),
            )
        elif self.step_cache is None:

            def body(i, carry):
                lat, sc = carry
                t = samp.timesteps[i]
                return samp.step(i, run_step(t, lat), lat, sc)

            latents, _ = jax.lax.fori_loop(
                0, samp.num_steps, body, (latents, samp.init_carry(latents))
            )
        elif self.step_cache == "dynamic" and use_cfg_cache:
            from hallo_tpu.diffusion.cache import make_allow_mask

            allow = jnp.asarray(make_allow_mask(samp.num_steps))
            thresh = jnp.float32(self.step_cache_threshold)

            def body_dg(i, carry):
                lat, sc, prev_out, anchor, accum, u_prev = carry
                t = samp.timesteps[i]
                diff = jnp.mean(jnp.abs(lat - anchor)) / (
                    jnp.mean(jnp.abs(anchor)) + 1e-8
                )
                want_skip = allow[i] & (accum + diff < thresh)

                def reuse(_):
                    return prev_out, anchor, accum + diff, u_prev

                def recompute(_):
                    pred, u_next = run_cached_cfg(i, t, lat, u_prev)
                    return pred, lat, jnp.float32(0), u_next

                out, anchor, accum, u_prev = jax.lax.cond(
                    want_skip, reuse, recompute, None
                )
                lat, sc = samp.step(i, out, lat, sc)
                return lat, sc, out, anchor, accum, u_prev

            zero_out = jnp.zeros_like(latents)
            latents, *_ = jax.lax.fori_loop(
                0, samp.num_steps, body_dg,
                (latents, samp.init_carry(latents), zero_out, latents,
                 jnp.float32(0), zero_out),
            )
        elif self.step_cache == "dynamic":
            # TeaCache-style on-device skip criterion: reuse the cached
            # prediction while the ACCUMULATED relative L1 change of the
            # latents since the last recompute stays under the threshold.
            # lax.cond executes only the taken branch on TPU, so skipped
            # steps cost just the cheap error estimate + sampler update.
            from hallo_tpu.diffusion.cache import make_allow_mask

            allow = jnp.asarray(make_allow_mask(samp.num_steps))
            thresh = jnp.float32(self.step_cache_threshold)

            def body_d(i, carry):
                lat, sc, prev_out, anchor, accum, n_skips = carry
                t = samp.timesteps[i]
                diff = jnp.mean(jnp.abs(lat - anchor)) / (
                    jnp.mean(jnp.abs(anchor)) + 1e-8
                )
                want_skip = allow[i] & (accum + diff < thresh)

                def reuse(_):
                    return prev_out, anchor, accum + diff

                def recompute(_):
                    return run_step(t, lat).astype(jnp.float32), lat, jnp.float32(0)

                out, anchor, accum = jax.lax.cond(want_skip, reuse, recompute, None)
                n_skips = n_skips + want_skip.astype(jnp.int32)
                lat, sc = samp.step(i, out, lat, sc)
                return lat, sc, out, anchor, accum, n_skips

            zero_out = jnp.zeros_like(latents)
            latents, *_ = jax.lax.fori_loop(
                0, samp.num_steps, body_d,
                (latents, samp.init_carry(latents), zero_out, latents,
                 jnp.float32(0), jnp.int32(0)),
            )
        else:
            # Cached-prediction step skipping (diffusion/cache.py): on skip
            # steps reuse the previous model output; the sampler update still
            # advances. Static schedule -> lax.cond inside the jitted loop.
            from hallo_tpu.diffusion.cache import make_skip_mask

            skip = jnp.asarray(make_skip_mask(samp.num_steps))

            def body_c(i, carry):
                lat, sc, prev_out = carry
                t = samp.timesteps[i]
                out = jax.lax.cond(
                    skip[i],
                    lambda _: prev_out,
                    # carry in f32: the model emits the compute dtype (bf16
                    # on TPU) and cond branches must type-match
                    lambda _: run_step(t, lat).astype(jnp.float32),
                    None,
                )
                lat, sc = samp.step(i, out, lat, sc)
                return lat, sc, out

            zero_out = jnp.zeros_like(latents)
            latents, _, _ = jax.lax.fori_loop(
                0, samp.num_steps, body_c,
                (latents, samp.init_carry(latents), zero_out),
            )

        # --- batched VAE decode -> uint8 pixels (the host fetch crosses the
        # TPU tunnel; uint8 is 4x fewer bytes than f32 — ~1.5 s/clip at
        # 512²x16 frames) ---
        flat = latents.reshape((b * f,) + latents.shape[2:])
        frames = m.vae.apply(p["vae"], flat, method=m.vae.decode)
        frames = jnp.clip(frames.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        frames = jnp.round(frames * 255.0).astype(jnp.uint8)
        frames = frames.reshape((b, f) + frames.shape[1:])
        # Next clip's motion frames, computed ON DEVICE from the decoded uint8
        # (identical numerics to the reference's host-side carry,
        # scripts/inference.py:302-310) so the sliding-window loop can dispatch
        # clip c+1 without waiting for clip c's host fetch.
        next_motion = (
            frames[:, -self.n_motion_frames :].astype(jnp.float32) / 127.5 - 1.0
        )
        return frames, next_motion

    # ------------------------------------------------------------------
    def __call__(
        self,
        ref_image: np.ndarray,        # (B, H, W, 3) in [-1, 1]
        audio_windows: np.ndarray,    # (T, 2*margin+1, blocks, C), T % clip_length == 0
        face_emb: np.ndarray,         # (B, 512)
        face_region: np.ndarray,      # (B, H, W, 3)
        masks: Tuple[Tuple[np.ndarray, np.ndarray, np.ndarray], ...],
        motion_scale=(1.0, 1.0, 1.0),
        seed: int = 42,
        audio_length: Optional[int] = None,
        on_clip=None,
        return_video: bool = True,
    ) -> Optional[np.ndarray]:
        """Generate the full video by sliding-window clips with motion-frame
        carry-over. Returns (B, T_out, H, W, 3) float32 in [0, 1].

        `on_clip(frames_uint8)` (optional) receives each clip's fetched
        (B, f', H, W, 3) uint8 frames (already trimmed to `audio_length`)
        while the NEXT clip is still denoising on-device — host-side
        consumers (e.g. utils.video.StreamingVideoWriter) run in the shadow
        of device time instead of serializing after generation. With
        `return_video=False` frames are not accumulated on the host
        (long-form runs stay O(clip) in host memory) and None is returned."""
        b, h, w, _ = ref_image.shape
        f, m_frames = self.clip_length, self.n_motion_frames
        t_total = audio_windows.shape[0]
        assert t_total % f == 0, "pad audio windows to a clip multiple first"
        num_clips = t_total // f

        key = jax.random.PRNGKey(seed)
        ref_image = jnp.asarray(ref_image, jnp.float32)
        motion_scale = jnp.asarray(motion_scale, jnp.float32)
        masks = tuple(tuple(jnp.asarray(x, jnp.float32) for x in lvl) for lvl in masks)
        face_emb = jnp.asarray(face_emb, jnp.float32)
        face_region = jnp.asarray(face_region, jnp.float32)

        # First clip: motion frames are copies of the reference image
        # (scripts/inference.py:294-301).
        motion = jnp.repeat(ref_image[:, None], m_frames, axis=1)

        # Pipelined sliding window: clip c+1 only depends on clip c through
        # the ON-DEVICE motion carry, so it is dispatched before clip c's
        # frames are fetched — the ~0.4 s/clip uint8 host fetch (and the host
        # float conversion) overlaps the next clip's denoise instead of
        # serializing with it. jax's async dispatch keeps the device queue
        # busy; np.asarray on the PREVIOUS clip's frames blocks only the host.
        pending = None  # device frames of clip c-1, not yet fetched
        outputs = []
        limit = audio_length if audio_length is not None else t_total
        emitted = 0

        def _emit(dev_frames) -> Optional[np.ndarray]:
            # Fetch + trim one clip; feed the hook; return uint8 or None.
            nonlocal emitted
            arr = np.asarray(dev_frames)
            take = min(arr.shape[1], limit - emitted)
            if take <= 0:
                return None
            arr = arr[:, :take]
            emitted += take
            if on_clip is not None:
                on_clip(arr)
            return arr

        for c in range(num_clips):
            key, sub = jax.random.split(key)
            latents = jax.random.normal(sub, (b, f, h // 8, w // 8, 4), jnp.float32)
            clip_audio = jnp.asarray(
                audio_windows[c * f : (c + 1) * f], jnp.float32
            )[None]
            clip_audio = jnp.broadcast_to(clip_audio, (b,) + clip_audio.shape[1:])
            ref_pixels = jnp.concatenate([ref_image[:, None], motion], axis=1)
            frames, motion = self._generate_clip(
                self.models.params,
                ref_pixels,
                latents,
                clip_audio,
                face_emb,
                face_region,
                masks,
                motion_scale,
            )
            if pending is not None:
                got = _emit(pending)
                if got is not None and return_video:
                    outputs.append(got.astype(np.float32) / 255.0)
            pending = frames
        got = _emit(pending)
        if got is not None and return_video:
            outputs.append(got.astype(np.float32) / 255.0)

        if not return_video:
            return None
        return np.concatenate(outputs, axis=1)
