"""Jitted training steps for both stages.

Reference semantics (scripts/train_stage1.py:559-759,
scripts/train_stage2.py:698-930):

- train scheduler = scaled_linear betas + zero-SNR rescale + v-prediction
  (get_noise_scheduler, train_stage2.py:203-225)
- per-STEP (not per-sample) conditioning dropouts: image, audio, and
  zero-motion-frame "start" dropout (train_stage2.py:795-805)
- Min-SNR-gamma loss weighting with the +1 shift for v-prediction
  (train_stage1.py:642-664)
- stage 1: 2D single-frame path, trains spatial nets; stage 2: freezes them
  and trains motion+audio modules + audio_proj

The whole step (VAE encode -> ReferenceNet -> denoiser -> loss -> grads ->
optax update) is one jitted program; under a Mesh, batch inputs are sharded
on "data" and XLA inserts the gradient all-reduce (ZeRO-style optimizer-state
sharding comes from hallo_tpu.parallel.zero_shard_tree).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.diffusion import ddim, schedule
from hallo_tpu.pipelines.face_animate import HalloModels
from hallo_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    stage: int = 2
    uncond_img_ratio: float = 0.05
    uncond_audio_ratio: float = 0.05
    uncond_ia_ratio: float = 0.05
    start_ratio: float = 0.05
    noise_offset: float = 0.05
    snr_gamma: float = 5.0
    legacy_context_tiling: bool = True
    # scaled_linear is the reference's training beta schedule
    scheduler: SchedulerConfig = SchedulerConfig(beta_schedule="scaled_linear")
    # Skip-and-count non-finite updates (the reference has no such guard —
    # a single NaN loss poisons its run): when loss/grad_norm is non-finite
    # the params and optimizer state keep their previous values and
    # metrics["skipped"] is 1. The trainer loop counts consecutive skips
    # and aborts past a threshold (scripts/train_stage{1,2}.py).
    nan_guard: bool = True


def _min_snr_weights(
    alphas_cumprod: jax.Array, t: jax.Array, gamma: float, prediction_type: str
) -> jax.Array:
    snr = ddim.compute_snr(alphas_cumprod, t)
    if prediction_type == "v_prediction":
        snr = snr + 1.0
    return jnp.minimum(snr, gamma) / snr


def make_train_step(
    models: HalloModels,
    tx: optax.GradientTransformation,
    cfg: TrainConfig = TrainConfig(),
    mesh: Optional[jax.sharding.Mesh] = None,
    seq_axis: str = "seq",
    data_axis: str = "data",
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jittable (state, batch, rng) -> (state, metrics) step.

    Batch keys (stage 2):
      pixel_values (B,F,H,W,3), ref_pixels (B,H,W,3),
      motion_pixels (B,M,H,W,3), audio_windows (B,F,W,12,768),
      face_emb (B,512), face_region (B,H,W,3),
      masks: 4-tuple of (full, face, lip) each (B, L_d)
    Stage 1 uses F=1, no motion_pixels/audio_windows/masks.
    Optional deterministic overrides: "noise" (lat-shaped) and
    "timesteps" (B,) replace the sampled values (tests, bitwise resume).

    With `mesh` whose seq axis is >1, the fwd+bwd runs inside shard_map
    over (data, seq): batch sharded on data, frames (pixel_values /
    audio_windows / noise) additionally sharded on seq (clip parallelism
    through the denoiser's motion modules), loss/grads pmean'd over both.
    Without a mesh, data parallelism comes from GSPMD autosharding.
    """
    alphas = jnp.asarray(schedule.alphas_cumprod(cfg.scheduler))
    pred_type = cfg.scheduler.prediction_type

    def loss_fn(params, batch, rng, seq_ax=None, data_ax=None):
        m = models
        pixels = batch["pixel_values"]
        b, f = pixels.shape[0], pixels.shape[1]
        r_t, r_noise, r_off, r_drop, r_start = jax.random.split(rng, 5)
        if data_ax is not None:
            # Inside shard_map the rng arrives replicated; fold the data-shard
            # index into the PER-SAMPLE keys so every data shard draws distinct
            # timesteps / noise / offsets (matching the GSPMD path where draws
            # span the global batch). The per-STEP dropout draws (r_drop,
            # r_start) stay global — reference semantics are one draw per step
            # (train_stage2.py:795-805). axis_index(data) is equal across seq
            # shards, so sample-level draws still agree along seq.
            di = jax.lax.axis_index(data_ax)
            r_t = jax.random.fold_in(r_t, di)
            r_noise = jax.random.fold_in(r_noise, di)
            r_off = jax.random.fold_in(r_off, di)

        # --- target latents + noise ---
        lat = m.vae.apply(
            params["vae"],
            pixels.reshape((b * f,) + pixels.shape[2:]),
            method=m.vae.encode_mean,
        )
        # The VAE is frozen in BOTH stages (train_stage1.py vae.requires_
        # grad_(False); stage 2 same) — without stop_gradient, cotangents
        # flow through `lat` into the whole VAE-encoder backward (and
        # d/d(vae_params) is computed) only for optax to mask the update to
        # zero. stop_gradient lets XLA dead-code the entire VAE backward.
        lat = jax.lax.stop_gradient(lat)
        lat = lat.reshape((b, f) + lat.shape[1:])
        if "noise" in batch:
            noise = batch["noise"].astype(jnp.float32)
        else:
            if seq_ax is not None:
                # iid per-frame noise across the seq shards; sample-level
                # draws below stay on the unfolded keys so they agree
                # across the seq axis.
                r_noise = jax.random.fold_in(r_noise, jax.lax.axis_index(seq_ax))
            noise = jax.random.normal(r_noise, lat.shape, jnp.float32)
            if cfg.noise_offset > 0:
                noise = noise + cfg.noise_offset * jax.random.normal(
                    r_off, (b, 1, 1, 1, lat.shape[-1]), jnp.float32
                )
        if "timesteps" in batch:
            t = batch["timesteps"]
        else:
            t = jax.random.randint(
                r_t, (b,), 0, cfg.scheduler.num_train_timesteps
            )
        noisy = ddim.add_noise(alphas, lat, noise, t[:, None, None, None, None])

        # --- per-step conditioning dropouts (train_stage2.py:795-805) ---
        u = jax.random.uniform(r_drop, ())
        p_i, p_a, p_ia = cfg.uncond_img_ratio, cfg.uncond_audio_ratio, cfg.uncond_ia_ratio
        drop_img = jnp.logical_or(u < p_i, u >= 1.0 - p_ia)
        drop_audio = jnp.logical_or(
            jnp.logical_and(u >= p_i, u < p_i + p_a), u >= 1.0 - p_ia
        )
        start = jax.random.uniform(r_start, ()) < cfg.start_ratio

        face_emb = jnp.where(drop_img, 0.0, batch["face_emb"])
        tokens = m.image_proj.apply(params["image_proj"], face_emb)
        if cfg.stage == 2:
            # image_proj is frozen in stage 2 (train_stage2.py:553-560
            # trains only audio/motion modules + audio_proj).
            tokens = jax.lax.stop_gradient(tokens)
        uncond_mask = jnp.broadcast_to(drop_img.astype(jnp.float32), (b,))

        # --- reference + motion-frame latents -> ReferenceNet features ---
        ref_px = batch["ref_pixels"][:, None]
        if cfg.stage == 2 and "motion_pixels" in batch:
            motion_px = jnp.where(start, 0.0, batch["motion_pixels"])
            ref_px = jnp.concatenate([ref_px, motion_px], axis=1)
        one_m = ref_px.shape[1]
        ref_lat = jax.lax.stop_gradient(
            m.vae.apply(
                params["vae"],
                ref_px.reshape((b * one_m,) + ref_px.shape[2:]),
                method=m.vae.encode_mean,
            )
        )
        ref_ctx = (
            jnp.tile(tokens, (one_m, 1, 1))
            if cfg.legacy_context_tiling
            else jnp.repeat(tokens, one_m, axis=0)
        )
        _, feats = m.reference_net.apply(
            params["reference_net"], ref_lat, jnp.zeros(()), ref_ctx
        )
        if cfg.stage == 2:
            feats = jax.lax.stop_gradient(feats)
        split = jax.tree.map(lambda x: x.reshape(b, one_m, *x.shape[1:]), feats)
        ref_feats = jax.tree.map(lambda x: x[:, 0], split)
        motion_feats = (
            jax.tree.map(lambda x: x[:, 1:], split) if one_m > 1 else None
        )

        # --- face locator conditioning ---
        face_cond = None
        if "face_region" in batch:
            mask_video = jnp.repeat(batch["face_region"][:, None], f, axis=1)
            face_cond = m.face_locator.apply(params["face_locator"], mask_video)
            if cfg.stage == 2:  # frozen in stage 2 (see tokens note)
                face_cond = jax.lax.stop_gradient(face_cond)

        # --- audio tokens ---
        audio_tokens = None
        if cfg.stage == 2 and "audio_windows" in batch:
            audio = jnp.where(drop_audio, 0.0, batch["audio_windows"])
            audio_tokens = m.audio_proj.apply(params["audio_proj"], audio)

        masks = None
        if cfg.stage == 2 and "masks" in batch:
            masks = tuple(
                tuple(jnp.repeat(x, f, axis=0) for x in lvl) for lvl in batch["masks"]
            )

        pred = m.denoising_net.apply(
            params["denoising_net"],
            noisy,
            t,
            tokens,
            ref_feats,
            motion_feats,
            audio_tokens,
            face_cond,
            masks,
            jnp.ones(3),
            uncond_mask,
            train=True,
            seq_axis=seq_ax,
        )

        if pred_type == "v_prediction":
            target = ddim.get_velocity(
                alphas, lat, noise, t[:, None, None, None, None]
            )
        else:
            target = noise
        per_sample = jnp.mean(
            jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)),
            axis=tuple(range(1, pred.ndim)),
        )
        if cfg.snr_gamma > 0:
            per_sample = per_sample * _min_snr_weights(
                alphas, t, cfg.snr_gamma, pred_type
            )
        return jnp.mean(per_sample)

    use_seq = mesh is not None and mesh.shape.get(seq_axis, 1) > 1
    if use_seq:
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # jax < 0.8
            from jax.experimental.shard_map import shard_map

        d, s = data_axis, seq_axis
        # Frame-axis tensors shard on (data, seq); per-sample tensors on data.
        key_spec = {
            "pixel_values": P(d, s),
            "audio_windows": P(d, s),
            "noise": P(d, s),
            "ref_pixels": P(d),
            "motion_pixels": P(d),
            "face_emb": P(d),
            "face_region": P(d),
            "timesteps": P(d),
            "masks": P(d),
        }

        def value_and_grad(params, batch, rng):
            def local(p_, b_, r_):
                # Differentiate the pmean'd GLOBAL loss: grads of replicated
                # params through a replicated scalar are the true gradient on
                # every device, regardless of how shard_map transposes
                # collectives (differentiating the LOCAL loss and pmean-ing
                # after gives n_devices-times-too-large grads — jax's vma
                # tracking already psums cotangents of unvarying inputs).
                def global_loss(p__):
                    return jax.lax.pmean(loss_fn(p__, b_, r_, s, d), (d, s))

                return jax.value_and_grad(global_loss)(p_)

            specs = {k: key_spec[k] for k in batch}
            kwargs = {}
            if mesh.shape.get("model", 1) > 1:
                # Manual axes: data + seq only. "model" stays an AUTO axis so
                # GSPMD keeps partitioning the TP-sharded param matmuls
                # (parallel/tp.py) inside the shard_map body; P() in_specs
                # then mean "replicated over data/seq" rather than "over the
                # whole mesh". jax >= 0.8 (`axis_names`).
                kwargs["axis_names"] = {d, s}
            fn = shard_map(
                local, mesh=mesh, in_specs=(P(), specs, P()),
                out_specs=(P(), P()), **kwargs,
            )
            return fn(params, batch, rng)

    else:

        def value_and_grad(params, batch, rng):
            return jax.value_and_grad(loss_fn)(params, batch, rng)

    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        loss, grads = value_and_grad(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if cfg.nan_guard:
            finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            # per-leaf select keeps params AND optimizer state (incl. Adam
            # step counts / 8-bit moment blocks) untouched on a bad step
            keep = lambda new, old: jax.tree.map(  # noqa: E731
                lambda n, o: jnp.where(finite, n, o), new, old
            )
            params = keep(params, state.params)
            opt_state = keep(opt_state, state.opt_state)
            metrics["skipped"] = 1.0 - finite.astype(jnp.float32)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return train_step
