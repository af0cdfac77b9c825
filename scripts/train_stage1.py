"""Stage-1 training: spatial/identity (ReferenceNet + denoising UNet in 2D
mode + FaceLocator + ImageProj from SD-1.5).

Reference: scripts/train_stage1.py:289-793. TPU-native deltas:
- HF Accelerate + DeepSpeed ZeRO-2 -> jax.sharding Mesh ("data" axis), batch
  sharded, ZeRO-style optimizer-state sharding (hallo_tpu.parallel)
- the whole step is one jitted program; gradient all-reduce is inserted by
  XLA from the shardings
- orbax checkpoints with keep-k rotation; metrics to JSONL + stdout
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("hallo_tpu.train1")


def train_stage1_process(cfg) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hallo_tpu import config as cfglib
    from hallo_tpu.config import SchedulerConfig, unet_config_from_yaml_kwargs
    from hallo_tpu.convert.load_pretrained import load_pretrained_params
    from hallo_tpu.data.datasets import FaceMaskDataset, batch_iterator
    from hallo_tpu.parallel.mesh import (
        make_mesh,
        mesh_from_config,
        maybe_initialize_distributed,
        parallel_settings,
        zero_shard_tree,
    )
    from hallo_tpu.pipelines.face_animate import HalloModels
    from hallo_tpu.train.state import (
        OptimizerConfig,
        TrainState,
        label_params,
        make_optimizer,
        stage1_trainable,
    )
    from hallo_tpu.train.step import TrainConfig, make_train_step
    from hallo_tpu.utils import checkpoint as ckpt
    from hallo_tpu.utils.profiling import MetricsLogger

    maybe_initialize_distributed()
    exp_dir = os.path.join(str(cfg.output_dir), str(cfg.exp_name))
    os.makedirs(exp_dir, exist_ok=True)

    # configs/parallel.yaml shapes the mesh AND the precision/ZeRO knobs
    # (the TPU-native accelerate_config.yaml). solver.mixed_precision (the
    # reference's key) takes priority when present; fp16 maps to bf16.
    ppath = str(getattr(cfg, "parallel_config", "") or "")
    if not ppath:
        ppath = "configs/parallel.yaml" if os.path.exists("configs/parallel.yaml") else None
    psettings = parallel_settings(ppath)
    solver = cfg.solver
    mp = str(getattr(solver, "mixed_precision", "") or psettings["mixed_precision"])
    compute_dtype = jnp.bfloat16 if mp.lower() in ("bf16", "fp16", "bfloat16") else jnp.float32
    grad_ckpt = bool(getattr(solver, "gradient_checkpointing", False))
    # Nested per-layer remat (YAML: solver.gradient_checkpointing_inner):
    # needed to fit full-width steps in 16 GB HBM (see UNetConfig.remat_inner).
    remat_inner = grad_ckpt and bool(
        getattr(solver, "gradient_checkpointing_inner", True)
    )

    width = height = int(cfg.data.train_width)
    unet_kwargs = cfglib.to_container(cfg.unet_additional_kwargs) if "unet_additional_kwargs" in cfg else {}
    # stage 1 runs the denoiser in 2D mode: no motion/audio modules
    den_cfg = unet_config_from_yaml_kwargs(
        unet_kwargs, use_motion_module=False, use_audio_module=False,
        remat=grad_ckpt, remat_inner=remat_inner,
    )
    ref_cfg = unet_config_from_yaml_kwargs(
        unet_kwargs,
        use_motion_module=False, use_audio_module=False,
        use_inflated_groupnorm=False, remat=grad_ckpt,
        remat_inner=remat_inner,
    )
    aux = {}
    if str(getattr(cfg, "aux_scale", "")) == "tiny":  # tiny integration tests
        from hallo_tpu.utils.factory import TINY_AUX

        aux = TINY_AUX
    models = HalloModels.create(ref_cfg, den_cfg, params={}, dtype=compute_dtype, **aux)
    models.init_params(
        jax.random.PRNGKey(int(cfg.seed)), height=height, width=width,
        clip_length=1, n_motion_frames=0,
    )
    models.params = load_pretrained_params(
        models.params,
        base_model_path=str(cfg.base_model_path),
        vae_model_path=str(cfg.vae_model_path),
    )

    labels = label_params(models.params, stage1_trainable)
    tx = make_optimizer(
        OptimizerConfig(
            learning_rate=float(solver.learning_rate),
            max_grad_norm=float(solver.max_grad_norm),
            beta1=float(getattr(solver, "adam_beta1", 0.9)),
            beta2=float(getattr(solver, "adam_beta2", 0.999)),
            weight_decay=float(getattr(solver, "adam_weight_decay", 1e-2)),
            eps=float(getattr(solver, "adam_epsilon", 1e-8)),
            lr_warmup_steps=int(getattr(solver, "lr_warmup_steps", 0)),
            gradient_accumulation_steps=int(
                getattr(solver, "gradient_accumulation_steps", 1)
            ),
            # reference stage2.yaml:37 use_8bit_adam (bnb AdamW8bit ->
            # train/adam8bit.py int8 block-quantized moments)
            use_8bit_adam=bool(getattr(solver, "use_8bit_adam", False)),
        ),
        labels,
    )
    state = TrainState.create(models.params, tx)
    sched = SchedulerConfig(beta_schedule="scaled_linear")
    train_cfg = TrainConfig(
        stage=1,
        uncond_img_ratio=float(cfg.uncond_ratio),
        uncond_audio_ratio=0.0,
        uncond_ia_ratio=0.0,
        start_ratio=0.0,
        noise_offset=float(cfg.noise_offset),
        snr_gamma=float(cfg.snr_gamma),
        scheduler=sched,
    )
    # Mesh from configs/parallel.yaml; with seq > 1 the train step runs
    # clip-parallel (frames sharded).
    mesh = mesh_from_config(ppath)
    use_seq = mesh.shape.get("seq", 1) > 1
    step_fn = jax.jit(
        make_train_step(models, tx, train_cfg, mesh=mesh if use_seq else None),
        donate_argnums=(0,),
    )
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    # mesh.model > 1: tensor parallelism over the wide denses (GSPMD param
    # shardings, parallel/tp.py); GSPMD path only — see train_stage2.py.
    if mesh.shape.get("model", 1) > 1 and not use_seq:
        from hallo_tpu.parallel.tp import tp_shardings

        param_sharding = tp_shardings(state.params, mesh)
    else:
        param_sharding = jax.tree.map(lambda _: replicated, state.params)
    opt_sharding = (
        zero_shard_tree(state.opt_state, mesh)
        if psettings["zero_optimizer_sharding"]
        else jax.tree.map(lambda _: replicated, state.opt_state)
    )
    state = TrainState(
        step=jax.device_put(state.step, replicated),
        params=jax.device_put(state.params, param_sharding),
        opt_state=jax.device_put(state.opt_state, opt_sharding),
    )

    dataset = FaceMaskDataset(
        list(cfg.data.meta_paths),
        img_size=width,
        sample_margin=int(cfg.data.sample_margin),
        seed=int(cfg.seed),
    )
    batches = batch_iterator(dataset, int(cfg.data.train_bs) * mesh.shape["data"])

    start_step = 0
    if str(getattr(cfg, "resume_from_checkpoint", "")) == "latest":
        latest = ckpt.latest_step(exp_dir)
        if latest is not None:
            state, start_step = ckpt.load_train_state(exp_dir, state)
            logger.info("resumed from checkpoint-%d", start_step)

    # validation renders (reference train_stage1.py:181-286, 728-744)
    val_cfg = getattr(cfg, "val", None) or {}
    val_steps = int(val_cfg.get("validation_steps", 0) if hasattr(val_cfg, "get") else 0)
    val_infer_steps = int(val_cfg.get("num_inference_steps", 20) if hasattr(val_cfg, "get") else 20)

    def run_validation(step):
        from hallo_tpu.train.validation import log_validation_stage1

        models.params = state.params
        items = [dataset[i] for i in range(min(2, len(dataset)))]
        log_validation_stage1(
            models, exp_dir, step,
            ref_images=[it["ref_pixels"] for it in items],
            face_embs=[it["face_emb"] for it in items],
            face_regions=[it["face_region"] for it in items],
            num_inference_steps=val_infer_steps,
            seed=int(cfg.seed),
        )

    rng = jax.random.PRNGKey(int(cfg.seed))
    metrics = MetricsLogger(exp_dir)
    log_every = int(cfg.get("log_every", 10) if hasattr(cfg, "get") else 10)
    t0 = time.time()
    nan_skips = consecutive_skips = 0
    td_window = 0.0  # dataloader stall time, the reference's `td` log
    for step in range(start_step, int(cfg.solver.max_train_steps)):
        t_data = time.time()
        batch = next(batches)
        batch = {k: jax.device_put(v, data_sharding) for k, v in batch.items()}
        td_window += time.time() - t_data
        sub = jax.random.fold_in(rng, step)  # resume-stable per-step key
        if step == start_step:
            # First dispatch compiles + loads the big program: the TPU
            # worker can fault transiently there (utils/retry.py); OOMs
            # propagate immediately (deterministic).
            from hallo_tpu.utils.retry import retry_transient

            state, step_metrics = retry_transient(
                step_fn, state, batch, sub, what="first train step",
            )
        else:
            state, step_metrics = step_fn(state, batch, sub)
        if float(step_metrics.get("skipped", 0.0)) > 0:
            nan_skips += 1
            consecutive_skips += 1
            logger.warning("step %d: non-finite loss/grads — update skipped "
                           "(%d total)", step, nan_skips)
            if consecutive_skips >= 25:
                raise RuntimeError(
                    f"{consecutive_skips} consecutive non-finite steps; "
                    "aborting (checkpoints keep the last finite state)"
                )
        else:
            consecutive_skips = 0
        if step % log_every == 0:
            line = dict(loss=float(step_metrics["loss"]),
                        grad_norm=float(step_metrics["grad_norm"]),
                        td=round(td_window, 3), nan_skips=nan_skips,
                        sec=round(time.time() - t0, 1))
            td_window = 0.0
            logger.info("%s", {"step": step, **line})
            metrics.log(step, **line)
        if (step + 1) % int(cfg.checkpointing_steps) == 0:
            ckpt.save_train_state(exp_dir, step + 1, state,
                                  keep=int(cfg.get("total_limit", 3) if hasattr(cfg, "get") else 3))
        if val_steps and (step + 1) % val_steps == 0:
            run_validation(step + 1)
    metrics.close()

    # final per-module exports for stage hand-off (reference
    # move_final_checkpoint, train_stage1.py:752-758)
    for name in ("reference_net", "denoising_net", "face_locator", "image_proj"):
        ckpt.save_params(os.path.join(exp_dir, f"final_{name}"), state.params[name])
    logger.info("stage 1 done")


def main() -> None:
    from hallo_tpu import config as cfglib

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/train/stage1.yaml")
    args = parser.parse_args()
    train_stage1_process(cfglib.load_config(args.config))


if __name__ == "__main__":
    main()
