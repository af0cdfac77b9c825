"""End-to-end stage-2 trainer integration: tiny model, 2 steps on the
virtual 8-device mesh, checkpoint written + metrics logged + final export.

Exercises the actual scripts/train_stage2.py process function (never just
the step), including load_pretrained graceful no-op, ZeRO-sharded optimizer
state, orbax snapshot, and resume bookkeeping."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_dataset(tmp_path, n_clips=2, t=16, h=64):
    rng = np.random.default_rng(0)
    meta = []
    for i in range(n_clips):
        data = dict(
            frames=(rng.uniform(0, 255, (t, h, h, 3))).astype(np.uint8),
            audio_emb=rng.normal(size=(t, 2, 4)).astype(np.float32),
            face_emb=rng.normal(size=(16,)).astype(np.float32),
            face_region=np.ones((h, h, 3), np.float32),
        )
        hl = h // 8
        for level, div in enumerate((1, 2, 4, 8)):
            size = hl // div
            for kind in ("full", "face", "lip"):
                data[f"{kind}_mask_{level}"] = np.ones((1, size * size), np.float32)
        path = tmp_path / f"clip{i}.npz"
        np.savez(path, **data)
        meta.append({"clip_path": str(path)})
    meta_path = tmp_path / "meta.json"
    meta_path.write_text(json.dumps(meta))
    return str(meta_path)


TINY_UNET_YAML = dict(
    use_inflated_groupnorm=True,
    use_motion_module=True,
    use_audio_module=True,
    motion_module_mid_block=True,
    block_out_channels=[8, 16, 16, 16],
    layers_per_block=1,
    num_attention_heads=2,
    cross_attention_dim=12,
    norm_num_groups=4,
    audio_attention_dim=6,
    motion_module_kwargs=dict(
        num_attention_heads=2,
        num_transformer_block=1,
        temporal_position_encoding_max_len=8,
        norm_num_groups=4,
    ),
)


@pytest.mark.slow
def test_train_stage2_two_steps(tmp_path):
    from hallo_tpu.config import DotDict
    from scripts.train_stage2 import train_stage2_process

    meta = _write_dataset(tmp_path)
    cfg = DotDict.wrap(
        dict(
            exp_name="t2",
            output_dir=str(tmp_path / "exp"),
            seed=0,
            aux_scale="tiny",
            data=dict(
                train_bs=1,  # x8 mesh devices = global batch 8
                train_width=64,
                train_height=64,
                n_sample_frames=2,
                n_motion_frames=2,
                audio_margin=1,
                meta_paths=[meta],
            ),
            solver=dict(
                learning_rate=1e-4,
                max_train_steps=2,
                max_grad_norm=1.0,
                # exercise the reference training knobs: grad accumulation
                # (optax.MultiSteps) + remat. mixed_precision stays "no"
                # here — bf16 is EMULATED (very slow) on the CPU test host;
                # the bf16 path is measured on the chip by
                # scripts/bench_train_step.py.
                gradient_accumulation_steps=2,
                gradient_checkpointing=True,
                mixed_precision="no",
            ),
            val=dict(validation_steps=2, num_inference_steps=2),
            uncond_img_ratio=0.05,
            uncond_audio_ratio=0.05,
            uncond_ia_ratio=0.05,
            start_ratio=0.05,
            noise_offset=0.05,
            snr_gamma=5.0,
            unet_additional_kwargs=TINY_UNET_YAML,
            base_model_path=str(tmp_path / "nonexistent"),
            vae_model_path=str(tmp_path / "nonexistent"),
            checkpointing_steps=2,
            resume_from_checkpoint="",
        )
    )
    train_stage2_process(cfg)

    exp = tmp_path / "exp" / "t2"
    metrics = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    assert metrics and np.isfinite(metrics[0]["loss"])
    assert "ts" in metrics[0]  # written through MetricsLogger
    assert (exp / "checkpoint-2").is_dir()
    assert (exp / "final_net").is_dir()
    # validation video rendered at step 2 (val.validation_steps=2)
    assert (exp / "validation" / "step2.mp4").is_file()


@pytest.mark.slow
def test_train_stage1_two_steps_and_resume(tmp_path):
    """Stage-1 spatial trainer through the real script process function,
    plus checkpoint-resume: 2 steps -> checkpoint -> 2 more from 'latest'."""
    from hallo_tpu.config import DotDict
    from scripts.train_stage1 import train_stage1_process

    meta = _write_dataset(tmp_path, n_clips=2, t=8, h=64)

    def cfg(max_steps, resume):
        return DotDict.wrap(
            dict(
                exp_name="t1",
                output_dir=str(tmp_path / "exp"),
                seed=0,
                aux_scale="tiny",
                data=dict(
                    train_bs=1,
                    train_width=64,
                    train_height=64,
                    sample_margin=2,
                    meta_paths=[meta],
                ),
                solver=dict(
                    learning_rate=1e-4, max_train_steps=max_steps,
                    max_grad_norm=1.0,
                    mixed_precision="no",  # bf16 is emulated/slow on CPU
                ),
                val=dict(validation_steps=4, num_inference_steps=2),
                uncond_ratio=0.1,
                noise_offset=0.05,
                snr_gamma=5.0,
                log_every=1,
                unet_additional_kwargs=dict(
                    block_out_channels=[8, 16, 16, 16],
                    layers_per_block=1,
                    num_attention_heads=2,
                    cross_attention_dim=12,
                    norm_num_groups=4,
                ),
                base_model_path=str(tmp_path / "nonexistent"),
                vae_model_path=str(tmp_path / "nonexistent"),
                checkpointing_steps=2,
                resume_from_checkpoint=resume,
            )
        )

    train_stage1_process(cfg(2, ""))
    exp = tmp_path / "exp" / "t1"
    assert (exp / "checkpoint-2").is_dir()
    train_stage1_process(cfg(4, "latest"))  # resumes at step 2

    metrics = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    steps = [m["step"] for m in metrics]
    # run 1 logs steps 0,1; the resumed run continues at 2 (a restart from
    # scratch would log 0,1 again)
    assert steps == [0, 1, 2, 3], steps
    assert all(np.isfinite(m["loss"]) for m in metrics)
    for name in ("reference_net", "denoising_net", "face_locator", "image_proj"):
        assert (exp / f"final_{name}").is_dir()
    # validation stills rendered at step 4 in the resumed run
    assert (exp / "validation" / "step4_sample0.png").is_file()
