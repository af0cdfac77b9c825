"""Train state: optax optimizer over a trainable parameter subset.

Replaces the reference's requires_grad_ freezing + DeepSpeed ZeRO-2 wrapper
(train_stage1.py:354-394 freeze/unfreeze; train_stage2.py:547-560 name-match
of `audio_modules`/`motion_modules`; accelerate_config.yaml zero_stage: 2)
with optax.multi_transform masking + sharded optimizer state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    # reference solver knobs (configs/train/stage2.yaml:23-37)
    lr_warmup_steps: int = 0
    gradient_accumulation_steps: int = 1
    # bnb.optim.AdamW8bit equivalent (train_stage2.py:613-622): int8
    # block-quantized moments — what fits full-width stage-2 moments in
    # 16 GB HBM (train/adam8bit.py).
    use_8bit_adam: bool = False


def stage1_trainable(top_key: str, path: Tuple[str, ...]) -> bool:
    """Stage 1 trains reference_net + denoising_net (2D mode) + face_locator
    + image_proj (train_stage1.py:372-394); vae and audio_proj are frozen."""
    return top_key in ("reference_net", "denoising_net", "face_locator", "image_proj")


def stage2_trainable(top_key: str, path: Tuple[str, ...]) -> bool:
    """Stage 2 trains only motion_modules + audio_modules inside the denoiser,
    plus audio_proj (stage2.yaml:84-86, train_stage2.py:553-560)."""
    if top_key == "audio_proj":
        return True
    if top_key != "denoising_net":
        return False
    return any(("motion_modules" in p) or ("audio_modules" in p) for p in path)


def label_params(
    params: Dict[str, Any], trainable_fn: Callable[[str, Tuple[str, ...]], bool]
) -> Dict[str, Any]:
    """'train' / 'freeze' label pytree for optax.multi_transform."""

    def label_tree(top_key, tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        labeled = {}
        for path, _ in flat:
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            labeled[keys] = "train" if trainable_fn(top_key, keys) else "freeze"

        def walk(subtree, prefix):
            if isinstance(subtree, dict):
                return {k: walk(v, prefix + (k,)) for k, v in subtree.items()}
            return labeled[prefix]

        return walk(tree, ())

    return {k: label_tree(k, v) for k, v in params.items()}


def make_optimizer(
    cfg: OptimizerConfig, labels: Dict[str, Any]
) -> optax.GradientTransformation:
    lr = cfg.learning_rate
    if cfg.lr_warmup_steps > 0:
        # reference lr_scheduler: "constant" with lr_warmup_steps
        # (stage2.yaml:31-33, get_scheduler in train_stage*.py)
        lr = optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)
    if cfg.use_8bit_adam:
        from hallo_tpu.train.adam8bit import adamw_8bit

        inner = adamw_8bit(
            lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    else:
        inner = optax.adamw(
            lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    adamw = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)
    tx = optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, labels
    )
    if cfg.gradient_accumulation_steps > 1:
        # reference solver.gradient_accumulation_steps (Accelerate
        # accumulate()); params update every k micro-batches.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx


@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Dict[str, Any]
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["step", "params", "opt_state"], meta_fields=[]
)
