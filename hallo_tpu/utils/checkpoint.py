"""Checkpoint save/load/rotate on orbax.

Replaces the reference's three mechanisms (SURVEY.md §5):
1. full train-state snapshots every N steps with keep-k rotation
   (accelerator.save_state + delete_additional_ckpt, util.py:120-151,707-768)
2. per-module weight exports for stage hand-off (save_checkpoint .pth)
3. "resume latest" scanning checkpoint-N dirs (util.py:784-819)
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(root, f"checkpoint-{step}")


def save_train_state(root: str, step: int, state: Any, keep: int = 3) -> str:
    """Snapshot the full TrainState (params + optimizer + step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(_ckpt_dir(root, step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, _as_pytree(state)), force=True)
    ckptr.wait_until_finished()
    rotate(root, keep)
    return path


def load_train_state(root: str, state_like: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `state_like`. step=None -> latest
    (reference resume_from_checkpoint="latest", util.py:784-819)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoint-* under {root}")
    path = os.path.abspath(_ckpt_dir(root, step))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, _as_pytree(state_like))
    return _from_pytree(state_like, restored), step


def latest_step(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def rotate(root: str, keep: int) -> None:
    """Keep the newest `keep` checkpoints (util.py:120-151)."""
    import shutil

    steps = sorted(
        int(m.group(1))
        for name in os.listdir(root)
        if (m := re.fullmatch(r"checkpoint-(\d+)", name))
    )
    for step in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(_ckpt_dir(root, step), ignore_errors=True)


def save_params(path: str, params: Any) -> str:
    """Per-module weight export (stage hand-off / final artifacts)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, params), force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, params_like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), params_like)


def _as_pytree(state: Any) -> Any:
    if hasattr(state, "params") and hasattr(state, "opt_state"):
        return {"step": state.step, "params": state.params,
                "opt_state": state.opt_state}
    return state


def _from_pytree(state_like: Any, tree: Any) -> Any:
    if hasattr(state_like, "params") and hasattr(state_like, "opt_state"):
        return type(state_like)(
            step=tree["step"], params=tree["params"], opt_state=tree["opt_state"]
        )
    return tree
