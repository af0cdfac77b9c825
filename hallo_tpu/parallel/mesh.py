"""Mesh + sharding utilities.

Design (SURVEY.md §2.4): the reference's only strategy is data parallelism
with ZeRO-2 optimizer-state sharding across 8 GPUs. TPU-native equivalent:

- a ("data",) or ("data", "model") Mesh over ICI
- batch arrays sharded on "data" (NamedSharding); params replicated
- optimizer state sharded ZeRO-style along its largest divisible axis
  (zero_shard_tree) so Adam moments don't replicate
- gradient reduction is inserted by XLA from the shardings (no explicit
  collectives — the pjit/GSPMD recipe)
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed on multihost slices (the reference's
    multinode path is accelerate launch rank args, README.md:301-334; on TPU
    pods the runtime env carries coordinator/process info)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
            return True
        except Exception:  # already initialized or single-process
            return False
    return False


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ("data", "seq", "model") mesh. With n_seq=n_model=1 this is
    pure DP. "seq" is clip parallelism: the 16-frame window sharded over
    devices (models/motion.py all_to_all + GroupNorm psum); it is the inner
    (fastest-ICI) axis after "model" since its collectives run every motion
    module."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    total = n_data * n_model * n_seq
    assert total <= len(devices), (n_data, n_seq, n_model, len(devices))
    grid = np.asarray(devices[:total]).reshape(n_data, n_seq, n_model)
    return Mesh(grid, axis_names=("data", "seq", "model"))


def mesh_from_config(path: Optional[str] = None) -> Mesh:
    """Build the Mesh from configs/parallel.yaml (the TPU-native equivalent
    of the reference's accelerate_config.yaml). Axis sizes: -1 = all
    remaining devices; `seq` is clip parallelism (frames sharded)."""
    spec = {"data": -1, "seq": 1, "model": 1}
    if path and not os.path.exists(path):
        # A typo'd path must not silently disable clip parallelism.
        raise FileNotFoundError(
            f"parallel config not found: {path!r} (pass path=None for the "
            "default pure-DP mesh)"
        )
    if path:
        from hallo_tpu.config import load_yaml

        cfg = load_yaml(path)
        mesh_cfg = getattr(cfg, "mesh", None) or {}
        for axis in spec:
            if axis in mesh_cfg:
                spec[axis] = int(mesh_cfg[axis])
    n_seq = max(1, spec["seq"])
    n_model = max(1, spec["model"])
    n_data = None if spec["data"] in (-1, 0) else spec["data"]
    return make_mesh(n_data=n_data, n_model=n_model, n_seq=n_seq)


def parallel_settings(path: Optional[str] = None) -> dict:
    """Non-mesh knobs of configs/parallel.yaml: `mixed_precision`
    ("no" | "bf16" | "fp16" — fp16 maps to bf16 on TPU) and
    `zero_optimizer_sharding` (reference accelerate_config.yaml zero_stage: 2
    / mixed_precision: fp16)."""
    out = {"mixed_precision": "no", "zero_optimizer_sharding": True}
    if path and not os.path.exists(path):
        raise FileNotFoundError(f"parallel config not found: {path!r}")
    if path:
        from hallo_tpu.config import load_yaml

        cfg = load_yaml(path)
        for key in out:
            if key in cfg:
                out[key] = cfg[key]
    out["mixed_precision"] = str(out["mixed_precision"]).lower()
    out["zero_optimizer_sharding"] = bool(out["zero_optimizer_sharding"])
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _zero_spec(shape: Sequence[int], n_shards: int) -> P:
    """ZeRO-style: shard the largest axis divisible by n_shards, else
    replicate (small params aren't worth scattering)."""
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % n_shards == 0 and shape[axis] >= n_shards:
            spec = [None] * len(shape)
            spec[axis] = "data"
            return P(*spec)
    return P()


def zero_shard_tree(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for optimizer state (ZeRO-2 equivalent,
    reference accelerate_config.yaml:9 zero_stage: 2)."""
    n = mesh.shape["data"]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, _zero_spec(shape, n))

    return jax.tree.map(spec, tree)
