"""Tensor parallelism over the "model" mesh axis (GSPMD recipe).

The reference has no TP at all (SURVEY.md §2.4 — DP/ZeRO-2 only); this is
TPU-native headroom for the wide blocks: the 1280-channel mid/up-block
FeedForward and attention projections dominate the denoiser's dense time
(BASELINE.md per-step composition). The idiomatic JAX way is NOT explicit
collectives: annotate the big Dense kernels with PartitionSpecs over
"model" and let GSPMD partition the matmuls and insert the all-reduces.

Sharding rule (Megatron pattern, emergent from one local heuristic):
- a (in, out) kernel with a wide `out` is COLUMN-parallel: P(None, "model"),
  bias P("model") — activations come out feature-sharded;
- a kernel with a wide `in` is ROW-parallel: P("model", None), bias
  replicated — GSPMD turns the contraction over the sharded axis into
  partial sums + psum.
A FeedForward pair (C -> 4C -> C) therefore gets column- then row-parallel
with exactly one all-reduce, and qkv/out projections pair the same way —
without any per-module wiring. Everything else stays replicated.

Used by the trainers when configs/parallel.yaml `mesh.model > 1`. Composes
with the shard_map clip-parallel path (seq > 1): the train step's shard_map
is manual over ("data", "seq") only, leaving "model" an AUTO axis so GSPMD
keeps partitioning the TP-sharded matmuls inside the body
(train/step.py value_and_grad). Numerics pinned by
tests/test_tensor_parallel.py; the combined (data, seq, model) step runs in
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Only genuinely wide layers are worth scattering: at 1280 features a
# 2-way shard still leaves 640-wide MXU-friendly panels; sharding the
# 320-wide level-0 layers would pad below the 128-lane tile.
DEFAULT_MIN_DIM = 1280


def _dense_specs(
    kernel_shape, n_model: int, min_dim: int
) -> Optional[tuple]:
    """(kernel_spec, bias_spec) for a 2-D Dense kernel, or None."""
    if len(kernel_shape) != 2:
        return None
    d_in, d_out = kernel_shape
    col_ok = d_out >= min_dim and d_out % n_model == 0
    row_ok = d_in >= min_dim and d_in % n_model == 0
    # Prefer the LARGER dim (the FF down-projection (4C, C) must be
    # row-parallel so the pair forms the single-psum Megatron pattern);
    # ties go column-parallel (activations stay sharded longer).
    if col_ok and (d_out >= d_in or not row_ok):
        return P(None, "model"), P("model")
    if row_ok:
        return P("model", None), P()
    return None


def tp_param_specs(
    params: Any, n_model: int, min_dim: int = DEFAULT_MIN_DIM
) -> Any:
    """PartitionSpec pytree for `params`: wide Dense kernels sharded over
    "model" per the column/row rule above, everything else replicated.

    Kernel and bias of one flax Dense live in the same dict, so the bias
    spec is decided together with its kernel."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            kb = None
            if "kernel" in node and hasattr(node["kernel"], "shape"):
                kb = _dense_specs(node["kernel"].shape, n_model, min_dim)
            for k, v in node.items():
                if kb is not None and k == "kernel":
                    out[k] = kb[0]
                elif kb is not None and k == "bias":
                    out[k] = kb[1]
                elif isinstance(v, dict):
                    out[k] = walk(v)
                else:
                    out[k] = P()
            return out
        return P()

    # flax params are plain (Frozen)dicts all the way down; anything exotic
    # falls back to replicated leaf-by-leaf.
    if isinstance(params, dict):
        return walk(params)
    return jax.tree.map(lambda _: P(), params)


def tp_shardings(
    params: Any, mesh: Mesh, min_dim: int = DEFAULT_MIN_DIM
) -> Any:
    """NamedSharding pytree ready for jax.device_put / jit in_shardings."""
    n = mesh.shape.get("model", 1)
    specs = tp_param_specs(params, n, min_dim) if n > 1 else jax.tree.map(
        lambda _: P(), params
    )
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def count_sharded(specs: Any) -> int:
    """Number of leaves with a non-trivial spec (diagnostics/tests)."""
    return sum(
        1
        for leaf in jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
        if isinstance(leaf, P) and any(a is not None for a in leaf)
    )
