"""AnimateDiff-style temporal motion module.

Reference: hallo/models/motion_module.py (VanillaTemporalModule /
TemporalTransformer3DModel / VersatileAttention). Attention runs over the
time axis per spatial location: (B*F, L, C) -> (B*L, F, C) with a sinusoidal
positional encoding added to the normed sequence (motion_module.py:579-607).
proj_out is zero-initialized so a freshly-added module is the identity
(motion_module.py:169-172).

Clip parallelism (`seq_axis`, inside shard_map): every other op in the UNet
is frame-local, so the clip shards over frames across devices; only this
module crosses frames. The Ulysses-style reshard lives HERE, after the
per-frame GN + proj_in (both frame-local, and proj_in shrinks channels by
`temporal_attention_dim_div` first, halving the bytes on the wire):
all_to_all frames<->sites, attend over the full clip per site shard, then
all_to_all back. ReferenceNet motion-frame features concatenate on the time
axis in the full-frames/sharded-sites layout, sliced per device.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import MotionModuleConfig
from hallo_tpu.models.layers import (
    TemporalSelfAttention,
    Dense,
    Dtype,
    FeedForward,
    GroupNorm,
    LayerNorm,
    sinusoidal_positions,
)


class TemporalAttention(nn.Module):
    """Self-attention over frames per spatial site, with sinusoidal PE."""

    heads: int
    head_dim: int
    max_len: int = 32
    use_pe: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T, L, C) normed; attend over T in place (see
        # TemporalSelfAttention docstring for why this beats the reference's
        # (b d) f c rearrange on TPU).
        t, c = x.shape[1], x.shape[-1]
        if self.use_pe:
            assert t <= self.max_len, (
                f"temporal PE max_len={self.max_len} < sequence length {t} "
                "(clip frames + motion frames); raise "
                "temporal_position_encoding_max_len"
            )
            pe = sinusoidal_positions(self.max_len, c)[:t]
            x = x + pe[None, :, None, :].astype(x.dtype)
        return TemporalSelfAttention(
            self.heads, self.head_dim, out_dim=c, dtype=self.dtype, name="attn"
        )(x)


class MotionModule(nn.Module):
    """GN -> proj_in -> N x (temporal attn x2 + FF) -> zero proj_out + residual."""

    config: MotionModuleConfig
    dtype: Dtype = jnp.float32
    # Clip-parallel mesh axis. An ATTRIBUTE (not a call arg) so the call
    # signature stays all-arrays — nn.remat-wrappable without static_argnums.
    seq_axis: Optional[str] = None
    # Sub-layer rematerialization: wrap each temporal attention and the FF
    # in their own remat so a replay of THIS module holds one sub-layer's
    # temporaries instead of all of them. At 512²x16f the level-0 motion FF
    # GEGLU alone is a 320 MB bf16 temp and each attention's backward adds
    # three q/k/v copies — measured as the top HBM temps of the r4 stage-2
    # OOM (17.48 G vs 15.75 G).
    remat_inner: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        motion_feats: Optional[jax.Array] = None,
        seq_axis: Optional[str] = None,
    ) -> jax.Array:
        # x: (B, F, H, W, C) — F is the LOCAL frame count when seq_axis is
        # set (clip parallelism inside shard_map). motion_feats: (B, M, L, C)
        # per-site ReferenceNet motion-frame features (replicated across the
        # seq mesh axis), concatenated ahead of the clip on the time axis and
        # sliced off after (reference unet_3d_blocks.py:477-490).
        seq_axis = seq_axis if seq_axis is not None else self.seq_axis
        cfg = self.config
        if motion_feats is not None and motion_feats.shape[1] == 0:
            # stage-2 "start_ratio" batches carry zero motion frames
            # (train_stage2.py:799-805); an empty prep() would hit 0-size
            # GroupNorm batches.
            motion_feats = None
        b, f, h, w, c = x.shape
        l = h * w
        heads = cfg.num_attention_heads
        head_dim = c // heads // cfg.temporal_attention_dim_div

        norm = GroupNorm(cfg.norm_num_groups, 1e-6, name="norm")
        proj_in = Dense(heads * head_dim, dtype=self.dtype, name="proj_in")

        def prep(z: jax.Array) -> jax.Array:
            # (B, T, L, C): per-frame GN (stats over L x C/G) + proj_in.
            zn = norm(z.reshape(b * z.shape[1], l, c)).reshape(z.shape)
            return proj_in(zn)

        residual = x.reshape(b, f, l, c)
        hs = prep(residual)
        m = 0 if motion_feats is None else motion_feats.shape[1]
        if motion_feats is not None:
            mf = prep(motion_feats.astype(x.dtype))
        if seq_axis is not None:
            # frames-sharded -> sites-sharded: (B, f, L, C') -> (B, f*n, L/n, C')
            hs = jax.lax.all_to_all(
                hs, seq_axis, split_axis=2, concat_axis=1, tiled=True
            )
            if motion_feats is not None:
                n_dev = jax.lax.psum(1, seq_axis)
                l_loc = mf.shape[2] // n_dev
                idx = jax.lax.axis_index(seq_axis)
                mf = jax.lax.dynamic_slice_in_dim(mf, idx * l_loc, l_loc, axis=2)
        if motion_feats is not None:
            hs = jnp.concatenate([mf, hs], axis=1)

        R = nn.remat if self.remat_inner else (lambda cls: cls)
        for i in range(cfg.num_transformer_block):
            for j, block_type in enumerate(cfg.attention_block_types):
                assert block_type == "Temporal_Self", block_type
                normed = LayerNorm(dtype=self.dtype, name=f"blocks_{i}_norm_{j}")(hs)
                hs = hs + R(TemporalAttention)(
                    heads,
                    head_dim,
                    max_len=cfg.temporal_position_encoding_max_len,
                    use_pe=cfg.temporal_position_encoding,
                    dtype=self.dtype,
                    name=f"blocks_{i}_attn_{j}",
                )(normed)
            # Under remat_inner also CHUNK the FF over sites (lax.map): the
            # rematted replay of one chunk then bounds the GEGLU backward
            # temps at 1/chunks of the full site axis (the r4b OOM's top-5
            # temps were this FF's backward at down_blocks_0, ~960 MB).
            n_ff_chunks = (
                4 if self.remat_inner and hs.shape[-2] % 4 == 0 else 1
            )
            hs = hs + R(FeedForward)(
                hs.shape[-1], dtype=self.dtype, chunks=n_ff_chunks,
                name=f"blocks_{i}_ff",
            )(
                LayerNorm(dtype=self.dtype, name=f"blocks_{i}_ff_norm")(hs)
            )

        if motion_feats is not None:
            hs = hs[:, m:]
        if seq_axis is not None:
            # sites-sharded -> frames-sharded: (B, f*n, L/n, C') -> (B, f, L, C')
            hs = jax.lax.all_to_all(
                hs, seq_axis, split_axis=1, concat_axis=2, tiled=True
            )
        hs = Dense(c, dtype=self.dtype, zero_init=True, name="proj_out")(hs)
        return (hs + residual).reshape(b, f, h, w, c)
