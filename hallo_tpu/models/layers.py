"""Core NN building blocks (channels-last, TPU-friendly).

Replaces the reference L1 layer (hallo/models/resnet.py primitives,
diffusers Attention/FeedForward) with flax.linen modules that keep params in
fp32 and compute in a configurable dtype (bf16 on TPU). All spatial tensors
are NHWC; video tensors are (B, F, H, W, C) with frames folded into batch
for spatial ops — the TPU-native equivalent of the reference's
InflatedConv3d rearrange (hallo/models/resnet.py:50-66).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype

# Escape hatch: HALLO_NORM_F32=1 restores the legacy f32-upcast normalize
# pass in GroupNorm AND LayerNorm (see group_norm's perf note). Read once
# at import (jit-static).
import os as _os

_GN_F32_NORMALIZE = _os.environ.get("HALLO_NORM_F32", "0") == "1"


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """GroupNorm over all non-batch axes, channels-last, stats in fp32.

    The caller controls the normalization extent by shaping the batch axis:
    pass (B*F, H, W, C) for per-frame GroupNorm (torch nn.GroupNorm on folded
    frames) or (B, F, H, W, C) for "inflated" GroupNorm whose stats span
    (F, H, W) (reference: hallo/models/resnet.py:69-101).

    With `axis_name` (inside shard_map), the moment sums are psum-reduced
    over that mesh axis so statistics span the device-sharded extent too —
    the clip-parallel path shards frames while inflated-GN stats must cover
    the whole clip.

    TPU layout note: the big-tensor passes keep C as the minor (lane) dim —
    per-channel sum/sum-of-squares, then the tiny (B, C) stats are regrouped.
    The naive (B, N, G, C/G) reshape makes the lane dim C/G (= 10 for SD's
    320/32), a ~13x tile-padding tax on every GN; xprof showed these as some
    of the hottest fusions in the denoiser step.
    """
    orig_dtype = x.dtype
    b, c = x.shape[0], x.shape[-1]
    g = num_groups
    cg = c // g
    xf = x.reshape(b, -1, c)
    n = xf.shape[1]

    x32 = xf.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=1)  # (B, C)
    s2 = jnp.sum(jnp.square(x32), axis=1)  # (B, C)
    if axis_name is not None:
        s1, s2 = jax.lax.psum((s1, s2), axis_name)
        n = n * jax.lax.psum(1, axis_name)
    denom = float(n * cg)
    mean_g = jnp.sum(s1.reshape(b, g, cg), axis=-1) / denom  # (B, G)
    ex2_g = jnp.sum(s2.reshape(b, g, cg), axis=-1) / denom
    var_g = jnp.maximum(ex2_g - jnp.square(mean_g), 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)

    mean_c = jnp.repeat(mean_g, cg, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd_g, cg, axis=-1)
    eff_scale = rstd_c * scale[None, :].astype(jnp.float32)  # (B, C)
    eff_bias = bias[None, :].astype(jnp.float32) - mean_c * eff_scale
    if _GN_F32_NORMALIZE:
        # Legacy path: normalize the f32 upcast. XLA materializes an f32
        # copy of the activation from the stats fusion (~3 ms per level-0
        # inflated GN; doubles the HBM write+read of the big tensor).
        # Decoupling it with an optimization_barrier was MEASURED SLOWER
        # (544.5 vs 526.5 ms/step) — don't retry that variant.
        out = x32 * eff_scale[:, None, :] + eff_bias[:, None, :]
        return out.reshape(x.shape).astype(orig_dtype)
    # Default: apply the per-(B, C) affine IN THE COMPUTE DTYPE. The stats
    # are still exact f32 sums (the x32 converts fuse into the reduces and
    # never materialize); only the tiny (B, C) coefficients are rounded to
    # the compute dtype, so no f32 copy of the big tensor exists anywhere
    # in the graph. In f32 compute this is bit-identical to the legacy
    # path; in bf16 the elementwise rounding is ~0.4% relative (pinned by
    # tests/test_layers.py::test_group_norm_bf16_affine_close_to_f32).
    a = eff_scale.astype(orig_dtype)[:, None, :]
    b = eff_bias.astype(orig_dtype)[:, None, :]
    return (xf * a + b).reshape(x.shape)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5
    axis_name: Optional[str] = None  # psum moments over this mesh axis

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(
            x, scale, bias, self.num_groups, self.eps, axis_name=self.axis_name
        )


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if _GN_F32_NORMALIZE:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
            out = out * scale + bias
            return out.astype(self.dtype)
        # Default: f32 one-pass moments (both converts fuse into the
        # reduces — no f32 copy of the big tensor), normalize applied in
        # the compute dtype; same perf rationale as group_norm. NOTE: unlike
        # group_norm this also changes the f32 variance ESTIMATOR from
        # two-pass E[(x-mean)^2] to one-pass E[x^2]-E[x]^2, which is
        # cancellation-prone when |mean| >> std; the max(., 0) guard plus
        # the large-mean envelope test (test_layer_norm_bf16_large_mean)
        # bound the effect for this model's activation scales. Exact legacy
        # math stays available under HALLO_NORM_F32=1.
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + self.eps)
        cd = self.dtype
        out = (x.astype(cd) - mean.astype(cd)) * rstd.astype(cd)
        return out * scale.astype(cd) + bias.astype(cd)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kernel_init,
        )(x)


class Conv(nn.Module):
    """2D conv on NHWC inputs. For video, callers fold frames into batch."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    dtype: Dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=[(self.padding, self.padding)] * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kernel_init,
        )(x)


class _FusedUp2xConv3x3(nn.Module):
    """Nearest-2x upsample + 3x3 conv computed AT LOW RESOLUTION.

    Exact rewrite (reference resnet.py:104-185 semantics): on nearest-2x
    input, every hi-res output parity class (p, q) in {0,1}^2 only ever sees
    2x2 distinct low-res pixels, with an effective 2x2 kernel made of sums
    of the 3x3 taps (rows: p=0 -> [W0, W1+W2], p=1 -> [W0+W1, W2]; same for
    columns). All four parity kernels are stacked on the output-feature
    axis into ONE (2, 2, C, 4F) conv with (1,1)x(1,1) padding — parity
    (p, q) then reads the (h, w) window at offset (p, q) of its feature
    block — followed by a static-slice interleave to (N, 2h, 2w, F).

    Why: 16 MACs per 4 hi-res outputs instead of 36 (2.25x fewer MXU
    passes) and the 4x-materialized nearest-upsampled input never exists
    (HBM). Param tree identical to nn.Conv (kernel (3,3,C,F) + bias), so
    checkpoints/converters are unaffected; gradients flow through the tap
    sums, so training uses it too.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c, f = x.shape[-1], self.features
        w3 = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, f), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        xd = x.astype(self.dtype)
        wd = w3.astype(self.dtype)
        rows = {0: jnp.stack([wd[0], wd[1] + wd[2]]),
                1: jnp.stack([wd[0] + wd[1], wd[2]])}

        def cols(a: jax.Array, q: int) -> jax.Array:
            if q == 0:
                return jnp.stack([a[:, 0], a[:, 1] + a[:, 2]], axis=1)
            return jnp.stack([a[:, 0] + a[:, 1], a[:, 2]], axis=1)

        k = jnp.concatenate(
            [cols(rows[p], q) for p in (0, 1) for q in (0, 1)], axis=-1
        )  # (2, 2, C, 4F), feature block index = 2p + q
        y = jax.lax.conv_general_dilated(
            xd, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (N, h+1, w+1, 4F)
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        parts = [
            y[:, p:p + h, q:q + w, (2 * p + q) * f:(2 * p + q + 1) * f]
            for p in (0, 1) for q in (0, 1)
        ]
        out = jnp.stack(
            [jnp.stack(parts[0:2], axis=3), jnp.stack(parts[2:4], axis=3)],
            axis=2,
        )  # (N, h, 2, w, 2, F): [i, p, j, q] -> hi-res (2i+p, 2j+q)
        return out.reshape(n, 2 * h, 2 * w, f) + b.astype(self.dtype)


class Up2xConv(nn.Module):
    """Nearest-2x spatial upsample + 3x3 conv on (N, H, W, C).

    Drop-in for `jnp.repeat(x, 2, 1/2)` + `Conv(name=...)`: the param tree
    (<name>/Conv_0/{kernel,bias}) and math are identical on both paths.
    HALLO_FUSED_UPSAMPLE=0 falls back to the materialized hi-res conv (the
    A/B escape hatch); default is the fused low-res form (_FusedUp2xConv3x3).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        if os.environ.get("HALLO_FUSED_UPSAMPLE", "1") != "0":
            return _FusedUp2xConv3x3(
                self.features, dtype=self.dtype, name="Conv_0"
            )(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(
            self.features,
            kernel_size=(3, 3),
            padding=[(1, 1)] * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="Conv_0",
        )(x)


def fold_time(x: jax.Array) -> Tuple[jax.Array, int]:
    """(B, F, H, W, C) -> ((B*F, H, W, C), F)."""
    b, f = x.shape[0], x.shape[1]
    return x.reshape((b * f,) + x.shape[2:]), f


def unfold_time(x: jax.Array, frames: int) -> jax.Array:
    """(B*F, H, W, C) -> (B, F, H, W, C)."""
    return x.reshape((x.shape[0] // frames, frames) + x.shape[1:])


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers `Timesteps` semantics
    (flip_sin_to_cos=True, freq_shift=0 per unet_3d.py:184-186)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """Linear -> SiLU -> Linear MLP over the sinusoidal embedding."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        x = Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class FeedForward(nn.Module):
    """GEGLU feed-forward, diffusers semantics: proj to 2*inner, value * gelu(gate).

    chunks > 1 runs the (token-wise) FF through `lax.map` over chunks of the
    second-to-last axis: the GEGLU intermediates then exist one chunk at a
    time — in forward AND (scan-transposed) backward — instead of all at
    once. At 512²x16f the level-0 motion FF otherwise holds ~1 GB of
    backward temps (the top allocations of the r4 stage-2 OOM dumps). Exact
    same math; same param paths as the unchunked Dense pair.
    """

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    chunks: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        if self.chunks <= 1 or x.ndim < 2 or x.shape[-2] % self.chunks:
            proj = Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
            value, gate = jnp.split(proj, 2, axis=-1)
            x = value * nn.gelu(gate, approximate=False)
            x = Dense(self.dim, dtype=self.dtype, name="proj_out")(x)
            return x

        # Same param paths (<name>/Dense_0/{kernel,bias}) as the Dense pair
        # above; the contraction happens inside the mapped chunk body.
        k1, b1 = _NamedDense(x.shape[-1], inner * 2, name="proj_in")()
        k2, b2 = _NamedDense(inner, self.dim, name="proj_out")()
        dt = self.dtype
        k1, b1, k2, b2 = (t.astype(dt) for t in (k1, b1, k2, b2))

        def ff_chunk(z):
            proj = jnp.einsum("...c,cd->...d", z.astype(dt), k1) + b1
            value, gate = jnp.split(proj, 2, axis=-1)
            h = value * nn.gelu(gate, approximate=False)
            return jnp.einsum("...c,cd->...d", h, k2) + b2

        n = x.shape[-2]
        xs = x.reshape(x.shape[:-2] + (self.chunks, n // self.chunks, x.shape[-1]))
        xs = jnp.moveaxis(xs, -3, 0)
        ys = jax.lax.map(ff_chunk, xs)
        ys = jnp.moveaxis(ys, 0, -3)
        return ys.reshape(x.shape[:-1] + (self.dim,))


class _NamedDense(nn.Module):
    """Creates kernel/bias at the exact param paths of `Dense` (i.e.
    <name>/Dense_0/{kernel,bias}) and returns them for a caller-side
    contraction (e.g. inside a `lax.map` chunk body, where calling a
    compact submodule is not allowed)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return _DenseParams(self.in_features, self.features, name="Dense_0")()


class _DenseParams(nn.Module):
    """Holds a Dense kernel/bias at the same param paths nn.Dense would
    create (<name>/kernel, <name>/bias) without applying it — the caller
    contracts with a custom einsum (e.g. heads-major attention layouts)."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class CrossAttention(nn.Module):
    """Multi-head attention (self- when context is None), diffusers `Attention`
    weight layout: to_q/to_k/to_v without bias, to_out with bias.

    The QKV projections emit the heads-major (B, H, L, D) layout directly via
    einsum so no standalone transpose materializes before the attention
    kernel (xprof showed ~8% of the denoiser step in those transposes)."""

    heads: int
    head_dim: int
    out_dim: Optional[int] = None
    upcast: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        bias: Optional[jax.Array] = None,
        backend: Optional[str] = None,
        extra_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        """extra_kv: pre-projected (B, L_extra, inner) key/value rows appended
        after this call's own K/V projection. Because to_k/to_v carry no bias,
        `to_k(concat([ctx, extra]))` row-equals `concat([to_k(ctx), extra_k])`
        — callers hoist step-invariant KV (e.g. reference-feature tokens)
        out of a sampling loop and pass the projected rows here. A `bias`
        must already cover the concatenated key length."""
        context = x if context is None else context
        inner = self.heads * self.head_dim
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        c_q, c_kv = x.shape[-1], context.shape[-1]

        wq, _ = _Wrap(c_q, inner, False, dtype=self.dtype, name="to_q")()
        wk, _ = _Wrap(c_kv, inner, False, dtype=self.dtype, name="to_k")()
        wv, _ = _Wrap(c_kv, inner, False, dtype=self.dtype, name="to_v")()
        wo, bo = _Wrap(inner, out_dim, True, dtype=self.dtype, name="to_out")()

        h, d = self.heads, self.head_dim

        # Packed path (TPU): projections and attention I/O stay in the
        # NATURAL (B, L, C) layout — the all-heads-resident kernel slices
        # heads in VMEM (pallas_flash._attention_kernel_packed). Emitting
        # head-major/transposed layouts to HBM made XLA propagate L-minor
        # layouts through every downstream matmul (~260 GB/s writes,
        # measured ~35-55 ms/step at 512²).
        from hallo_tpu.ops.attention import _resolve_backend

        per_key_bias = bias is None or (
            bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
        ) or bias.ndim <= 2
        if (
            _resolve_backend(backend) == "pallas"
            and not self.upcast
            and per_key_bias
            and x.shape[1] >= 256
            and d % 128 != 0
        ):
            from hallo_tpu.ops.pallas_flash import flash_attention_packed

            q = jnp.einsum("blc,cm->blm", x, wq.astype(self.dtype))
            k = jnp.einsum("blc,cm->blm", context, wk.astype(self.dtype))
            v = jnp.einsum("blc,cm->blm", context, wv.astype(self.dtype))
            if extra_kv is not None:
                k = jnp.concatenate([k, extra_kv[0].astype(k.dtype)], axis=1)
                v = jnp.concatenate([v, extra_kv[1].astype(v.dtype)], axis=1)
            flat_bias = (
                None if bias is None else bias.reshape(bias.shape[0], -1)
            )
            out = flash_attention_packed(q, k, v, heads=h, bias=flat_bias)
            out = jnp.einsum(
                "blm,mo->blo", out.astype(self.dtype), wo.astype(self.dtype)
            )
            return out + bo.astype(self.dtype)

        q = jnp.einsum(
            "blc,chd->bhld", x, wq.reshape(c_q, h, d).astype(self.dtype)
        )
        k = jnp.einsum(
            "blc,chd->bhld", context, wk.reshape(c_kv, h, d).astype(self.dtype)
        )
        v = jnp.einsum(
            "blc,chd->bhld", context, wv.reshape(c_kv, h, d).astype(self.dtype)
        )
        if extra_kv is not None:
            bx, lx = extra_kv[0].shape[0], extra_kv[0].shape[1]
            ek = extra_kv[0].reshape(bx, lx, h, d).swapaxes(1, 2).astype(k.dtype)
            ev = extra_kv[1].reshape(bx, lx, h, d).swapaxes(1, 2).astype(v.dtype)
            k = jnp.concatenate([k, ek], axis=2)
            v = jnp.concatenate([v, ev], axis=2)
        if self.upcast:
            q, k = q.astype(jnp.float32), k.astype(jnp.float32)
        out = dot_product_attention(q, k, v, bias=bias, backend=backend)
        out = jnp.einsum(
            "bhld,hdc->blc",
            out.astype(self.dtype),
            wo.reshape(h, d, out_dim).astype(self.dtype),
        )
        return out + bo.astype(self.dtype)


class TemporalSelfAttention(nn.Module):
    """Self-attention over the FRAME axis per spatial site, formulated on
    (B, F, L, C) directly — no (B*L, F, C) re-layout.

    The classic formulation (reference motion_module.py:579-607 rearranges
    `(b f) d c -> (b d) f c`) forces two materialized 90 MB transposes per
    attention at 512^2 plus batched 18x18 matmuls; xprof measured ~100 ms/step
    across the motion modules — for ~4 GFLOP of actual math. Keeping the
    site axis in place lets XLA fold the layout changes into the projection
    matmuls, and the tiny frame-axis contraction runs as a (b h l) batched
    matmul without host-visible copies. Param tree matches CrossAttention
    (to_q/to_k/to_v/to_out) so converted checkpoints load unchanged."""

    heads: int
    head_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, F, L, C)
        b, f, l, c = x.shape
        inner = self.heads * self.head_dim
        out_dim = self.out_dim if self.out_dim is not None else c
        wq, _ = _Wrap(c, inner, False, dtype=self.dtype, name="to_q")()
        wk, _ = _Wrap(c, inner, False, dtype=self.dtype, name="to_k")()
        wv, _ = _Wrap(c, inner, False, dtype=self.dtype, name="to_v")()
        wo, bo = _Wrap(inner, out_dim, True, dtype=self.dtype, name="to_out")()

        h, d = self.heads, self.head_dim
        scale = float(d) ** -0.5
        from hallo_tpu.ops.attention import _resolve_backend

        if _resolve_backend(None) == "pallas":
            from hallo_tpu.ops import pallas_temporal as pt

            wq_ = wq.astype(self.dtype)
            wk_ = wk.astype(self.dtype)
            wv_ = wv.astype(self.dtype)

            # NOTE(r1, measured): temporal_attention_packed (natural-layout
            # I/O, heads in VMEM) removes the ~30 ms of L-minor Dense
            # penalties its site-major HBM layout causes downstream, BUT the
            # kernel itself ran ~200 ms/step slower — the natural
            # orientation puts d=40 on lanes (31% VPU lane use), the
            # scoped-vmem limit forces 64-site tiles, and the 8 heads run
            # sequentially per instance. Site-major stays the dispatch;
            # the packed kernel + tests remain for a future Mosaic with
            # cheaper relayouts.
            q = jnp.einsum("bflc,cm->bfml", x, wq_)
            k = jnp.einsum("bflc,cm->bfml", x, wk_)
            v = jnp.einsum("bflc,cm->bfml", x, wv_)
            o = pt.temporal_attention(q, k, v, heads=h, scale=scale)
            y = jnp.einsum("bfml,mo->bflo", o.astype(self.dtype), wo.astype(self.dtype))
            # NOTE(r1, measured): ops/layout.layout_anchor(y) here — forcing
            # the natural layout with one pallas copy — came out 13 ms/step
            # SLOWER (511 vs 498): the anchor copies cost more than the
            # L-minor Dense penalty they remove. Don't retry without a new
            # profile showing the downstream chain got more expensive.
            return y + bo.astype(self.dtype)

        q = jnp.einsum("bflc,chd->bhlfd", x, wq.reshape(c, h, d).astype(self.dtype))
        k = jnp.einsum("bflc,chd->bhlfd", x, wk.reshape(c, h, d).astype(self.dtype))
        v = jnp.einsum("bflc,chd->bhlfd", x, wv.reshape(c, h, d).astype(self.dtype))
        s = jnp.einsum("bhlfd,bhlgd->bhlfg", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhlfg,bhlgd->bhlfd", p, v)
        y = jnp.einsum(
            "bhlfd,hdc->bflc", o.astype(self.dtype),
            wo.reshape(h, d, out_dim).astype(self.dtype),
        )
        return y + bo.astype(self.dtype)


class _Wrap(nn.Module):
    """Param subtree shaped like the Dense wrapper (<name>/Dense_0/{kernel,
    bias}) for checkpoint-converter compatibility."""

    in_features: int
    features: int
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return _DenseParams(
            self.in_features, self.features, self.use_bias, name="Dense_0"
        )()


def sinusoidal_positions(max_len: int, dim: int) -> jax.Array:
    """Motion-module positional encoding table
    (reference: hallo/models/motion_module.py:426-461)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe
