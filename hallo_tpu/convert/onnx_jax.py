"""Execute ONNX graphs with JAX — the TPU-native replacement for the
reference's onnxruntime dependency (SURVEY.md §2.3; image_processor.py:
100-138 runs SCRFD + ArcFace through onnxruntime sessions).

Design notes (TPU-first):

- The executor builds one pure function ``run(params, inputs) -> outputs``
  where ``params`` holds the float weights as explicit arguments — safe to
  ``jax.jit`` (never closes over large constants; see CLAUDE.md on the
  axon tunnel materializing captured constants one by one).
- Exported graphs carry shape-computation subgraphs (Shape → Gather →
  Unsqueeze → Concat → Reshape). Under jit all shapes are static, so these
  fold on the host: every value is either a host ``np.ndarray`` constant
  or a traced array, and an op whose inputs are all host constants (and is
  foldable) executes eagerly with numpy. This keeps the traced graph free
  of data-dependent shapes — XLA requirement.
- Layout: ONNX is NCHW. Convs are expressed in NCHW dimension numbers and
  XLA:TPU's layout assignment picks the tiled internal layout; these
  models run once per clip (host-side preprocessing in the reference), so
  no Pallas work is warranted here.

Supported op set = everything in the InsightFace SCRFD/ArcFace family
plus common exporter patterns; unsupported ops raise with the op name.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from hallo_tpu.convert.onnx_io import OnnxModel, OnnxNode, load_onnx

Array = Union[np.ndarray, jax.Array]

# Ops that may fold on host when every input is a host constant.
_FOLDABLE = {
    "Shape", "Gather", "Slice", "Concat", "Unsqueeze", "Squeeze", "Cast",
    "Add", "Sub", "Mul", "Div", "Reshape", "Transpose", "Constant",
    "ConstantOfShape", "Range", "Identity", "Expand", "Where", "Equal",
    "ReduceProd", "Floor", "Ceil",
}


def _is_host(*vals: Array) -> bool:
    return all(isinstance(v, np.ndarray) or np.isscalar(v) for v in vals)


def _pair(v: Optional[Sequence[int]], default: int, n: int = 2) -> Tuple[int, ...]:
    if v is None:
        return (default,) * n
    return tuple(int(x) for x in v)


def _conv_padding(pads: Optional[Sequence[int]], spatial: int) -> List[Tuple[int, int]]:
    if pads is None:
        return [(0, 0)] * spatial
    pads = [int(p) for p in pads]
    return [(pads[i], pads[i + spatial]) for i in range(spatial)]


def _align_unidirectional(slope: Array, rank: int) -> Array:
    """ONNX PRelu broadcasts slope to x unidirectionally: align the slope's
    shape to the input rank by prepending singleton dims."""
    while slope.ndim < rank:
        slope = slope[None]
    return slope


class UnsupportedOnnxOps(NotImplementedError):
    """Raised at executor construction when the graph uses ops the executor
    has no kernel for. Carries the sorted unique op list for tooling."""

    def __init__(self, ops: Sequence[str]):
        self.ops = sorted(set(ops))
        super().__init__(
            "ONNX graph uses unsupported op(s): " + ", ".join(self.ops)
            + " — extend OnnxExecutor (_op_<name>) or export the model "
            "without them"
        )


class OnnxExecutor:
    """Compile an OnnxModel into a jittable ``(params, inputs) -> outputs``.

    ``params``: dict of the float initializers (weights). Small / integer
    initializers (shape vectors, axes) stay embedded as host constants so
    the shape subgraphs fold at trace time.
    """

    PARAM_MIN_SIZE = 65  # arrays at least this big (and float) become params

    def __init__(self, model: Union[OnnxModel, str, bytes], strict: bool = True):
        if not isinstance(model, OnnxModel):
            model = load_onnx(model)
        self.graph = model.graph
        self.opset = model.opset
        if strict:
            # Preflight: fail at LOAD time with the full unsupported-op list
            # instead of a mid-inference NotImplementedError on one op
            # (reference loads models eagerly too — image_processor.py:100-138
            # constructs every onnxruntime session up front).
            missing = self.check_support(self.graph)
            if missing:
                raise UnsupportedOnnxOps(missing)
        self.params: Dict[str, np.ndarray] = {}
        self._consts: Dict[str, np.ndarray] = {}
        for k, arr in self.graph.initializers.items():
            if arr.dtype.kind == "f" and arr.size >= self.PARAM_MIN_SIZE:
                self.params[k] = arr
            else:
                self._consts[k] = arr
        self.input_names = [n for n, _ in self.graph.inputs]
        self.output_names = list(self.graph.outputs)

    # -- public ------------------------------------------------------------
    def __call__(
        self, params: Dict[str, Array], inputs: Dict[str, Array]
    ) -> Dict[str, Array]:
        vals: Dict[str, Array] = dict(self._consts)
        vals.update(params)
        for k, v in inputs.items():
            vals[k] = v
        for node in self.graph.nodes:
            args = [vals[i] if i else None for i in node.inputs]
            outs = self._run_node(node, args)
            if not isinstance(outs, tuple):
                outs = (outs,)
            for name, o in zip(node.outputs, outs):
                if name:
                    vals[name] = o
        return {k: vals[k] for k in self.output_names}

    def jit(self) -> Callable[[Dict[str, Array], Dict[str, Array]], Dict[str, Array]]:
        return jax.jit(self.__call__)

    @classmethod
    def supported_ops(cls) -> frozenset:
        """ONNX op_types this executor can dispatch (derived from the
        _op_<name> methods, so it can never drift from the implementation).
        Names are lowercase — ONNX op casing is normalized at dispatch."""
        return frozenset(
            name[len("_op_"):] for name in dir(cls) if name.startswith("_op_")
        )

    @classmethod
    def check_support(cls, graph) -> List[str]:
        """Sorted unique list of op_types in `graph` the executor cannot
        run (empty = fully supported). Use before / at load to fail with
        the complete list instead of mid-inference on the first one."""
        ok = cls.supported_ops()
        return sorted(
            {n.op_type for n in graph.nodes if n.op_type.lower() not in ok}
        )

    # -- dispatch ----------------------------------------------------------
    def _run_node(self, node: OnnxNode, args: List[Optional[Array]]):
        fn = getattr(self, f"_op_{node.op_type.lower()}", None)
        if fn is None:
            raise NotImplementedError(
                f"ONNX op {node.op_type!r} (node {node.name!r}) is not "
                "supported by OnnxExecutor"
            )
        host = node.op_type in _FOLDABLE and _is_host(
            *[a for a in args if a is not None]
        )
        xp = np if host else jnp
        out = fn(xp, node.attrs, *args)
        if host and not isinstance(out, (np.ndarray, tuple)):
            out = np.asarray(out)
        return out

    # -- elementwise / math --------------------------------------------------
    def _op_add(self, xp, a, x, y):
        return x + y

    def _op_sub(self, xp, a, x, y):
        return x - y

    def _op_mul(self, xp, a, x, y):
        return x * y

    def _op_div(self, xp, a, x, y):
        return x / y

    def _op_pow(self, xp, a, x, y):
        return x ** y

    def _op_neg(self, xp, a, x):
        return -x

    def _op_sqrt(self, xp, a, x):
        return xp.sqrt(x)

    def _op_exp(self, xp, a, x):
        return xp.exp(x)

    def _op_log(self, xp, a, x):
        return xp.log(x)

    def _op_floor(self, xp, a, x):
        return xp.floor(x)

    def _op_ceil(self, xp, a, x):
        return xp.ceil(x)

    def _op_min(self, xp, a, *xs):
        out = xs[0]
        for x in xs[1:]:
            out = xp.minimum(out, x)
        return out

    def _op_max(self, xp, a, *xs):
        out = xs[0]
        for x in xs[1:]:
            out = xp.maximum(out, x)
        return out

    def _op_relu(self, xp, a, x):
        return xp.maximum(x, 0)

    def _op_leakyrelu(self, xp, a, x):
        alpha = a.get("alpha", 0.01)
        return xp.where(x >= 0, x, alpha * x)

    def _op_prelu(self, xp, a, x, slope):
        slope = _align_unidirectional(slope, x.ndim)
        return xp.where(x >= 0, x, slope * x)

    def _op_sigmoid(self, xp, a, x):
        return jax.nn.sigmoid(x) if xp is jnp else 1 / (1 + np.exp(-x))

    def _op_tanh(self, xp, a, x):
        return xp.tanh(x)

    def _op_erf(self, xp, a, x):
        return jax.scipy.special.erf(x)

    def _op_softmax(self, xp, a, x):
        axis = a.get("axis", -1 if self.opset >= 13 else 1)
        return jax.nn.softmax(x, axis=axis)

    def _op_clip(self, xp, a, x, lo=None, hi=None):
        lo = a.get("min", lo)
        hi = a.get("max", hi)
        if lo is not None:
            x = xp.maximum(x, lo)
        if hi is not None:
            x = xp.minimum(x, hi)
        return x

    def _op_where(self, xp, a, c, x, y):
        return xp.where(c, x, y)

    def _op_equal(self, xp, a, x, y):
        return x == y

    def _op_identity(self, xp, a, x):
        return x

    def _op_dropout(self, xp, a, x, *rest):
        return x  # eval mode; optional mask output unused

    def _op_cast(self, xp, a, x):
        np_dtype = {
            1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 9: jnp.bool_,
            10: jnp.float16, 11: jnp.float64, 2: jnp.uint8, 3: jnp.int8,
        }[int(a["to"])]
        if xp is np:
            return np.asarray(x).astype(np.dtype(np_dtype))
        return x.astype(np_dtype)

    # -- reductions ----------------------------------------------------------
    def _reduce(self, xp, a, x, fn, axes_in=None):
        axes = a.get("axes", axes_in)
        if axes is not None:
            axes = tuple(int(v) for v in np.asarray(axes).reshape(-1))
        keep = bool(a.get("keepdims", 1))
        return fn(x, axis=axes, keepdims=keep)

    def _op_reducemean(self, xp, a, x, axes=None):
        return self._reduce(xp, a, x, xp.mean, axes)

    def _op_reducesum(self, xp, a, x, axes=None):
        return self._reduce(xp, a, x, xp.sum, axes)

    def _op_reducemax(self, xp, a, x, axes=None):
        return self._reduce(xp, a, x, xp.max, axes)

    def _op_reduceprod(self, xp, a, x, axes=None):
        return self._reduce(xp, a, x, xp.prod, axes)

    # -- shape plumbing --------------------------------------------------------
    def _op_shape(self, xp, a, x):
        return np.asarray(x.shape, np.int64)  # always a host constant

    def _op_constant(self, xp, a):
        if "value" in a:
            return np.asarray(a["value"])
        for k in ("value_float", "value_int"):
            if k in a:
                return np.asarray(a[k])
        raise NotImplementedError("Constant without tensor value")

    def _op_constantofshape(self, xp, a, shape):
        val = a.get("value")
        fill = np.asarray(val).reshape(-1)[0] if val is not None else np.float32(0)
        return np.full(tuple(int(s) for s in np.asarray(shape)), fill)

    def _op_range(self, xp, a, start, limit, delta):
        return np.arange(int(start), int(limit), int(delta), np.int64)

    def _op_reshape(self, xp, a, x, shape):
        target = [int(s) for s in np.asarray(shape).reshape(-1)]
        out: List[int] = []
        for i, s in enumerate(target):
            out.append(int(x.shape[i]) if s == 0 else s)
        return xp.reshape(x, out)

    def _op_flatten(self, xp, a, x):
        axis = int(a.get("axis", 1))
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        return xp.reshape(x, (lead, -1))

    def _op_transpose(self, xp, a, x):
        perm = a.get("perm")
        if perm is None:
            perm = list(range(x.ndim))[::-1]
        return xp.transpose(x, tuple(int(p) for p in perm))

    def _op_concat(self, xp, a, *xs):
        return xp.concatenate(xs, axis=int(a["axis"]))

    def _op_gather(self, xp, a, x, idx):
        axis = int(a.get("axis", 0))
        return xp.take(x, np.asarray(idx) if _is_host(idx) else idx, axis=axis)

    def _op_unsqueeze(self, xp, a, x, axes=None):
        axes = a.get("axes", axes)
        axes = sorted(int(v) for v in np.asarray(axes).reshape(-1))
        for ax in axes:
            x = xp.expand_dims(x, ax if ax >= 0 else ax + x.ndim + 1)
        return x

    def _op_squeeze(self, xp, a, x, axes=None):
        axes = a.get("axes", axes)
        if axes is None:
            return xp.squeeze(x)
        axes = tuple(int(v) % x.ndim for v in np.asarray(axes).reshape(-1))
        return xp.squeeze(x, axis=axes)

    def _op_slice(self, xp, a, x, starts=None, ends=None, axes=None, steps=None):
        starts = a.get("starts", starts)
        ends = a.get("ends", ends)
        axes = a.get("axes", axes)
        steps = a.get("steps", steps)
        starts = [int(v) for v in np.asarray(starts).reshape(-1)]
        ends = [int(v) for v in np.asarray(ends).reshape(-1)]
        axes = (
            list(range(len(starts)))
            if axes is None
            else [int(v) % x.ndim for v in np.asarray(axes).reshape(-1)]
        )
        steps = (
            [1] * len(starts)
            if steps is None
            else [int(v) for v in np.asarray(steps).reshape(-1)]
        )
        sl = [slice(None)] * x.ndim
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            lim = int(x.shape[ax])
            en = max(min(en, lim), -lim - 1)
            sl[ax] = slice(st, en, sp)
        return x[tuple(sl)]

    def _op_pad(self, xp, a, x, pads=None, value=None, axes=None):
        """Pad: opset<11 attribute form and opset>=11 input form. ONNX pads
        are [begin_0..begin_{r-1}, end_0..end_{r-1}] over the padded axes
        (all axes when `axes` is absent)."""
        mode = a.get("mode", b"constant")
        mode = mode.decode() if isinstance(mode, bytes) else str(mode)
        pads = a.get("pads", pads)
        pads = [int(v) for v in np.asarray(pads).reshape(-1)]
        if value is None:
            value = float(a.get("value", 0.0))
        else:
            value = float(np.asarray(value).reshape(()))
        if axes is None:
            idx = list(range(x.ndim))
        else:
            idx = [int(v) % x.ndim for v in np.asarray(axes).reshape(-1)]
        n = len(idx)
        width = [(0, 0)] * x.ndim
        for k, ax in enumerate(idx):
            width[ax] = (pads[k], pads[n + k])
        if mode == "constant":
            return xp.pad(x, width, constant_values=value)
        jmode = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}.get(mode)
        if jmode is None:
            raise NotImplementedError(f"Pad mode {mode!r}")
        return xp.pad(x, width, mode=jmode)

    def _op_split(self, xp, a, x, split=None):
        axis = int(a.get("axis", 0))
        split = a.get("split", split)
        if split is None:
            raise NotImplementedError("Split without explicit sizes")
        sizes = [int(v) for v in np.asarray(split).reshape(-1)]
        idx = np.cumsum(sizes)[:-1]
        return tuple(xp.split(x, idx, axis=axis))

    def _op_expand(self, xp, a, x, shape):
        target = [int(s) for s in np.asarray(shape).reshape(-1)]
        # ONNX Expand: bidirectional broadcast; dims of 1 in target keep x's
        out_shape = list(np.broadcast_shapes(tuple(x.shape), tuple(target)))
        return xp.broadcast_to(x, out_shape)

    def _op_tile(self, xp, a, x, reps):
        return xp.tile(x, tuple(int(r) for r in np.asarray(reps).reshape(-1)))

    # -- linear algebra --------------------------------------------------------
    def _op_matmul(self, xp, a, x, y):
        return jnp.matmul(x, y)

    def _op_gemm(self, xp, a, x, w, b=None):
        alpha = a.get("alpha", 1.0)
        beta = a.get("beta", 1.0)
        if a.get("transA", 0):
            x = x.T
        if a.get("transB", 0):
            w = w.T
        out = alpha * jnp.matmul(x, w)
        if b is not None:
            out = out + beta * b
        return out

    # -- NN ops ------------------------------------------------------------
    def _op_conv(self, xp, a, x, w, b=None):
        spatial = x.ndim - 2
        strides = _pair(a.get("strides"), 1, spatial)
        dilations = _pair(a.get("dilations"), 1, spatial)
        groups = int(a.get("group", 1))
        if a.get("auto_pad", "NOTSET") not in ("NOTSET", ""):
            k = w.shape[2:]
            pads = []
            for i in range(spatial):
                eff = (k[i] - 1) * dilations[i] + 1
                out = math.ceil(x.shape[2 + i] / strides[i])
                total = max(0, (out - 1) * strides[i] + eff - x.shape[2 + i])
                if a["auto_pad"] == "SAME_UPPER":
                    pads.append((total // 2, total - total // 2))
                else:
                    pads.append((total - total // 2, total // 2))
        else:
            pads = _conv_padding(a.get("pads"), spatial)
        dn = ("NCHW", "OIHW", "NCHW") if spatial == 2 else None
        out = jax.lax.conv_general_dilated(
            x, w, strides, pads,
            rhs_dilation=dilations,
            dimension_numbers=dn,
            feature_group_count=groups,
        )
        if b is not None:
            out = out + b.reshape((1, -1) + (1,) * spatial)
        return out

    def _op_convtranspose(self, xp, a, x, w, b=None):
        spatial = x.ndim - 2
        strides = _pair(a.get("strides"), 1, spatial)
        dilations = _pair(a.get("dilations"), 1, spatial)
        groups = int(a.get("group", 1))
        if groups != 1:
            raise NotImplementedError("grouped ConvTranspose")
        pads = _conv_padding(a.get("pads"), spatial)
        out_pad = _pair(a.get("output_padding"), 0, spatial)
        # ONNX ConvTranspose == gradient of Conv: lhs-dilated conv with the
        # kernel spatially flipped and I/O channel axes swapped.
        k = w.shape[2:]
        w_flipped = jnp.flip(w, axis=tuple(range(2, w.ndim)))
        w_t = jnp.swapaxes(w_flipped, 0, 1)  # (I, O, ...) -> (O, I, ...)
        conv_pads = []
        for i in range(spatial):
            eff = (k[i] - 1) * dilations[i] + 1
            conv_pads.append(
                (eff - 1 - pads[i][0], eff - 1 - pads[i][1] + out_pad[i])
            )
        dn = ("NCHW", "OIHW", "NCHW") if spatial == 2 else None
        out = jax.lax.conv_general_dilated(
            x, w_t, (1,) * spatial, conv_pads,
            lhs_dilation=strides,
            rhs_dilation=dilations,
            dimension_numbers=dn,
        )
        if b is not None:
            out = out + b.reshape((1, -1) + (1,) * spatial)
        return out

    def _op_instancenormalization(self, xp, a, x, scale, bias):
        eps = a.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return (x - mu) * jax.lax.rsqrt(var + eps) * scale.reshape(
            shape
        ) + bias.reshape(shape)

    def _op_batchnormalization(self, xp, a, x, scale, bias, mean, var):
        eps = a.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
        return (x - mean.reshape(shape)) * (inv * scale).reshape(shape) + bias.reshape(shape)

    def _pool(self, xp, a, x, init, op, avg: bool):
        spatial = x.ndim - 2
        k = tuple(int(v) for v in a["kernel_shape"])
        strides = _pair(a.get("strides"), 1, spatial)
        pads = _conv_padding(a.get("pads"), spatial)
        if a.get("ceil_mode", 0):
            new_pads = []
            for i in range(spatial):
                size = x.shape[2 + i] + pads[i][0] + pads[i][1]
                out = math.ceil((size - k[i]) / strides[i]) + 1
                need = (out - 1) * strides[i] + k[i] - size
                new_pads.append((pads[i][0], pads[i][1] + max(0, need)))
            pads = new_pads
        window = (1, 1) + k
        ws = (1, 1) + strides
        pad_cfg = [(0, 0), (0, 0)] + pads
        out = jax.lax.reduce_window(x, init, op, window, ws, pad_cfg)
        if avg:
            if a.get("count_include_pad", 0):
                out = out / float(np.prod(k))
            else:
                ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
                counts = jax.lax.reduce_window(
                    ones, 0.0, jax.lax.add, window, ws, pad_cfg
                )
                out = out / counts
        return out

    def _op_maxpool(self, xp, a, x):
        return self._pool(xp, a, x, -jnp.inf, jax.lax.max, avg=False)

    def _op_averagepool(self, xp, a, x):
        return self._pool(xp, a, x, 0.0, jax.lax.add, avg=True)

    def _op_globalaveragepool(self, xp, a, x):
        return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    def _op_upsample(self, xp, a, x, scales=None):
        scales = a.get("scales", scales)
        return self._resize_common(
            x, np.asarray(scales, np.float64).reshape(-1), None,
            a.get("mode", "nearest"), "asymmetric",
        )

    def _op_resize(self, xp, a, x, roi=None, scales=None, sizes=None):
        sc = None
        if scales is not None and np.asarray(scales).size:
            sc = np.asarray(scales, np.float64).reshape(-1)
        sz = None
        if sizes is not None and np.asarray(sizes).size:
            sz = [int(v) for v in np.asarray(sizes).reshape(-1)]
        mode = a.get("mode", "nearest")
        coord = a.get("coordinate_transformation_mode", "half_pixel")
        return self._resize_common(x, sc, sz, mode, coord)

    def _resize_common(self, x, scales, sizes, mode, coord):
        if sizes is None:
            sizes = [int(math.floor(s * d)) for s, d in zip(scales, x.shape)]
        if list(sizes[:2]) != list(x.shape[:2]):
            raise NotImplementedError("Resize on batch/channel dims")
        in_sp = x.shape[2:]
        out_sp = sizes[2:]
        if "nearest" in mode:
            # index maps per spatial dim (host-computed, static shapes)
            idxs = []
            for i, (oi, ii) in enumerate(zip(out_sp, in_sp)):
                ratio = ii / oi
                if coord == "asymmetric":
                    src = np.floor(np.arange(oi) * ratio)
                else:  # half_pixel, round_prefer_floor ~ floor(+0.5 shift)
                    src = np.floor((np.arange(oi) + 0.5) * ratio)
                idxs.append(np.clip(src, 0, ii - 1).astype(np.int32))
            out = x
            for d, idx in enumerate(idxs):
                out = jnp.take(out, idx, axis=2 + d)
            return out
        # linear: jax.image.resize implements the half_pixel convention
        return jax.image.resize(
            x, tuple(x.shape[:2]) + tuple(out_sp), method="bilinear"
        )
