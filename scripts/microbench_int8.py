"""Microbenchmark: int8 W8A8 dense vs bf16 at hallo's FF/projection shapes.

The r1 cost model (CLAUDE.md): bf16 MXU passes are 128-deep, int8 passes are
256-deep -> int8 halves ceil(K/128) whenever K >= 256. The FF + qkv/out
projection pool is 219 ms of the 498 ms denoiser step; this measures how much
of it W8A8 dynamic per-row quantization actually recovers, including the
quantize/dequant elementwise overhead.

Run ONLY on the TPU (nothing else using the chip):
    python scripts/microbench_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timeit_looped(fn, args, iters=30):
    @jax.jit
    def run(*a):
        def body(i, carry):
            x, rest = carry[0], carry[1:]
            out = fn(x + i * jnp.asarray(1e-30, x.dtype), *rest)
            bump = jnp.mean(out).astype(x.dtype) * 1e-12
            return (x + bump, *rest)

        return jax.lax.fori_loop(0, iters, body, a)[0]

    out = run(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def bf16_dense(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def w8a8_dense(x, w_q, w_scale):
    """Dynamic per-row activation quant + per-channel weight scales."""
    a_max = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    a_scale = jnp.maximum(a_max, 1e-8) / 127.0
    x_q = jnp.round(x.astype(jnp.float32) / a_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * a_scale * w_scale[None, :]).astype(x.dtype)


def w8_only_dense(x, w_q, w_scale):
    """Weight-only int8: dequantize W to bf16 then matmul (no MXU rate win,
    halves weight HBM traffic -- control case)."""
    w = (w_q.astype(jnp.float32) * w_scale[None, :]).astype(x.dtype)
    return bf16_dense(x, w)


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    # (label, M, K, N): level-0 FF1/FF2, fused qkv, out-proj; level-1/2 FF
    cases = [
        ("L0 ff1  (131072,320,2560)", 131072, 320, 2560),
        ("L0 ff2  (131072,1280,320)", 131072, 1280, 320),
        ("L0 qkv  (131072,320,960)", 131072, 320, 960),
        ("L0 out  (131072,320,320)", 131072, 320, 320),
        ("L1 ff1  (32768,640,5120)", 32768, 640, 5120),
        ("L2 ff1  (8192,1280,10240)", 8192, 1280, 10240),
    ]
    for label, m, k, n in cases:
        kx, kw = jax.random.split(jax.random.fold_in(key, m * n))
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        w = jax.random.normal(kw, (k, n), jnp.bfloat16) / (k ** 0.5)
        w_scale = (jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0)
        w_q = jnp.round(w.astype(jnp.float32) / w_scale[None, :]).astype(jnp.int8)

        t_bf = timeit_looped(bf16_dense, (x, w))
        t_q = timeit_looped(w8a8_dense, (x, w_q, w_scale))
        t_w8 = timeit_looped(w8_only_dense, (x, w_q, w_scale))
        flops = 2 * m * k * n
        print(
            f"{label}: bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s)"
            f" | w8a8 {t_q*1e3:7.3f} ms ({flops/t_q/1e12:6.1f} TF/s)"
            f" | w8-only {t_w8*1e3:7.3f} ms"
            f" | w8a8 speedup {t_bf/t_q:4.2f}x"
        )

        # numeric sanity: relative error of the quantized path
        ref = bf16_dense(x, w).astype(jnp.float32)
        got = w8a8_dense(x, w_q, w_scale).astype(jnp.float32)
        rel = float(jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-9))
        print(f"    w8a8 rel-l2 error vs bf16: {rel:.4f}")


if __name__ == "__main__":
    main()
