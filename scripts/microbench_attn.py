"""Microbenchmark: attention cost model at hallo's level-0 spatial shape.

Per-call dispatch via the axon tunnel is ~3-4 ms, so every op is looped
N times INSIDE one jitted lax.fori_loop (with a data dependency between
iterations so XLA can't hoist it) and we report device time / N.

Run ONLY on the TPU: python scripts/microbench_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from hallo_tpu.ops.pallas_flash import flash_attention  # noqa: E402


def timeit_looped(fn, args, iters=20):
    """fn(*args) -> array. Loops fn inside one jit; each iteration's first
    arg is nudged by the previous output's mean so nothing is hoisted."""

    @jax.jit
    def run(*a):
        def body(i, carry):
            x, rest = carry[0], carry[1:]
            out = fn(x, *rest)
            bump = jnp.mean(out).astype(x.dtype) * 1e-12
            return (x + bump, *rest)

        return jax.lax.fori_loop(0, iters, body, a)[0]

    out = run(*args)  # compile + warm
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    print("\n== raw matmul cost model (bf16, fori-looped x20) ==")
    cases = [
        ("S   (4096,40)x(40,8192)", (4096, 40), (40, 8192)),
        ("S128(4096,128)x(128,8192)", (4096, 128), (128, 8192)),
        ("PV  (4096,8192)x(8192,40)", (4096, 8192), (8192, 40)),
        ("PV128(4096,8192)x(8192,128)", (4096, 8192), (8192, 128)),
        ("PVT (40,8192)x(8192,4096)", (40, 8192), (8192, 4096)),
        ("ctl (4096,320)x(320,320)", (4096, 320), (320, 320)),
        ("big (4096,2048)x(2048,4096)", (4096, 2048), (2048, 4096)),
    ]
    for name, sa, sb in cases:
        a = jax.random.normal(key, sa, dt)
        b = jax.random.normal(key, sb, dt)
        t = timeit_looped(lambda a, b: a @ b, (a, b))
        flops = 2 * sa[0] * sa[1] * sb[1]
        print(f"{name}: {t*1e6:8.1f} us  {flops/t/1e12:6.2f} TF/s")

    print("\n== batched matmul (B=16, fori-looped x10) ==")
    for name, sa, sb in cases[:5]:
        a = jax.random.normal(key, (16,) + sa, dt)
        b = jax.random.normal(key, (16,) + sb, dt)
        t = timeit_looped(
            lambda a, b: jnp.einsum("bmk,bkn->bmn", a, b), (a, b), iters=10
        )
        flops = 2 * 16 * sa[0] * sa[1] * sb[1]
        print(f"{name}: {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TF/s")

    print("\n== attention @ B16 H8 Lq4096 Lk8192 d40 (bf16, x5) ==")
    b, h, lq, lk, d = 16, 8, 4096, 8192, 40
    q = jax.random.normal(key, (b, h, lq, d), dt)
    k = jax.random.normal(key, (b, h, lk, d), dt)
    v = jax.random.normal(key, (b, h, lk, d), dt)
    fl = 4 * b * h * lq * lk * d

    t = timeit_looped(lambda q, k, v: flash_attention(q, k, v), (q, k, v), iters=5)
    print(f"pallas flash      : {t*1e3:8.2f} ms  useful {fl/t/1e12:5.2f} TF/s")

    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * (d**-0.5), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    t = timeit_looped(xla_attn, (q, k, v), iters=5)
    print(f"xla unfused       : {t*1e3:8.2f} ms  useful {fl/t/1e12:5.2f} TF/s")

    q2 = jax.random.normal(key, (b, h, lq, 128), dt)
    k2 = jax.random.normal(key, (b, h, lk, 128), dt)
    v2 = jax.random.normal(key, (b, h, lk, 128), dt)
    t = timeit_looped(
        lambda q, k, v: flash_attention(q, k, v), (q2, k2, v2), iters=5
    )
    fl2 = 4 * b * h * lq * lk * 128
    print(f"pallas flash d=128: {t*1e3:8.2f} ms  useful {fl2/t/1e12:5.2f} TF/s")


if __name__ == "__main__":
    main()
