"""Microbench part 2: peak calibration + flash block-size sweep on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from hallo_tpu.ops.pallas_flash import flash_attention  # noqa: E402


def timeit_looped(fn, args, iters=10):
    @jax.jit
    def run(*a):
        def body(i, carry):
            x, rest = carry[0], carry[1:]
            out = fn(x, *rest)
            bump = jnp.mean(out).astype(x.dtype) * 1e-12
            return (x + bump, *rest)

        return jax.lax.fori_loop(0, iters, body, a)[0]

    out = run(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # --- peak calibration: chained matmul keeping everything in VMEM-ish ---
    print("== peak calibration ==")
    a = jax.random.normal(key, (2048, 2048), dt)
    b = jax.random.normal(key, (2048, 2048), dt)

    def chain(a, b):
        y = a
        for _ in range(8):
            y = jax.lax.dot(y, b, preferred_element_type=jnp.bfloat16)
        return y

    t = timeit_looped(chain, (a, b), iters=10)
    fl = 8 * 2 * 2048**3
    print(f"chained 2048^3 x8: {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")

    # --- flash block-size sweep at level-0 shape ---
    print("\n== flash sweep @ B16 H8 Lq4096 Lk8192 d40 ==")
    bsz, h, lq, lk, d = 16, 8, 4096, 8192, 40
    q = jax.random.normal(key, (bsz, h, lq, d), dt)
    k = jax.random.normal(key, (bsz, h, lk, d), dt)
    v = jax.random.normal(key, (bsz, h, lk, d), dt)
    fl = 4 * bsz * h * lq * lk * d
    for bq, bk in [(512, 512), (1024, 1024), (2048, 1024), (1024, 2048), (2048, 2048), (4096, 2048)]:
        try:
            t = timeit_looped(
                lambda q, k, v: flash_attention(q, k, v, block_q=bq, block_k=bk),
                (q, k, v),
                iters=5,
            )
            print(f"bq={bq:5d} bk={bk:5d}: {t*1e3:8.2f} ms  useful {fl/t/1e12:5.2f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}")

    # d=128 same shape for the pad-ceiling comparison
    q2 = jax.random.normal(key, (bsz, h, lq, 128), dt)
    k2 = jax.random.normal(key, (bsz, h, lk, 128), dt)
    v2 = jax.random.normal(key, (bsz, h, lk, 128), dt)
    fl2 = 4 * bsz * h * lq * lk * 128
    t = timeit_looped(
        lambda q, k, v: flash_attention(q, k, v, block_q=1024, block_k=1024),
        (q2, k2, v2),
        iters=5,
    )
    print(f"d=128 bq/bk=1024 : {t*1e3:8.2f} ms  useful {fl2/t/1e12:5.2f} TF/s")


if __name__ == "__main__":
    main()
