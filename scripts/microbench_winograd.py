"""Microbenchmark: Winograd F(2,3) pallas kernel vs XLA direct 3x3 conv.

Production conv shapes of the denoiser (512^2 workload -> 64^2/32^2 latent
feature maps, B = 2 CFG x 16 frames). Run ONLY on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from hallo_tpu.ops.pallas_winograd import conv3x3_direct, winograd_conv3x3


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


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    cases = [
        ("L0 res (32,64,64,320)->320", (32, 64, 64, 320), 320),
        ("L0 up  (32,64,64,640)->320", (32, 64, 64, 640), 320),
        ("L0 cat (32,64,64,960)->320", (32, 64, 64, 960), 320),
        ("L1 res (32,32,32,640)->640", (32, 32, 32, 640), 640),
        ("L1 up  (32,32,32,1280)->640", (32, 32, 32, 1280), 640),
    ]
    for label, xs, co in cases:
        kx, kw = jax.random.split(jax.random.fold_in(key, sum(xs)))
        x = jax.random.normal(kx, xs, jnp.bfloat16)
        k = (jax.random.normal(kw, (3, 3, xs[-1], co), jnp.float32) / 30).astype(
            jnp.bfloat16
        )
        bias = jnp.zeros((co,), jnp.float32)
        try:
            t_w = timeit_looped(lambda a, b_, c_: winograd_conv3x3(a, b_, c_), (x, k, bias))
        except Exception as e:
            print(f"{label}: winograd FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        t_d = timeit_looped(conv3x3_direct, (x, k, bias))
        flops = 2 * xs[0] * xs[1] * xs[2] * 9 * xs[3] * co
        ref = conv3x3_direct(x, k, bias).astype(jnp.float32)
        got = winograd_conv3x3(x, k, bias).astype(jnp.float32)
        rel = float(
            jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-9)
        )
        print(
            f"{label}: direct {t_d*1e3:7.3f} ms ({flops/t_d/1e12:6.1f} TF/s)"
            f" | winograd {t_w*1e3:7.3f} ms (eff {flops/t_w/1e12:6.1f} TF/s)"
            f" | speedup {t_d/t_w:4.2f}x | rel-l2 {rel:.2e}"
        )


if __name__ == "__main__":
    main()
