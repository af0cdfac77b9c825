"""One-shot Winograd probe at a shape given on argv; prints OK or dies.

Usage: python scripts/wino_probe.py B H W C CO
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from hallo_tpu.ops.pallas_winograd import conv3x3_direct, winograd_conv3x3

b, h, w, c, co = map(int, sys.argv[1:6])
key = jax.random.PRNGKey(0)
kx, kw = jax.random.split(key)
x = jax.random.normal(kx, (b, h, w, c), jnp.bfloat16)
k = (jax.random.normal(kw, (3, 3, c, co), jnp.float32) / 30).astype(jnp.bfloat16)
got = winograd_conv3x3(x, k, None)
ref = conv3x3_direct(x, k, None)
rel = float(
    jnp.linalg.norm(got.astype(jnp.float32) - ref.astype(jnp.float32))
    / (jnp.linalg.norm(ref.astype(jnp.float32)) + 1e-9)
)
print(f"OK ({b},{h},{w},{c})->{co} rel-l2 {rel:.2e}", flush=True)
