"""On-chip correctness + timing for the pallas kernels at the real
denoiser shapes (flash spatial level-0, temporal motion level-0).

Usage: python scripts/microbench_kernels.py [--loops 8]
Run ALONE on the chip (no concurrent bench/profile; CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from hallo_tpu.ops import pallas_flash as pf
    from hallo_tpu.ops import pallas_temporal as pt
    from hallo_tpu.ops.attention import _xla_attention

    def log(m):
        print(m, file=sys.stderr, flush=True)

    def timeit(fn, *xs):
        @jax.jit
        def loop(*xs):
            def body(i, acc):
                # loop-dependent perturbation of the first operand: without
                # it the body is loop-invariant and XLA hoists the kernel
                # out, timing ONE call amortized over `loops`.
                q = xs[0] + (i * jnp.float32(1e-30)).astype(xs[0].dtype)
                return acc + jnp.sum(fn(q, *xs[1:]).astype(jnp.float32))
            return jax.lax.fori_loop(0, args.loops, body, jnp.zeros((), jnp.float32))

        float(loop(*xs))  # compile+warm
        t0 = time.perf_counter()
        float(loop(*xs))
        return (time.perf_counter() - t0) / args.loops * 1e3

    rng = np.random.default_rng(0)

    # --- flash transposed-PV at level-0 cond shape: B16 H8 L4096 KV8192 d40
    b, h, lq, lk, d = 16, 8, 4096, 8192, 40
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.bfloat16)
    got = pf.flash_attention(q[:1], k[:1], v[:1], scale=d**-0.5)
    want = _xla_attention(q[:1], k[:1], v[:1], None, d**-0.5)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    log(f"flash_t correctness max|diff| = {err:.4f}")
    assert err < 0.05, err
    ms = timeit(lambda q, k, v: pf.flash_attention(q, k, v, scale=d**-0.5), q, k, v)
    log(f"flash_t level-0 cond ({b},{h},{lq},{lk},d{d}): {ms:.2f} ms")

    got8 = pf.flash_attention(q[:1], k[:1], v[:1], scale=d**-0.5, quant="int8")
    rel = float(
        jnp.linalg.norm((got8 - want).astype(jnp.float32))
        / jnp.linalg.norm(want.astype(jnp.float32))
    )
    log(f"flash_t int8 rel_err = {rel:.5f}")
    assert rel < 0.02, rel
    ms = timeit(
        lambda q, k, v: pf.flash_attention(q, k, v, scale=d**-0.5, quant="int8"),
        q, k, v,
    )
    log(f"flash_t int8 level-0 cond: {ms:.2f} ms")

    # --- packed all-heads kernel, same level-0 cond workload on natural
    # (B, L, C) tensors
    qp = q.swapaxes(1, 2).reshape(b, lq, h * d)
    kp = k.swapaxes(1, 2).reshape(b, lk, h * d)
    vp = v.swapaxes(1, 2).reshape(b, lk, h * d)
    gotp = pf.flash_attention_packed(qp[:1], kp[:1], vp[:1], heads=h, scale=d**-0.5)
    wantp = pf._xla_reference_packed(qp[:1], kp[:1], vp[:1], None, h, d**-0.5)
    errp = float(jnp.max(jnp.abs(gotp.astype(jnp.float32) - wantp.astype(jnp.float32))))
    log(f"flash_packed correctness max|diff| = {errp:.4f}")
    assert errp < 0.05, errp
    ms = timeit(
        lambda q_, k_, v_: pf.flash_attention_packed(q_, k_, v_, heads=h, scale=d**-0.5),
        qp, kp, vp,
    )
    log(f"flash_packed level-0 cond (B{b}, L{lq}, KV{lk}, C{h*d}): {ms:.2f} ms")

    # --- temporal kernel at motion level-0: B2 F18 L4096 C320 (h8 d40)
    bt, f, l, c, heads = 2, 18, 4096, 320, 8
    qt = jnp.asarray(rng.normal(size=(bt, f, c, l)), jnp.bfloat16)
    kt = jnp.asarray(rng.normal(size=(bt, f, c, l)), jnp.bfloat16)
    vt = jnp.asarray(rng.normal(size=(bt, f, c, l)), jnp.bfloat16)
    got = pt.temporal_attention(qt[:1, ..., :512], kt[:1, ..., :512], vt[:1, ..., :512], heads=heads)
    want = pt._xla_reference(
        qt[:1, ..., :512], kt[:1, ..., :512], vt[:1, ..., :512], heads, (c // heads) ** -0.5
    )
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    log(f"temporal correctness max|diff| = {err:.4f}")
    assert err < 0.05, err
    ms = timeit(lambda q, k, v: pt.temporal_attention(q, k, v, heads=heads), qt, kt, vt)
    log(f"temporal level-0 ({bt},{f},{l},{c}): {ms:.2f} ms")


if __name__ == "__main__":
    main()

