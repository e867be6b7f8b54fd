"""Microbench: int8 (AQT-style quantized) vs bf16 matmul on the production
ViT-B/16 shapes — is there a v5e int8 speedup worth wiring as a training
option? v5e peak: 394 int8 TOPS vs 197 bf16 TFLOPS (2x), but quant/dequant
overhead and XLA's int8 lowering decide whether any of it is realizable.

Shapes: the ViT-B MLP pair (the step's largest matmuls) and the qkv
projection at bs 96 x L 197.

    python scripts/bench_int8_matmul.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    M = 96 * 197  # tokens in a step
    cases = [
        ("mlp_up   [18912,768]x[768,3072]", (M, 768), (768, 3072)),
        ("mlp_down [18912,3072]x[3072,768]", (M, 3072), (3072, 768)),
        ("qkv      [18912,768]x[768,2304]", (M, 768), (768, 2304)),
    ]

    def bench(fn, args, n=50):
        out = fn(*args)
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / n

    for tag, (m, k), (k2, n_) in cases:
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k2, n_)), jnp.bfloat16)

        @jax.jit
        def mm_bf16(a, b):
            return a @ b

        # static int8 weights + dynamic per-row int8 activation quant —
        # the realizable training-step pattern (weights quantized once per
        # step, activations on the fly)
        bi8 = jnp.asarray(
            np.clip(np.round(rng.normal(size=(k2, n_)) * 30), -127, 127),
            jnp.int8,
        )
        b_scale = jnp.float32(1 / 30)

        @jax.jit
        def mm_int8(a, bi8, b_scale):
            a_scale = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=1,
                              keepdims=True) / 127.0
            ai8 = jnp.clip(
                jnp.round(a.astype(jnp.float32) / a_scale), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                ai8, bi8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * a_scale * b_scale).astype(
                jnp.bfloat16
            )

        # pure int8 dot with no quant overhead: the hardware upper bound
        ai8_pre = jnp.asarray(
            np.clip(np.round(rng.normal(size=(m, k)) * 30), -127, 127),
            jnp.int8,
        )

        @jax.jit
        def mm_int8_raw(ai8, bi8):
            return jax.lax.dot_general(
                ai8, bi8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        t_bf = bench(mm_bf16, (a, b))
        t_i8 = bench(mm_int8, (a, bi8, b_scale))
        t_raw = bench(mm_int8_raw, (ai8_pre, bi8))
        print(
            f"{tag}: bf16 {t_bf*1e3:7.3f} ms | int8+quant {t_i8*1e3:7.3f} ms "
            f"({t_bf/t_i8:4.2f}x) | int8 raw {t_raw*1e3:7.3f} ms "
            f"({t_bf/t_raw:4.2f}x)"
        )


if __name__ == "__main__":
    main()
