"""Microbench: fused VMEM-resident attention vs XLA attention on TPU.

Flagship shapes: vision [96,12,197,64], text [96,8,77,64] (causal), bf16.
Measures fwd and fwd+bwd; ends timing with a value fetch (axon
block_until_ready is unreliable).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from refining_clip_via_dinov2_representations_tpu.ops.attention import (
        dot_product_attention_xla,
    )
    from refining_clip_via_dinov2_representations_tpu.ops.fused_attention import (
        fused_attention,
    )

    def bench(fn, args, n=30, tag=""):
        out = fn(*args)
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum())
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum())
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:<44} {dt*1e3:8.3f} ms")
        return dt

    rng = np.random.default_rng(0)
    cases = [
        (96, 12, 197, 64, False, "vision 96x12x197x64"),
        (96, 8, 77, 64, True, "text   96x8x77x64 causal"),
        # BASELINE config 5 / VERDICT r2 Weak #4: EVA-g & ViT-H at 224/14 sit
        # at L=257, between the measured L=197 and the flash dispatch
        # threshold (512) — measure instead of assuming
        (32, 16, 257, 88, False, "eva-g  32x16x257x88"),
        (96, 12, 257, 64, False, "vision 96x12x257x64 (L-isolated)"),
    ]
    if os.environ.get("ATTN_CASE"):
        b_, h_, l_, d_ = (int(x) for x in os.environ["ATTN_CASE"].split("x"))
        cases = [(b_, h_, l_, d_, False, f"custom {os.environ['ATTN_CASE']}")]
    for (b, h, l, d, causal, name) in cases:
        q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
        scale = d ** -0.5
        mask = (
            jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1) if causal else None
        )

        xla_f = jax.jit(lambda q, k, v: dot_product_attention_xla(q, k, v, mask=mask))
        fus_f = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale, causal))
        bench(xla_f, (q, k, v), tag=f"{name} fwd xla")
        bench(fus_f, (q, k, v), tag=f"{name} fwd fused")

        def mk_loss(att):
            def loss(q, k, v):
                return jnp.sum(att(q, k, v).astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        xla_g = mk_loss(lambda q, k, v: dot_product_attention_xla(q, k, v, mask=mask))
        fus_g = mk_loss(lambda q, k, v: fused_attention(q, k, v, scale, causal))
        bench(xla_g, (q, k, v), tag=f"{name} grad xla")
        bench(fus_g, (q, k, v), tag=f"{name} grad fused")

        # numerics spot check on-device
        a = np.asarray(xla_f(q, k, v), np.float32)
        bt = np.asarray(fus_f(q, k, v), np.float32)
        print(f"{name} max|xla-fused| = {np.abs(a-bt).max():.4f}")


if __name__ == "__main__":
    main()
