"""Microbench (VERDICT r4 #6b): is the text tower's L=77 tiling-hostile —
does padding the context to a lane/sublane-friendly length pay on TPU?

The r4 profile attributes the ViT-B/16 step's remaining headroom to matmul
tiling at ViT-B operand sizes; the text side (L=77, W=512) is the smallest
operand set in the step. Padding the causal text tower beyond the real
tokens is EXACT for every real position (causal masking means position i
only sees j <= i, and the argmax-EOT readout sits inside the real range),
so the only question is whether the tile-aligned shapes run faster than
the 77-row originals despite the extra FLOPs. Measures the production
12-block text stack (bs 96, width 512, heads 8, bf16) fwd and fwd+grad at
L in {77, 80, 96, 128}. Run on the real TPU chip:

    python scripts/bench_text_padding.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from refining_clip_via_dinov2_representations_tpu.models.transformer import (
        ResidualAttentionBlock,
    )

    B, W, H, LAYERS, L_REAL = 96, 512, 8, 12, 77

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, mask=None):
            for i in range(LAYERS):
                x = ResidualAttentionBlock(
                    n_head=H, dtype=jnp.bfloat16, name=f"blk_{i}",
                )(x, mask=mask)
            return x

    model = Stack()
    rng = np.random.default_rng(0)
    x_real = jnp.asarray(rng.normal(size=(B, L_REAL, W)), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x_real)["params"]

    def causal(L):
        # the production text mask (`build_causal_mask`): additive upper -inf
        m = jnp.full((L, L), -1e9, jnp.float32)
        return jnp.triu(m, 1)

    def bench(fn, args, n=30, tag=""):
        out = fn(*args)
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum())  # sync (axon-reliable)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum())
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:<40} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    results = {}
    for L in (77, 80, 96, 128):
        pad = L - L_REAL
        if pad:
            x = jnp.concatenate(
                [x_real, jnp.zeros((B, pad, W), jnp.bfloat16)], axis=1
            )
        else:
            x = x_real
        mask = causal(L)

        @jax.jit
        def fwd(p, x, m=mask):
            return model.apply({"params": p}, x, mask=m)

        @jax.jit
        def fwdbwd(p, x, m=mask):
            def loss(p):
                out = model.apply({"params": p}, x, mask=m)
                # only real rows feed the loss, like the real EOT readout
                return jnp.sum(out[:, :L_REAL].astype(jnp.float32) ** 2)

            return jax.value_and_grad(loss)(p)

        f = bench(fwd, (params, x), tag=f"L={L} fwd")
        g = bench(fwdbwd, (params, x), tag=f"L={L} fwd+grad")
        results[L] = (f, g)

    base_f, base_g = results[L_REAL]
    print()
    for L, (f, g) in results.items():
        print(
            f"L={L}: fwd {f * 1e3:7.3f} ms ({f / base_f:5.3f}x), "
            f"fwd+grad {g * 1e3:7.3f} ms ({g / base_g:5.3f}x)"
        )


if __name__ == "__main__":
    main()
