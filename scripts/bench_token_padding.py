"""Microbench (VERDICT r3 #8): does padding the ViT-B/16 vision sequence
from L=197 to a tile-friendly length buy anything on TPU?

The recorded profile attributes the remaining ViT-B/16 step headroom to
matmul-internal padding at L=197 (COMPONENTS.md, MFU entry). The candidate
mitigation is padding tokens to a lane/sublane-friendly length with an
exact additive key mask. This measures the 12-block ViT-B transformer stack
(bs 96, width 768, heads 12, bf16 — the production shape) fwd+grad at
L in {197, 200, 208, 256}, padded variants carrying the mask a real
implementation would need. Run on the real TPU chip:

    python scripts/bench_token_padding.py
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

    B, W, H, LAYERS, L_REAL = 96, 768, 12, 12, 197

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

    def bench(fn, args, n=30, tag=""):
        out = fn(*args)
        out = fn(*args)  # second call: compiled path, warm
        _ = float(jax.tree.leaves(out)[0].sum())  # sync (axon-reliable)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum())
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:<40} {dt * 1e3:8.3f} ms")
        return dt

    results = {}
    for L in (197, 200, 208, 256):
        pad = L - L_REAL
        if pad:
            x = jnp.concatenate(
                [x_real, jnp.zeros((B, pad, W), jnp.bfloat16)], axis=1
            )
            # exact additive key mask: padded keys contribute -inf logits
            mask = jnp.zeros((L, L), jnp.float32).at[:, L_REAL:].set(-1e9)
        else:
            x, mask = x_real, None

        @jax.jit
        def fwd(p, x, m=mask):
            return model.apply({"params": p}, x, mask=m)

        @jax.jit
        def fwdbwd(p, x, m=mask):
            def loss(p):
                out = model.apply({"params": p}, x, mask=m)
                # only real rows feed the loss, like a real padded pipeline
                return jnp.sum(out[:, :L_REAL].astype(jnp.float32) ** 2)

            return jax.value_and_grad(loss)(p)

        f = bench(fwd, (params, x), tag=f"L={L} fwd")
        g = bench(fwdbwd, (params, x), tag=f"L={L} fwd+grad")
        results[L] = (f, g)

    base_f, base_g = results[197]
    print()
    for L, (f, g) in results.items():
        print(
            f"L={L}: fwd {f * 1e3:7.3f} ms ({f / base_f:5.3f}x), "
            f"fwd+grad {g * 1e3:7.3f} ms ({g / base_g:5.3f}x)"
        )


if __name__ == "__main__":
    main()
