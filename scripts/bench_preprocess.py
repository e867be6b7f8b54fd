"""Measure host PIL preprocessing vs the --device-preprocess split.

Host pipeline (reference-parity): decode JPEG -> RandomResizedCrop(224) ->
normalize, all on CPU workers.
Device path: decode -> shortest-resize/center-crop to raw uint8 on CPU;
RandomResizedCrop + normalize on-device fused (ops/preprocess.py).

Prints imgs/s for each host stage and the on-device preprocess time.
"""

import io
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)

    # realistic-ish source: 480x640 JPEGs held in memory
    blobs = []
    for _ in range(64):
        arr = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        blobs.append(buf.getvalue())

    from refining_clip_via_dinov2_representations_tpu.transform import (
        image_transform,
        raw_uint8_transform,
    )

    host_t = image_transform(224, is_train=True)
    raw_t = raw_uint8_transform(256)

    def run(transform, tag):
        def work(i):
            img = Image.open(io.BytesIO(blobs[i % len(blobs)]))
            return transform(img)

        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(work, range(32)))  # warm
            t0 = time.perf_counter()
            out = list(pool.map(work, range(n)))
            dt = time.perf_counter() - t0
        print(f"{tag}: {n/dt:.1f} imgs/s host ({workers} workers)")
        return out

    run(host_t, "host full pipeline (decode+RRC+normalize)")
    raws = run(raw_t, "host raw path (decode+resize->uint8)  ")

    # device side of the raw path
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    from refining_clip_via_dinov2_representations_tpu.ops.preprocess import (
        preprocess_train_batch,
    )

    batch = jnp.asarray(np.stack(raws[:96]))
    key = jax.random.PRNGKey(0)
    fn = jax.jit(lambda k, b: preprocess_train_batch(k, b, (224, 224)))
    out = fn(key, batch)
    float(out.sum())  # sync (block_until_ready unreliable on axon)
    t0 = time.perf_counter()
    for i in range(20):
        out = fn(jax.random.fold_in(key, i), batch)
    float(out.sum())
    dt = (time.perf_counter() - t0) / 20
    print(
        f"device preprocess (96 uint8@256 -> 224 crops, {jax.default_backend()}): "
        f"{dt*1e3:.2f} ms/batch = {96/dt:.0f} imgs/s/chip"
    )


if __name__ == "__main__":
    main()
