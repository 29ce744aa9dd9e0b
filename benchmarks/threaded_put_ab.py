"""Sequential vs threaded puts, same process, interleaved — does issuing
h2d transfers from ThreadPoolExecutor workers serialize/degrade the
relay's put path? (Suspect for the 'degraded h2d mode': the engine's
UploadThreads pool is the main structural difference between the slow
measured pass uploads and fast single-threaded micro puts.)

Usage: python benchmarks/threaded_put_ab.py
"""
from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    x = jnp.ones((256, 256), jnp.bfloat16)
    (x @ x).block_until_ready()

    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=(4096, 128)).astype(np.float32)
              .astype(ml_dtypes.bfloat16) for _ in range(8)]
    chunks_f32 = [rng.normal(size=(4096, 128)).astype(np.float32)
                  for _ in range(8)]

    def seq(cs, conv=False):
        t0 = time.perf_counter()
        devs = [jnp.asarray(c, dtype=jnp.bfloat16) if conv
                else jnp.asarray(c) for c in cs]
        jax.block_until_ready(devs)
        return (time.perf_counter() - t0) * 1e3

    pools = {n: ThreadPoolExecutor(max_workers=n) for n in (2, 4)}

    def thr(cs, n, conv=False):
        t0 = time.perf_counter()
        futs = [pools[n].submit(
            (lambda c: jnp.asarray(c, dtype=jnp.bfloat16)) if conv
            else jnp.asarray, c) for c in cs]
        devs = [f.result() for f in futs]
        jax.block_until_ready(devs)
        return (time.perf_counter() - t0) * 1e3

    # interleave so relay weather can't masquerade as a mode difference
    for rep in range(3):
        s = seq(chunks)
        t2 = thr(chunks, 2)
        t4 = thr(chunks, 4)
        sc = seq(chunks_f32, conv=True)
        t4c = thr(chunks_f32, 4, conv=True)
        print(f"rep {rep}: seq-bf16 {s:7.1f} ms | thr2 {t2:7.1f} | "
              f"thr4 {t4:7.1f} | seq-f32conv {sc:7.1f} | "
              f"thr4-f32conv {t4c:7.1f}", flush=True)


if __name__ == "__main__":
    main()
