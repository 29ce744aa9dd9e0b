"""Characterize the d2h-poisons-h2d relay mode + test mitigations.

degrade_bisect_engine pinned the trigger: puts run >1 GB/s until the
process's first ARRAY d2h fetch (np.asarray of a device array), after
which every put runs ~36 MB/s. (r4 attributed this to 'any kernel' —
its micro fetched the kernel's result, which was the actual trigger.)

Questions, in order:
  1. minimal repro: put fast -> fetch a tiny array -> put slow?
  2. does a SCALAR fetch (float(x.sum())) also trigger it?
  3. does fetch size matter (4 B / 4 KB / 4 MB)?
  4. is it reversible — do puts recover after idle, or after any call?
  5. mitigation: copy_to_host_async + np.asarray later?
  6. mitigation: fetch via __dlpack__ or jax.device_get differences?

Usage: python benchmarks/d2h_poison_micro.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    probe = np.random.default_rng(1).normal(size=(32768, 128)).astype(
        np.float32).astype(ml_dtypes.bfloat16)

    def put_ms(reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jnp.asarray(probe).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    def report(tag):
        ms = put_ms()
        print(f"{tag:55s}: put 8MB {ms:7.1f} ms ({8/ms*1e3:6.0f} MB/s)",
              flush=True)

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    y = (x * 2.0).block_until_ready()
    report("baseline (kernel ran, nothing fetched)")

    # 2. scalar fetch
    s = float(y.sum())
    report("after SCALAR fetch (float(sum))")

    # 3a. tiny array fetch (4 B shaped [1])
    _ = np.asarray(y[:1, :1])
    report("after [1,1] array fetch")

    # 3b. 8 KB fetch
    _ = np.asarray(y)
    report("after 16x128 (8KB) array fetch")

    # 4. does it heal with idle time?
    time.sleep(10)
    report("after 10 s idle")
    time.sleep(30)
    report("after 30 s more idle")

    # 5. copy_to_host_async path
    big = jnp.asarray(probe)
    try:
        big.copy_to_host_async()
        _ = np.asarray(big)
        report("after copy_to_host_async + asarray")
    except Exception as e:
        print(f"copy_to_host_async failed: {e}", flush=True)

    # 6. dlpack export (device->host via dlpack not expected to work; try)
    try:
        cap = y.__dlpack__()
        del cap
        report("after __dlpack__ export")
    except Exception as e:
        print(f"dlpack failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
