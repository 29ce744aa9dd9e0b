"""Characterize the d2h-poisons-h2d relay mode + test mitigations.

degrade_bisect_engine pinned the trigger: puts run >1 GB/s until the
process's first ARRAY d2h fetch (np.asarray of a device array), after
which every put runs ~36 MB/s. (r4 attributed this to 'any kernel' —
its micro fetched the kernel's result, which was the actual trigger.)

Because ONE poisoning fetch contaminates every later measurement in a
process, each candidate trigger/mitigation runs in its OWN subprocess:
  warm backend -> put probe (clean) -> candidate action -> put probe.

Candidates:
  scalar   — float(x.sum()) scalar fetch
  tiny     — np.asarray of a [1,1] slice
  small    — np.asarray of 16x128 (8 KB)
  big      — np.asarray of 32768x128 bf16 (8 MB)
  devget   — jax.device_get of 16x128
  async    — copy_to_host_async() then np.asarray
  idle     — big fetch, then 60 s idle, then probe (does it heal?)
  reinit   — big fetch, then jax.extend.backend.clear_backends(),
             re-warm, then probe (does a fresh client heal it?)
  viacpu   — device_put the result onto the CPU backend, fetch the
             CPU copy (does routing d2h through the cpu client avoid
             the poison?)
  dlpack   — fetch via __dlpack__ export instead of np.asarray
  defer    — run 5 put+kernel rounds with NO fetch, then fetch all 5
             results at the end; reports per-round put times (the
             offline/throughput serving mode: does deferring keep
             every upload fast?)

Usage: python benchmarks/d2h_poison_micro.py [case ...]
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

CASES = ["scalar", "tiny", "small", "big", "devget", "async", "idle",
         "reinit", "viacpu", "dlpack", "defer"]

CHILD = r"""
import json, sys, time
import numpy as np
case = sys.argv[1]
import jax, jax.numpy as jnp
import ml_dtypes

probe = np.random.default_rng(1).normal(size=(32768, 128)).astype(
    np.float32).astype(ml_dtypes.bfloat16)

def put_ms(reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jnp.asarray(probe).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) * 1e3, 1)

x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
y = (x * 2.0).block_until_ready()
before = put_ms()

extra = {}
if case == "scalar":
    float(y.sum())
elif case == "tiny":
    np.asarray(y[:1, :1])
elif case == "small":
    np.asarray(y)
elif case == "big":
    np.asarray(jnp.asarray(probe))
elif case == "devget":
    jax.device_get(y)
elif case == "async":
    y.copy_to_host_async()
    np.asarray(y)
elif case == "idle":
    np.asarray(y)
    extra["right_after"] = put_ms()
    time.sleep(60)
elif case == "reinit":
    np.asarray(y)
    extra["right_after"] = put_ms()
    t0 = time.perf_counter()
    try:
        import jax.extend.backend as jeb
        jeb.clear_backends()
    except Exception as e:
        extra["clear_error"] = repr(e)
    x2 = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    (x2 * 2.0).block_until_ready()
    extra["reinit_s"] = round(time.perf_counter() - t0, 1)
elif case == "viacpu":
    try:
        cpu = jax.devices("cpu")[0]
        yc = jax.device_put(y, cpu)
        np.asarray(yc)
    except Exception as e:
        extra["viacpu_error"] = repr(e)
elif case == "dlpack":
    try:
        np.from_dlpack(y)
    except Exception as e:
        extra["dlpack_error"] = repr(e)
elif case == "defer":
    results, puts = [], []
    for i in range(5):
        t0 = time.perf_counter()
        q = jnp.asarray(probe).block_until_ready()
        puts.append(round((time.perf_counter() - t0) * 1e3, 1))
        results.append((q.astype(jnp.float32).sum(axis=1)[:16]
                        ).block_until_ready())
    extra["per_round_put_ms"] = puts
    t0 = time.perf_counter()
    for r in results:
        np.asarray(r)
    extra["drain_all_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

after = put_ms()
print(json.dumps({"case": case, "put_before_ms": before,
                  "put_after_ms": after, **extra}))
"""


def main():
    cases = sys.argv[1:] or CASES
    for case in cases:
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", CHILD, case],
                               capture_output=True, text=True, timeout=560)
            line = (p.stdout or "").strip().splitlines()
            out = line[-1] if line else f"rc={p.returncode} " + \
                (p.stderr or "")[-200:]
        except subprocess.TimeoutExpired:
            out = json.dumps({"case": case, "error": "timeout"})
        print(f"{out}   ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
