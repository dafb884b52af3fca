#!/usr/bin/env python
"""Time the hash-candidate kernel on chip, whole and in parts.

Usage: PYTHONPATH=. python tools/probe_hash.py [parts]  (run from the
repo root with the TPU plugin active)

LZ4NET_HASH_PROBE selects a stripped kernel variant so the per-phase
cost of the chunk loop is measurable on silicon:
  full (default) | noupdate | noprobe | noap | notpose | empty
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lz4net_tpu.ops.decode_vector import CH, _cdiv
    from lz4net_tpu.ops.encode_vector import _u32
    from lz4net_tpu.ops import hash_kernel as hk
    from lz4net_tpu.utils import corpus

    B, size = 16, 65536
    D = _cdiv(size + 1, CH) * CH
    data = corpus.silesia_like(B * size, seed=42)
    x = np.zeros((B, D), np.int32)
    for i in range(B):
        x[i, :size] = np.frombuffer(data[i * size:(i + 1) * size],
                                    np.uint8)
    xj = jax.device_put(jnp.asarray(x))

    @jax.jit
    def prep(xj):
        wa = _u32(xj)
        wb = jnp.concatenate([wa[:, 4:], jnp.zeros_like(wa[:, :4])],
                             axis=1)
        return wa, wb, hk.hash_bucket(wa), hk.hash_bucket8(wa, wb)

    wa, wb, h4, h8 = (jax.device_put(v) for v in prep(xj))

    variants = sys.argv[1:] or ["full"]
    for var in variants:
        os.environ["LZ4NET_HASH_PROBE"] = "" if var == "full" else var
        fn = jax.jit(lambda a, b, c, d: hk._bucket_prev_pallas(
            a, b, c, d, D)[:, :1])
        r = np.asarray(jax.jit(lambda a, b, c, d: hk._bucket_prev_pallas(
            a, b, c, d, D))(wa, wb, h4, h8))    # compile + run
        fn(wa, wb, h4, h8)

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(wa, wb, h4, h8)
            np.asarray(out)                      # tiny fetch syncs
            return time.perf_counter() - t0

        run(1)
        dt = (run(12) - run(2)) / 10             # dispatch-differenced
        mb = B * size / 1e6
        print(f"{var:10s} {dt * 1e3:8.2f} ms  {mb / dt / 1e3:.4f} GB/s"
              f"  (nonzero prev: {(r >= 0).mean():.3f})", flush=True)


if __name__ == "__main__":
    sys.exit(main())
