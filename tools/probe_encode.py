#!/usr/bin/env python
"""Dispatch-differenced end-to-end device-encode timing (one batch).

Usage: PYTHONPATH=. python tools/probe_encode.py [hc]  (run from the
repo root with the TPU plugin active)
Env: LZ4NET_FUSED / LZ4NET_HASH_IMPL forwarded to the pipeline.
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
    from lz4net_tpu.constants import MINMATCH, maximum_output_length
    from lz4net_tpu.ops.decode_vector import CH, LANE, _cdiv, _use_fused
    from lz4net_tpu.ops.encode_vector import encode_batch_vectorized
    from lz4net_tpu.utils import corpus

    hc = 9 if "hc" in sys.argv[1:] else 0
    for a in sys.argv[1:]:
        if a.startswith("stage="):
            os.environ["LZ4NET_ENC_STAGE"] = a.split("=", 1)[1]
        if a.startswith("hc="):
            hc = int(a.split("=", 1)[1])
    rcap_arg = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                     if a.startswith("rcap=")), None)
    B, size = 16, 65536
    D = _cdiv(size + 1, CH) * CH
    O = _cdiv(maximum_output_length(D) + 1, CH) * CH
    S_cap = _cdiv(D // MINMATCH + 2, LANE) * LANE + LANE
    data = corpus.silesia_like(B * size, seed=42)
    x = np.zeros((B, D), np.int32)
    dl = np.full((B,), size, np.int32)
    for i in range(B):
        x[i, :size] = np.frombuffer(data[i * size:(i + 1) * size],
                                    np.uint8)
    xd = jax.device_put(jnp.asarray(x))
    dld = jax.device_put(jnp.asarray(dl))
    fused = _use_fused()

    rcap = (4096 if hc == 0 else
            max(4096, D // (8 if hc <= 5 else 4)))   # production setting
    if rcap_arg is not None:
        rcap = rcap_arg
    def call():
        return encode_batch_vectorized(xd, dld, D, O, S_cap, rcap=rcap,
                                       hc_level=hc, fused=fused)

    out, ol, ok, _ = call()
    if not os.environ.get("LZ4NET_ENC_STAGE"):
        assert bool(np.asarray(ok).all()), "encode flagged blocks"
        print(f"ratio {int(np.asarray(ol).sum()) / (B * size):.4f} "
              f"dbg={os.environ.get('LZ4NET_HC_DEBUG', '')!r}", flush=True)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            _o, ol, _k, _a = call()
        np.asarray(ol)
        return time.perf_counter() - t0

    run(1)
    dt = (run(12) - run(2)) / 10
    mb = B * size / 1e6
    print(f"e2e hc={hc} fused={fused} "
          f"stage={os.environ.get('LZ4NET_ENC_STAGE', 'full')}: "
          f"{dt * 1e3:8.2f} ms/batch "
          f"({mb / dt / 1e3:.4f} GB/s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
