#!/usr/bin/env python
"""Standalone timing + correctness of resolve_wavefront on the chip.

Builds truth T0 state for B blocks of the bench corpus in numpy, then
times the resolver alone (dispatch-differenced).

Usage: python tools/bench_resolve.py [B]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from probe_stages import truth_parse, truth_state
    from lz4net_tpu.models import native
    from lz4net_tpu.ops.resolve_kernel import resolve_wavefront
    from lz4net_tpu.utils import corpus

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Dt = 73728
    data = corpus.silesia_like(B * 64 * 1024, seed=42)
    blocks = corpus.split_blocks(data, 64 * 1024)[:B]
    packed = [native.compress_block(b) for b in blocks]

    T0 = np.zeros((B, Dt), np.int32)
    for i, p in enumerate(packed):
        _, _, _, seqs = truth_parse(p, Dt)
        _, _, T0[i] = truth_state(blocks[i], seqs, Dt)
    t0d = jax.device_put(jnp.asarray(T0))

    out, ok = resolve_wavefront(t0d, start_chunk=0)
    outn = np.asarray(out)
    bad = 0
    for i, b in enumerate(blocks):
        if outn[i, :len(b)].astype(np.uint8).tobytes() != b:
            bad += 1
    print(f"correct: {B - bad}/{B}  ok={np.asarray(ok).sum()}/{B}",
          flush=True)

    def run(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            r, _ = resolve_wavefront(t0d, start_chunk=0)
        np.asarray(r)
        return time.perf_counter() - t0

    run(1)
    ta, tb = run(2), run(12)
    per = (tb - ta) / 10
    mb = B * 64 * 1024 / 1e6
    print(f"resolve: {per * 1e3:.3f} ms for {mb:.0f} MB "
          f"= {mb / 1e3 / per:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
