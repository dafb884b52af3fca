#!/usr/bin/env python
"""Per-phase timing of the vectorised decode pipeline on the real chip.

Times cumulative prefixes (upto=1..7, then the full pipeline) with the
same dispatch-differencing method as bench.py, then the full pipeline at
larger batch sizes to measure how fixed sequential costs (scans,
while_loops, chunk loops) amortise.  Prints one JSON line per
measurement, flushed immediately.
"""
import json
import sys
import time

import numpy as np

BLOCK = 64 * 1024


def main():
    import jax
    import jax.numpy as jnp
    from lz4net_tpu.models import native
    from lz4net_tpu.utils import corpus
    from lz4net_tpu.ops.decode_vector import (BCH, CH, LANE, _cdiv,
                                              decode_batch_vectorized)

    fused = "--fused" in sys.argv[1:]
    batches = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [16]
    nmax = max(batches)
    data = corpus.silesia_like(nmax * BLOCK, seed=42)
    blocks = corpus.split_blocks(data, BLOCK)[:nmax]
    packed = [native.compress_block(b) for b in blocks]
    out_lens = [len(b) for b in blocks]

    max_c = max(len(p) for p in packed)
    C = _cdiv(max_c + 1, BCH) * BCH
    D = _cdiv(max(out_lens) + 1, CH) * CH
    S_cap = _cdiv(C // 5 + 2, LANE) * LANE
    E_cap = 2 * S_cap
    print(json.dumps({"C": C, "D": D, "S_cap": S_cap}), flush=True)

    comp = np.zeros((nmax, C), np.int32)
    for i, p in enumerate(packed):
        comp[i, :len(p)] = np.frombuffer(p, np.uint8)
    cl = np.array([len(p) for p in packed], np.int32)
    ol = np.array(out_lens, np.int32)

    def timeit(fn):
        def run(iters):
            t0 = time.perf_counter()
            r = None
            for _ in range(iters):
                r = fn()
            np.asarray(jax.tree_util.tree_leaves(r)[0])
            return time.perf_counter() - t0
        run(1)
        ta, tb = run(2), run(10)
        return (tb - ta) / 8

    B0 = batches[0]
    cd = jax.device_put(jnp.asarray(comp[:B0]))
    cld = jax.device_put(jnp.asarray(cl[:B0]))
    old = jax.device_put(jnp.asarray(ol[:B0]))
    prev = 0.0
    for upto in [1, 2, 3, 4, 5, 6, 7, 99]:
        t0 = time.time()
        per = timeit(lambda: decode_batch_vectorized(
            cd, cld, old, C, D, S_cap, E_cap, 2048, upto, fused=fused))
        print(json.dumps({"B": B0, "upto": upto,
                          "cum_ms": round(per * 1e3, 3),
                          "phase_ms": round((per - prev) * 1e3, 3),
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
        prev = per

    for B in batches[1:]:
        cd = jax.device_put(jnp.asarray(comp[:B]))
        cld = jax.device_put(jnp.asarray(cl[:B]))
        old = jax.device_put(jnp.asarray(ol[:B]))
        t0 = time.time()
        per = timeit(lambda: decode_batch_vectorized(
            cd, cld, old, C, D, S_cap, E_cap, 2048, fused=fused))
        gbps = B * BLOCK / per / 1e9
        print(json.dumps({"B": B, "upto": 99, "cum_ms": round(per * 1e3, 3),
                          "gbps": round(gbps, 4),
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
