#!/usr/bin/env python
"""Correctness + throughput of ops/fused_gather kernels on the chip."""
import json
import sys
import time

import numpy as np


def timeit(fn, iters=20):
    import jax
    fn()
    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        return time.perf_counter() - t0
    run(2)
    ta, tb = run(2), run(2 + iters)
    return (tb - ta) / iters


def main():
    import jax.numpy as jnp
    from lz4net_tpu.ops import fused_gather as F

    rng = np.random.default_rng(7)
    results = {}

    # lane_lookup
    M = 16 * 544
    t = rng.integers(0, 1 << 20, (M, 128)).astype(np.int32)
    i = rng.integers(0, 128, (M, 128)).astype(np.int32)
    got = np.asarray(F.lane_lookup(jnp.asarray(t), jnp.asarray(i)))
    ref = np.take_along_axis(t, i, axis=1)
    assert (got == ref).all(), "lane_lookup WRONG"
    per = timeit(lambda: F.lane_lookup(jnp.asarray(t), jnp.asarray(i)))
    results["lane_lookup"] = {"gelem_s": round(M * 128 / per / 1e9, 2),
                              "ms": round(per * 1e3, 3)}
    print(json.dumps({"k": "lane_lookup", **results["lane_lookup"]}),
          flush=True)

    # diag_gather: B=16, N=69632, window rows [-1, +15)
    B, N = 16, 69632
    tbl = rng.integers(0, 256, (B, N)).astype(np.int32)
    q = np.arange(N, dtype=np.int32)[None, :]
    off = rng.integers(-128, 15 * 128, (B, N)).astype(np.int32)
    idx = np.clip(q + off, 0, N - 1).astype(np.int32)
    vals, band = F.diag_gather(jnp.asarray(tbl), jnp.asarray(idx), 1, 16)
    vals, band = np.asarray(vals), np.asarray(band)
    expect_band = (idx // 128 - q // 128 >= -1) & (idx // 128 - q // 128 < 15)
    assert (band == expect_band).all(), "diag band WRONG"
    ref = np.take_along_axis(tbl, idx, axis=1)
    assert (vals[band] == ref[band]).all(), "diag vals WRONG"
    per = timeit(lambda: F.diag_gather(jnp.asarray(tbl), jnp.asarray(idx),
                                       1, 16))
    results["diag16"] = {"gelem_s": round(B * N / per / 1e9, 2),
                         "ms": round(per * 1e3, 3)}
    print(json.dumps({"k": "diag_gather_w16", **results["diag16"]}),
          flush=True)

    # rowbase_gather: monotone idx, 2 tables (8-bit + 17-bit)
    K = 73728
    t1 = rng.integers(0, 256, (B, N)).astype(np.int32)
    t2 = rng.integers(0, 1 << 17, (B, N)).astype(np.int32)
    steps = rng.integers(0, 2, (B, K)).astype(np.int32)
    idx = np.minimum(np.cumsum(steps, axis=1), N - 1).astype(np.int32)
    (v1, v2), band = F.rowbase_gather(
        (jnp.asarray(t1), jnp.asarray(t2)), jnp.asarray(idx), 8, (8, 17))
    v1, v2, band = np.asarray(v1), np.asarray(v2), np.asarray(band)
    r1 = np.take_along_axis(t1, idx, axis=1)
    r2 = np.take_along_axis(t2, idx, axis=1)
    base = (idx[:, ::128] // 128).repeat(128, axis=1)
    eband = (idx // 128 - base >= 0) & (idx // 128 - base < 8)
    assert (band == eband).all(), "rowbase band WRONG"
    assert (v1[band] == r1[band]).all(), "rowbase v1 WRONG"
    assert (v2[band] == r2[band]).all(), "rowbase v2 WRONG"
    per = timeit(lambda: F.rowbase_gather(
        (jnp.asarray(t1), jnp.asarray(t2)), jnp.asarray(idx), 8, (8, 17)))
    results["rowbase"] = {"gelem_s": round(B * K * 2 / per / 1e9, 2),
                          "ms": round(per * 1e3, 3)}
    print(json.dumps({"k": "rowbase_w8_2tab", **results["rowbase"]}),
          flush=True)

    # table_gather: arbitrary idx into an 8K-entry table (wavefront jumps)
    Nt, K2 = 8192, 8192
    tt = rng.integers(0, 1 << 20, (B, Nt)).astype(np.int32)
    ii = rng.integers(0, Nt, (B, K2)).astype(np.int32)
    (vt,) = F.table_gather((jnp.asarray(tt),), jnp.asarray(ii), (20,))
    assert (np.asarray(vt) == np.take_along_axis(tt, ii, axis=1)).all(), \
        "table_gather WRONG"
    per = timeit(lambda: F.table_gather((jnp.asarray(tt),),
                                        jnp.asarray(ii), (20,)))
    results["table8k"] = {"gelem_s": round(B * K2 / per / 1e9, 2),
                          "ms": round(per * 1e3, 3)}
    print(json.dumps({"k": "table_gather_8k", **results["table8k"]}),
          flush=True)

    # table_gather: 64K-entry byte table (cross-chunk resolve)
    Nb = 65536
    tb = rng.integers(0, 256, (B, Nb)).astype(np.int32)
    ib = rng.integers(0, Nb, (B, K2)).astype(np.int32)
    (vb,) = F.table_gather((jnp.asarray(tb),), jnp.asarray(ib), (8,))
    assert (np.asarray(vb) == np.take_along_axis(tb, ib, axis=1)).all(), \
        "table_gather64k WRONG"
    per = timeit(lambda: F.table_gather((jnp.asarray(tb),),
                                        jnp.asarray(ib), (8,)))
    results["table64k"] = {"gelem_s": round(B * K2 / per / 1e9, 2),
                           "ms": round(per * 1e3, 3)}
    print(json.dumps({"k": "table_gather_64k", **results["table64k"]}),
          flush=True)
    print("ALL OK")


if __name__ == "__main__":
    main()
