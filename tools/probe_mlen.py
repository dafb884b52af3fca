#!/usr/bin/env python
"""Chip A/B: mlen megakernel vs XLA _match_lengths — bit-equality and
dispatch-differenced timing at the production 64 KB shape."""
import os
import sys
import time

VARIANT = sys.argv[1] if len(sys.argv) > 1 else ""
if VARIANT:
    os.environ["LZ4NET_MLEN_PROBE"] = VARIANT

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from lz4net_tpu.ops import encode_vector as ev
from lz4net_tpu.ops.mlen_kernel import match_lengths_fused
from lz4net_tpu.ops.hash_kernel import (bucket_prev, hash_bucket,
                                        hash_bucket8)
from lz4net_tpu.utils import corpus

B = 16
D = 73728
RCAP = 4096


def main():
    data = corpus.silesia_like(B * 65536, seed=42)
    x = np.zeros((B, D), np.int32)
    dl = np.zeros(B, np.int32)
    for j in range(B):
        blk = data[j * 65536:(j + 1) * 65536]
        x[j, :len(blk)] = np.frombuffer(blk, np.uint8)
        dl[j] = len(blk)
    xj = jax.device_put(jnp.asarray(x))
    dlj = jax.device_put(jnp.asarray(dl))

    @jax.jit
    def prep(xj):
        u32 = ev._u32(xj)
        u32s4 = jnp.concatenate(
            [u32[:, 4:], jnp.zeros_like(u32[:, :4])], axis=1)
        prev = bucket_prev(u32, u32s4, hash_bucket(u32),
                           hash_bucket8(u32, u32s4), D=D)
        i = jnp.arange(D, dtype=jnp.int32)
        off = i[None, :] - prev
        far = (prev >= 0) & (off <= ev.MAX_DISTANCE) & (off > 4)
        dks = ev._top_offsets_select(off, far, 8, 16)
        return u32, prev, dks

    u32, prev, dks = jax.block_until_ready(prep(xj))
    m8 = jnp.zeros(prev.shape, jnp.int32)

    @jax.jit
    def run_kernel(xj, u32, prev, m8, dks, dlj):
        m, o, l = match_lengths_fused(xj, u32, prev, m8, dks, dlj, dlj,
                                      D, RCAP)
        return m.astype(jnp.int32), o, l

    @jax.jit
    def run_xla(xj, u32, prev, m8, dks, dlj):
        m, o, l = ev._match_lengths(xj, u32, prev, m8.astype(bool),
                                    dlj, dlj, D, RCAP, fused=True)
        return m.astype(jnp.int32), o, l

    t0 = time.time()
    mk, ok_, lk = run_kernel(xj, u32, prev, m8, dks, dlj)
    mk = np.asarray(mk)
    print(f"kernel first dispatch {time.time()-t0:.1f}s", flush=True)
    if not VARIANT:
        t0 = time.time()
        mx, ox, lx = run_xla(xj, u32, prev, m8, dks, dlj)
        mx = np.asarray(mx)
        print(f"xla first dispatch {time.time()-t0:.1f}s", flush=True)
        ok_, lk, ox, lx = map(np.asarray, (ok_, lk, ox, lx))
        for name, a, b in (("matched", mk, mx), ("off", ok_, ox),
                           ("mlen", lk, lx)):
            neq = int((a != b).sum())
            print(f"{name}: mismatches={neq}", flush=True)
            if neq:
                idx = np.argwhere(a != b)[:5]
                for bi, pi in idx:
                    print(f"  [{bi},{pi}] kernel={a[bi, pi]} "
                          f"xla={b[bi, pi]}")

    def timeit(fn):
        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                m, o, l = fn(xj, u32, prev, m8, dks, dlj)
            np.asarray(l[:1, :1])
            return time.perf_counter() - t0
        run(2)
        return (run(12) - run(2)) / 10

    tk = timeit(run_kernel)
    print(f"kernel[{VARIANT or 'full'}]: {tk*1e3:.2f} ms/MB",
          flush=True)
    if not VARIANT:
        tx = timeit(run_xla)
        print(f"xla: {tx*1e3:.2f} ms/MB", flush=True)


if __name__ == "__main__":
    main()
