#!/usr/bin/env python
"""Small-scale diagnosis of the fused decode path on the real chip:
decode a few 64 KB blocks with fused=True at bench shapes and report,
per block, which certification term fails (ok / total / strict /
needed) and whether the output bytes actually match the truth."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax.numpy as jnp
    from lz4net_tpu.models import native
    from lz4net_tpu.ops.decode_vector import (BCH, CH, LANE, _cdiv,
                                              decode_batch_vectorized)
    from lz4net_tpu.utils import corpus

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    fused = os.environ.get("LZ4NET_FUSED", "1") == "1"
    data = corpus.silesia_like(B * 64 * 1024, seed=42)
    blocks = corpus.split_blocks(data, 64 * 1024)[:B]
    packed = [native.compress_block(b) for b in blocks]
    out_lens = [len(b) for b in blocks]

    max_c = max(len(p) for p in packed)
    C = _cdiv(max_c + 1, BCH) * BCH
    D = _cdiv(max(out_lens) + 1, CH) * CH
    S_cap = _cdiv(C // 5 + 2, LANE) * LANE
    E_cap = 2 * S_cap
    comp = np.zeros((B, C), np.int32)
    for i, p in enumerate(packed):
        comp[i, :len(p)] = np.frombuffer(p, np.uint8)
    cl = np.array([len(p) for p in packed], np.int32)
    ol = np.array(out_lens, np.int32)

    out, total, ok, strict, consumed, needed = decode_batch_vectorized(
        jnp.asarray(comp), jnp.asarray(cl), jnp.asarray(ol),
        C, D, S_cap, E_cap, 2048, fused=fused)
    out = np.asarray(out)
    total, ok = np.asarray(total), np.asarray(ok)
    strict, consumed = np.asarray(strict), np.asarray(consumed)
    needed = np.asarray(needed)
    nbad = 0
    for i in range(B):
        truth = np.frombuffer(blocks[i], np.uint8).astype(np.int32)
        got = out[i, :out_lens[i]]
        diff = np.nonzero(got != truth)[0]
        flag = (not ok[i]) or total[i] != ol[i] or len(diff)
        if flag:
            nbad += 1
        if flag and nbad <= 8:
            print(f"blk {i}: ok={bool(ok[i])} total={total[i]}/{ol[i]} "
                  f"strict={bool(strict[i])} consumed={consumed[i]}/{cl[i]} "
                  f"needed={needed[i]} bytediffs={len(diff)}"
                  + (f" first@{diff[0]}" if len(diff) else ""))
    print(f"fused={fused} bad={nbad}/{B} shapes C={C} D={D} S_cap={S_cap}")


if __name__ == "__main__":
    main()
