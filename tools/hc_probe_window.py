#!/usr/bin/env python
"""Dump matched/off/mlen candidate state around a window of a block to
see why a reference match was not selected.

Usage: JAX_PLATFORMS=cpu python tools/hc_probe_window.py [blk] [lo] [hi]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp
    from lz4net_tpu.constants import MINMATCH, maximum_output_length
    from lz4net_tpu.ops import encode_vector as ev
    from lz4net_tpu.ops.decode_vector import CH, LANE, _cdiv
    from lz4net_tpu.utils import corpus

    blk = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 940
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 980
    BLOCK = 8 * 1024
    data = corpus.silesia_like(6 * BLOCK, seed=77)
    b = corpus.split_blocks(data, BLOCK)[blk]

    D = _cdiv(len(b) + 1, CH) * CH
    x = np.zeros((1, D), np.int32)
    x[0, :len(b)] = np.frombuffer(b, np.uint8)
    dl = np.array([len(b)], np.int32)
    xd, dld = jnp.asarray(x), jnp.asarray(dl)

    i = jnp.arange(D, dtype=jnp.int32)
    u32 = ev._u32(xd)
    u32s4 = jnp.concatenate([u32[:, 4:], jnp.zeros_like(u32[:, :4])],
                            axis=1)
    prev4 = ev._prev_occurrence((u32,))
    prev8 = ev._prev_occurrence((u32, u32s4))
    m8 = (prev8 >= 0) & (i[None, :] - prev8 <= 65535)
    prev = jnp.where(m8, prev8, prev4)
    matched, off_all, mlen_all = ev._match_lengths(
        xd, u32, prev, m8, dld, D, 4096)
    m, o, ml = map(np.asarray, (matched, off_all, mlen_all))
    xs = np.asarray(x)[0]
    print("base tier (nearest 4/8B):")
    for q in range(lo, hi):
        if m[0, q]:
            print(f"  i={q} byte={xs[q]:3d} off={o[0, q]:5d} "
                  f"ml={ml[0, q]:3d}")
    print("bytes:", bytes(xs[lo:hi].astype(np.uint8)))


if __name__ == "__main__":
    main()
