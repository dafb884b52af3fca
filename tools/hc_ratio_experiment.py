#!/usr/bin/env python
"""Measure device fast-HC compressed size vs reference HC per corpus
component, under candidate-tier ablations (LZ4NET_HC_DEBUG knobs).

CPU-only iteration tool for closing the HC ratio gap (BASELINE bar:
compressed size <= reference at matching level).

Usage: JAX_PLATFORMS=cpu python tools/hc_ratio_experiment.py [n_blocks]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    from lz4net_tpu.models import native as N
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    from lz4net_tpu.utils import corpus

    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    BLOCK = 8 * 1024
    data = corpus.silesia_like(n_blocks * BLOCK, seed=77)
    blocks = corpus.split_blocks(data, BLOCK)

    enc = VectorEncoder()
    ref = [N.compress_block_hc(b) for b in blocks]
    dev = enc.encode_batch(blocks, hc_level=9)
    print(f"{'blk':>4} {'ref':>7} {'dev':>7} {'delta':>6}")
    for i, (r, d) in enumerate(zip(ref, dev)):
        print(f"{i:>4} {len(r):>7} {len(d):>7} {len(d) - len(r):>+6}")
    rt, dt = sum(map(len, ref)), sum(map(len, dev))
    print(f"TOTAL ref={rt} dev={dt} delta={dt - rt:+d} "
          f"({(dt - rt) / rt * 100:+.2f}%)")


if __name__ == "__main__":
    main()
