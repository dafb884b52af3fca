#!/usr/bin/env python
"""Byte-exact validation of the fused decode path on the real chip:
compress the bench corpus with the native oracle, decode on device with
fused=True through VectorDecoder (both passes + unknown-length), diff
every byte.  Also covers the dictionary path."""
import os
import sys

os.environ.setdefault("LZ4NET_FUSED", "1")

import numpy as np


def main():
    from lz4net_tpu.models import native, reference
    from lz4net_tpu.ops.decode_vector import VectorDecoder
    from lz4net_tpu.utils import corpus

    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    data = corpus.silesia_like(n_mb << 20, seed=42)
    blocks = corpus.split_blocks(data, 64 * 1024)
    packed = [native.compress_block(b) for b in blocks]
    out_lens = [len(b) for b in blocks]

    dec = VectorDecoder()
    got = dec.decode_batch(packed, out_lens)
    bad = [i for i, (g, b) in enumerate(zip(got, blocks)) if g != b]
    print("known-length: ", "OK" if not bad else f"MISMATCH {bad[:5]}",
          flush=True)

    got_u = dec.decode_batch_unknown(packed[:16],
                                     [n + 32 for n in out_lens[:16]])
    bad_u = [i for i in range(16) if got_u[i] != blocks[i]]
    print("unknown-length:", "OK" if not bad_u else f"MISMATCH {bad_u[:5]}",
          flush=True)

    dictionary = bytes(data[:4096])
    body = bytes(data[4096:4096 + 30000])
    pk = native.compress_block_dict(dictionary, body, 2 * len(body) + 64)
    got_d = dec.decode_batch([pk], [len(body)], dictionary=dictionary)
    print("dict decode:   ", "OK" if got_d[0] == body else "MISMATCH",
          flush=True)
    if bad or bad_u or got_d[0] != body:
        sys.exit(1)
    print("FUSED DECODE EXACT")


if __name__ == "__main__":
    main()
