#!/usr/bin/env python
"""Compare the reference HC parse vs the device fast-HC parse sequence
by sequence on one block: where do the extra bytes go?

Usage: JAX_PLATFORMS=cpu python tools/hc_parse_diff.py [blk_idx]
"""
import os
import sys

import numpy as np


def parse_seqs(payload):
    """(tok_pos, lit_len, off, mlen, seq_bytes) list from a compressed
    block."""
    src = np.frombuffer(payload, np.uint8).astype(np.int32)
    n = len(src)
    seqs = []
    p = 0
    while p < n:
        tok = p
        token = src[p]; p += 1
        ll = token >> 4
        if ll == 15:
            while src[p] == 255:
                ll += 255; p += 1
            ll += src[p]; p += 1
        p += ll
        if p >= n:
            seqs.append((tok, ll, 0, 0, p - tok))
            break
        off = int(src[p]) | (int(src[p + 1]) << 8); p += 2
        ml = token & 15
        if ml == 15:
            while src[p] == 255:
                ml += 255; p += 1
            ml += src[p]; p += 1
        ml += 4
        seqs.append((tok, ll, off, ml, p - tok))
    return seqs


def to_spans(seqs):
    """Output-domain spans [(out_pos, lit_len, off, mlen)]"""
    out = []
    o = 0
    for (_, ll, off, ml, _) in seqs:
        out.append((o, ll, off, ml))
        o += ll + ml
    return out


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from lz4net_tpu.models import native as N
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    from lz4net_tpu.utils import corpus

    blk_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    BLOCK = 8 * 1024
    data = corpus.silesia_like(6 * BLOCK, seed=77)
    blocks = corpus.split_blocks(data, BLOCK)
    b = blocks[blk_idx]

    ref = N.compress_block_hc(b)
    dev = VectorEncoder().encode_batch([b], hc_level=9)[0]
    rs, ds = to_spans(parse_seqs(ref)), to_spans(parse_seqs(dev))
    print(f"ref: {len(ref)} B, {len(rs)} seqs   "
          f"dev: {len(dev)} B, {len(ds)} seqs")
    rlit = sum(s[1] for s in rs)
    dlit = sum(s[1] for s in ds)
    print(f"literal bytes: ref={rlit} dev={dlit} (delta {dlit - rlit:+d})")
    rml = sum(s[3] for s in rs)
    dml = sum(s[3] for s in ds)
    print(f"match bytes:   ref={rml} dev={dml}")

    # walk both span lists over the output domain; report divergences
    ri = di = 0
    shown = 0
    while ri < len(rs) and di < len(ds) and shown < 25:
        r, d = rs[ri], ds[di]
        if r == d:
            ri += 1; di += 1
            continue
        # sync point: first output pos where both agree again
        print(f"  ref@{r[0]}: lit={r[1]} off={r[2]} ml={r[3]}   "
              f"dev@{d[0]}: lit={d[1]} off={d[2]} ml={d[3]}")
        shown += 1
        if r[0] + r[1] + r[3] <= d[0] + d[1] + d[3]:
            ri += 1
        else:
            di += 1
    # histogram: device literal bytes at output positions the reference
    # covers with matches
    def coverage(spans, n):
        cov = np.zeros(n, np.uint8)
        for (o, ll, off, ml) in spans:
            cov[o + ll:o + ll + ml] = 1
        return cov
    rc, dc = coverage(rs, len(b)), coverage(ds, len(b))
    print(f"bytes matched by ref but literal in dev: "
          f"{int(((rc == 1) & (dc == 0)).sum())}")
    print(f"bytes matched by dev but literal in ref: "
          f"{int(((dc == 1) & (rc == 0)).sum())}")


if __name__ == "__main__":
    main()
