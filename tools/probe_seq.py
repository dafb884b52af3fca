#!/usr/bin/env python
"""Chip A/B: E3+E4 sequence-records kernel vs the XLA pipeline at the
production 16 x 64 KB shape — full fused-encode output equality plus
dispatch-differenced end-to-end timing of both."""
import os
import sys
import time

VARIANT = ""
for a in sys.argv[1:]:
    if a.startswith("upto:"):
        VARIANT = a
        os.environ["LZ4NET_SEQ_PROBE"] = a
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from lz4net_tpu.constants import MINMATCH, maximum_output_length
from lz4net_tpu.ops import encode_vector as ev
from lz4net_tpu.ops.decode_vector import CH, LANE, _cdiv
from lz4net_tpu.utils import corpus

B = 16
HC = len(sys.argv) > 1 and sys.argv[1] == "hc"


def main():
    data = corpus.silesia_like(B * 65536, seed=42)
    blocks = corpus.split_blocks(data, 65536)[:B]
    D = _cdiv(65536 + 1, CH) * CH
    O = _cdiv(maximum_output_length(D) + 1, CH) * CH
    S_cap = _cdiv(D // MINMATCH + 2, LANE) * LANE + LANE
    x = np.zeros((B, D), np.int32)
    dl = np.zeros(B, np.int32)
    for j, b in enumerate(blocks):
        x[j, :len(b)] = np.frombuffer(b, np.uint8)
        dl[j] = len(b)
    xd = jax.device_put(jnp.asarray(x))
    dld = jax.device_put(jnp.asarray(dl))
    lvl = 9 if HC else 0
    rcap = max(4096, D // 4) if lvl else 4096

    def run(impl):
        os.environ["LZ4NET_SEQ_IMPL"] = impl
        return ev.encode_batch_vectorized(
            xd, dld, D, O, S_cap, rcap=rcap, hc_level=lvl, fused=True)

    t0 = time.time()
    out_k, len_k, ok_k, aux_k = map(np.asarray, run("kernel"))
    print(f"kernel first dispatch {time.time()-t0:.1f}s", flush=True)
    if VARIANT:
        tk = timeit_impl("kernel")
        print(f"kernel[{VARIANT}]: {tk*1e3:.2f} ms/MB", flush=True)
        return
    t0 = time.time()
    out_x, len_x, ok_x, aux_x = map(np.asarray, run("xla"))
    print(f"xla first dispatch {time.time()-t0:.1f}s", flush=True)
    print("len eq:", (len_k == len_x).all(), " ok eq:",
          (ok_k == ok_x).all(), " aux eq:", (aux_k == aux_x).all(),
          flush=True)
    neq = int((out_k != out_x).sum())
    print("byte mismatches:", neq, flush=True)
    if neq:
        bi, pi = np.argwhere(out_k != out_x)[0]
        print("  first at", bi, pi, out_k[bi, pi], out_x[bi, pi])
    # round-trip certification of the kernel path
    from lz4net_tpu.models import native
    for j, b in enumerate(blocks):
        payload = out_k[j, :len_k[j]].astype(np.uint8).tobytes()
        assert native.decompress_block(payload, len(b)) == b, j
    print("round-trip OK, ratio",
          round(int(len_k.sum()) / (B * 65536), 4), flush=True)

    def timeit_impl(impl):
        os.environ["LZ4NET_SEQ_IMPL"] = impl

        def go(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out, ol, ok, aux = ev.encode_batch_vectorized(
                    xd, dld, D, O, S_cap, rcap=rcap, hc_level=lvl,
                    fused=True)
            np.asarray(ol)
            return time.perf_counter() - t0
        go(2)
        return (go(12) - go(2)) / 10

    tk = timeit_impl("kernel")
    tx = timeit_impl("xla")
    print(f"e2e encode kernel: {tk*1e3:.2f} ms/MB "
          f"({B*65536/tk/1e9:.4f} GB/s)   xla: {tx*1e3:.2f} ms/MB",
          flush=True)


if __name__ == "__main__":
    main()
