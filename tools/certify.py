#!/usr/bin/env python
"""On-silicon certification gate — run before EVERY commit that touches
`lz4net_tpu/ops/`.

The CPU test suite pins JAX to interpret mode, so Mosaic-level
divergence (the class of bug that broke rounds 1 AND 2) is invisible to
it by construction.  This gate round-trips real corpus data through the
production device paths on the actual chip and asserts byte-exactness
plus 100% certification.  With a warm compile cache it completes in
~1-2 minutes.

Checks:
  decode   VectorDecoder (fused megakernels) over 1 MB of 64 KB blocks
           + unknown-length + dictionary decode, byte-exact.
  encode   device vector encoder (fast + HC) over 8 blocks: output
           decodes bit-exact on the host oracle, ok flags set.
  pallas   the sequencer fallback kernel on 4 blocks.

Exit 0 + "CERTIFIED" on success; nonzero with details otherwise.

Usage: PYTHONPATH=. python tools/certify.py [decode encode pallas]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

FAIL = 0


def report(name, ok, detail=""):
    global FAIL
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
    if not ok:
        FAIL = 1


def main():
    import jax
    d = jax.devices()[0]
    on_tpu = "TPU" in d.device_kind.upper() or d.platform == "tpu"
    if not on_tpu:
        print("certify: not on TPU hardware — this gate certifies "
              "silicon, run it where jax.devices() is a TPU", flush=True)
        return 2

    from lz4net_tpu.models import native
    from lz4net_tpu.utils import corpus

    which = sys.argv[1:] or ["decode", "encode", "pallas"]
    t_all = time.time()

    data = corpus.silesia_like(1 << 20, seed=42)
    blocks = corpus.split_blocks(data, 64 * 1024)
    packed = [native.compress_block(b) for b in blocks]
    out_lens = [len(b) for b in blocks]

    if "decode" in which:
        from lz4net_tpu.ops.decode_vector import VectorDecoder
        dec = VectorDecoder()
        # certified = no silent host fallback: count device acceptance
        from lz4net_tpu.ops import decode_vector as dv
        calls = {"host": 0}
        orig = VectorDecoder._host_decode

        def counting(block, out_len, dictionary=None):
            calls["host"] += 1
            return orig(block, out_len, dictionary)

        VectorDecoder._host_decode = staticmethod(counting)
        try:
            got = dec.decode_batch(packed, out_lens)
        finally:
            VectorDecoder._host_decode = staticmethod(orig)
        bad = [i for i, (g, b) in enumerate(zip(got, blocks)) if g != b]
        report("decode.bytes", not bad, f"{len(blocks) - len(bad)}/"
               f"{len(blocks)} exact")
        report("decode.certified", calls["host"] == 0,
               f"host_fallbacks={calls['host']}")

        got_u = dec.decode_batch_unknown(packed[:4],
                                         [n + 32 for n in out_lens[:4]])
        report("decode.unknown", all(got_u[i] == blocks[i]
                                     for i in range(4)))

        dictionary = bytes(data[:4096])
        body = bytes(data[4096:4096 + 30000])
        pk = native.compress_block_dict(dictionary, body,
                                        2 * len(body) + 64)
        got_d = dec.decode_batch([pk], [len(body)], dictionary=dictionary)
        report("decode.dict", got_d[0] == body)

        # beyond the 96 KB kernel cap: prefix-window fragment waves
        big = corpus.silesia_like(200 * 1024, seed=77)
        pk_big = native.compress_block(big)
        got_big = dec.decode_batch([pk_big], [len(big)])
        report("decode.bigblock", got_big[0] == big,
               f"{len(big) >> 10} KB")

    if "encode" in which:
        import jax.numpy as jnp
        from lz4net_tpu.ops.decode_vector import CH, LANE, _cdiv, _use_fused
        from lz4net_tpu.ops.encode_vector import encode_batch_vectorized
        from lz4net_tpu.constants import MINMATCH, maximum_output_length
        fused = _use_fused()   # certify the PRODUCTION VectorEncoder path
        B = 8
        sub = blocks[:B]
        max_d = max(len(b) for b in sub)
        D = _cdiv(max_d + 1, CH) * CH
        O = _cdiv(maximum_output_length(D) + 1, CH) * CH
        S_cap = _cdiv(D // MINMATCH + 2, LANE) * LANE + LANE
        x = np.zeros((B, D), np.int32)
        dl = np.zeros((B,), np.int32)
        for i, b in enumerate(sub):
            x[i, :len(b)] = np.frombuffer(b, np.uint8)
            dl[i] = len(b)
        # hash-kernel A/B: the Mosaic kernel must agree bit-for-bit
        # with the XLA scan ON SILICON (interpret tests can't see
        # Mosaic divergence)
        from lz4net_tpu.ops.hash_kernel import (_bucket_prev_pallas,
                                                _bucket_prev_scan,
                                                hash_bucket, hash_bucket8)
        from lz4net_tpu.ops.encode_vector import _u32
        xj = jnp.asarray(x)
        wa = _u32(xj)
        wb = jnp.concatenate([wa[:, 4:], jnp.zeros_like(wa[:, :4])],
                             axis=1)
        h4, h8 = hash_bucket(wa), hash_bucket8(wa, wb)
        pv = np.asarray(_bucket_prev_pallas(wa, wb, h4, h8, D))
        sv = np.asarray(_bucket_prev_scan(wa, wb, h4, h8, D))
        report("encode.hashkernel", (pv == sv).all(),
               f"{(pv == sv).mean():.6f} agree")

        for lvl, name in ((0, "encode.fast"), (9, "encode.hc")):
            out, out_len, ok, _aux = encode_batch_vectorized(
                jnp.asarray(x), jnp.asarray(dl), D, O, S_cap,
                hc_level=lvl, fused=fused)
            out, out_len = np.asarray(out), np.asarray(out_len)
            okn = np.asarray(ok)
            bad = 0
            for i, b in enumerate(sub):
                if not bool(okn[i]):
                    bad += 1
                    continue
                payload = out[i, :int(out_len[i])].astype(
                    np.uint8).tobytes()
                if native.decompress_block(payload, len(b)) != b:
                    bad += 1
            report(name, bad == 0, f"{B - bad}/{B} round-trip")

    if "pallas" in which:
        import jax.numpy as jnp
        from lz4net_tpu.ops.decode_pallas import (LANES, _cdiv,
                                                  build_decode_call)
        n = 4
        sub_p, sub_b = packed[:n], blocks[:n]
        crows = _cdiv(max(len(p) for p in sub_p), LANES) + 2
        drows = _cdiv(max(len(b) for b in sub_b), LANES) + 2
        comp = np.zeros((n, crows, LANES), np.int32)
        lens = np.zeros((n, 2), np.int32)
        for i, p in enumerate(sub_p):
            buf = np.zeros(crows * LANES, np.uint8)
            buf[:len(p)] = np.frombuffer(p, np.uint8)
            comp[i] = buf.reshape(crows, LANES)
            lens[i] = (len(p), len(sub_b[i]))
        kernel = build_decode_call(n, crows, drows, interpret=False)
        out, status = kernel(jnp.asarray(comp), jnp.asarray(comp),
                             jnp.asarray(lens))
        out, status = np.asarray(out), np.asarray(status)
        bad = 0
        for i, b in enumerate(sub_b):
            got = out[i].reshape(-1)[:len(b)].astype(np.uint8).tobytes()
            if got != b or status[i, 1] != len(b):
                bad += 1
        report("pallas.decode", bad == 0, f"{n - bad}/{n} exact")

    dt = time.time() - t_all
    if FAIL:
        print(f"NOT CERTIFIED ({dt:.0f}s)", flush=True)
        return 1
    print(f"CERTIFIED ({dt:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
