#!/usr/bin/env python
"""Headline benchmark: LZ4 block decode throughput on one TPU chip.

Workload: Silesia-like corpus (synthetic, deterministic — no network in
this environment; set SILESIA_DIR to use the real corpus), split into
64 KB blocks, compressed on the host by the native oracle (bit-exact
with the reference codec), decoded on-device by the batched Pallas
kernel.  Baseline: the reference's published single-core decompression
speed, ~2 GB/s (`doc/readme.md:5`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Timing notes for this environment: the device queue is asynchronous and
`block_until_ready` is unreliable over the tunnel, so iterations are
timed by differencing two dispatch-loop lengths, each synchronised by
fetching the (tiny) status output of the last call.  Host<->device
transfer is slow here, so compressed bytes ship packed 4-per-word and are
unpacked on-device.
"""

import json
import sys
import time

import numpy as np

BASELINE_GBPS = 2.0          # reference single-core decode, doc/readme.md:5
CORPUS_MB = 16
BLOCK_SIZE = 64 * 1024
ITERS_SMALL = 2
ITERS_BIG = 12


def build_workload():
    from lz4net_tpu.models import native
    from lz4net_tpu.utils import corpus

    data = corpus.silesia_like(CORPUS_MB << 20, seed=42)
    blocks = corpus.split_blocks(data, BLOCK_SIZE)
    packed = [native.compress_block(b) for b in blocks]
    ratio = sum(map(len, packed)) / len(data)
    return data, blocks, packed, ratio


def pack_words(packed, out_lens):
    """Pack compressed bytes 4-per-int32 word for cheap upload; the device
    unpacks with shifts."""
    from lz4net_tpu.ops.decode_pallas import LANES, _cdiv

    max_c = max(len(p) for p in packed)
    max_d = max(out_lens)
    crows = _cdiv(max_c, LANES) + 2
    drows = _cdiv(max_d, LANES) + 2
    n = len(packed)
    words = np.zeros((n, crows, LANES // 4), np.int32)
    lens = np.zeros((n, 2), np.int32)
    for i, p in enumerate(packed):
        buf = np.zeros(crows * LANES, np.uint8)
        buf[:len(p)] = np.frombuffer(p, np.uint8)
        words[i] = buf.view("<u4").astype(np.int32).reshape(crows, LANES // 4)
        lens[i] = (len(p), out_lens[i])
    return words, lens, crows, drows


def main():
    t_start = time.time()
    data, blocks, packed, ratio = build_workload()
    out_lens = [len(b) for b in blocks]
    result = {
        "metric": "silesia64k_tpu_decode",
        "value": 0.0,
        "unit": "GB/s/chip",
        "vs_baseline": 0.0,
        "corpus_mb": CORPUS_MB,
        "block_kb": BLOCK_SIZE // 1024,
        "ratio": round(ratio, 4),
    }

    try:
        import jax
        import jax.numpy as jnp
        from lz4net_tpu.ops.decode_pallas import build_decode_call

        on_tpu = any("TPU" in d.device_kind.upper() for d in jax.devices())
        result["backend"] = jax.default_backend()
        if not on_tpu:
            raise RuntimeError("no TPU device visible")

        words, lens, crows, drows = pack_words(packed, out_lens)
        kernel = build_decode_call(len(packed), crows, drows, interpret=False)

        @jax.jit
        def step(words, lens):
            # unpack 4 bytes per little-endian word, on device
            shifts = jnp.array([0, 8, 16, 24], jnp.int32)
            comp = ((words[..., None] >> shifts) & 0xFF)
            comp = comp.reshape(words.shape[0], crows, -1)
            out, status = kernel(comp, comp, lens)
            return out, status

        words_d = jax.device_put(jnp.asarray(words))
        lens_d = jax.device_put(jnp.asarray(lens))

        def run(iters):
            t0 = time.perf_counter()
            status = None
            for _ in range(iters):
                _out, status = step(words_d, lens_d)
            np.asarray(status)  # sync: queue drains before the fetch returns
            return time.perf_counter() - t0

        # warm-up: compile + first execution + validate correctness
        _out, status = step(words_d, lens_d)
        st = np.asarray(status)
        bad = [i for i in range(len(packed))
               if (st[i, 0] != len(packed[i]) or st[i, 1] != out_lens[i])]
        if bad:
            raise RuntimeError(f"TPU decode status mismatch on blocks {bad[:5]}")
        result["validated_blocks"] = len(packed)

        t_small = run(ITERS_SMALL)
        t_big = run(ITERS_BIG)
        per_iter = max((t_big - t_small) / (ITERS_BIG - ITERS_SMALL), 1e-9)
        gbps = len(data) / per_iter / 1e9
        result["value"] = round(gbps, 4)
        result["vs_baseline"] = round(gbps / BASELINE_GBPS, 4)
        result["iter_ms"] = round(per_iter * 1e3, 3)
    except Exception as exc:  # noqa: BLE001 - bench must always emit its line
        result["error"] = f"{type(exc).__name__}: {exc}"[:200]

    result["wall_s"] = round(time.time() - t_start, 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
