"""Command-line interface: compress / decompress files with LZ4Stream
framing, plus engine diagnostics.

The end-to-end smoke-test role of the reference's MiniApp
(`src/misc/LZ4.MiniApp/Program.cs:38-98`: compress -> decompress -> hash
equality, printing the selected codec).

    python -m lz4net_tpu compress   <input> <output.lz4s> [--hc] [--block KB]
    python -m lz4net_tpu decompress <input.lz4s> <output>
    python -m lz4net_tpu verify     <input>            # round-trip + MD5
    python -m lz4net_tpu info                          # engine diagnostics
    python -m lz4net_tpu continuous [--mb N] [--out results.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time


def _cmd_compress(args) -> int:
    from . import LZ4Stream, LZ4StreamFlags, LZ4StreamMode

    if args.block is None:
        # the reference's 1 MB default chunk (`LZ4Stream.cs:119`);
        # blocks beyond the 96 KB kernel cap decode on device as
        # prefix-window fragments (ops/bigblock.py), so the default no
        # longer needs to shrink for the TPU engine
        from .constants import DEFAULT_BLOCK_SIZE
        block = DEFAULT_BLOCK_SIZE
    else:
        block = args.block * 1024
    flags = LZ4StreamFlags.DEFAULT
    if args.hc:
        flags |= LZ4StreamFlags.HIGH_COMPRESSION
    t0 = time.time()
    with open(args.input, "rb") as src, open(args.output, "wb") as dst:
        with LZ4Stream(dst, LZ4StreamMode.COMPRESS, flags,
                       block_size=block) as stream:
            while chunk := src.read(1 << 20):
                stream.write(chunk)
    import os
    i, o = os.path.getsize(args.input), os.path.getsize(args.output)
    print(f"{i} -> {o} bytes (ratio {o / max(1, i):.3f}) "
          f"in {time.time() - t0:.2f}s")
    return 0


def _cmd_decompress(args) -> int:
    from . import LZ4Stream, LZ4StreamMode

    t0 = time.time()
    with open(args.input, "rb") as src, open(args.output, "wb") as dst:
        with LZ4Stream(src, LZ4StreamMode.DECOMPRESS) as stream:
            while chunk := stream.read(1 << 20):
                dst.write(chunk)
    print(f"decompressed in {time.time() - t0:.2f}s")
    return 0


def _cmd_verify(args) -> int:
    from . import codec_name
    from .stream import compress_stream, decompress_stream

    data = open(args.input, "rb").read()
    print("codec:", codec_name())
    for hc in (False, True):
        framed = compress_stream(data, high_compression=hc)
        back = decompress_stream(framed)
        ok = hashlib.md5(back).hexdigest() == hashlib.md5(data).hexdigest()
        mode = "HC  " if hc else "fast"
        print(f"{mode}: {len(data)} -> {len(framed)} "
              f"(ratio {len(framed) / max(1, len(data)):.3f}) "
              f"round-trip {'OK' if ok else 'FAILED'}")
        if not ok:
            return 1
    return 0


def _cmd_info(_args) -> int:
    from . import codec_name, registry

    print("selected:", codec_name())
    for name, svc in registry.available_services().items():
        print(f"engine {name}: {type(svc).__name__}")
    try:
        import jax
        print("jax backend:", jax.default_backend(), jax.devices())
    except Exception as exc:  # noqa: BLE001
        print("jax: unavailable:", exc)
    return 0


def _cmd_continuous(args) -> int:
    from .utils.continuous import run_continuous

    results = run_continuous(total_mb=args.mb, out_path=args.out)
    print(json.dumps(results, indent=2))
    return 0


def _cmd_select(args) -> int:
    from . import codec, registry
    orders = registry.measure_preferences()
    print(json.dumps({"orders": {k: list(v) for k, v in orders.items()},
                      "codec_name": codec.codec_name(),
                      "cache": registry._select_cache_path()}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="lz4net_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("compress")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--hc", action="store_true")
    p.add_argument("--block", type=int, default=None,
                   help="block size KB (default: 64 on a TPU-enabled "
                        "install so decode runs on-device, else 1024)")
    p.set_defaults(fn=_cmd_compress)

    p = sub.add_parser("decompress")
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(fn=_cmd_decompress)

    p = sub.add_parser("verify")
    p.add_argument("input")
    p.set_defaults(fn=_cmd_verify)

    p = sub.add_parser("info")
    p.set_defaults(fn=_cmd_info)

    p = sub.add_parser("continuous")
    p.add_argument("--mb", type=int, default=64)
    p.add_argument("--out", default="continuous_results.json")
    p.set_defaults(fn=_cmd_continuous)

    p = sub.add_parser(
        "select", help="time every engine per role on this host and "
        "persist measured SelectCodec orders (the reference's orders "
        "are benchmark-derived; this runs the benchmark here)")
    p.set_defaults(fn=_cmd_select)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
