"""Continuous comparative harness: per-engine throughput + ratio tracking.

The role of the reference's `LZ4.Tests.Continuous` CLI
(`src/misc/LZ4.Tests.Continuous/Program.cs:23-250`, `Results.cs:18-85`):
stream a corpus through every registered engine, verify each round trip,
and persist best/average speeds + ratios across runs so regressions show
up over time.
"""

from __future__ import annotations

import json
import os
import time

from ..constants import maximum_output_length
from .. import registry
from . import corpus


def _bench_engine(name: str, svc, data: bytes, block_size: int) -> dict:
    blocks = corpus.split_blocks(data, block_size)
    budget = maximum_output_length(block_size)

    t0 = time.perf_counter()
    packed = [svc.encode(b, budget) for b in blocks]
    t_enc = time.perf_counter() - t0
    assert all(packed), f"{name}: encode returned empty"

    t0 = time.perf_counter()
    out = [svc.decode(p, len(b)) for p, b in zip(packed, blocks)]
    t_dec = time.perf_counter() - t0
    verified = out == blocks

    t0 = time.perf_counter()
    packed_hc = [svc.encode_hc(b, budget) for b in blocks]
    t_hc = time.perf_counter() - t0
    hc_verified = all(svc.decode(p, len(b)) == b
                      for p, b in zip(packed_hc, blocks))

    n = len(data)
    return {
        "engine": name,
        "verified": bool(verified and hc_verified),
        "encode_MBps": round(n / t_enc / 1e6, 2),
        "decode_MBps": round(n / t_dec / 1e6, 2),
        "encode_hc_MBps": round(n / t_hc / 1e6, 2),
        "ratio": round(sum(map(len, packed)) / n, 4),
        "ratio_hc": round(sum(map(len, packed_hc)) / n, 4),
    }


def run_continuous(total_mb: int = 64, block_size: int = 64 * 1024,
                   out_path: str | None = "continuous_results.json",
                   engines: list[str] | None = None) -> dict:
    """One pass over the corpus for every engine; merges best-so-far
    results into ``out_path`` (the XML/CSV sink of the reference, as JSON)."""
    data = corpus.silesia_like(total_mb << 20, seed=42)
    available = registry.available_services()
    if engines:
        available = {k: v for k, v in available.items() if k in engines}

    run = {"ts": time.time(), "corpus_mb": total_mb,
           "block_kb": block_size // 1024, "engines": {}}
    for name, svc in available.items():
        # the slow engines get a proportionally smaller slice
        slice_mb = total_mb
        if name == "python-reference":
            slice_mb = max(1, total_mb // 64)
        elif name == "tpu":
            slice_mb = max(1, total_mb // 16)
        try:
            run["engines"][name] = _bench_engine(
                name, svc, data[:slice_mb << 20], block_size)
            run["engines"][name]["corpus_mb"] = slice_mb
        except Exception as exc:  # noqa: BLE001 - keep surveying others
            run["engines"][name] = {"engine": name,
                                    "error": f"{type(exc).__name__}: {exc}"}

    if out_path:
        history = {}
        if os.path.exists(out_path):
            try:
                history = json.load(open(out_path))
            except (OSError, ValueError):
                history = {}
        best = history.get("best", {})
        for name, r in run["engines"].items():
            if "error" in r or not r.get("verified"):
                continue
            b = best.setdefault(name, {})
            for key in ("encode_MBps", "decode_MBps", "encode_hc_MBps"):
                b[key] = max(b.get(key, 0.0), r[key])
            for key in ("ratio", "ratio_hc"):
                b[key] = min(b.get(key, 9.9), r[key])
        history["best"] = best
        history.setdefault("runs", []).append(run)
        history["runs"] = history["runs"][-50:]
        with open(out_path, "w") as fh:
            json.dump(history, fh, indent=2)
    return run
