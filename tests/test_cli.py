"""CLI smoke tests (the MiniApp analogue)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.quick

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    # the ambient environment may expose a real (possibly busy) TPU via
    # sitecustomize; keep CLI subprocesses off it
    env["LZ4NET_DISABLE_ENGINES"] = "tpu"
    return subprocess.run([sys.executable, "-m", "lz4net_tpu", *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=env, cwd=REPO)


def test_cli_compress_decompress_round_trip(tmp_path):
    src = tmp_path / "input.txt"
    src.write_bytes(b"the quick brown fox jumps over the lazy dog\n" * 2000)
    packed = tmp_path / "out.lz4s"
    restored = tmp_path / "restored.txt"

    r = _run(["compress", str(src), str(packed), "--block", "16"])
    assert r.returncode == 0, r.stderr
    assert packed.stat().st_size < src.stat().st_size

    r = _run(["decompress", str(packed), str(restored)])
    assert r.returncode == 0, r.stderr
    assert restored.read_bytes() == src.read_bytes()


def test_cli_verify(tmp_path):
    src = tmp_path / "data.bin"
    src.write_bytes(b"abc" * 5000)
    r = _run(["verify", str(src)])
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_cli_info():
    r = _run(["info"])
    assert r.returncode == 0, r.stderr
    assert "selected:" in r.stdout


def test_continuous_harness(tmp_path):
    from lz4net_tpu.utils.continuous import run_continuous
    out = tmp_path / "results.json"
    res = run_continuous(total_mb=1, block_size=16 * 1024,
                         out_path=str(out), engines=["native"])
    if "native" in res["engines"] and "error" not in res["engines"]["native"]:
        assert res["engines"]["native"]["verified"]
    assert out.exists()
    # second run merges best-so-far history
    run_continuous(total_mb=1, block_size=16 * 1024, out_path=str(out),
                   engines=["native"])
    import json
    hist = json.load(open(out))
    assert len(hist["runs"]) == 2
    assert "best" in hist
