"""Measured SelectCodec: the registry must prefer whichever engine
actually wins on the running host (VERDICT r3 item 7 — the reference's
orders are benchmark-derived, `src/LZ4/LZ4Codec.cs:103-167`; here the
benchmark can run in place and persist its verdict)."""

import json
import os
import time

import pytest

pytestmark = pytest.mark.quick

from lz4net_tpu import registry  # noqa: E402


@pytest.fixture(autouse=True)
def _restore_registry():
    yield
    os.environ.pop("LZ4NET_SELECT_CACHE", None)
    registry.initialize(force=True)


def test_measured_cache_overrides_static_order(tmp_path, monkeypatch):
    monkeypatch.setenv("LZ4NET_SELECT_CACHE", str(tmp_path))
    registry.initialize(force=True)
    if "native" not in registry.available_services():
        pytest.skip("native engine unavailable")
    # static CPU order prefers native; a measured cache saying the
    # python engine won must override it
    path = registry._select_cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    json.dump({registry._select_cache_key(): {
        "decode": ["python-reference", "native"],
        "encode": ["native", "python-reference"],
        "encode_hc": ["native", "python-reference"]}}, open(path, "w"))
    registry.initialize(force=True)
    assert registry.decoder() is registry.service("python-reference")
    assert registry.encoder() is registry.service("native")
    # kill-switch restores the static order
    monkeypatch.setenv("LZ4NET_TIMED_SELECT", "0")
    registry.initialize(force=True)
    assert registry.decoder() is registry.service("native")


class _Stub:
    """Correctness-free timing stub (the bench times, it does not
    verify — AutoTest already gated correctness at registration)."""

    def __init__(self, name, delay):
        self.codec_name = name
        self.delay = delay

    def _work(self):
        time.sleep(self.delay)
        return b"x"

    def encode(self, src, m):
        return self._work()

    def encode_hc(self, src, m, level=9):
        return self._work()

    def decode(self, src, n):
        return self._work()

    def decode_unknown(self, src, m):
        return self._work()


def test_measure_preferences_ranks_by_speed(tmp_path, monkeypatch):
    monkeypatch.setenv("LZ4NET_SELECT_CACHE", str(tmp_path))
    registry.initialize(force=True)
    real = dict(registry._registry.services)
    base = real.get("native") or real["python-reference"]
    registry._registry.services = {
        "python-reference": real["python-reference"],
        "turtle": _Stub("turtle", 0.005),
        "hare": _Stub("hare", 0.0)}
    if "native" in real:
        registry._registry.services["native"] = real["native"]
    try:
        orders = registry.measure_preferences(block_kb=1, n_blocks=2)
    finally:
        registry._registry.services = real
        registry.initialize(force=True)
    for role in ("encode", "decode", "encode_hc"):
        assert orders[role].index("hare") < orders[role].index("turtle")
    saved = json.load(open(registry._select_cache_path()))
    assert saved[registry._select_cache_key()]["decode"] == \
        list(orders["decode"])
