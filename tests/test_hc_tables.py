"""HC candidate tables (`ops/hash_kernel.hc_tables`) vs a literal NumPy
replay, plus the hash-HC encode path end-to-end.

The oracle walks 512-position chunks sequentially: every table is
probed with state as of the chunk start (stored word must equal the
query's u32), then updated with a count-guarded scatter (buckets hit
exactly once in the chunk take the new entry; sticky tables
additionally keep their first committed entry).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4net_tpu.constants import maximum_output_length  # noqa: E402
from lz4net_tpu.ops.hash_kernel import (CHUNK, MIX12, NBROWS,  # noqa: E402
                                        LANE, RUN_ROWS, hash_fold,
                                        hc_tables)
from lz4net_tpu.utils import corpus  # noqa: E402


def _u32_np(x, off=0):
    b = np.zeros((len(x) + 35,), np.uint32)
    b[:len(x)] = x
    s = off
    return (b[s:s + len(x)] | (b[s + 1:s + 1 + len(x)] << 8)
            | (b[s + 2:s + 2 + len(x)] << 16)
            | (b[s + 3:s + 3 + len(x)] << 24)).astype(np.uint32)


def _oracle(wa, hs, sticky, nrows):
    n = len(wa)
    nt = len(hs)
    tabs = [np.zeros(nrows[t] * LANE, np.int64) for t in range(nt)]
    words = [np.zeros(nrows[t] * LANE, np.int64) for t in range(nt)]
    cands = [np.full(n, -1, np.int32) for _ in range(nt)]
    for cs in range(0, n, CHUNK):
        ce = min(cs + CHUNK, n)
        for t in range(nt):
            # probe with chunk-start state
            for i in range(cs, ce):
                c = tabs[t][hs[t][i]]
                if c > 0 and words[t][hs[t][i]] == wa[i]:
                    cands[t][i] = c - 1
            # count-guarded update
            cnt = np.zeros(nrows[t] * LANE, np.int64)
            for i in range(cs, ce):
                cnt[hs[t][i]] += 1
            for i in range(cs, ce):
                h = hs[t][i]
                if cnt[h] == 1 and (not sticky[t] or tabs[t][h] == 0):
                    tabs[t][h] = i + 1
                    words[t][h] = wa[i]
    return cands


def test_hc_tables_match_oracle():
    B, D = 2, 2048
    rng = np.random.default_rng(11)
    x = rng.integers(0, 7, size=(B, D)).astype(np.int32)
    x[:, 500:700] = 3                       # a long run for run tiers
    wa = np.stack([_u32_np(r) for r in x]).astype(np.int64)
    wb = np.stack([_u32_np(r, 4) for r in x]).astype(np.int64)
    wa_j = jnp.asarray(wa.astype(np.uint32).astype(np.int32))
    wb_j = jnp.asarray(wb.astype(np.uint32).astype(np.int32))
    h12 = np.asarray(hash_fold((wa_j, wb_j, wa_j), MIX12))
    run_ok = np.zeros((B, D), bool)
    for b in range(B):
        run = 1
        for i in range(D - 2, -1, -1):
            run = run + 1 if x[b, i] == x[b, i + 1] else 1
            if run >= 4 and (i == 0 or x[b, i - 1] != x[b, i]):
                run_ok[b, i] = run >= 4
    hrun = np.where(run_ok, x, RUN_ROWS * LANE - 1).astype(np.int32)
    hs = (h12, hrun)
    sticky = (False, True)
    nrows = (NBROWS, RUN_ROWS)
    got = hc_tables(wa_j, tuple(jnp.asarray(h) for h in hs),
                    sticky, nrows, D)
    for b in range(B):
        want = _oracle(wa[b], tuple(h[b] for h in hs), sticky, nrows)
        for t in range(len(hs)):
            np.testing.assert_array_equal(np.asarray(got[t])[b], want[t],
                                          err_msg=f"b={b} t={t}")


@pytest.mark.parametrize("lvl,tiers", [(1, None), (5, None), (7, None),
                                       (5, "hash")])
def test_hash_hc_roundtrip_and_ratio(lvl, tiers, monkeypatch):
    """Budget HC tier paths (suffix default, bucket-table via knob):
    round-trip exactly, compress better than the fast greedy path, and
    stay within 5% of the exact-tier search on the ratio corpus."""
    if tiers is not None:
        monkeypatch.setenv("LZ4NET_HC_TIERS", tiers)
    from lz4net_tpu.models import native
    from lz4net_tpu.ops import encode_vector as ev
    from lz4net_tpu.ops.decode_vector import CH, LANE as DLANE, _cdiv

    B, size = 4, 8192
    data = corpus.silesia_like(B * size, seed=7)
    blocks = corpus.split_blocks(data, size)[:B]
    D = _cdiv(size + 1, CH) * CH
    O = _cdiv(maximum_output_length(D) + 1, CH) * CH
    S_cap = _cdiv(D // 4 + 2, DLANE) * DLANE + DLANE
    x = np.zeros((B, D), np.int32)
    dl = np.zeros(B, np.int32)
    for j, b in enumerate(blocks):
        x[j, :len(b)] = np.frombuffer(b, np.uint8)
        dl[j] = len(b)
    out, ol, ok, _ = ev.encode_batch_vectorized(
        jnp.asarray(x), jnp.asarray(dl), D, O, S_cap,
        rcap=max(4096, D // 4), hc_level=lvl, fused=False)
    out, ol, ok = map(np.asarray, (out, ol, ok))
    assert ok.all()
    tot = 0
    for j, b in enumerate(blocks):
        payload = out[j, :ol[j]].astype(np.uint8).tobytes()
        assert native.decompress_block(payload, len(b)) == b
        tot += int(ol[j])
    fast = sum(len(native.compress_block(b)) for b in blocks)
    exact = sum(len(native.compress_block_hc(
        b, maximum_output_length(len(b)))) for b in blocks)
    assert tot < fast, (tot, fast)
    assert tot <= exact * 1.05, (tot, exact)
