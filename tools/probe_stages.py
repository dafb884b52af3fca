#!/usr/bin/env python
"""Stage-isolated diagnosis of the fused decode path on the real chip.

Computes ground-truth parse fields / per-byte state in numpy from the
compressed bytes, then drives each device stage with TRUTH inputs:

  stage parse    : parse_tokens(comp)        vs truth marks/ll/ml
  stage records  : records_to_state(truth parse) vs truth t0m/cidx
  stage literal  : rowbase_gather on truth cidx  vs truth literal bytes
  stage resolve  : resolve_wavefront(truth T0)   vs original bytes

Usage: python tools/probe_stages.py [B] [stage ...]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

VFLAG = 1 << 19


def truth_parse(block, C):
    """Token marks + per-token lit_len/mlen + per-byte state, in numpy."""
    src = np.frombuffer(block, np.uint8).astype(np.int32)
    n = len(src)
    mark = np.zeros(C, np.int32)
    ll_all = np.zeros(C, np.int32)
    ml_all = np.zeros(C, np.int32)
    seqs = []          # (tok_pos, lit_src, lit_len, match_dst?, off, mlen)
    p = 0
    o = 0
    while p < n:
        tok = p
        token = src[p]; p += 1
        ll = token >> 4
        if ll == 15:
            while src[p] == 255:
                ll += 255; p += 1
            ll += src[p]; p += 1
        lit_src = p
        p += ll
        o += ll
        if p >= n:
            mark[tok] = 1; ll_all[tok] = ll; ml_all[tok] = 4 + (token & 15)
            seqs.append((tok, lit_src, ll, None, 0, 0))
            break
        off = int(src[p]) | (int(src[p + 1]) << 8); p += 2
        ml = token & 15
        if ml == 15:
            while src[p] == 255:
                ml += 255; p += 1
            ml += src[p]; p += 1
        ml += 4
        mark[tok] = 1; ll_all[tok] = ll; ml_all[tok] = ml
        seqs.append((tok, lit_src, ll, o, off, ml))
        o += ml
    return mark, ll_all, ml_all, seqs


def truth_state(block, seqs, Dt):
    """Expected t0m / cidx / T0 per output byte (P=0)."""
    t0m = np.full(Dt, VFLAG, np.int32)
    cidx = np.full(Dt, -1, np.int32)
    o = 0
    for (tok, lit_src, ll, mdst, off, ml) in seqs:
        for j in range(ll):
            cidx[o + j] = lit_src + j
        o += ll
        if mdst is None or ml == 0 or off == 0:
            continue
        for j in range(ml):
            pos = o + j
            if j >= off:
                t0m[pos] = mdst - off + (j % off)
            else:
                t0m[pos] = pos - off
        o += ml
    raw = np.frombuffer(block, np.uint8).astype(np.int32)
    # T0: literal bytes as terminals (literal at output o copies raw[o])
    T0 = t0m.copy()
    lit = cidx >= 0
    T0[lit] = VFLAG | raw[np.nonzero(lit)[0]]
    return t0m, cidx, T0


def main():
    import jax.numpy as jnp
    from lz4net_tpu.models import native
    from lz4net_tpu.ops.decode_vector import BCH, CH, _cdiv
    from lz4net_tpu.utils import corpus

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    stages = sys.argv[2:] or ["parse", "records", "literal", "resolve"]
    data = corpus.silesia_like(B * 64 * 1024, seed=42)
    blocks = corpus.split_blocks(data, 64 * 1024)[:B]
    packed = [native.compress_block(b) for b in blocks]
    out_lens = [len(b) for b in blocks]

    max_c = max(len(p) for p in packed)
    C = _cdiv(max_c + 1, BCH) * BCH
    D = _cdiv(max(out_lens) + 1, CH) * CH
    Dt = D
    comp = np.zeros((B, C), np.int32)
    for i, p in enumerate(packed):
        comp[i, :len(p)] = np.frombuffer(p, np.uint8)
    cl = np.array([len(p) for p in packed], np.int32)
    ol = np.array(out_lens, np.int32)

    t_mark = np.zeros((B, C), np.int32)
    t_ll = np.zeros((B, C), np.int32)
    t_ml = np.zeros((B, C), np.int32)
    t_t0m = np.zeros((B, Dt), np.int32)
    t_cidx = np.zeros((B, Dt), np.int32)
    t_T0 = np.zeros((B, Dt), np.int32)
    for i, p in enumerate(packed):
        m, l, ml_, seqs = truth_parse(p, C)
        t_mark[i], t_ll[i], t_ml[i] = m, l, ml_
        a, b_, c_ = truth_state(blocks[i], seqs, Dt)
        t_t0m[i], t_cidx[i], t_T0[i] = a, b_, c_

    if "parse" in stages:
        from lz4net_tpu.ops.parse_kernel import parse_tokens
        mark, ll, ml, miss = parse_tokens(jnp.asarray(comp),
                                          jnp.asarray(cl), C)
        mark, ll, ml = map(np.asarray, (mark, ll, ml))
        for i in range(B):
            dm = np.nonzero(mark[i] != t_mark[i])[0]
            # ll/ml only matter at marked positions
            sel = t_mark[i] == 1
            dl = np.nonzero(ll[i][sel] != t_ll[i][sel])[0]
            dml = np.nonzero(ml[i][sel] != t_ml[i][sel])[0]
            if len(dm) or len(dl) or len(dml) or bool(np.asarray(miss)[i]):
                print(f"PARSE blk {i}: markdiff={len(dm)} lldiff={len(dl)} "
                      f"mldiff={len(dml)} miss={bool(np.asarray(miss)[i])}"
                      + (f" first@{dm[0]}" if len(dm) else ""))
        print("parse done")

    if "records" in stages:
        from lz4net_tpu.ops.records_kernel import records_to_state
        t0m, cidx, stats = records_to_state(
            jnp.asarray(comp), jnp.asarray(t_mark), jnp.asarray(t_ll),
            jnp.asarray(t_ml), jnp.asarray(cl), jnp.asarray(ol),
            jnp.asarray(np.zeros(B, np.int32)), C, Dt, 0)
        t0m, cidx, stats = map(np.asarray, (t0m, cidx, stats))
        for i in range(B):
            lim = out_lens[i]
            d1 = np.nonzero(t0m[i][:lim] != t_t0m[i][:lim])[0]
            d2 = np.nonzero(cidx[i][:lim] != t_cidx[i][:lim])[0]
            if len(d1) or len(d2) or stats[i, 5]:
                print(f"RECORDS blk {i}: t0mdiff={len(d1)} "
                      f"cidxdiff={len(d2)} miss={stats[i,5]} "
                      f"cover={stats[i,6]} nmiss1={stats[i,7]}"
                      + (f" first_t0m@{d1[0]}" if len(d1) else "")
                      + (f" first_cidx@{d2[0]}" if len(d2) else ""))
        print("records done")

    if "literal" in stages:
        import jax
        from lz4net_tpu.ops import fused_gather as fg
        o = np.arange(Dt)[None, :]
        is_lit = t_cidx >= 0
        lit_idx_t = np.maximum.accumulate(
            np.where(is_lit, np.clip(t_cidx, 0, C - 1), 0), axis=1)

        @jax.jit
        def run(comp, lit_idx):
            return fg.rowbase_gather((comp,), lit_idx, 8, (8,))

        (vals0,), band_l = run(jnp.asarray(comp),
                               jnp.asarray(lit_idx_t.astype(np.int32)))
        vals0, band_l = np.asarray(vals0), np.asarray(band_l)
        for i in range(B):
            lim = out_lens[i]
            sel = is_lit[i][:lim]
            want = comp[i][t_cidx[i][:lim][sel]]
            got = vals0[i][:lim][sel] & 0xFF
            d = np.nonzero(got != want)[0]
            nb = np.sum(~band_l[i][:lim][sel])
            if len(d) or nb:
                where = np.nonzero(sel)[0][d[:3]] if len(d) else []
                print(f"LITERAL blk {i}: diffs={len(d)} nband={nb} "
                      f"at={list(where)}")
        print("literal done")

    if "resolve" in stages:
        from lz4net_tpu.ops.resolve_kernel import resolve_wavefront
        out, res_ok = resolve_wavefront(jnp.asarray(t_T0), start_chunk=0)
        out, res_ok = np.asarray(out), np.asarray(res_ok)
        for i in range(B):
            lim = out_lens[i]
            truth = np.frombuffer(blocks[i], np.uint8).astype(np.int32)
            d = np.nonzero(out[i][:lim] != truth)[0]
            if len(d) or not res_ok[i]:
                print(f"RESOLVE blk {i}: diffs={len(d)} ok={res_ok[i]}"
                      + (f" first@{d[0]}" if len(d) else ""))
        print("resolve done")


if __name__ == "__main__":
    main()
