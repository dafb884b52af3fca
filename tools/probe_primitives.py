#!/usr/bin/env python
"""Microbenchmarks for candidate gather/shuffle primitives on this chip.

The decode pipeline's cost model is set by one number: gathered elements
per second.  Round 1 established ~0.08 Gelem/s for XLA's scalarized
gather and ~1 Gelem/s for HBM-staged one-hot matmuls (banded.py).  This
probe measures what a *fused Pallas kernel* can do, plus whether Mosaic
exposes a hardware shuffle (take_along_axis / dynamic_gather / roll with
a traced shift) on this v5e.

Run:  python tools/probe_primitives.py [probe ...]
Each probe prints one JSON line; failures print {"probe": ..., "error"}.
"""
import functools
import json
import sys
import time

import numpy as np


def timeit(fn, iters=20):
    import jax
    fn()  # compile
    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        return time.perf_counter() - t0
    run(2)
    ta, tb = run(2), run(2 + iters)
    return (tb - ta) / iters


def probe(name):
    def deco(f):
        PROBES[name] = f
        return f
    return deco


PROBES = {}


# --- 1. per-lane gather along sublanes: dst[i,l] = src[idx[i,l], l] ------

@probe("xla_take_sublane")
def _xla_take_sublane():
    """take_along_axis over axis 0 of [N, 128] per-lane tables (plain XLA)."""
    import jax
    import jax.numpy as jnp
    N, K, L = 512, 4096, 512
    src = jnp.asarray(np.random.randint(0, 256, (N, L), np.int32))
    idx = jnp.asarray(np.random.randint(0, N, (K, L), np.int32))
    f = jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=0))
    per = timeit(lambda: f(src, idx))
    return {"gelem_s": K * L / per / 1e9, "ms": per * 1e3}


@probe("pallas_take_sublane")
def _pallas_take_sublane():
    """Same gather inside a Pallas kernel (does Mosaic lower it? rate?)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N, K, L = 512, 4096, 512

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    @jax.jit
    def f(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    src = jnp.asarray(np.random.randint(0, 256, (N, L), np.int32))
    idx = jnp.asarray(np.random.randint(0, N, (K, L), np.int32))
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
    got = np.asarray(f(src, idx))
    assert (got == ref).all(), "WRONG RESULT"
    per = timeit(lambda: f(src, idx))
    return {"gelem_s": K * L / per / 1e9, "ms": per * 1e3}


@probe("pallas_take_lane")
def _pallas_take_lane():
    """Lane-axis gather inside Pallas: dst[i,l] = src[i, idx[i,l]]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R, L = 4096, 128

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    @jax.jit
    def f(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    src = jnp.asarray(np.random.randint(0, 256, (R, L), np.int32))
    idx = jnp.asarray(np.random.randint(0, L, (R, L), np.int32))
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    got = np.asarray(f(src, idx))
    assert (got == ref).all(), "WRONG RESULT"
    per = timeit(lambda: f(src, idx))
    return {"gelem_s": R * L / per / 1e9, "ms": per * 1e3}


@probe("pallas_gather2d")
def _pallas_gather2d():
    """Full 2D gather in Pallas: dst[k] = src.reshape(-1)[idx[k]] via
    (row, lane) split: sublane gather then lane gather."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N, K = 65536, 65536          # table bytes, gathered elements
    R, L = N // 128, 128
    KR = K // 128

    def kernel(s_ref, i_ref, o_ref):
        idx = i_ref[:]
        row = idx >> 7
        lane = idx & 127
        rows = jnp.take_along_axis(s_ref[:], row, axis=0)   # [KR,128] rows?
        o_ref[:] = jnp.take_along_axis(rows, lane, axis=1)

    @jax.jit
    def f(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((KR, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    # NOTE: this treats src as [R, L] and needs dst[i,l] = src[row[i,l],
    # lane[i,l]] — the sublane gather gives src[row[i,l], l], wrong lane.
    # Correct 2-level: gather rows by row index (sublane), then *diagonal*
    # lane gather.  Only valid if take_along_axis(axis=0) then (axis=1)
    # compose — they do: rows[i,l] = src[row[i,l], l]; out[i,l] =
    # rows[i, lane[i,l]] = src[row[i, lane[i,l]], lane[i,l]].  So feed
    # row' = take_along_axis(row, lane) pre-swizzled... here we just time
    # the two gathers; correctness of composition is checked numerically
    # with row precomputed as row[i,l] = true_row[i, lane[i,l]].
    src = np.random.randint(0, 256, (R, L), np.int32)
    flat_idx = np.random.randint(0, N, (KR, L), np.int32)
    lane = flat_idx & 127
    true_row = flat_idx >> 7
    row_sw = np.take_along_axis(true_row, lane, axis=1)  # pre-swizzle...
    # kernel computes: rows[i,l] = src[row_sw[i,l], l]; out[i,l] =
    # rows[i, lane[i,l]] = src[row_sw[i,lane], lane].  row_sw[i,lane] =
    # true_row[i, lane[i, lane[i,l]]]... not equal.  Skip exactness here:
    # this probe only measures the RATE of two chained gathers.
    got = f(jnp.asarray(src), jnp.asarray(flat_idx))
    np.asarray(got)
    per = timeit(lambda: f(jnp.asarray(src), jnp.asarray(flat_idx)))
    return {"gelem_s": K / per / 1e9, "ms": per * 1e3, "note": "rate only"}


@probe("pallas_roll_dynamic")
def _pallas_roll_dynamic():
    """pltpu.roll with a traced (non-static) shift."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 1)

    @jax.jit
    def f(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    x = jnp.asarray(np.arange(1024, dtype=np.int32).reshape(8, 128))
    s = jnp.asarray(np.array([5], np.int32))
    got = np.asarray(f(x, s))
    ref = np.roll(np.asarray(x), -5, axis=1)
    ok = (got == ref).all() or (got == np.roll(np.asarray(x), 5, axis=1)).all()
    per = timeit(lambda: f(x, s))
    return {"works": bool(ok), "us": per * 1e6}


@probe("pallas_onehot_matmul")
def _pallas_onehot_matmul():
    """Fused one-hot matmul gather in Pallas: K elems from an N-table."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N, K, CH = 2048, 65536, 512   # window width, total elems, chunk

    def kernel(t_ref, i_ref, o_ref):
        tbl = t_ref[:].astype(jnp.bfloat16)       # [N//128, 128] -> flat
        tbl2 = tbl.reshape(N // 128, 128)
        def body(c, _):
            idx = i_ref[pl.ds(c * CH, CH), :]     # [CH, 1]? keep [CH,128]
            return _
        # simpler: single shot over [K//128, 128] idx with N-wide one-hot
        idx = i_ref[:]                             # [K//128, 128]
        hi = idx >> 7
        lo = idx & 127
        oh_hi = (hi[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, hi.shape + (N // 128,), 2)).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            oh_hi.reshape(-1, N // 128), tbl2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [K, 128]
        rows = rows.reshape(idx.shape + (128,))
        oh_lo = (lo[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, lo.shape + (128,), 2)).astype(jnp.float32)
        o_ref[:] = jnp.sum(rows * oh_lo, axis=-1).astype(jnp.int32)

    @jax.jit
    def f(tbl, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K // 128, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    tbl = np.random.randint(0, 256, (N // 128, 128), np.int32)
    idx = np.random.randint(0, N, (K // 128, 128), np.int32)
    got = np.asarray(f(jnp.asarray(tbl), jnp.asarray(idx)))
    ref = tbl.reshape(-1)[idx]
    assert (got == ref).all(), "WRONG RESULT"
    per = timeit(lambda: f(jnp.asarray(tbl), jnp.asarray(idx)))
    return {"gelem_s": K / per / 1e9, "ms": per * 1e3}


@probe("xla_sort_1m")
def _xla_sort_1m():
    """lax.sort of [16, 65536] int32 (P3/P6 cost anchor)."""
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(np.random.randint(0, 1 << 30, (16, 65536), np.int32))
    f = jax.jit(lambda v: jax.lax.sort(v, dimension=-1))
    per = timeit(lambda: f(x))
    return {"ms": per * 1e3, "melem_s": 16 * 65536 / per / 1e6}


@probe("xla_cumsum_1m")
def _xla_cumsum_1m():
    import jax
    import jax.numpy as jnp
    x = jnp.asarray(np.random.randint(0, 100, (16, 73728), np.int32))
    f = jax.jit(lambda v: jnp.cumsum(v, axis=-1))
    per = timeit(lambda: f(x))
    return {"ms": per * 1e3, "melem_s": 16 * 73728 / per / 1e6}


@probe("pallas_dma_seq")
def _pallas_dma_seq():
    """Rate of small in-kernel VMEM->VMEM dynamic-slice copies (per-seq
    copy candidate): 4096 copies of 16 bytes at dynamic offsets."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    NSEQ = 4096

    def kernel(src_ref, off_ref, o_ref):
        def body(i, _):
            o = off_ref[i]
            o_ref[pl.ds(i, 1), :] = src_ref[pl.ds(o, 1), :]
            return _
        jax.lax.fori_loop(0, NSEQ, body, 0)

    @jax.jit
    def f(src, off):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NSEQ, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, off)

    src = jnp.asarray(np.random.randint(0, 256, (512, 128), np.int32))
    off = jnp.asarray(np.random.randint(0, 512, (NSEQ,), np.int32))
    np.asarray(f(src, off))
    per = timeit(lambda: f(src, off))
    return {"us_per_copy": per / NSEQ * 1e6, "ms": per * 1e3}


def main():
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        t0 = time.time()
        try:
            r = PROBES[name]()
            r["probe"] = name
        except Exception as exc:  # noqa: BLE001
            r = {"probe": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
