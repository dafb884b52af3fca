#!/usr/bin/env python
"""Experimental resolver variants, timed on chip against truth T0.

Variants (sys.argv picks):
  base       : production resolve_wavefront
  nowhile    : 7 fixed doubling rounds, no convergence loop (flags deep)
  nocv       : skip the cross-chunk value gather (WRONG bytes; timing
               isolates its cost)
  unpack     : cross-chunk gather from the unpacked byte table
  nodouble   : single doubling round only (WRONG; isolates doubling)
  allinone   : no chunk loop; value-iteration over whole output

Usage: python tools/resolve_exp.py <variant> [B]
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
CH = 8192
CR = CH // LANE
VFLAG = 1 << 19


def _interpret():
    d = jax.devices()[0]
    return not ("TPU" in d.device_kind.upper() or d.platform == "tpu")


from lz4net_tpu.ops.resolve_kernel import _gather_tbl, _pack_chunk


def _gather_sel(tbl, idx):
    """Select-loop gather: out[k] = tbl[idx[k]] for tbl [R,128] int32,
    idx [KR,128].  R passes of broadcast-row lane shuffle; native int32
    (no planes, no MXU, no relayout)."""
    R = tbl.shape[0]
    row = idx >> 7
    acc = jnp.zeros_like(idx)
    for r in range(R):
        vals = jnp.take_along_axis(
            jnp.broadcast_to(tbl[r:r + 1, :], idx.shape), idx, axis=-1)
        acc = jnp.where(row == r, vals, acc)
    return acc


def make_kernel(variant, nchunks):
    def kern(t0_ref, out_ref, ok_ref, pk_scr):
        kloc = jax.lax.broadcasted_iota(jnp.int32, (CR, LANE), 0) * LANE \
            + jax.lax.broadcasted_iota(jnp.int32, (CR, LANE), 1)

        def body(j, ok):
            t0 = t0_ref[0, pl.ds(j * CR, CR), :]
            lo = j * CH
            pend = (t0 < VFLAG) & (t0 >= lo)
            n = jnp.where(pend, jnp.clip(t0 - lo, 0, CH - 1), kloc)
            if variant == "nodouble":
                n = _gather_tbl(n, n, 2)
            elif variant in ("selloop", "selloop2"):
                for _ in range(7):
                    n = _gather_sel(n, n)
            elif variant in ("nowhile", "nocv", "unpack"):
                for _ in range(7):
                    n = _gather_tbl(n, n, 2)
            t = (_gather_sel(t0, n) if variant in ("selloop", "selloop2")
                 else _gather_tbl(t0, n, 3))
            tc = jnp.clip(t, 0, jnp.maximum(lo - 1, 0))
            if variant == "nocv":
                cv = tc
            elif variant == "unpack":
                cv = _gather_tbl(out_ref[0], tc, 1)
            elif variant == "selloop2":
                w = _gather_sel(pk_scr[:, :], tc >> 2)
                cv = (w >> (8 * (tc & 3))) & 0xFF
            else:
                w = _gather_tbl(pk_scr[:, :], tc >> 2, 4)
                cv = (w >> (8 * (tc & 3))) & 0xFF
            res = jnp.where(t >= VFLAG, t - VFLAG, cv) & 0xFF
            out_ref[0, pl.ds(j * CR, CR), :] = res
            if variant not in ("nocv", "unpack"):
                pk_scr[pl.ds(j * (CR // 4), CR // 4), :] = _pack_chunk(res)
            return ok

        ok = jax.lax.fori_loop(0, nchunks, body, jnp.int32(1))
        ok_ref[pl.program_id(0), 0] = ok
    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def resolve_var(t0, variant):
    B, Dt = t0.shape
    nchunks = Dt // CH
    rows = Dt // LANE
    kern = make_kernel(variant, nchunks)
    out, okk = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, rows, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, rows, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, rows, LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B, 1), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((rows // 4, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(t0.reshape(B, rows, LANE))
    return out.reshape(B, Dt), okk[:, 0]


def main():
    from probe_stages import truth_parse, truth_state
    from lz4net_tpu.models import native
    from lz4net_tpu.ops.resolve_kernel import resolve_wavefront
    from lz4net_tpu.utils import corpus

    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    Dt = 73728
    data = corpus.silesia_like(B * 64 * 1024, seed=42)
    blocks = corpus.split_blocks(data, 64 * 1024)[:B]
    packed = [native.compress_block(b) for b in blocks]
    T0 = np.zeros((B, Dt), np.int32)
    for i, p in enumerate(packed):
        _, _, _, seqs = truth_parse(p, Dt)
        _, _, T0[i] = truth_state(blocks[i], seqs, Dt)
    t0d = jax.device_put(jnp.asarray(T0))

    if variant == "base":
        fn = lambda: resolve_wavefront(t0d, start_chunk=0)[0]
    else:
        fn = lambda: resolve_var(t0d, variant)[0]

    out = np.asarray(fn())
    bad = sum(1 for i, b in enumerate(blocks)
              if out[i, :len(b)].astype(np.uint8).tobytes() != b)
    def run(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(r)
        return time.perf_counter() - t0
    run(1)
    ta, tb = run(2), run(12)
    per = (tb - ta) / 10
    mb = B * 64 * 1024 / 1e6
    print(f"{variant}: {per * 1e3:.3f} ms  correct={B - bad}/{B}  "
          f"({mb / 1e3 / per:.3f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
