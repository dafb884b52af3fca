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


def _gather_sel_banded(tbl, idx, B, R):
    """Cross-block batched select-loop gather.  tbl/idx are [B*R, LANE]
    banded flat tables (band b = block b's R rows); idx holds band-LOCAL
    flat positions (< R*128).  out[b*R+k, l] = tbl[b*R + idx>>7, idx&127].
    R select rounds over ALL blocks at once: per-round data is a [B, 128]
    row slice broadcast across sublanes (no jnp.repeat — the broadcast is
    a native sublane splat), so the op size grows B-fold while the round
    count stays R."""
    KRb = idx.shape[0] // B
    row = idx >> 7
    lane = idx & (LANE - 1)
    t3 = tbl.reshape(B, R, LANE)
    acc = jnp.zeros_like(idx)
    for r in range(R):
        bc = jnp.broadcast_to(t3[:, r:r + 1, :],
                              (B, KRb, LANE)).reshape(B * KRb, LANE)
        vals = jnp.take_along_axis(bc, lane, axis=-1)
        acc = jnp.where(row == r, vals, acc)
    return acc


def _pack_chunk_banded(res, B):
    """Banded twin of _pack_chunk: res [B*CR, LANE] byte rows ->
    [B*(CR//4), LANE] packed words, per band.  The strided 4k+r row
    selection is a single CR-round select loop instead of a one-hot
    matmul (no block-diagonal one-hot needed)."""
    CRl = res.shape[0] // B
    KR = CRl // 4
    r3 = res.reshape(B, CRl, LANE)
    k_id = jax.lax.broadcasted_iota(jnp.int32, (B * KR, LANE), 0) % KR
    grps = [jnp.zeros((B * KR, LANE), jnp.int32) for _ in range(4)]
    for rr in range(CRl):
        bc = jnp.broadcast_to(r3[:, rr:rr + 1, :],
                              (B, KR, LANE)).reshape(B * KR, LANE)
        sel = k_id == (rr >> 2)
        g = rr & 3
        grps[g] = jnp.where(sel, bc, grps[g])
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B * KR, LANE), 1)
    word = jnp.zeros((B * KR, LANE), jnp.int32)
    for r in range(4):
        for byte in range(4):
            src_lane = (4 * lanes + byte) & (LANE - 1)
            vals = jnp.take_along_axis(grps[r], src_lane, axis=-1)
            word = jnp.where((lanes >> 5) == r,
                             word | (vals << (8 * byte)), word)
    return word


def make_flat_kernel(B, nchunks, rows):
    """All B blocks resolved in ONE grid step: every select round's op
    covers [B*64, 128] instead of [64, 128], amortising per-op issue
    overhead B-fold (PROFILE_r04 orientation rule)."""
    PKR = rows // 4

    def kern(t0_ref, out_ref, ok_ref, pk_scr):
        i_iota = jax.lax.broadcasted_iota(jnp.int32, (B * CR, LANE), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (B * CR, LANE), 1)
        kloc = (i_iota % CR) * LANE + l_iota     # band-local position

        def body(j, ok):
            t0 = t0_ref[:, pl.ds(j * CR, CR), :].reshape(B * CR, LANE)
            lo = j * CH
            pend = (t0 < VFLAG) & (t0 >= lo)
            n = jnp.where(pend, jnp.clip(t0 - lo, 0, CH - 1), kloc)

            for _ in range(6):
                n = _gather_sel_banded(n, n, B, CR)

            def d_cond(st):
                n, n2, r = st
                return jnp.any(n2 != n) & (r < 13)

            def d_body(st):
                _, n, r = st
                n1 = _gather_sel_banded(n, n, B, CR)
                return n, _gather_sel_banded(n1, n1, B, CR), r + 2

            _, n, _ = jax.lax.while_loop(
                d_cond, d_body,
                (n, _gather_sel_banded(n, n, B, CR), jnp.int32(7)))

            t = _gather_sel_banded(t0, n, B, CR)
            tc = jnp.clip(t, 0, jnp.maximum(lo - 1, 0))
            pk = pk_scr[:, :, :].reshape(B * PKR, LANE)
            w = _gather_sel_banded(pk, tc >> 2, B, PKR)
            cv = (w >> (8 * (tc & 3))) & 0xFF
            res = jnp.where(t >= VFLAG, t - VFLAG, cv) & 0xFF
            out_ref[:, pl.ds(j * CR, CR), :] = res.reshape(B, CR, LANE)
            pk_scr[:, pl.ds(j * (CR // 4), CR // 4), :] = \
                _pack_chunk_banded(res, B).reshape(B, CR // 4, LANE)
            return ok

        ok = jax.lax.fori_loop(0, nchunks, body, jnp.int32(1))
        for b in range(B):
            ok_ref[b, 0] = ok
    return kern


@functools.partial(jax.jit, static_argnames=())
def resolve_flat(t0):
    B, Dt = t0.shape
    nchunks = Dt // CH
    rows = Dt // LANE
    kern = make_flat_kernel(B, nchunks, rows)
    out, okk = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, rows, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        grid=(1,),
        in_specs=[pl.BlockSpec((B, rows, LANE), lambda _: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((B, rows, LANE), lambda _: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B, 1), lambda _: (0, 0),
                                memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((B, rows // 4, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024),
        interpret=_interpret(),
    )(t0.reshape(B, rows, LANE))
    return out.reshape(B, Dt), okk[:, 0]


# (the staircase variant was PROMOTED to production in round 4;
# "stair" now dispatches to ops/resolve_kernel.resolve_wavefront
# so this tool cannot silently diverge from the shipped kernel)


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

    if variant in ("base", "stair"):     # stair == production now
        fn = lambda: resolve_wavefront(t0d, start_chunk=0)[0]
    elif variant == "flat":
        fn = lambda: resolve_flat(t0d)[0]
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
    # tunnel-latency noise: take the best of 3 dispatch-differenced
    # estimates with a wider iteration spread
    ests = []
    for _ in range(3):
        ta, tb = run(2), run(22)
        ests.append((tb - ta) / 20)
    per = max(min(ests), 1e-6)
    mb = B * 64 * 1024 / 1e6
    print(f"{variant}: {per * 1e3:.3f} ms  correct={B - bad}/{B}  "
          f"({mb / 1e3 / per:.3f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
