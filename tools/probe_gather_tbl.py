#!/usr/bin/env python
"""Isolate _gather_tbl / resolve primitives on the real chip.

t1: resolve_wavefront on ALL-terminal state (out must equal the bytes;
    exercises only the identity-index path of _gather_tbl).
t2: bare pallas kernel calling _gather_tbl(tbl, idx, planes) vs numpy.
t3: same but idx == iota (identity gather).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lz4net_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

VFLAG = 1 << 19


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lz4net_tpu.ops.resolve_kernel import (_gather_tbl, _interpret,
                                               resolve_wavefront)

    which = sys.argv[1:] or ["t1", "t2", "t3"]
    rng = np.random.default_rng(0)

    if "t1" in which:
        B, Dt = 2, 73728
        byts = rng.integers(0, 256, (B, Dt), dtype=np.int32)
        T0 = VFLAG | byts
        out, ok = resolve_wavefront(jnp.asarray(T0), start_chunk=0)
        out = np.asarray(out)
        d = np.nonzero(out != byts)
        print(f"t1 all-terminal: diffs={len(d[0])} ok={np.asarray(ok)}",
              ("first@" + str((d[0][0], d[1][0])) if len(d[0]) else ""))

    for name, ident in (("t2", False), ("t3", True)):
        if name not in which:
            continue
        R, KR, planes = 64, 64, 2

        def kern(t_ref, i_ref, o_ref):
            o_ref[:, :] = _gather_tbl(t_ref[:, :], i_ref[:, :], planes)

        @jax.jit
        def f(tbl, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((KR, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=_interpret(),
            )(tbl, idx)

        tbl = rng.integers(0, 1 << (8 * planes), (R, 128), dtype=np.int32)
        if ident:
            idx = np.arange(R * 128, dtype=np.int32).reshape(KR, 128)
        else:
            idx = rng.integers(0, R * 128, (KR, 128), dtype=np.int32)
        got = np.asarray(f(jnp.asarray(tbl), jnp.asarray(idx)))
        ref = tbl.reshape(-1)[idx]
        d = np.nonzero(got != ref)
        print(f"{name} ident={ident}: diffs={len(d[0])}",
              ("first@" + str((d[0][0], d[1][0]))
               + f" got={got[d[0][0], d[1][0]]} want={ref[d[0][0], d[1][0]]}"
               if len(d[0]) else "OK"))


if __name__ == "__main__":
    main()
