#!/usr/bin/env python
"""Robustness checks for Mosaic's in-kernel lane gather
(take_along_axis axis=-1) before the decode pipeline builds on it:
shapes (rows not multiple of 8, >1 lane tile?), index edge values,
int8/int16 tables, 3D batching, and out-of-range behaviour.
"""
import json
import sys
import time

import numpy as np


def lane_gather_kernel_factory(shape, dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=-1)

    @jax.jit
    def f(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
    return f


def check(shape, dtype=np.int32, lane_range=None):
    import jax.numpy as jnp
    L = shape[-1]
    lane_range = lane_range or L
    rng = np.random.default_rng(0)
    src = rng.integers(0, 200, shape).astype(dtype)
    idx = rng.integers(0, lane_range, shape).astype(np.int32)
    f = lane_gather_kernel_factory(shape, jnp.dtype(dtype))
    got = np.asarray(f(jnp.asarray(src), jnp.asarray(idx)))
    ref = np.take_along_axis(src, idx, axis=-1)
    return bool((got == ref).all())


def main():
    cases = [
        ("rows8_l128_i32", dict(shape=(8, 128))),
        ("rows512_l128_i32", dict(shape=(512, 128))),
        ("rows9_l128_i32", dict(shape=(9, 128))),
        ("l256_i32", dict(shape=(8, 256))),          # 2 lane tiles
        ("l512_i32", dict(shape=(64, 512))),
        ("3d_i32", dict(shape=(4, 64, 128))),
        ("rows8_l128_sub64", dict(shape=(8, 128), lane_range=64)),
        ("i8_table", dict(shape=(32, 128), dtype=np.int8)),
        ("i16_table", dict(shape=(16, 128), dtype=np.int16)),
    ]
    for name, kw in cases:
        t0 = time.time()
        try:
            ok = check(**kw)
            r = {"case": name, "ok": ok}
        except Exception as exc:  # noqa: BLE001
            r = {"case": name, "error": f"{type(exc).__name__}: {exc}"[:200]}
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)

    # out-of-range behaviour (don't assert, just report)
    import jax.numpy as jnp
    f = lane_gather_kernel_factory((8, 128), jnp.int32)
    src = np.arange(8 * 128, dtype=np.int32).reshape(8, 128)
    idx = np.full((8, 128), 127, np.int32)
    idx[0, 0] = 128
    idx[0, 1] = -1
    try:
        got = np.asarray(f(jnp.asarray(src), jnp.asarray(idx)))
        print(json.dumps({"case": "oob", "at128": int(got[0, 0]),
                          "atm1": int(got[0, 1]),
                          "expect127": int(src[0, 127])}), flush=True)
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"case": "oob",
                          "error": str(exc)[:160]}), flush=True)


if __name__ == "__main__":
    main()
