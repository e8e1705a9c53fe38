#!/usr/bin/env python
"""Is jnp.exp inside a Mosaic kernel worth replacing with a polynomial?

Times three variants of an elementwise-chain kernel at the Gabor filter
shape: native jnp.exp, a bitcast-based fast exp2 polynomial, and a no-exp
control (to isolate the exp cost). Decides VERDICT item 6's fast-exp
question by measurement instead of assumption.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, REPS = 1024, 256, 32   # ~ one Gabor layer's filter eval, repeated


def _fast_exp(x):
    """exp(x) = 2^(x*log2 e): degree-5 poly on the fraction, exponent bits
    assembled by integer bitcast. Valid for |x| < ~87 (clamped)."""
    z = x * np.float32(1.4426950408889634)
    zf = jnp.floor(z)
    f = z - zf
    p = np.float32(1.0) + f * (np.float32(0.6931471805599453) + f * (
        np.float32(0.2401596780245049) + f * (np.float32(0.05582631641864478)
        + f * (np.float32(0.008989340273841543)
               + f * np.float32(0.001877576775046349)))))
    k = jnp.clip(zf, -126.0, 126.0).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((k + 127) << 23, jnp.float32)
    return p * scale


def _kernel(x_ref, o_ref, *, mode):
    x = x_ref[:]
    acc = jnp.zeros_like(x)
    for i in range(REPS):
        a = x * (-0.01 * (i + 1))
        if mode == "exp":
            acc += jnp.exp(a)
        elif mode == "fast":
            acc += _fast_exp(a)
        else:
            acc += a * a + a  # control: same loop, no exp
    o_ref[:] = acc


def build(mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((N, H), jnp.float32),
        in_specs=[pl.BlockSpec((N, H), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, H), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def main():
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 40, (N, H)),
                    jnp.float32)
    # correctness first
    got = np.asarray(build("fast")(x))
    want = np.asarray(build("exp")(x))
    rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-30))
    print(f"fast-exp max rel err vs native: {rel:.2e}")

    for mode in ("control", "exp", "fast"):
        fn = jax.jit(lambda v, m=mode: build(m)(v))
        r = fn(x)
        float(np.asarray(r[0, 0]))
        t0 = time.perf_counter()
        out = x
        for _ in range(50):
            out = fn(out * 0.999)  # chained
        float(np.asarray(out[0, 0]))
        dt = (time.perf_counter() - t0) / 50
        per = dt / (N * H * REPS) * 1e12
        print(f"{mode:8s}: {dt*1e6:8.1f} us/call  {per:6.2f} ps/elem-op")


if __name__ == "__main__":
    main()
