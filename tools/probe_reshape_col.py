"""Probe: does current Mosaic lower jnp.reshape between a ray-major
(TR, S) matrix and a per-sample (TR*S, 1) column — BOTH directions?

Round-1 notes (fused_render.py header) record matrix->column as
unsupported, which forced the O(TB*S) one-hot select-sum `to_col` and kept
the compositing scans on (TB,1) columns (1/128 lane efficiency). If the
direction works on current Mosaic, the whole composite can go lane-major
(TR, S) and the scans become trivial.

Run on TPU: python tools/probe_reshape_col.py
"""

import sys

sys.path.insert(0, ".")
from nerf_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import functools  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TR, S = 8, 256
TB = TR * S


def k_mat2col(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(TB, 1)


def k_col2mat(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(TR, S)


def k_roundtrip(x_ref, o_ref):
    col = x_ref[:].reshape(TB, 1)
    o_ref[:] = (col * 2.0).reshape(TR, S)


def run(kernel, in_shape, out_shape):
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(in_shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    x = np.arange(np.prod(in_shape), dtype=np.float32).reshape(in_shape)
    return f(x), x


for name, kern, ishape, oshape in [
    ("mat->col", k_mat2col, (TR, S), (TB, 1)),
    ("col->mat", k_col2mat, (TB, 1), (TR, S)),
    ("roundtrip*2", k_roundtrip, (TR, S), (TR, S)),
]:
    try:
        out, x = run(kern, ishape, oshape)
        expect = x.reshape(oshape) * (2.0 if name == "roundtrip*2" else 1.0)
        ok = np.allclose(np.asarray(out), expect)
        print(f"{name}: {'OK exact' if ok else 'LOWERED BUT WRONG'}")
    except Exception as e:
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})")
