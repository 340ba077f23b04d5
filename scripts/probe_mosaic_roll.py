"""Probe Mosaic primitive support on the real chip (v5e, jax 0.9).

Each candidate micro-kernel is compiled + run standalone; prints ok/FAIL
with the Mosaic error. Informs the realign kernel design
(ops/pallas/realign.py): the pair-folded layout needs a ±1 roll on the
sublane dim (f32) or, failing that, extra kernel outputs combined in XLA.

  python scripts/probe_mosaic_roll.py
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, out_shape=None):
    out_shape = out_shape or jax.ShapeDtypeStruct(x.shape, x.dtype)
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        y = jax.jit(f)(x)
        jax.block_until_ready(y)
        print(f"{name}: ok")
        return np.asarray(y)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    print("device:", jax.devices()[0].device_kind)
    x32 = jnp.asarray(np.arange(256 * 256, dtype=np.float32).reshape(256, 256))
    x16 = x32.astype(jnp.bfloat16)
    x3 = jnp.asarray(
        np.arange(8 * 64 * 256, dtype=np.float32).reshape(8, 64, 256)
    )

    # 1. f32 sublane roll (2D, axis 0)
    y = run("f32 sublane roll 2d", lambda i, o: o.__setitem__(
        ..., pltpu.roll(i[...], 1, axis=0)), x32)
    if y is not None:
        ref = np.roll(np.asarray(x32), 1, axis=0)
        print("   values:", "exact" if (y == ref).all() else "WRONG")

    # 2. f32 lane roll (2D, axis 1)
    y = run("f32 lane roll 2d", lambda i, o: o.__setitem__(
        ..., pltpu.roll(i[...], 64, axis=1)), x32)
    if y is not None:
        ref = np.roll(np.asarray(x32), 64, axis=1)
        print("   values:", "exact" if (y == ref).all() else "WRONG")

    # 3. bf16 lane roll (expected FAIL per round-2 notes)
    run("bf16 lane roll 2d", lambda i, o: o.__setitem__(
        ..., pltpu.roll(i[...], 64, axis=1)), x16)

    # 4. bf16 sublane roll
    run("bf16 sublane roll 2d", lambda i, o: o.__setitem__(
        ..., pltpu.roll(i[...], 1, axis=0)), x16)

    # 5. 3D: roll on middle (sublane) dim, f32
    y = run("f32 sublane roll 3d", lambda i, o: o.__setitem__(
        ..., pltpu.roll(i[...], -1, axis=1)), x3)
    if y is not None:
        ref = np.roll(np.asarray(x3), -1, axis=1)
        print("   values:", "exact" if (y == ref).all() else "WRONG")

    # 6. 3D: outer-dim static slice (legal baseline)
    run("f32 outer slice 3d", lambda i, o: o.__setitem__(
        ..., i[1:8] + i[0:7]),
        x3, jax.ShapeDtypeStruct((7, 64, 256), jnp.float32))

    # 7. sublane static slice with offset 1 (expected FAIL, constraint 1)
    run("f32 sublane slice off1", lambda i, o: o.__setitem__(
        ..., i[:, 1:33, :]),
        x3, jax.ShapeDtypeStruct((8, 32, 256), jnp.float32))

    # 8. bf16 -> f32 convert in VMEM
    run("bf16->f32 convert", lambda i, o: o.__setitem__(
        ..., i[...].astype(jnp.float32) * 2.0),
        x16, jax.ShapeDtypeStruct((256, 256), jnp.float32))


if __name__ == "__main__":
    main()
