#!/usr/bin/env python
"""Probe: can the wide-warp kernel gather 4-byte-packed lanes?

Three primitive questions for the quad-pack idea (pack BOTH horizontal
taps of TWO consecutive source rows into one 32-bit lane, halving the
candidate-loop gather count of ops/warp_wide.py):

  1. does Mosaic lower a 2D 128-lane `take_along_axis` on int32?
  2. if not, does an f32 gather preserve arbitrary bit patterns
     (bitcast i32 -> f32, gather, bitcast back), including patterns
     that alias NaNs/denormals?
  3. do i32 shift/and/convert unpack ops lower inside the kernel?

Usage: python scripts/kexp_quadprobe.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 32, 128


def run(name, kernel, x, idx):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        out = np.asarray(jax.block_until_ready(out))
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, W, (H, W), dtype=np.int32)
    # Packed quads: 4 random bytes per lane, including NaN-aliasing
    # patterns (force some lanes to 0x7FC00000 / 0xFF800001 style).
    quads = rng.integers(0, 2**32, (H, W), dtype=np.uint64).astype(np.uint32)
    quads[0, :4] = [0x7FC00000, 0xFF800001, 0x7F800000, 0x00000001]
    qi32 = quads.astype(np.int64).astype(np.int32)  # two's complement view

    xi = jnp.asarray(qi32)
    xidx = jnp.asarray(idx)

    # --- probe 1: i32 gather, byte-0 extraction in-kernel
    def k_i32(x_ref, i_ref, o_ref):
        g = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)
        b0 = jnp.bitwise_and(g, 0xFF)
        o_ref[...] = b0.astype(jnp.float32)

    want_b0 = (quads & 0xFF).astype(np.float32)
    got = run("i32_gather", k_i32, xi, xidx)
    if got is not None:
        exp = np.take_along_axis(want_b0, idx, axis=1)
        print(f"i32_gather: ok={np.array_equal(got, exp)}")

    # --- probe 2: bitcast f32 gather preserves bits
    def k_bitcast(x_ref, i_ref, o_ref):
        xf = x_ref[...]
        g = jnp.take_along_axis(xf, i_ref[...], axis=1)
        gi = jax.lax.bitcast_convert_type(g, jnp.int32)
        o_ref[...] = jnp.bitwise_and(gi, 0xFF).astype(jnp.float32)

    xf32 = jnp.asarray(qi32).view(jnp.float32)
    got = run("f32_bitcast_gather", k_bitcast, xf32, xidx)
    if got is not None:
        exp = np.take_along_axis(want_b0, idx, axis=1)
        print(f"f32_bitcast_gather: ok={np.array_equal(got, exp)}")

    # --- probe 3: full 4-byte unpack from i32 gather
    def k_unpack(x_ref, i_ref, o_ref):
        g = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)
        b3 = jnp.bitwise_and(jax.lax.shift_right_logical(g, 24), 0xFF)
        b2 = jnp.bitwise_and(jax.lax.shift_right_logical(g, 16), 0xFF)
        b1 = jnp.bitwise_and(jax.lax.shift_right_logical(g, 8), 0xFF)
        b0 = jnp.bitwise_and(g, 0xFF)
        o_ref[...] = (b3 * 1000000 + b2 * 10000 + b1 * 100 + b0
                      ).astype(jnp.float32)

    got = run("i32_full_unpack", k_unpack, xi, xidx)
    if got is not None:
        q = np.take_along_axis(quads, idx, axis=1)
        exp = ((q >> 24) * 1000000 + ((q >> 16) & 0xFF) * 10000
               + ((q >> 8) & 0xFF) * 100 + (q & 0xFF)).astype(np.float32)
        print(f"i32_full_unpack: ok={np.array_equal(got, exp)}")


if __name__ == "__main__":
    main()
