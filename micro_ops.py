#!/usr/bin/env python3
"""Microbenchmark Mosaic primitive op costs on the attached TPU.

Each kernel runs OP_REPS dependent applications of one primitive over a
(GRID,) grid to swamp launch overhead; reported number is ns per
primitive application (on the stated shape).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 2048
OP_REPS = 64


def bench(name, kernel, out_shape, *inputs, reps=OP_REPS, grid=GRID):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(x.shape,
                               (lambda nd: lambda i: (0,) * nd)(x.ndim),
                               memory_space=pltpu.VMEM) for x in inputs],
        out_specs=pl.BlockSpec(out_shape,
                               lambda i: tuple(0 for _ in out_shape),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    out = f(*inputs)
    out.block_until_ready()
    n = 3
    ts = []
    for _ in range(n):
        t0 = time.time()
        f(*inputs).block_until_ready()
        ts.append(time.time() - t0)
    t = min(ts)
    ns = t / (grid * reps) * 1e9
    print(f"{name:44s} {ns:8.2f} ns/op")
    return ns


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.random((8, 128), np.float32))
    a64 = jnp.asarray(rng.random((64, 128), np.float32))
    a128 = jnp.asarray(rng.random((128, 128), np.float32))
    idx8 = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    idx64 = jnp.asarray(rng.integers(0, 128, (64, 128)), jnp.int32)
    ridx8 = jnp.asarray(rng.integers(0, 8, (8, 128)), jnp.int32)
    ridx64 = jnp.asarray(rng.integers(0, 64, (8, 128)), jnp.int32)

    def k_mul(a_ref, o_ref):
        x = a_ref[...]
        for _ in range(OP_REPS):
            x = x * 1.0001
        o_ref[...] = x

    bench("mul (8,128)", k_mul, (8, 128), a8)
    bench("mul (64,128)", k_mul, (64, 128), a64)

    def k_gather_lane8(a_ref, i_ref, o_ref):
        x = a_ref[...]
        i = i_ref[...]
        for _ in range(OP_REPS):
            x = jnp.take_along_axis(x, i, axis=1) + 0.5
        o_ref[...] = x

    bench("lane-gather axis1 (8,128)", k_gather_lane8, (8, 128), a8, idx8)

    def k_gather_lane64(a_ref, i_ref, o_ref):
        x = a_ref[...]
        i = i_ref[...]
        for _ in range(OP_REPS):
            x = jnp.take_along_axis(x, i, axis=1) + 0.5
        o_ref[...] = x

    bench("lane-gather axis1 (64,128)", k_gather_lane64, (64, 128),
          a64, idx64)

    def k_gather_sub8(a_ref, i_ref, o_ref):
        x = a_ref[...]
        i = i_ref[...]
        acc = jnp.zeros((8, 128), jnp.float32)
        for _ in range(OP_REPS):
            acc = acc + jnp.take_along_axis(x, i, axis=0)
        o_ref[...] = acc

    bench("sublane-gather axis0 (8,128)<-8", k_gather_sub8, (8, 128),
          a8, ridx8)



    def k_where(a_ref, i_ref, o_ref):
        x = a_ref[...]
        i = i_ref[...]
        for r in range(OP_REPS):
            x = jnp.where(i == r, x, x * 1.0001)
        o_ref[...] = x

    bench("where (8,128)", k_where, (8, 128), a8, ridx8)

    def k_concat(a_ref, o_ref):
        x = a_ref[...]
        acc = jnp.zeros((64, 128), jnp.float32)
        for _ in range(OP_REPS // 8):
            acc = acc + jnp.concatenate([x] * 8, axis=0)
        o_ref[...] = acc

    bench("concat 8x(8,128)->(64,128) [/8 reps]", k_concat, (64, 128),
          a8, reps=OP_REPS // 8 * 8)

    def k_mxu(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(OP_REPS):
            x = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        o_ref[...] = x

    bench("matmul (64,128)@(128,128) f32-default", k_mxu, (64, 128),
          a64, a128)

    def k_mxu8(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(OP_REPS):
            x = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        o_ref[...] = x

    bench("matmul (8,128)@(128,128) f32-default", k_mxu8, (8, 128),
          a8, a128)

    def k_dyn_roll(a_ref, i_ref, o_ref):
        x = a_ref[...]
        i = i_ref[...]
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in range(OP_REPS):
            acc = acc + pltpu.roll(x, i[0, 0], axis=1)
        o_ref[...] = acc

    try:
        bench("dynamic lane-roll (8,128)", k_dyn_roll, (8, 128), a8, ridx8)
    except Exception as e:
        print(f"dynamic lane-roll: unsupported ({type(e).__name__})")

    # --- control flow overheads ---
    def k_fori(a_ref, o_ref):
        x = a_ref[...]

        def body(i, acc):
            return acc + 1.0

        o_ref[...] = jax.lax.fori_loop(0, OP_REPS, body, x)

    bench("fori_loop iteration (trivial body)", k_fori, (8, 128), a8)

    def k_when(a_ref, o_ref):
        o_ref[...] = a_ref[...]
        for r in range(OP_REPS):
            @pl.when(pl.program_id(0) >= 0)
            def _():
                o_ref[...] += 1.0

    bench("pl.when + vmem rmw (8,128)", k_when, (8, 128), a8)

    def k_dynslice(a_ref, i_ref, o_ref):
        x = a_ref
        i = i_ref[0, 0]
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in range(OP_REPS):
            acc = acc + x[pl.ds(((i + r) % 8) * 8, 8), :]
        o_ref[...] = acc

    bench("dynamic-slice rows (8,128)<-(64,128)", k_dynslice, (8, 128),
          a64, ridx8)

    # composite: one chunk_body-equivalent (3ch, 4 taps h+v, group=8)
    win = jnp.asarray(rng.random((3, 8, 128), np.float32))
    relb = jnp.asarray(rng.integers(0, 128, (4, 64, 128)), jnp.int32)
    wfb = jnp.asarray(rng.random((4, 64, 128), np.float32))
    ry = jnp.asarray(rng.integers(0, 8, (4, 8, 8, 128)), jnp.int32)
    wv = jnp.asarray(rng.random((4, 8, 8, 128), np.float32))

    def k_chunk(w_ref, rb_ref, wf_ref, ry_ref, wv_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for rep in range(OP_REPS // 16):
            for c in range(3):
                blk = w_ref[c]
                rep8 = jnp.concatenate([blk] * 8, axis=0)
                ih = None
                for k in range(4):
                    term = jnp.take_along_axis(rep8, rb_ref[k], axis=1) \
                        * wf_ref[k]
                    ih = term if ih is None else ih + term
                adds = []
                for r in range(8):
                    ih_r = ih[r * 8:(r + 1) * 8, :]
                    add = None
                    for m in range(4):
                        gv = jnp.take_along_axis(
                            ih_r, ry_ref[m, r], axis=0)[0:1, :]
                        term = gv * wv_ref[m, r][0:1, :]
                        add = term if add is None else add + term
                    adds.append(add)
                acc = acc + jnp.concatenate(adds, axis=0)
        o_ref[...] = acc

    ns = bench("chunk_body composite (3ch)", k_chunk, (8, 128),
               win, relb, wfb, ry, wv, reps=OP_REPS // 16, grid=256)
    print(f"  -> per chunk-body: {ns:.0f} ns")


if __name__ == "__main__":
    sys.exit(main())
