"""Microbench: DIA SpMV variants on real TPU.

Variants:
  roll  — production round-1 path: sum_k data_k * roll(x, -lin_k)
  pallas — fused windowed-DMA kernel (ops/pallas/dia_kernel)

Method per docs/DESIGN.md: chain ITERS applications inside ONE jit, pass the
operator as a jit ARGUMENT (closure capture bakes it in as constants — the
tunneled remote compiler rejects the program body at 256^3), sync on the
result.

Findings log (TPU v5e):
  - padded-x static-slice variant removed: 190 ms at 128^3/7-off — misaligned
    full-length slices do not fuse and are element-serial-class. Rolls win.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def make_problem(dims, n_off, seed=0):
    n = int(np.prod(dims))
    if n_off == 7:
        offs = [(0, 0, 0), (0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
                (1, 0, 0), (-1, 0, 0)]
    else:
        offs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
                for c in (-1, 0, 1)][:n_off]
    strides = (dims[1] * dims[2], dims[2], 1)
    lins = tuple(int(np.dot(o, strides)) for o in offs)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    data = jax.random.normal(k1, (len(offs), n), jnp.float32)
    x = jax.random.normal(k2, (n,), jnp.float32)
    return data, lins, x


def bench(f, data, x, label):
    # sync by pulling a 4-byte scalar to host: on the tunneled axon platform
    # block_until_ready returns before remote execution finishes
    s = float(f(data, x))
    t0 = time.perf_counter()
    s = float(f(data, x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {label:8s}: {dt*1e3:8.3f} ms/spmv   (sync={s:.3e})", flush=True)
    return dt


def roll_step(data, lins, x):
    y = None
    for k, o in enumerate(lins):
        t = data[k] * (x if o == 0 else jnp.roll(x, -o))
        y = t if y is None else y + t
    return y


def main():
    from functools import partial

    from raptor_tpu.ops.pallas.dia_kernel import dia_spmv_pallas_v2 as dia_spmv_pallas

    dev = jax.devices()[0]
    print("device:", dev, dev.platform, flush=True)
    cases = [
        ((128, 128, 128), 7),
        ((128, 128, 128), 27),
        ((256, 256, 256), 7),
        ((128, 256, 256), 15),   # level-1 shape of the 256^3 hierarchy
        ((64, 128, 256), 27),    # level-3-ish shape
        ((256, 256, 256), 27),
    ]
    for dims, n_off in cases:
        data, lins, x = make_problem(dims, n_off)

        @partial(jax.jit, static_argnames=())
        def roll_fn(data, x0, lins=lins):
            def step(i, x):
                y = roll_step(data, lins, x)
                return y / jnp.max(jnp.abs(y))
            return jnp.vdot(x0, jax.lax.fori_loop(0, ITERS, step, x0))

        @partial(jax.jit, static_argnames=())
        def pallas_fn(data, x0, lins=lins):
            def step(i, x):
                y = dia_spmv_pallas(data, lins, x)
                return y / jnp.max(jnp.abs(y))
            return jnp.vdot(x0, jax.lax.fori_loop(0, ITERS, step, x0))

        print(f"dims={dims} n_off={n_off}", flush=True)
        try:
            bench(roll_fn, data, x, "roll")
        except Exception as e:
            print(f"  roll    : FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        try:
            bench(pallas_fn, data, x, "pallas")
        except Exception as e:
            print(f"  pallas  : FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
