"""Calibrate achievable VPU f32 elementwise throughput on this chip.

The roofline analysis in docs/DESIGN.md needs one measured constant: how many
f32 elementwise VPU ops/s a Pallas kernel actually sustains (peak for a v5e
TensorCore is lanes*sublanes*ALUs*clock ~ 4096 * clock; DMA waits, selects,
and scan shifts eat into it). This micro runs a kernel with an EXACTLY known
op count -- L iterations of x = x * a + b on a (256, 256) f32 VMEM block,
2 ops/element/iteration, no HBM traffic inside the loop -- and reports
sustained Tops/s. Compare against the forward kernel's ops/(face,pixel)
estimate (DESIGN.md roofline section) to get its MFU.

Run on the chip via benchmarks/tpu_queue.sh; runs (slowly, meaninglessly) in
interpret mode on CPU -- numbers only matter on real hardware.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(l_iters: int, interpret: bool):
    # The chain must be algebraically IRREDUCIBLE. A first draft used the
    # affine recurrence x = x*a + b with loop-invariant (a, b); XLA's
    # simplifier reassociated/strength-reduced it and reported 21-29
    # "sustained Tops/s" -- 5-8x above the architectural VPU peak, i.e. the
    # ops were never executed (measured 2026-08-19, kept here as a warning).
    # The logistic-style quadratic map x = a - x*x has no closed form a
    # compiler can exploit; 2 f32 ops (mul + sub) per element per iteration.
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        a = x * 0.0000001 + 1.62
        for _ in range(l_iters):
            x = a - x * x
        o_ref[...] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x)

    return run


def main():
    interpret = jax.default_backend() == "cpu"
    n0, n1, l_iters, reps = 256, 256, 4096, 64
    x = jnp.ones((n0, n1), jnp.float32) * 0.5
    run = make_kernel(l_iters, interpret)
    # block_until_ready is unreliable under the axon remote tunnel (returns
    # before device execution completes -- the first drafts of this micro
    # reported 21-39 "Tops/s", 5-10x the architectural peak, because the
    # timed region never waited). A host readback of one scalar is the only
    # reliable fence, exactly as bench.py's force().
    float(run(x)[0, 0])
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = run(y)
    float(y[0, 0])
    dt = (time.perf_counter() - t0) / reps
    ops = 2.0 * n0 * n1 * l_iters  # 2 f32 ops (mul+add) per element per iter
    print(f"pallas fma chain: {dt * 1e6:.1f} us/call, "
          f"{ops / dt / 1e12:.3f} sustained f32 Tops/s "
          f"(block {n0}x{n1}, L={l_iters})")

    # XLA (non-Pallas) comparison point: the same chain under plain jit.
    @jax.jit
    def xla_chain(x):
        a = x * 0.0000001 + 1.62
        for _ in range(l_iters):
            x = a - x * x
        return x

    float(xla_chain(x)[0, 0])
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = xla_chain(y)
    float(y[0, 0])
    dt = (time.perf_counter() - t0) / reps
    print(f"xla fma chain:    {dt * 1e6:.1f} us/call, "
          f"{ops / dt / 1e12:.3f} sustained f32 Tops/s")


if __name__ == "__main__":
    main()
