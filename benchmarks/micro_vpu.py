"""Calibrate achievable VPU f32 elementwise throughput on this chip.

The roofline analysis in docs/DESIGN.md needs one measured constant: how many
f32 elementwise VPU ops/s a Pallas kernel actually sustains. This micro
iterates the quadratic map x = a - x*x (2 f32 ops/element/iteration) on a
VMEM-resident block via fori_loop, at two iteration counts -- the slope
between them isolates compute throughput from per-launch overhead.

Measurement lessons baked in (2026-08-19, all on-chip):
  * an affine recurrence x = x*a + b with loop-invariant (a, b) gets
    reassociated/strength-reduced by the compiler (reported 21-39 "Tops/s",
    5-10x the architectural peak: the ops never ran). The quadratic map has
    no closed form a compiler can exploit.
  * block_until_ready returns early through the axon remote tunnel; the
    only reliable fence is a host readback of one scalar (bench.py force()).
  * single-launch times include ~ms-scale tunnel/launch overhead, so
    throughput must come from the L-slope, not one absolute time.

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
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        a = x * 0.0000001 + 1.62

        def body(_, xc):
            return a - xc * xc

        o_ref[...] = jax.lax.fori_loop(0, l_iters, body, x)

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


def _time_chain(run, x, reps):
    float(run(x)[0, 0])  # compile + warm (scalar readback = reliable fence)
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = run(y)
    float(y[0, 0])
    return (time.perf_counter() - t0) / reps


def main():
    interpret = jax.default_backend() == "cpu"
    n0, n1 = 512, 1024
    l_lo, l_hi = 2048, 16384
    reps = 8 if not interpret else 1
    if interpret:
        l_lo, l_hi = 8, 64
    x = jnp.ones((n0, n1), jnp.float32) * 0.5

    dt_lo = _time_chain(make_kernel(l_lo, interpret), x, reps)
    dt_hi = _time_chain(make_kernel(l_hi, interpret), x, reps)
    # Slope: extra ops per extra second, with launch overhead cancelled.
    d_ops = 2.0 * n0 * n1 * (l_hi - l_lo)
    tops = d_ops / max(dt_hi - dt_lo, 1e-9) / 1e12
    overhead_us = max(dt_lo - dt_hi * (l_lo / l_hi), 0.0) * 1e6
    print(f"pallas quad map: L={l_lo} {dt_lo * 1e6:.1f} us/call, "
          f"L={l_hi} {dt_hi * 1e6:.1f} us/call -> "
          f"{tops:.3f} sustained f32 Tops/s (slope), "
          f"~{overhead_us:.0f} us launch overhead "
          f"(block {n0}x{n1})", flush=True)

    # XLA (non-Pallas) comparison point: the same map under plain jit.
    def make_xla(l_iters):
        @jax.jit
        def xla_chain(x):
            a = x * 0.0000001 + 1.62

            def body(_, xc):
                return a - xc * xc

            return jax.lax.fori_loop(0, l_iters, body, x)

        return xla_chain

    dt_lo = _time_chain(make_xla(l_lo), x, reps)
    dt_hi = _time_chain(make_xla(l_hi), x, reps)
    tops = d_ops / max(dt_hi - dt_lo, 1e-9) / 1e12
    print(f"xla quad map:    L={l_lo} {dt_lo * 1e6:.1f} us/call, "
          f"L={l_hi} {dt_hi * 1e6:.1f} us/call -> "
          f"{tops:.3f} sustained f32 Tops/s (slope)", flush=True)


if __name__ == "__main__":
    main()
