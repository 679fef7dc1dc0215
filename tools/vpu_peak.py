"""Measure the chip's sustained VPU throughput (u32 lane-ops/s).

The base-5 interleaved decoder is VPU-bound (docs/DESIGN.md SS4): its time
is ~2.3x the max of its HBM and MXU rooflines, so neither roofline can say
how close to "speed of light" it actually runs.  This tool measures the
missing denominator — sustained elementwise u32 vector throughput — with a
Pallas kernel that runs K independent-stream ALU ops per loaded element and
takes the SLOPE of device time over K (the intercept absorbs the fixed
load/store traffic, so the slope is pure ALU issue rate).

Four independent accumulator streams keep the VPU issue slots full (a
single dependent chain measures latency, not throughput); the op mix
(add / xor / shift / and) mirrors the decode kernel's.

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/vpu_peak.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cute_nucleotides_tpu.ops import pallas_kernels as pk
    from cute_nucleotides_tpu.utils import profiling

    rows, cols = 4096, 1024  # 16 MiB of u32 lanes per pass

    def make_kernel(k_ops: int):
        """k_ops ALU ops per lane per stream, 4 independent streams."""

        def kernel(x_ref, o_ref):
            x = x_ref[:]
            a = x
            b = x ^ jnp.uint32(0x55555555)
            c = x + jnp.uint32(1)
            d = x ^ jnp.uint32(0x33333333)
            for i in range(k_ops // 4):
                # one add, one xor, one shift, one and per stream per round
                a = a + jnp.uint32(0x01010101)
                b = b ^ a
                c = (c << 1) if i % 2 == 0 else (c >> 1)
                d = d & jnp.uint32(0x7F7F7F7F)
                d = d + b  # keep d live (and-only would constant-fold)
            o_ref[:] = a ^ b ^ c ^ d

        def run(x):
            R = x.shape[0]
            rb = 512
            return pl.pallas_call(
                kernel,
                grid=(pk._cdiv(R, rb),),
                in_specs=[
                    pl.BlockSpec(
                        (rb, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
                    )
                ],
                out_specs=pl.BlockSpec(
                    (rb, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((R, cols), jnp.uint32),
                interpret=pk._auto_interpret(False),
            )(x)

        return run

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = r.ravel()[0].reshape((1, 1))
            return jax.lax.dynamic_update_slice(s, patch, (0, 0)), r

        return jax.jit(step, donate_argnums=0)

    rng = np.random.default_rng(0x7970)
    host = rng.integers(0, 2**32, size=(rows, cols), dtype=np.uint32)

    def measure(k_ops: int) -> float | None:
        step = chained(make_kernel(k_ops))
        state = jnp.asarray(host)
        state, r = step(state)
        np.asarray(r.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/vpu_peak/k{k_ops}"
        )
        if dt is None:
            print(f"k={k_ops:4d}  NO PROFILE", flush=True)
            return None
        print(f"k={k_ops:4d}  {dt * 1e3:8.3f} ms", flush=True)
        return dt

    # slope over several K spans; ops counted per ROUND (5 ops / 4 lanes)
    ks = [8, 64, 128, 256]
    times = {k: measure(k) for k in ks}
    times = {k: t for k, t in times.items() if t is not None}
    if len(times) < 2:
        print("not enough samples", flush=True)
        return 1
    ks_ok = sorted(times)
    lanes = rows * cols
    print("--- pairwise slopes ---", flush=True)
    rates = []
    for lo, hi in zip(ks_ok, ks_ok[1:]):
        # k//4 rounds x 5 ops per 4-lane group = 1.25 ops/lane/k
        dops = lanes * (hi - lo) * 1.25
        slope = times[hi] - times[lo]
        if slope <= 0:
            continue
        rate = dops / slope
        rates.append(rate)
        print(
            f"k {lo:3d}->{hi:3d}: {rate / 1e12:6.3f} Tops/s (u32 lane-ops)",
            flush=True,
        )
    if rates:
        # median of pairwise slopes: one jittery sample must not be able to
        # inflate the number this feeds the decode roofline as denominator
        best = float(np.median(rates))
        print(
            f"sustained u32 VPU throughput ~= {best / 1e12:.3f} Tops/s  "
            f"(median of pairwise slopes; "
            f"{best / 940e6 / 128 / 8:.1f} lanes-equiv ALUs at 940 MHz)",
            flush=True,
        )
        print(
            "plug into utils/profiling.py: "
            f'VPU_U32_GOPS["v5e"] = {best / 1e9:.0f}.0  # measured by this tool',
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
