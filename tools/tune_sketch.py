"""On-TPU A/B: chunk size for the sketch layer's bottom-s distinct pass.

``ops/sketch._bottom_s_distinct`` reduces an N-hash stream with per-row
bottom-s passes over a (C, _CHUNK) reshape (N·log(chunk) compares instead
of the flat sort's N·log(N); 1.9x on CPU at 4M hashes).  XLA's TPU sort
is a different machine, so the chunk choice is re-measured here: flat vs
2048 / 8192 / 32768 on the bench row's workload shape (4M canonical k=21
hashes, s=1000).  Ships by updating ``_CHUNK`` if a size beats the
current one by >= 3%.

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_sketch.py
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/tune_sketch.py --selftest
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    selftest = "--selftest" in sys.argv
    import jax
    import jax.numpy as jnp

    from cute_nucleotides_tpu.ops import sketch
    from cute_nucleotides_tpu.utils import profiling

    S = 1000
    rng = np.random.default_rng(0x5EE7)
    n = 1 << 16 if selftest else 1 << 22
    # realistic duplication: hash-uniform plus a heavy low-entropy band
    h_np = rng.integers(0, 2**32 - 1, n, dtype=np.uint64).astype(np.uint32)
    h_np[: n // 8] = rng.integers(0, 997, n // 8, dtype=np.uint64).astype(
        np.uint32
    )

    def flat_fn(x):
        return sketch._bottom_s_distinct_count(x, S)[0]

    def chunked_fn(m):
        def fn(x):
            old = sketch._CHUNK
            sketch._CHUNK = m
            try:
                return sketch._bottom_s_distinct(x, S)
            finally:
                sketch._CHUNK = old

        return fn

    h = jnp.asarray(h_np)
    want = np.asarray(jax.jit(flat_fn)(h))
    variants = [("flat", flat_fn)] + [
        (f"chunk{m}", chunked_fn(m)) for m in (2048, 8192, 32768)
    ]
    ok_all = True
    for name, fn in variants:
        got = np.asarray(jax.jit(fn)(h))
        ok = np.array_equal(got, want)
        ok_all &= ok
        print(f"{name:10s} {'bit-exact' if ok else 'WRONG'}", flush=True)
    if selftest:
        print("selftest", "PASS" if ok_all else "FAIL", flush=True)
        return 0 if ok_all else 1
    if not ok_all:
        return 1

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = r[0:1] | jnp.uint32(1)  # keep state non-degenerate
            return jax.lax.dynamic_update_slice(s, patch, (0,)), r

        return jax.jit(step, donate_argnums=0)

    for name, fn in variants:
        step = chained(fn)
        state = jnp.asarray(h_np)
        state, r = step(state)
        np.asarray(r[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_sketch/{name}"
        )
        if dt is None:
            print(f"{name:10s} NO PROFILE", flush=True)
            continue
        print(
            f"{name:10s} {dt * 1e3:8.3f} ms  "
            f"{n / dt / 1e9:6.2f} Ghash/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
