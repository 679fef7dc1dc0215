"""Benchmark harness: reproduces the reference's criterion table on TPU.

The reference benches 40,000-nt strings per call on one CPU core
(reference benches/bench_n_to_bits.rs:9-82) with a memcpy baseline and an
allocation-included policy.  Here the unit of work is a large resident batch
(the TPU production shape), every op allocates its output (XLA does so per
call), an on-device memcpy is the baseline, and the denominator is ASCII
nucleotide bytes — the same convention as the reference's
``group.throughput(Bytes(40000))``.

Timing methodology: the execution stream is asynchronous end-to-end (and on
relayed/tunneled TPU backends ``block_until_ready`` can ack before hardware
completion), so each measurement enqueues ``iters`` dependent-free calls and
forces a tiny device->host readback of the last result; the stream executes
in order, so total wall time covers all real executions.  Best of ``trials``.

Prints a human table on stderr and exactly ONE JSON line on stdout:
``{"metric": ..., "value": ..., "unit": "GiB/s", "vs_baseline": ...}``
where vs_baseline compares against the reference's champion single-core
encode (n_to_bits_movemask, 28.962 GiB/s, reference README.md:349).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


REF_BEST_ENCODE_GIBS = 28.962  # reference README.md:349 (n_to_bits_movemask)
REF_MEMCPY_GIBS = 23.599       # reference README.md:351

# workload: 256 MiB of nucleotides, batch of 32768 reads x 8192 nt
ROWS = 32768
NT_PER_ROW = 8192          # % 16 == 0 (2-bit block)
NT_PER_ROW_B5 = 8208       # % 27 == 0 (base-5 block)
ITERS = 12
TRIALS = 3


def _bench(fn, args, iters=ITERS, trials=TRIALS):
    r = fn(*args)
    np.asarray(r.ravel()[:8])  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(iters)]
        np.asarray(rs[-1].ravel()[:8])
        best = min(best, (time.perf_counter() - t0) / iters)
        del rs
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cute_nucleotides_tpu.ops import pallas_kernels as pk, xla

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0xC0DEC)
    alphabet = np.frombuffer(b"ACGTUacgtu", np.uint8)
    alphabet_n = np.frombuffer(b"ACGTUNacgtun", np.uint8)

    nt_bytes = ROWS * NT_PER_ROW
    host_u8 = rng.choice(alphabet, size=(ROWS, NT_PER_ROW))
    x_u8 = jnp.asarray(host_u8)                                   # u8[B, L]
    x_nt4 = jnp.asarray(host_u8.reshape(ROWS, -1).view(np.uint32))  # u32[B, L/4]
    nt_bytes_b5 = ROWS * NT_PER_ROW_B5
    x_b5 = jnp.asarray(rng.choice(alphabet_n, size=(ROWS, NT_PER_ROW_B5)))

    results: dict[str, float] = {}

    def run(name, fn, args, denom):
        dt = _bench(fn, args)
        gibs = denom / dt / 2**30
        results[name] = gibs
        print(f"{name:28s} {dt * 1e3:9.3f} ms   {gibs:9.2f} GiB/s", file=sys.stderr)
        return gibs

    # --- baselines ---------------------------------------------------------
    memcpy = jax.jit(lambda a: a + jnp.uint8(0))
    run("memcpy_device", memcpy, (x_u8,), nt_bytes)

    # --- 2-bit codec -------------------------------------------------------
    enc_pallas = jax.jit(lambda w: pk.encode_2bit_nt4(w, "mul"))
    enc_pallas_shift = jax.jit(lambda w: pk.encode_2bit_nt4(w, "shift"))
    enc_xla = jax.jit(lambda x: xla.encode_2bit_words(x, "mul"))
    run("encode_2bit_pallas_mul", enc_pallas, (x_nt4,), nt_bytes)
    run("encode_2bit_pallas_shift", enc_pallas_shift, (x_nt4,), nt_bytes)
    run("encode_2bit_xla_mul", enc_xla, (x_u8,), nt_bytes)

    packed = enc_pallas(x_nt4)
    np.asarray(packed.ravel()[:8])
    dec_pallas = jax.jit(lambda p: pk.decode_2bit_nt4(p, "shuffle"))
    run("decode_2bit_pallas_shuffle", dec_pallas, (packed,), nt_bytes)
    words_xla = jax.jit(lambda x: xla.encode_2bit_words(x, "mul"))(x_u8)
    np.asarray(words_xla.ravel()[:8])
    dec_xla = jax.jit(lambda w: xla.decode_2bit_bytes(w, "shuffle"))
    run("decode_2bit_xla_shuffle", dec_xla, (words_xla,), nt_bytes)

    # --- base-5 codec ------------------------------------------------------
    rows_b5 = (ROWS * NT_PER_ROW_B5) // pk.B5_ROW_NT
    x_b5_panels = jnp.asarray(
        np.asarray(x_b5).reshape(-1)[: rows_b5 * pk.B5_ROW_NT].reshape(
            rows_b5, pk.B5_ROW_NT
        )
    )
    nt_b5_panels = rows_b5 * pk.B5_ROW_NT
    enc_b5_pl = jax.jit(pk.encode_b5_panels)
    run("encode_b5_pallas", enc_b5_pl, (x_b5_panels,), nt_b5_panels)
    w_b5 = enc_b5_pl(x_b5_panels)
    np.asarray(w_b5.ravel()[:8])
    wn = np.asarray(w_b5)
    lo = jnp.asarray(np.ascontiguousarray(wn.reshape(-1, 2)[:, 0]).reshape(rows_b5, 128))
    hi = jnp.asarray(np.ascontiguousarray(wn.reshape(-1, 2)[:, 1]).reshape(rows_b5, 128))
    dec_b5_pl = jax.jit(pk.decode_b5_panels)
    run("decode_b5_pallas", dec_b5_pl, (lo, hi), nt_b5_panels)

    enc_b5 = jax.jit(xla.encode_b5_words)
    run("encode_b5_xla", enc_b5, (x_b5,), nt_bytes_b5)
    words_b5 = enc_b5(x_b5)
    np.asarray(words_b5.ravel()[:8])
    dec_b5 = jax.jit(xla.decode_b5_bytes)
    run("decode_b5_xla", dec_b5, (words_b5,), nt_bytes_b5)

    # --- headline ----------------------------------------------------------
    best_encode = max(
        results["encode_2bit_pallas_mul"],
        results["encode_2bit_pallas_shift"],
        results["encode_2bit_xla_mul"],
    )
    ratio_memcpy = best_encode / results["memcpy_device"]
    print(
        f"\nbest 2-bit encode: {best_encode:.2f} GiB/s "
        f"({ratio_memcpy:.2f}x device memcpy; reference best "
        f"{REF_BEST_ENCODE_GIBS} GiB/s = {REF_BEST_ENCODE_GIBS / REF_MEMCPY_GIBS:.2f}x its memcpy)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "encode_2bit_throughput",
                "value": round(best_encode, 3),
                "unit": "GiB/s",
                "vs_baseline": round(best_encode / REF_BEST_ENCODE_GIBS, 3),
                "detail": {k: round(v, 3) for k, v in results.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
