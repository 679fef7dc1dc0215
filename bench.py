"""Benchmark harness: reproduces the reference's criterion table on TPU.

The reference benches 40,000-nt strings per call on one CPU core
(reference benches/bench_n_to_bits.rs:9-82) with a memcpy baseline and an
allocation-included policy.  Here the unit of work is a large resident batch
(the TPU production shape), every op allocates its output (XLA does so per
call), an on-device memcpy is the baseline, and the denominator is ASCII
nucleotide bytes — the same convention as the reference's
``group.throughput(Bytes(40000))``.

Timing methodology: the execution stream is asynchronous end-to-end, and on
relayed/tunneled TPU backends neither ``block_until_ready`` nor a readback of
an *independent* result reliably covers queued work — and even a donated
input returned aliased short-circuits (parameter forwarding completes before
the kernel runs).  Each measurement therefore runs a **dependent chain**
whose carried state is updated *from the op's output* with one in-place
dynamic-update-slice element (donated input, near-zero cost), and takes the
slope between two chain lengths so the fixed dispatch+readback cost cancels:
``t = (T(k_hi) - T(k_lo)) / (k_hi - k_lo)``.

Prints a human table on stderr and exactly ONE JSON line on stdout:
``{"metric": ..., "value": ..., "unit": "GiB/s", "vs_baseline": ...}``
where vs_baseline compares against the reference's champion single-core
encode (n_to_bits_movemask, 28.962 GiB/s, reference README.md:349).
"""

from __future__ import annotations

import functools
import json
import os
import signal
import sys
import time

import numpy as np

#: include the (slow, portability-only) XLA-tier rows; default off so the
#: harness finishes well inside driver timeouts even on a congested relay
BENCH_FULL = os.environ.get("BENCH_FULL", "") == "1"


REF_BEST_ENCODE_GIBS = 28.962  # reference README.md:349 (n_to_bits_movemask)
REF_MEMCPY_GIBS = 23.599       # reference README.md:351
REF_TABLE = {                  # reference README.md:346-377 (for context)
    "encode_2bit": 28.962, "decode_2bit": 30.224,
    "encode_b5": 11.787, "decode_b5": 10.175,
}

# workload: 256 MiB of nucleotides, batch of 32768 reads x 8192 nt
ROWS = 32768
NT_PER_ROW = 8192          # % 16 == 0 (2-bit block)
NT_PER_ROW_B5 = 8208       # % 27 == 0 (base-5 block)
CHAIN_LO = 8
CHAIN_HI = 72
TRIALS = 5


def _chain_T(step, state, k):
    t0 = time.perf_counter()
    s = state
    for _ in range(k):
        s, r = step(s)
    np.asarray(r.ravel()[:4])
    return time.perf_counter() - t0, s


def _bench_chain(step, state, trials=TRIALS):
    """step: state -> (state, result), jitted, state donated, state depends
    on result.  Returns the median per-trial slope seconds/link (each trial
    pairs one short and one long chain so dispatch/readback jitter cancels
    within the trial)."""
    state, r = step(state)
    np.asarray(r.ravel()[:4])  # compile + warm
    slopes = []
    for _ in range(trials):
        t_lo, state = _chain_T(step, state, CHAIN_LO)
        t_hi, state = _chain_T(step, state, CHAIN_HI)
        slopes.append(max((t_hi - t_lo) / (CHAIN_HI - CHAIN_LO), 1e-9))
    return float(np.median(slopes))


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
    host_nt4 = host_u8.reshape(ROWS, -1).view(np.uint32)
    nt_bytes_b5 = ROWS * NT_PER_ROW_B5

    results: dict[str, float] = {}

    def emit_headline():
        candidates = [
            results.get(k, 0.0)
            for k in (
                "encode_2bit_pallas_mul",
                "encode_2bit_pallas_shift",
                "encode_2bit_xla_mul",
            )
        ]
        best_encode = max(candidates) if any(candidates) else 0.0
        memcpy = results.get("memcpy_device", 0.0)
        print(
            json.dumps(
                {
                    "metric": "encode_2bit_throughput",
                    "value": round(best_encode, 3),
                    "unit": "GiB/s",
                    "vs_baseline": round(best_encode / REF_BEST_ENCODE_GIBS, 3),
                    "gbps_per_chip": round(best_encode * 2**30 / 1e9, 1),
                    "vs_device_memcpy": round(best_encode / memcpy, 3) if memcpy else None,
                    "vs_reference_memcpy": round(best_encode / REF_MEMCPY_GIBS, 2),
                    "chips": 1,
                    "detail": {k: round(v, 3) for k, v in results.items()},
                }
            ),
            flush=True,
        )

    def on_term(signum, frame):  # driver timeout: still emit what we have
        print("SIGTERM: emitting partial results", file=sys.stderr)
        emit_headline()
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_term)

    def run(name, step, state, denom):
        # a single failing row must not prevent the headline JSON line
        try:
            dt = _bench_chain(step, state)
        except Exception as e:  # pragma: no cover
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            results[name] = 0.0
            return 0.0
        gibs = denom / dt / 2**30
        results[name] = gibs
        print(f"{name:28s} {dt * 1e3:9.3f} ms   {gibs:9.2f} GiB/s", file=sys.stderr)
        return gibs

    def chained(fn):
        """Dependent chain step: the carried state is refreshed in place from
        one element of the op output (true data dependency, ~zero cost)."""

        def step(s):
            r = fn(s)
            patch = r[:1, :1].astype(s.dtype)
            return jax.lax.dynamic_update_slice(s, patch, (0, 0)), r

        return jax.jit(step, donate_argnums=0)

    def chained2(fn):
        """two-array state variant."""

        def step(s):
            a, b = s
            r = fn(a, b)
            patch = r[:1, :1].astype(a.dtype)
            return (jax.lax.dynamic_update_slice(a, patch, (0, 0)), b), r

        return jax.jit(step, donate_argnums=0)

    # --- baselines -----------------------------------------------------------
    # memcpy chains naturally: output feeds the next copy (read N, write N)
    memcpy_step = jax.jit(lambda s: (s + jnp.uint8(0),) * 2, donate_argnums=0)
    run("memcpy_device", lambda s: memcpy_step(s), jnp.asarray(host_u8), nt_bytes)

    # --- 2-bit codec ---------------------------------------------------------
    run(
        "encode_2bit_pallas_mul",
        chained(lambda x: pk.encode_2bit_nt4(x, "mul")),
        jnp.asarray(host_nt4),
        nt_bytes,
    )
    run(
        "encode_2bit_pallas_shift",
        chained(lambda x: pk.encode_2bit_nt4(x, "shift")),
        jnp.asarray(host_nt4),
        nt_bytes,
    )
    if BENCH_FULL:
        run(
            "encode_2bit_xla_mul",
            chained(lambda x: xla.encode_2bit_words(x, "mul")),
            jnp.asarray(host_u8),
            nt_bytes,
        )

    packed_np = np.asarray(
        jax.jit(lambda w: pk.encode_2bit_nt4(w, "mul"))(jnp.asarray(host_nt4))
    )
    run(
        "decode_2bit_pallas_shuffle",
        chained(lambda p: pk.decode_2bit_nt4(p, "shuffle")),
        jnp.asarray(packed_np),
        nt_bytes,
    )
    run(
        "decode_2bit_pallas_swar",
        chained(lambda p: pk.decode_2bit_nt4(p, "swar")),
        jnp.asarray(packed_np),
        nt_bytes,
    )
    if BENCH_FULL:
        words_np = packed_np.reshape(ROWS, -1).view(np.uint32)
        run(
            "decode_2bit_xla_shuffle",
            chained(lambda w: xla.decode_2bit_bytes(w, "shuffle")),
            jnp.asarray(words_np),
            nt_bytes,
        )

    # --- base-5 codec --------------------------------------------------------
    rows_b5 = (ROWS * NT_PER_ROW_B5) // pk.B5_ROW_NT
    host_b5 = rng.choice(alphabet_n, size=(rows_b5, pk.B5_ROW_NT))
    nt_b5_panels = rows_b5 * pk.B5_ROW_NT
    run(
        "encode_b5_pallas",
        chained(pk.encode_b5_panels_v2),
        jnp.asarray(host_b5),
        nt_b5_panels,
    )
    run(
        "encode_b5_pallas_planar",
        chained(lambda x: pk.encode_b5_planar(x)[0]),
        jnp.asarray(host_b5),
        nt_b5_panels,
    )
    w_b5 = np.asarray(jax.jit(pk.encode_b5_panels_v2)(jnp.asarray(host_b5)))
    lo = np.ascontiguousarray(w_b5.reshape(-1, 2)[:, 0]).reshape(rows_b5, 128)
    hi = np.ascontiguousarray(w_b5.reshape(-1, 2)[:, 1]).reshape(rows_b5, 128)
    run(
        "decode_b5_pallas",
        chained2(pk.decode_b5_panels),
        (jnp.asarray(lo), jnp.asarray(hi)),
        nt_b5_panels,
    )
    run(
        "decode_b5_pallas_nt4",
        chained2(pk.decode_b5_nt4_panels),
        (jnp.asarray(lo), jnp.asarray(hi)),
        nt_b5_panels,
    )
    run(
        "decode_b5_pallas_nt4_padded",
        chained2(lambda a, b: pk.decode_b5_nt4_panels(a, b, padded=True)),
        (jnp.asarray(lo), jnp.asarray(hi)),
        nt_b5_panels,
    )
    if BENCH_FULL:
        x_b5 = rng.choice(alphabet_n, size=(ROWS, NT_PER_ROW_B5))
        run(
            "encode_b5_xla",
            chained(xla.encode_b5_words),
            jnp.asarray(x_b5),
            nt_bytes_b5,
        )
        words_b5 = np.asarray(jax.jit(xla.encode_b5_words)(jnp.asarray(x_b5)))
        run(
            "decode_b5_xla",
            chained(xla.decode_b5_bytes),
            jnp.asarray(words_b5),
            nt_bytes_b5,
        )

    # --- headline ------------------------------------------------------------
    best_encode = max(
        results.get("encode_2bit_pallas_mul", 0.0),
        results.get("encode_2bit_pallas_shift", 0.0),
        results.get("encode_2bit_xla_mul", 0.0),
    )
    memcpy = results.get("memcpy_device", 0.0)
    if memcpy:
        print(
            f"\nbest 2-bit encode: {best_encode:.2f} GiB/s "
            f"({best_encode / memcpy:.2f}x device memcpy; reference best "
            f"{REF_BEST_ENCODE_GIBS} GiB/s = {REF_BEST_ENCODE_GIBS / REF_MEMCPY_GIBS:.2f}x its memcpy)",
            file=sys.stderr,
        )
    emit_headline()
    return 0


if __name__ == "__main__":
    sys.exit(main())
