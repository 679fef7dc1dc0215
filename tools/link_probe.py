"""Characterize the host<->device transfer link (relay or PCIe/ICI).

The streaming pipeline's ceiling through a relayed TPU is the link, not the
kernel (BENCH stream rows sit ~25,000x below kernel rate).  This probe
measures the four facts the attribution needs:

  1. per-transfer round-trip latency (4-byte H2D + D2H)
  2. H2D bandwidth vs transfer size (does the call block? does size
     amortize per-call overhead?)
  3. D2H bandwidth vs size
  4. duplex: do concurrent H2D and D2H share or sum (full vs half duplex)

Ground truth for "transfer done": a dependent 1-element readback of the
transferred buffer (block_until_ready is not trustworthy through the relay,
see docs/DESIGN.md §7).

Usage: PYTHONPATH=.:/root/.axon_site python tools/link_probe.py
"""

from __future__ import annotations

import json
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

MB = 1 << 20


def _force(x: jax.Array) -> None:
    # dependent readback of one element: the transfer must have completed
    np.asarray(jax.device_get(x.ravel()[:1]))


def h2d(nbytes: int, reps: int = 2) -> dict:
    host = np.random.default_rng(0).integers(0, 255, nbytes, np.uint8)
    dev = jax.devices()[0]
    # warm
    _force(jax.device_put(host, dev))
    call_s, done_s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jax.device_put(host, dev)
        t1 = time.perf_counter()
        _force(x)
        t2 = time.perf_counter()
        call_s.append(t1 - t0)
        done_s.append(t2 - t0)
        del x
    return {
        "call_ms": round(1e3 * min(call_s), 2),
        "done_ms": round(1e3 * min(done_s), 2),
        "mb_s": round(nbytes / min(done_s) / MB, 1),
        "blocking_call": min(call_s) > 0.8 * min(done_s),
    }


def d2h(nbytes: int, reps: int = 2) -> dict:
    # a FRESH device array per rep: jax.Array caches its host copy after
    # the first device_get, so re-reading one array measures nothing
    x = jnp.arange(nbytes, dtype=jnp.uint8) | jnp.uint8(1)  # device-resident
    fresh = jax.jit(lambda a, i: a ^ i)
    np.asarray(fresh(x, jnp.uint8(1)))  # warm (compile + one readback)
    times = []
    for i in range(reps):
        y = fresh(x, jnp.uint8(i + 2))
        y.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(y)
        times.append(time.perf_counter() - t0)
    return {
        "done_ms": round(1e3 * min(times), 2),
        "mb_s": round(nbytes / min(times) / MB, 1),
    }


def h2d_parallel(nbytes: int, streams: int, reps: int = 2) -> dict:
    """Do concurrent uploads share the link or sum? (sum => the pipeline
    should fan uploads over several threads)."""
    hosts = [
        np.random.default_rng(s).integers(0, 255, nbytes, np.uint8)
        for s in range(streams)
    ]
    dev = jax.devices()[0]
    for h in hosts:  # warm
        _force(jax.device_put(h, dev))
    best = None
    for _ in range(reps):
        done = []

        def up(h):
            _force(jax.device_put(h, dev))

        t0 = time.perf_counter()
        threads = [threading.Thread(target=up, args=(h,)) for h in hosts]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "s": round(best, 3),
        "agg_mb_s": round(streams * nbytes / best / MB, 1),
    }


def latency(reps: int = 10) -> float:
    host = np.zeros(4, np.uint8)
    dev = jax.devices()[0]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jax.device_put(host, dev)
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    return round(1e3 * min(ts), 2)


def duplex(nbytes: int, reps: int = 3) -> dict:
    host = np.random.default_rng(1).integers(0, 255, nbytes, np.uint8)
    dev = jax.devices()[0]
    resident = jnp.arange(nbytes, dtype=jnp.uint8) | jnp.uint8(1)
    _force(jax.device_put(host, dev))
    np.asarray(resident)
    out = {}

    def up():
        for _ in range(reps):
            _force(jax.device_put(host, dev))

    def down():
        for _ in range(reps):
            np.asarray(resident)

    for name, fns in [("h2d_only", [up]), ("d2h_only", [down]),
                      ("both", [up, down])]:
        t0 = time.perf_counter()
        threads = [threading.Thread(target=f) for f in fns]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        out[name] = {
            "s": round(dt, 3),
            "agg_mb_s": round(len(fns) * reps * nbytes / dt / MB, 1),
        }
    return out


def main() -> None:
    print(f"devices: {jax.devices()}", file=sys.stderr)
    report = {"platform": jax.default_backend()}
    report["latency_rt_ms"] = latency()
    print(f"round-trip latency: {report['latency_rt_ms']} ms", file=sys.stderr)
    report["h2d"] = {}
    report["d2h"] = {}
    for mb in (1, 4, 16):
        report["h2d"][f"{mb}MiB"] = h2d(mb * MB)
        report["d2h"][f"{mb}MiB"] = d2h(mb * MB)
        print(
            f"{mb:3d} MiB  H2D {report['h2d'][f'{mb}MiB']['mb_s']:8.1f} MB/s"
            f" (call {report['h2d'][f'{mb}MiB']['call_ms']} ms,"
            f" done {report['h2d'][f'{mb}MiB']['done_ms']} ms)"
            f"   D2H {report['d2h'][f'{mb}MiB']['mb_s']:8.1f} MB/s",
            file=sys.stderr,
        )
    report["duplex_16MiB"] = duplex(16 * MB)
    print(f"duplex: {report['duplex_16MiB']}", file=sys.stderr)
    report["h2d_parallel_8MiB"] = {
        f"x{s}": h2d_parallel(8 * MB, s) for s in (1, 2, 4)
    }
    print(f"h2d parallel: {report['h2d_parallel_8MiB']}", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
