"""Profiling and roofline helpers (jax.profiler wrappers).

The reference README does manual ns/iteration and port-pressure analysis
(reference README.md:383-402); the TPU-native equivalents are a Perfetto
trace (``jax.profiler``) and a bytes-based roofline: every codec op is
memory-bound, so speed-of-light is HBM bandwidth divided by bytes moved.
"""

from __future__ import annotations

import contextlib
import dataclasses


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def parse_device_durations(log_dir: str) -> dict[str, list[float]]:
    """Parse a :func:`trace` capture into per-module device durations.

    Returns ``{module_name: [seconds, ...]}`` for every XLA module
    execution (events carrying ``device_duration_ps``) in the newest
    capture under ``log_dir``.  This is the ground-truth timing source:
    host-side wall clocks (even dependent-chain slopes) can mis-measure
    through relayed backends, while the device's own durations cannot.
    ``bench.py`` builds its table from these.
    """
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as fh:
        data = json.load(fh)
    out: dict[str, list[float]] = {}
    for e in data.get("traceEvents", []):
        dd = e.get("args", {}).get("device_duration_ps")
        if e.get("ph") == "X" and dd and e.get("name", "").startswith("jit_"):
            # record the DEVICE-BUSY duration the event carries, not the
            # event's wall span (which includes inter-kernel idle time)
            out.setdefault(e["name"].split("(")[0], []).append(
                float(dd) * 1e-12
            )
    return out


def measure_device_seconds(fn, *args, iters: int = 6, log_dir: str = "/tmp/cn_prof"):
    """Median on-device seconds per call of a jitted ``fn`` (profiler-based).

    Runs ``fn(*args)`` once to warm/compile, then ``iters`` times under a
    trace and returns the median device duration of the most-executed
    module (one-shot readback helpers run fewer times and are ignored).
    Returns ``None`` when the backend produced no device events.
    """
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    with trace(log_dir):
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
    by_name = parse_device_durations(log_dir)
    if not by_name:
        return None
    import statistics

    durs = max(by_name.values(), key=len)
    if len(durs) < 2:
        return None
    return float(statistics.median(durs))


#: published peak HBM bandwidth per chip, GiB/s (for roofline estimates)
HBM_GIBS = {
    "v4": 1130.0,
    "v5e": 763.0,   # 819 GB/s
    "v5p": 2569.0,
    "v6e": 1526.0,
}


@dataclasses.dataclass
class Roofline:
    """Bytes-moved model of one codec op at a given input size."""

    read_bytes: int
    write_bytes: int

    @property
    def total(self) -> int:
        return self.read_bytes + self.write_bytes

    def speed_of_light_s(self, hbm_gibs: float) -> float:
        """Minimum seconds at full HBM bandwidth."""
        return self.total / (hbm_gibs * 2**30)

    def efficiency(self, measured_s: float, hbm_gibs: float) -> float:
        """Fraction of speed-of-light achieved (1.0 == HBM-bound optimal)."""
        return self.speed_of_light_s(hbm_gibs) / max(measured_s, 1e-12)


def encode_2bit_roofline(nt: int) -> Roofline:
    """2-bit encode reads nt bytes, writes nt/4 packed bytes."""
    return Roofline(nt, nt // 4)


def decode_2bit_roofline(nt: int) -> Roofline:
    return Roofline(nt // 4, nt)


def encode_b5_roofline(nt: int) -> Roofline:
    """base-5: 8 packed bytes per 27 nt."""
    return Roofline(nt, 8 * (nt // 27))


def decode_b5_roofline(nt: int) -> Roofline:
    return Roofline(8 * (nt // 27), nt)
