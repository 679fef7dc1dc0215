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
