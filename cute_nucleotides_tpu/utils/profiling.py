"""Profiling and roofline helpers (jax.profiler wrappers).

The reference README does manual ns/iteration and port-pressure analysis
(reference README.md:383-402); the TPU-native equivalents are a Perfetto
trace (``jax.profiler``) and a bytes-based roofline: every codec op is
memory-bound, so speed-of-light is HBM bandwidth divided by bytes moved.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os


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


def _median_module_seconds(log_dir: str, iters: int):
    """Median device duration of the most-executed module in a capture.

    Shared by :func:`measure_device_seconds` and
    :func:`measure_chained_device_seconds` so the sample-count threshold
    cannot drift between them: the step module must have run at least
    ``max(2, iters - 2)`` times (one-shot readback helpers run fewer and
    are ignored; a too-sparse capture returns ``None``).
    """
    import statistics

    by_name = parse_device_durations(log_dir)
    if not by_name:
        return None
    durs = max(by_name.values(), key=len)
    if len(durs) < max(2, iters - 2):
        return None
    return float(statistics.median(durs))


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
    return _median_module_seconds(log_dir, iters)


def measure_chained_device_seconds(
    step, state, *, iters: int = 6, log_dir: str = "/tmp/cn_prof_chain"
):
    """Chained-state variant of :func:`measure_device_seconds`.

    ``step(state) -> (state, result)`` must thread its carried state (a
    dependent chain keeps relayed backends honest and lets donated buffers
    be reused); returns ``(median_seconds_or_None, final_state)``.  This is
    bench.py's primary timing source: the profiler's per-module
    ``device_duration_ps`` is ground truth and immune to the host-side
    anomalies that occasionally yield impossible (>100% of HBM peak)
    chain-slope readings for small-output ops.
    """
    import numpy as np

    with trace(log_dir):
        s = state
        r = None
        for _ in range(iters):
            s, r = step(s)
        np.asarray(r.ravel()[:4])
    return _median_module_seconds(log_dir, iters), s


#: published peak HBM bandwidth per chip, GiB/s (for roofline estimates)
HBM_GIBS = {
    "v4": 1130.0,
    "v5e": 763.0,   # 819 GB/s
    "v5p": 2569.0,
    "v6e": 1526.0,
}

#: published peak MXU throughput per chip: int8 TOPS and bf16 TFLOPS
#: (1 MAC = 2 ops/FLOPs; v4 has no int8 fast path — bf16 rate applies)
MXU_INT8_TOPS = {"v4": 275.0, "v5e": 394.0, "v5p": 918.0, "v6e": 1836.0}
MXU_BF16_TFLOPS = {"v4": 275.0, "v5e": 197.0, "v5p": 459.0, "v6e": 918.0}

#: MEASURED sustained elementwise u32 throughput, G lane-ops/s — there is
#: no published VPU number, so this is the slope measured by
#: tools/vpu_peak.py on the real chip (None until measured; env
#: CUTENUC_VPU_GOPS overrides for experiments).  The VPU is the third
#: roofline resource: the base-5 interleaved decoder runs ~2.3x above
#: max(HBM, MXU) time, so without this denominator its efficiency cannot
#: be stated honestly (docs/DESIGN.md §4).
VPU_U32_GOPS: dict = {"v4": None, "v5e": 2165.0, "v5p": None, "v6e": None}
# v5e: measured 2026-08 by tools/vpu_peak.py on the real chip — median of
# pairwise k-sweep slopes (2.165/2.167/1.646 Tops/s), i.e. ~2.2
# lane-equivalent u32 ALUs at 940 MHz sustained.
#
# SCOPE (calibration cross-check, 2026-08): this rate is a valid ceiling
# only for op streams that look like the tool's own — long DEPENDENT
# add/xor/shift/and chains (the Myers scan rows: 40nb+7 genuinely serial
# recurrence ops per step).  It is NOT a ceiling for the base-5 codec
# kernels' mixed streams: the interleaved decoder demonstrably executes
# its audited 64k-op row in 13.75 ns (~4.7 T audited-ops/s — converts,
# copies and fused shift+mask pairs issue beside the ALU slots the tool
# saturates), so feeding those audits through this rate would report
# SoL > 1.  bench.py therefore passes vpu_lane_ops only for the
# alignment rows; the codec audits remain as diagnostics
# (ops.pallas_kernels.b5_kernel_vpu_lane_ops).


def vpu_peak_gops(chip: str = "v5e"):
    """Sustained VPU u32 lane-ops/s for ``chip`` (None if not measured)."""
    env = os.environ.get("CUTENUC_VPU_GOPS")
    if env:
        return float(env)
    return VPU_U32_GOPS.get(chip)


@dataclasses.dataclass
class Roofline:
    """Bytes-moved + dense-MACs model of one op at a given input size.

    Codec ops are memory-bound (the MAC fields default to 0), but the
    MXU-backed ops (base-5 codec, k-mer histogram, all-pairs Hamming) also
    execute a *dense* constant matmul whose cost is ``K x N`` per row
    regardless of matrix sparsity; for those the honest speed-of-light is
    ``max(memory time, compute time)`` — a bytes-only SoL published for a
    compute-bound op reads as "0.1% of peak" for a kernel that is actually
    at its true ceiling (the reference's port-pressure analysis,
    reference README.md:383-402, is the scalar-world version of the same
    accounting).
    """

    read_bytes: int
    write_bytes: int
    #: dense MXU multiply-accumulates on the int8 path
    int8_macs: int = 0
    #: dense MXU multiply-accumulates on the bf16 path
    bf16_macs: int = 0
    #: elementwise u32 VPU lane-ops (static count; see
    #: ops.pallas_kernels.b5_kernel_vpu_lane_ops for the derivation style)
    vpu_lane_ops: int = 0

    @property
    def total(self) -> int:
        return self.read_bytes + self.write_bytes

    def memory_s(self, hbm_gibs: float) -> float:
        return self.total / (hbm_gibs * 2**30)

    def compute_s(self, chip: str = "v5e") -> float:
        """Minimum seconds at peak MXU throughput (1 MAC = 2 ops)."""
        s = 0.0
        if self.int8_macs:
            s += 2.0 * self.int8_macs / (MXU_INT8_TOPS[chip] * 1e12)
        if self.bf16_macs:
            s += 2.0 * self.bf16_macs / (MXU_BF16_TFLOPS[chip] * 1e12)
        return s

    def vpu_s(self, chip: str = "v5e") -> float:
        """Minimum seconds at the MEASURED sustained VPU rate (0.0 when the
        chip's rate is unmeasured or the op carries no lane-op count — the
        VPU term then simply doesn't participate in the max)."""
        peak = vpu_peak_gops(chip)
        if not self.vpu_lane_ops or not peak:
            return 0.0
        return self.vpu_lane_ops / (peak * 1e9)

    def speed_of_light_s(self, hbm_gibs: float, chip: str = "v5e") -> float:
        """Minimum seconds: the HBM, MXU and VPU bounds must all be met
        (the three resources run concurrently, so the ceiling is the max)."""
        return max(self.memory_s(hbm_gibs), self.compute_s(chip),
                   self.vpu_s(chip))

    def bound_kind(self, hbm_gibs: float, chip: str = "v5e") -> str:
        """Which resource sets the ceiling: "memory", "compute" or "vpu"."""
        m, c, v = self.memory_s(hbm_gibs), self.compute_s(chip), self.vpu_s(chip)
        if v > m and v > c:
            return "vpu"
        return "compute" if c > m else "memory"

    def efficiency(
        self, measured_s: float, hbm_gibs: float, chip: str = "v5e"
    ) -> float:
        """Fraction of speed-of-light achieved (1.0 == at the true bound)."""
        return self.speed_of_light_s(hbm_gibs, chip) / max(measured_s, 1e-12)


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
