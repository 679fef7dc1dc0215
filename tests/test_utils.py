"""Streaming IO, checkpoint manifest, metrics, validation pass, runtime."""

import gzip
import io as pyio
import json

import numpy as np
import pytest

import jax.numpy as jnp

from cute_nucleotides_tpu.ops import oracle, spec, validate
from cute_nucleotides_tpu.parallel import runtime
from cute_nucleotides_tpu.utils import checkpoint, io, metrics, profiling


# --- readers ----------------------------------------------------------------

def test_fasta_reader():
    data = b">r1 desc\nACGT\nACGT\n>r2\nTTTT\n"
    recs = list(io.read_fasta(pyio.BytesIO(data)))
    assert [r.name for r in recs] == [b"r1 desc", b"r2"]
    assert [r.seq for r in recs] == [b"ACGTACGT", b"TTTT"]


def test_fastq_reader():
    data = b"@r1\nACGT\n+\n!!!!\n@r2\nGGGG\n+\nIIII\n"
    recs = list(io.read_fastq(pyio.BytesIO(data)))
    assert [r.seq for r in recs] == [b"ACGT", b"GGGG"]


def test_fastq_malformed():
    with pytest.raises(ValueError):
        list(io.read_fastq(pyio.BytesIO(b"ACGT\nACGT\n+\n!!!!\n")))


def test_open_reads_gz(tmp_path):
    p = tmp_path / "reads.fa.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">a\nACGT\n")
    recs = list(io.open_reads(p))
    assert recs[0].seq == b"ACGT"


def test_shard_records():
    recs = [io.Record(str(i).encode(), b"A") for i in range(10)]
    got = list(io.shard_records(recs, host_id=1, num_hosts=3))
    assert [i for i, _ in got] == [1, 4, 7]


# --- batch stream -----------------------------------------------------------

def test_batch_stream_shapes_and_padding():
    recs = [io.Record(b"", b"ACGT" * k) for k in (1, 3, 9, 2, 5)]
    batches = list(io.BatchStream(recs, batch_size=2, max_len=40, block=32))
    assert len(batches) == 3
    assert all(b.reads.shape == (2, 64) for b in batches)  # 40 -> 64 (block)
    assert batches[0].lengths.tolist() == [4, 12]
    assert batches[-1].count == 1
    assert batches[-1].indices.tolist() == [-1, -1]  # plain records: no ids
    assert bytes(batches[0].reads[0][:8]) == b"ACGTAAAA"


def test_batch_stream_skip_resume():
    recs = [io.Record(b"", b"ACGT")] * 6
    all_b = list(io.BatchStream(recs, batch_size=2, max_len=32))
    resumed = list(io.BatchStream(recs, batch_size=2, max_len=32, skip=2))
    assert len(all_b) == 3 and len(resumed) == 1


def test_batch_stream_too_long():
    recs = [io.Record(b"", b"A" * 100)]
    with pytest.raises(ValueError):
        list(io.BatchStream(recs, batch_size=1, max_len=32))
    b = next(iter(io.BatchStream(recs, batch_size=1, max_len=32, truncate=True)))
    assert b.lengths[0] == 32
    # the raise fires BEFORE further records are consumed from the
    # caller's iterator (r05 review: batch-assembly-time validation lost
    # up to batch_size-1 records) and inside skipped batches too
    it = iter([io.Record(b"", b"A" * 100), io.Record(b"", b"ACGT")])
    with pytest.raises(ValueError, match="exceeds max_len"):
        next(iter(io.BatchStream(it, batch_size=8, max_len=32)))
    assert next(it).seq == b"ACGT"  # second record untouched
    with pytest.raises(ValueError, match="exceeds max_len"):
        list(
            io.BatchStream(
                [io.Record(b"", b"A" * 100)] * 4,
                batch_size=2,
                max_len=32,
                skip=5,
            )
        )


# --- checkpoint manifest ----------------------------------------------------

def test_manifest_roundtrip(tmp_path):
    p = tmp_path / "manifest.json"
    m = checkpoint.Manifest(p)
    m.advance(0, batches=3, records=100)
    m.advance(1, batches=2, records=64)
    m.save()
    m2 = checkpoint.Manifest(p)
    assert m2.batches_done(0) == 3 and m2.records_done(1) == 64
    assert m2.batches_done(9) == 0


def test_manifest_shared_path_merges_hosts(tmp_path):
    """Two host processes saving to the SAME manifest path must not
    clobber each other's positions (r05 review: a blind rewrite dropped
    the other host's entry, re-delivering its whole stream on resume)."""
    p = tmp_path / "manifest.json"
    host_a = checkpoint.Manifest(p)  # opened before host_b ever saved
    host_b = checkpoint.Manifest(p)
    host_a.advance(0, batches=5, records=500)
    host_a.save()
    host_b.advance(1, batches=7, records=700)
    host_b.save()  # must merge, not drop, host 0's entry
    merged = checkpoint.Manifest(p)
    assert merged.batches_done(0) == 5
    assert merged.batches_done(1) == 7
    # a host's own later save still wins over its stale on-disk entry
    host_a.advance(0, batches=1)
    host_a.save()
    assert checkpoint.Manifest(p).batches_done(0) == 6
    assert checkpoint.Manifest(p).batches_done(1) == 7


# --- metrics ----------------------------------------------------------------

def test_throughput_logger():
    buf = pyio.StringIO()
    log = metrics.ThroughputLogger(name="t", stream=buf, log_every=1)
    log.start()
    log.batch_done(nt=1000, reads=10)
    log.batch_done(nt=2000, reads=20)
    agg = log.aggregate()
    assert agg["total_nt"] == 3000 and agg["total_reads"] == 30
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert len(lines) == 2 and lines[0]["event"] == "batch"
    assert metrics.scaling_efficiency(10.0, 4, 40.0) == 1.0


def test_roofline():
    r = profiling.encode_2bit_roofline(1 << 30)
    assert r.total == (1 << 30) + (1 << 28)
    assert 0 < r.speed_of_light_s(763.0) < 1


# --- device-side validation -------------------------------------------------

def test_validate_mask():
    x = jnp.asarray(np.frombuffer(b"ACGTUacgtuNnX", np.uint8))
    m = np.asarray(validate.valid_mask(x))
    assert m[:10].all() and not m[10] and not m[11] and not m[12]
    mn = np.asarray(validate.valid_mask(x, allow_n=True))
    assert mn[:12].all() and not mn[12]


def test_validate_first_invalid():
    x = jnp.asarray(np.frombuffer(b"ACGTXACGT", np.uint8))
    assert int(validate.jit_first_invalid()(x)) == 4
    ok = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))
    assert int(validate.jit_first_invalid()(ok)) == -1
    batch = jnp.asarray(
        np.frombuffer(b"ACGTNNNNXAAA", np.uint8).reshape(3, 4)
    )
    got = np.asarray(validate.jit_first_invalid(allow_n=True)(batch))
    assert got.tolist() == [-1, -1, 0]
    assert int(validate.jit_count_invalid()(jnp.asarray(np.frombuffer(b"NXNA", np.uint8)))) == 3


# --- streaming runtime ------------------------------------------------------

def test_streaming_encoder_end_to_end(tmp_path):
    info = runtime.initialize()
    assert info["process_count"] == 1

    reads = [b"ACGTACGTacgtacgtUUUU", b"GGGGCCCC", b"ACGT" * 40]
    records = [io.Record(str(i).encode(), s) for i, s in enumerate(reads)]

    outputs = []
    enc = runtime.StreamingEncoder(
        batch_size=8,
        max_len=192,
        manifest_path=str(tmp_path / "m.json"),
    )
    agg = enc.run(records, sink=lambda w, b: outputs.append((w, b)))
    assert agg["total_reads"] == 3
    assert agg["total_nt"] == sum(len(r) for r in reads)
    (words, batch), = outputs
    for i, r in enumerate(reads):
        want = oracle.n_to_bits_lut(np.frombuffer(r, np.uint8))
        got = spec.u32_pairs_to_u64(words[i])[: want.size]
        assert np.array_equal(got, want)

    # resume: manifest records 1 batch done -> re-run consumes nothing
    enc2 = runtime.StreamingEncoder(
        batch_size=8,
        max_len=192,
        manifest_path=str(tmp_path / "m.json"),
    )
    agg2 = enc2.run(records, sink=lambda w, b: outputs.append((w, b)))
    assert agg2["batches"] == 0 and len(outputs) == 1


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp2

    with profiling.trace(str(tmp_path / "trace")):
        jnp2.arange(8).sum().block_until_ready()
    # a trace directory with at least one artifact must exist
    import os

    found = any(files for _, _, files in os.walk(tmp_path / "trace"))
    assert found


def test_streaming_crash_resume_no_loss_no_dup(tmp_path):
    """Failure recovery contract (SURVEY §5): a crash mid-stream resumes from
    the manifest with no batch lost.  Delivery is at-least-once (the sink
    runs before the manifest advances); here the crash happens *inside* the
    sink — before any durable effect — so the re-delivered batch appears
    once.  A crash after a durable sink but before the manifest write would
    re-deliver, which idempotent sinks absorb (see parallel/runtime.py)."""
    reads = [b"ACGT" * (i % 5 + 1) for i in range(20)]
    records = [io.Record(str(i).encode(), s) for i, s in enumerate(reads)]
    manifest = str(tmp_path / "m.json")

    delivered = []

    class Boom(Exception):
        pass

    def crashing_sink(words, batch):
        if len(delivered) == 1:
            raise Boom()  # crash after one durable batch
        delivered.append(sorted(int(i) for i in batch.indices if i >= 0))

    # batch_size must divide by the data-axis size (8 virtual devices here)
    enc = runtime.StreamingEncoder(
        batch_size=8, max_len=64, manifest_path=manifest
    )
    with pytest.raises(Boom):
        enc.run(records, sink=crashing_sink)
    # one batch was durably recorded before the crash
    assert checkpoint.Manifest(manifest).batches_done(0) == 1

    enc2 = runtime.StreamingEncoder(
        batch_size=8, max_len=64, manifest_path=manifest
    )
    enc2.run(
        records,
        sink=lambda w, b: delivered.append(
            sorted(int(i) for i in b.indices if i >= 0)
        ),
    )
    flat = sorted(i for batch in delivered for i in batch)
    assert flat == list(range(20)), flat  # exactly once each


def test_streaming_decoder_roundtrip(tmp_path):
    """StreamingDecoder mirrors StreamingEncoder: packed entries stream back
    to exact-length reads, with manifest crash-resume (at-least-once)."""
    from cute_nucleotides_tpu.ops import oracle
    from cute_nucleotides_tpu.parallel import runtime

    rng = np.random.default_rng(3)
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
        for n in (1, 33, 100, 64, 31, 7, 200, 16, 42, 5)
    ]
    entries = [
        (b"r%d" % i, len(s), oracle.n_to_bits_lut(np.frombuffer(s, np.uint8)))
        for i, s in enumerate(seqs)
    ]
    got = {}
    dec = runtime.StreamingDecoder(batch_size=8, max_len=256)
    agg = dec.run(entries, sink=lambda name, seq: got.__setitem__(name, seq))
    assert got == {b"r%d" % i: s for i, s in enumerate(seqs)}
    assert agg["total_reads"] == len(seqs)

    # crash after the first durable batch -> resume skips it, no loss
    manifest = str(tmp_path / "d.json")
    seen = []

    class Boom(Exception):
        pass

    def crashing(name, seq):
        if len(seen) == 8:
            raise Boom()
        seen.append(name)

    dec2 = runtime.StreamingDecoder(
        batch_size=8, max_len=256, manifest_path=manifest
    )
    with pytest.raises(Boom):
        dec2.run(entries, sink=crashing)
    dec3 = runtime.StreamingDecoder(
        batch_size=8, max_len=256, manifest_path=manifest
    )
    got2 = {}
    dec3.run(entries, sink=lambda name, seq: got2.__setitem__(name, seq))
    # batch 0 was durably recorded; resume delivers only the remainder
    assert set(got2) == {b"r8", b"r9"}
    assert got2[b"r9"] == seqs[9]


def test_parse_device_durations(tmp_path):
    """The profiler parser extracts per-module device durations (the bench
    harness's ground-truth timing source)."""
    import jax
    import jax.numpy as jnp2

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp2.arange(1024.0)
    jax.block_until_ready(f(x))
    d = str(tmp_path / "t")
    with profiling.trace(d):
        for _ in range(4):
            r = f(x)
        jax.block_until_ready(r)
    by_name = profiling.parse_device_durations(d)
    # CPU backends may not emit device events; when they do, the jitted
    # module must appear with >= 2 executions and positive durations
    if by_name:
        name, durs = max(by_name.items(), key=lambda kv: len(kv[1]))
        assert all(t > 0 for t in durs)


def test_parse_device_durations_uses_device_busy_field(tmp_path):
    """The parser must record device_duration_ps * 1e-12, NOT the event's
    wall 'dur' span (which includes inter-kernel idle — the bug class this
    fixture locks out, along with the ps exponent)."""
    import gzip
    import json

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        # wall span 100 us, device busy 7 us: the parser must report 7e-6
        {"ph": "X", "name": "jit_step(123)", "dur": 100.0,
         "args": {"device_duration_ps": "7000000"}},
        {"ph": "X", "name": "jit_step(123)", "dur": 90.0,
         "args": {"device_duration_ps": "9000000"}},
        # no device duration -> ignored
        {"ph": "X", "name": "jit_helper(9)", "dur": 50.0, "args": {}},
        # non-jit event -> ignored
        {"ph": "X", "name": "copy", "dur": 1.0,
         "args": {"device_duration_ps": "1000000"}},
    ]
    with gzip.open(d / "host.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    out = profiling.parse_device_durations(str(tmp_path))
    assert set(out) == {"jit_step"}
    assert out["jit_step"] == [7e-6, 9e-6]


def test_fastq_batches_matches_batchstream(tmp_path, rng):
    """The vectorized FASTQ->Batch assembler is bit-identical to the
    Record/BatchStream path (ragged lengths, chunk-boundary carry, skip)."""
    parts = []
    for i in range(533):
        L = int(rng.integers(0, 120))
        s = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), L))
        q = bytes(rng.integers(33, 105, L).astype(np.uint8))  # incl '@', '+'
        parts.append(b"@r%d meta\n" % i + s + b"\n+\n" + q + b"\n")
    fq = tmp_path / "t.fastq"
    fq.write_bytes(b"".join(parts))
    for skip in (0, 2):
        a = list(
            io.fastq_batches(str(fq), 64, 120, skip=skip, chunk_bytes=4096)
        )
        b = list(
            io.BatchStream(io.read_fastq(str(fq)), 64, 120, skip=skip)
        )
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x.count == y.count
            assert np.array_equal(x.reads, y.reads)
            assert np.array_equal(x.lengths, y.lengths)


def test_fill_rows_native_matches_fallback(rng, monkeypatch):
    """ops.native.fill_rows: C path == NumPy fallback (ragged, truncation,
    pad rows), and out-of-bounds spans are rejected before reaching C."""
    from cute_nucleotides_tpu.ops import native

    buf = rng.choice(np.frombuffer(b"ACGTNacgtn", np.uint8), 4096)
    starts = rng.integers(0, 3800, 37).astype(np.int64)
    lens = rng.integers(0, 300, 37).astype(np.int64)  # some exceed width 128
    out_native = np.full((48, 128), 0xEE, np.uint8)
    native.fill_rows(buf, starts, lens, out_native)
    out_fb = np.full((48, 128), 0xEE, np.uint8)
    monkeypatch.setattr(native, "_lib", lambda: None)
    native.fill_rows(buf, starts, lens, out_fb)
    assert np.array_equal(out_native, out_fb)
    assert np.all(out_native[37:] == ord("A"))
    monkeypatch.undo()

    if native.available():
        with pytest.raises(ValueError, match="out of buffer bounds"):
            native.fill_rows(
                buf,
                np.array([4090], np.int64),
                np.array([100], np.int64),
                np.empty((1, 128), np.uint8),
            )
        with pytest.raises(ValueError, match="reads for"):
            native.fill_rows(
                buf,
                np.zeros(3, np.int64),
                np.zeros(3, np.int64),
                np.empty((2, 8), np.uint8),
            )


def test_fastq_batches_fallback_matches_native(tmp_path, rng, monkeypatch):
    """fastq_batches emits identical batches with and without the C fill."""
    from cute_nucleotides_tpu.ops import native

    parts = []
    for i in range(150):
        L = int(rng.integers(0, 90))
        s = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), L))
        parts.append(b"@r%d\n" % i + s + b"\r\n+\n" + b"I" * L + b"\n")
    fq = tmp_path / "t.fastq"
    fq.write_bytes(b"".join(parts))
    a = list(io.fastq_batches(str(fq), 32, 96))
    monkeypatch.setattr(native, "_lib", lambda: None)
    b = list(io.fastq_batches(str(fq), 32, 96))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.count == y.count
        assert np.array_equal(x.reads, y.reads)
        assert np.array_equal(x.lengths, y.lengths)
        assert np.array_equal(x.indices, y.indices)


def test_streaming_encoder_run_batches(tmp_path, rng):
    """run_batches (the fastq_batches fast path) delivers the same packed
    words as run() and honors the manifest resume contract."""
    parts = []
    reads = []
    for i in range(37):
        s = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 64))
        reads.append(s)
        parts.append(b"@r%d\n" % i + s + b"\n+\nI\n")
    fq = tmp_path / "r.fastq"
    fq.write_bytes(b"".join(parts))

    outputs = []
    enc = runtime.StreamingEncoder(
        batch_size=8, max_len=64, manifest_path=str(tmp_path / "m.json")
    )
    agg = enc.run_batches(
        io.fastq_batches(str(fq), 8, 64),
        sink=lambda w, b: outputs.append((w.copy(), b)),
    )
    assert agg["total_reads"] == 37
    seen = 0
    for words, batch in outputs:
        for row in range(batch.count):
            want = oracle.n_to_bits_lut(np.frombuffer(reads[seen], np.uint8))
            got = spec.u32_pairs_to_u64(words[row])[: want.size]
            assert np.array_equal(got, want)
            seen += 1
    assert seen == 37

    # resume: 5 batches durably recorded -> nothing re-consumed
    enc2 = runtime.StreamingEncoder(
        batch_size=8, max_len=64, manifest_path=str(tmp_path / "m.json")
    )
    agg2 = enc2.run_batches(
        io.fastq_batches(str(fq), 8, 64), sink=lambda w, b: outputs.append(1)
    )
    assert agg2["batches"] == 0 and len(outputs) == 5


def test_roofline_compute_bound():
    """Roofline with MAC fields: SoL = max(memory, compute); bound tag."""
    r = profiling.Roofline(2**30, 2**30)  # 2 GiB moved, no MACs
    assert r.bound_kind(763.0) == "memory"
    assert r.compute_s() == 0.0
    # 10^12 int8 MACs ~ 5 ms at v5e peak >> the ~2.6 ms memory time
    rc = profiling.Roofline(2**30, 2**30, int8_macs=10**12)
    assert rc.bound_kind(763.0, "v5e") == "compute"
    assert rc.speed_of_light_s(763.0, "v5e") == rc.compute_s("v5e")
    # efficiency is against the binding resource
    assert rc.efficiency(rc.compute_s("v5e"), 763.0, "v5e") == 1.0
    # bf16 MACs price at the bf16 peak (half the int8 rate on v5e)
    rb = profiling.Roofline(0, 0, bf16_macs=10**12)
    assert rb.compute_s("v5e") > profiling.Roofline(0, 0, int8_macs=10**12).compute_s("v5e")


def test_b5_kernel_macs_shapes():
    from cute_nucleotides_tpu.ops import pallas_kernels as pk

    i8, bf = pk.b5_kernel_macs("dec_inter")
    # 8 slices x (768x128 int8 quad scatter + 128x256 bf16 folded gather)
    assert (i8, bf) == (8 * 768 * 128, 8 * 128 * 256)
    i8, bf = pk.b5_kernel_macs("enc_inter")
    assert (i8, bf) == (0, 2 * 1728 * 256)


def test_bench_outage_line_falls_back_to_committed_hw_run(tmp_path, monkeypatch):
    """Relay-down bench runs must surface the round's committed hardware
    headline (tagged stale) rather than zeros, and must degrade to the
    zero line when no artifact exists."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec_ = importlib.util.spec_from_file_location("bench_mod", root / "bench.py")
    bench = importlib.util.module_from_spec(spec_)
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT_S", "0")  # never probe on import-run
    spec_.loader.exec_module(bench)

    # with the committed artifact present: headline values + stale tag
    line = bench._outage_line()
    assert line["unit"] == "GiB/s"
    assert line["stale_hardware_run"] == "BENCH_LOCAL_r04.json"
    assert line["value"] > 0 and line["vs_baseline"] > 0
    assert "relay down" in line["error"]
    json.loads(json.dumps(line))  # driver-parseable

    # with a missing artifact: the honest zero line
    monkeypatch.setenv("BENCH_LAST_HW_PATH", "does_not_exist.json")
    line = bench._outage_line()
    assert line["value"] == 0.0 and "unreachable" in line["error"]
    assert "stale_hardware_run" not in line


def test_roofline_vpu_term(monkeypatch):
    """The VPU term participates in the SoL max only when both a lane-op
    count and a measured chip rate exist."""
    r = profiling.Roofline(2**20, 2**20, vpu_lane_ops=10**9)
    # unmeasured chip rate (v5p) -> the term vanishes
    assert r.vpu_s("v5p") == 0.0
    assert r.bound_kind(763.0, "v5p") == "memory"
    # v5e carries the 2026-08 measured rate -> the term participates
    assert r.vpu_s("v5e") == pytest.approx(10**9 / (2165.0 * 1e9))
    # measured rate (env override): 1e9 ops at 1 Gops/s = 1 s >> memory time
    monkeypatch.setenv("CUTENUC_VPU_GOPS", "1.0")
    assert r.vpu_s("v5e") == 1.0
    assert r.bound_kind(763.0, "v5e") == "vpu"
    assert r.speed_of_light_s(763.0, "v5e") == 1.0
    # no lane-op count -> never vpu-bound even with a measured rate
    rm = profiling.Roofline(2**20, 2**20)
    assert rm.vpu_s("v5e") == 0.0 and rm.bound_kind(763.0, "v5e") == "memory"


def test_b5_kernel_vpu_lane_ops():
    from cute_nucleotides_tpu.ops import pallas_kernels as pk

    ops = pk.b5_kernel_vpu_lane_ops("dec_inter")
    # the audited stage table: hoisted plane extraction + 8 slices
    per_slice = 128 + 256 * 3 + 1024 + 1024 + 1536 + 768 + 768 + 1680
    assert ops == 2560 + 8 * per_slice
    # ~18.6 lane-ops per nt; sanity-bound the audit against gross drift
    assert 15 * pk.B5_ROW_NT < ops < 25 * pk.B5_ROW_NT
    with pytest.raises(KeyError):
        pk.b5_kernel_vpu_lane_ops("enc_inter")


def test_vpu_lane_op_audit_matches_kernel_jaxpr():
    """Drift guard: the hand-audited lane-op count must track the actual
    kernel.  The count is recomputed from the decode kernel's own jaxpr
    (elementwise ALU ops + concat copies + real dtype converts; same-width
    int reinterprets are free) and the audit must stay within 10%."""
    import jax
    import jax.numpy as jnp
    from cute_nucleotides_tpu.ops import pallas_kernels as pk

    rb = 8
    jx = jax.make_jaxpr(
        lambda w: pk.decode_b5_interleaved_panels(w, interpret=True, row_block=rb)
    )(jnp.zeros((rb, 2 * pk.B5_ROW_WORDS), jnp.uint32))
    (call,) = [e for e in jx.jaxpr.eqns if e.primitive.name == "pallas_call"]
    alu = {
        "add", "sub", "mul", "and", "or", "xor", "not",
        "shift_left", "shift_right_logical", "shift_right_arithmetic",
        "concatenate",
    }
    lanes = 0
    for eqn in call.params["jaxpr"].eqns:
        out = eqn.outvars[0].aval
        if not getattr(out, "shape", None) or len(out.shape) != 2:
            continue
        if eqn.primitive.name in alu:
            lanes += out.shape[1]
        elif eqn.primitive.name == "convert_element_type":
            src = eqn.invars[0].aval.dtype
            dst = out.dtype
            free = (
                jnp.issubdtype(src, jnp.integer)
                and jnp.issubdtype(dst, jnp.integer)
                and src.itemsize == dst.itemsize
            )
            if not free:
                lanes += out.shape[1]
    audited = pk.b5_kernel_vpu_lane_ops("dec_inter")
    assert abs(audited - lanes) / lanes < 0.10, (audited, lanes)


def test_streaming_decoder_verify():
    """verify=True rides the fused checked decode: clean base-5 streams
    decode normally; a corrupt word raises with the diagnosed record before
    anything is sunk; 2-bit verify is rejected at construction."""
    from cute_nucleotides_tpu.ops import oracle as orc
    from cute_nucleotides_tpu.parallel import runtime as rt

    rng = np.random.default_rng(11)
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), n))
        for n in (27, 54, 13, 100, 7, 81, 40, 64, 9, 120)
    ]
    entries = [
        (b"r%d" % i, len(s), orc.n_to_bits2_lut(np.frombuffer(s, np.uint8)))
        for i, s in enumerate(seqs)
    ]
    got = {}
    dec = rt.StreamingDecoder(batch_size=8, max_len=128, codec="base5", verify=True)
    dec.run(entries, sink=lambda name, seq: got.__setitem__(name, seq))
    assert got == {b"r%d" % i: s for i, s in enumerate(seqs)}

    bad_entries = [(n, l, w.copy()) for n, l, w in entries]
    bad_entries[4][2][0] |= np.uint64(1) << np.uint64(63)  # r4's pad bit
    sunk = []
    dec2 = rt.StreamingDecoder(batch_size=8, max_len=128, codec="base5", verify=True)
    with pytest.raises(ValueError, match="corrupt base-5 word 0 in record r4"):
        dec2.run(bad_entries, sink=lambda name, seq: sunk.append(name))
    assert b"r4" not in sunk  # the corrupt batch was never sunk

    with pytest.raises(ValueError, match="base-5 only"):
        rt.StreamingDecoder(codec="2bit", verify=True)


def test_streaming_encoder_validate():
    """validate=True rides the fused checked encode: clean inputs stream
    normally (both codecs); an out-of-alphabet byte raises with position +
    record index before the batch is sunk."""
    from cute_nucleotides_tpu.parallel import runtime as rt
    from cute_nucleotides_tpu.utils import io as io_lib

    rng = np.random.default_rng(13)
    for codec, alpha in (("2bit", b"ACGTUacgtu"), ("base5", b"ACGTUNacgtun")):
        seqs = [
            rng.choice(np.frombuffer(alpha, np.uint8), n).tobytes()
            for n in (8, 33, 100, 64, 31, 7, 200, 16)
        ]
        records = [io_lib.Record(b"r%d" % i, s) for i, s in enumerate(seqs)]
        sunk = []
        enc = rt.StreamingEncoder(
            batch_size=8, max_len=256, codec=codec, validate=True
        )
        agg = enc.run(records, sink=lambda w, b: sunk.append(b.count))
        assert agg["total_reads"] == len(seqs) and sunk == [8]

        bad = list(seqs)
        bad[5] = bad[5][:3] + b"@" + bad[5][4:]
        records = [io_lib.Record(b"r%d" % i, s) for i, s in enumerate(bad)]
        sunk2 = []
        enc2 = rt.StreamingEncoder(
            batch_size=8, max_len=256, codec=codec, validate=True
        )
        with pytest.raises(ValueError, match="invalid byte b'@'.*record index 5"):
            enc2.run(records, sink=lambda w, b: sunk2.append(b.count))
        assert sunk2 == []  # nothing delivered from the poisoned batch
