"""Host-side streaming input: FASTA/FASTQ readers and batch assembly.

The reference operates on in-memory byte slices only; a production TPU codec
needs a host streaming layer that feeds resident device batches.  This module
supplies:

* record parsers for FASTA and FASTQ (plain or gzip),
* :class:`BatchStream` — fixed-shape padded u8 batches for the device codecs
  (static shapes keep every batch on the same compiled executable),
* host sharding for multi-host runs (host ``h`` of ``H`` consumes records
  ``i`` with ``i % H == h``), matching the per-host input streams of the
  distributed runtime (SURVEY.md §5 "Distributed communication backend").
"""

from __future__ import annotations

import dataclasses
import gzip
import io
import os
from typing import Iterable, Iterator, BinaryIO

import numpy as np


@dataclasses.dataclass
class Record:
    name: bytes
    seq: bytes


def _open(path: str | os.PathLike) -> BinaryIO:
    f = open(path, "rb")
    if str(path).endswith(".gz"):
        return gzip.open(f)  # type: ignore[return-value]
    return f


def read_fasta(source) -> Iterator[Record]:
    """Iterate FASTA records from a path or binary file object."""
    f = _open(source) if isinstance(source, (str, os.PathLike)) else source
    name, chunks = None, []
    for raw in f:
        line = raw.strip()
        if not line:
            continue
        if line.startswith(b">"):
            if name is not None:
                yield Record(name, b"".join(chunks))
            name, chunks = line[1:], []
        else:
            chunks.append(line)
    if name is not None:
        yield Record(name, b"".join(chunks))


def read_fastq(source) -> Iterator[Record]:
    """Iterate FASTQ records (4-line) from a path or binary file object."""
    f = _open(source) if isinstance(source, (str, os.PathLike)) else source
    while True:
        header = f.readline()
        if not header:
            return
        seq = f.readline().strip()
        plus = f.readline()
        qual = f.readline()
        if not header.startswith(b"@") or not plus.startswith(b"+"):
            raise ValueError("malformed FASTQ record")
        del qual
        yield Record(header[1:].strip(), seq)


def open_reads(path: str | os.PathLike) -> Iterator[Record]:
    """Dispatch on extension: .fa/.fasta[.gz] or .fq/.fastq[.gz]."""
    s = str(path)
    base = s[:-3] if s.endswith(".gz") else s
    if base.endswith((".fa", ".fasta", ".fna")):
        return read_fasta(path)
    if base.endswith((".fq", ".fastq")):
        return read_fastq(path)
    raise ValueError(f"unrecognized reads format: {path}")


def shard_records(
    records: Iterable[Record], host_id: int, num_hosts: int
) -> Iterator[tuple[int, Record]]:
    """Round-robin host sharding; yields (global_index, record)."""
    for i, rec in enumerate(records):
        if i % num_hosts == host_id:
            yield i, rec


@dataclasses.dataclass
class Batch:
    """One device-ready batch: 'A'-padded bytes + true lengths + global ids."""

    reads: np.ndarray    # u8[B, L]
    lengths: np.ndarray  # i32[B]
    indices: np.ndarray  # i64[B] global record indices (-1 for pad rows)
    count: int           # number of real rows


class BatchStream:
    """Assemble records into fixed-shape padded batches.

    Fixed ``(batch_size, max_len)`` keeps device shapes static, so every batch
    reuses one compiled executable (XLA recompiles per shape).  Reads longer
    than ``max_len`` raise unless ``truncate=True``.  The final partial batch
    is padded with empty rows (``indices == -1``).
    """

    def __init__(
        self,
        records: Iterable[Record] | Iterable[tuple[int, Record]],
        batch_size: int,
        max_len: int,
        *,
        block: int = 32,
        truncate: bool = False,
        skip: int = 0,
    ):
        self.batch_size = batch_size
        self.max_len = -(-max_len // block) * block
        self.truncate = truncate
        self.skip = skip  # batches to skip (checkpoint resume)
        self._records = records

    def __iter__(self) -> Iterator[Batch]:
        reads = np.full(
            (self.batch_size, self.max_len), ord("A"), dtype=np.uint8
        )
        lengths = np.zeros(self.batch_size, np.int32)
        indices = np.full(self.batch_size, -1, np.int64)
        row = 0
        emitted = 0

        def flush(count):
            nonlocal emitted
            b = Batch(reads.copy(), lengths.copy(), indices.copy(), count)
            emitted += 1
            return b

        for item in self._records:
            idx, rec = item if isinstance(item, tuple) else (-1, item)
            seq = rec.seq
            if len(seq) > self.max_len:
                if not self.truncate:
                    raise ValueError(
                        f"read of length {len(seq)} exceeds max_len {self.max_len}"
                    )
                seq = seq[: self.max_len]
            reads[row, : len(seq)] = np.frombuffer(seq, np.uint8)
            reads[row, len(seq) :] = ord("A")
            lengths[row] = len(seq)
            indices[row] = idx
            row += 1
            if row == self.batch_size:
                if emitted >= self.skip:
                    yield flush(row)
                else:
                    emitted += 1
                row = 0
                indices[:] = -1
                lengths[:] = 0
        if row and emitted >= self.skip:
            reads[row:] = ord("A")
            yield flush(row)


def pack_words_batch(
    chunk: list[tuple[bytes, int, np.ndarray]], batch_size: int
) -> np.ndarray:
    """Pack ``(name, length, u64-words)`` entries into one fixed-shape
    device batch: u32[batch_size, 2 * bucket] (little-endian u32 pairs).

    The word width buckets to the next power of two so the number of
    compiled decode programs stays logarithmic in record length; short
    records zero-pad (tail words decode to 'A' runs that the caller's
    per-record ``length`` truncation drops).  Shared by the CLI decode
    batch path and the streaming decoder — their batching must stay
    bit-identical.
    """
    from ..ops import spec

    wmax = max((e[2].size for e in chunk), default=1)
    bucket = 1 << max(wmax - 1, 0).bit_length()
    mat = np.zeros((batch_size, bucket), dtype="<u8")
    for i, (_, _, words) in enumerate(chunk):
        mat[i, : words.size] = words
    return spec.u64_to_u32_pairs(mat).reshape(batch_size, 2 * bucket)
