"""Device-mesh construction helpers.

A codec has one meaningful parallel axis — reads are independent — so the
default mesh is 1-D over all addressable devices, named ``"data"``.  A second
axis ``"seq"`` is available for block-sharded long-sequence encoding (both
axes can be combined, e.g. a (hosts*chips/2, 2) mesh encoding two long
sequences' halves on pairs of chips).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(
    data: int | None = None, seq: int = 1, *, devices=None
) -> Mesh:
    """Build a (data, seq) mesh.  ``data=None`` uses all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % seq:
            raise ValueError(f"{n} devices not divisible by seq={seq}")
        data = n // seq
    if data * seq > n:
        raise ValueError(f"mesh {data}x{seq} exceeds {n} devices")
    arr = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def default_mesh() -> Mesh:
    return make_mesh()
