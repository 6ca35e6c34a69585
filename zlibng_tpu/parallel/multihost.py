"""Multi-host (jax.distributed) sharded compression and decode.

Scale-out beyond one host (SURVEY §2.10: the reference's answer is the
external pigz process pool; ours is SPMD over a global mesh): every process
contributes its local devices to one global `Mesh`, and the SAME
dynamic-Huffman pipeline that runs single-host (parallel/sharded.py
compress_multichip / decompress_segments_multichip) runs with lanes and
segments partitioned across ALL devices of ALL hosts. Only the array
placement/fetch seam differs: inputs become global arrays via
make_array_from_callback and sharded outputs come back via
multihost_utils.process_allgather. Compressed lengths ride the in-graph
all_gather; host 0 assembles the final zlib stream with exact adler32
combines.

The same code path runs on a real multi-host TPU slice (ICI/DCN
collectives) and on the CPU-fake cluster used by tests/test_multihost.py
(N processes × M virtual devices, Gloo).
"""
from __future__ import annotations

import numpy as np

from ..checksum.adler32 import adler32_combine  # noqa: F401 (worker re-export)
from ..format.constants import ADLER_BASE  # noqa: F401 (worker re-export)


def _global_mesh():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("d",))


def _placement(mesh):
    """(to_dev, to_host) for a possibly multi-process mesh: global-array
    construction + cross-process gather of sharded outputs."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def to_dev(arr, spec=None):
        arr = np.asarray(arr)
        sh = NamedSharding(mesh, spec if spec is not None else P("d"))
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mhu

        def to_host(x):
            if getattr(x, "is_fully_addressable", True):
                return np.asarray(x)
            return np.asarray(mhu.process_allgather(x, tiled=True))
    else:
        to_host = np.asarray
    return to_dev, to_host


def multihost_compress(data: bytes, lane_block: int = 1 << 16,
                       level: int = 6) -> bytes | None:
    """Full multi-host one-shot zlib compression over every device of every
    process, using the real dynamic-Huffman sharded pipeline (per-lane
    dynamic/static tree choice, device bitpack, adler combine tree).
    Returns the zlib stream on process 0, None elsewhere."""
    import jax

    from .sharded import compress_multichip

    mesh = _global_mesh()
    to_dev, to_host = _placement(mesh)
    z = compress_multichip(bytes(data), mesh, level=level,
                           lane_block=lane_block, to_dev=to_dev,
                           to_host=to_host)
    return z if jax.process_index() == 0 else None


def multihost_decompress_segments(blob: bytes, start_bytes) -> list[bytes]:
    """Multi-host sharded decode of indexed full-flush segments: phase-A
    lanes and phase-B segments partition across the global mesh (every
    process runs the same SPMD program; outputs gather to every process).
    Returns the decoded segments (on every process)."""
    from .sharded import decompress_segments_multichip

    mesh = _global_mesh()
    to_dev, to_host = _placement(mesh)
    return decompress_segments_multichip(bytes(blob), start_bytes, mesh,
                                         to_dev=to_dev, to_host=to_host)
