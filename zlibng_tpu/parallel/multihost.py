"""Multi-host (jax.distributed) sharded compression.

Scale-out beyond one host (SURVEY §2.10: the reference's answer is the
external pigz process pool; ours is SPMD over a global mesh): every process
contributes its local devices to one global `Mesh`, the sharded compress
step (parallel/sharded.py) runs with lanes partitioned across ALL devices
of ALL hosts, compressed lengths ride the in-graph all_gather, and host 0
assembles the final zlib stream with exact adler32 combines.

The same code path runs on a real multi-host TPU slice (ICI/DCN
collectives) and on the CPU-fake cluster used by
tests/test_multihost.py (N processes × M virtual devices, Gloo).
"""
from __future__ import annotations

import numpy as np

from ..checksum.adler32 import adler32_combine
from ..format.constants import ADLER_BASE  # noqa: F401 (re-export for workers)

# lane geometry for the demo/test driver (kept small: CPU-fake friendly)
_LANE = 4096


def assemble_zlib_stream(packed: np.ndarray, totals: np.ndarray,
                         payload_lens, shard_adlers: np.ndarray,
                         shard_payload_lens) -> bytes:
    """Stitch sharded static-block lane bitstreams (BFINAL=0 each) into one
    zlib stream: bit-level lane concat + terminating empty static block +
    zlib header/adler trailer (deflatePrime-style stitching, SURVEY §2.10)."""
    from ..ops.deflate_tpu import _BitStitcher

    stitch = _BitStitcher()
    for i in range(packed.shape[0]):
        stitch.append(packed[i], int(totals[i]))
    # final empty static block: BFINAL=1|btype01 then 7-bit EOB
    stitch.append_tokens([(1 | (1 << 1), 3), (0, 7)])

    adler = 1
    for a, ln in zip(np.asarray(shard_adlers).tolist(), shard_payload_lens):
        adler = adler32_combine(adler, int(a), int(ln))

    body = stitch.getvalue()
    out = bytearray(b"\x78\x9c")  # wbits=15, default level marker
    out += body
    out += int(adler).to_bytes(4, "big")
    return bytes(out)


def compress_global(data: bytes, mesh, lane: int = _LANE):
    """Run the sharded step over `mesh` (possibly spanning processes) on
    `data` and return (packed, totals, shard_adlers, payload_lens,
    shard_payload_lens) as host numpy (gathered on every process)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharded import make_compress_step

    ndev = mesh.devices.size
    nlanes = max(1, -(-len(data) // lane))
    B = -(-nlanes // ndev) * ndev  # pad lane count to mesh multiple
    buf = np.zeros((B, lane), np.uint8)
    ends = np.zeros(B, np.int32)
    for i in range(B):
        seg = data[i * lane:(i + 1) * lane]
        buf[i, :len(seg)] = np.frombuffer(seg, np.uint8)
        ends[i] = len(seg)

    step = make_compress_step(mesh, lane, 2 * lane + 64, chain=4,
                              lazy=True, max_lazy=16)

    sh = NamedSharding(mesh, P("d"))

    def mk(arr, sharding):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    lanes_g = mk(buf, sh)
    starts_g = mk(np.zeros(B, np.int32), sh)
    ends_g = mk(ends, sh)
    hist_g = mk(np.zeros(B, np.int32), sh)

    packed, totals, all_bits, shard_adlers = step(
        lanes_g, starts_g, ends_g, hist_g)
    jax.block_until_ready(packed)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mhu
        packed_h = mhu.process_allgather(packed, tiled=True)
        totals_h = mhu.process_allgather(totals, tiled=True)
    else:
        packed_h = np.asarray(packed)
        totals_h = np.asarray(totals)
    shard_adlers_h = np.asarray(shard_adlers)  # replicated out-spec

    payload_lens = ends.astype(np.int64)
    per_shard = B // ndev
    shard_payload_lens = [int(payload_lens[s * per_shard:(s + 1) * per_shard]
                              .sum()) for s in range(ndev)]
    return (np.asarray(packed_h), np.asarray(totals_h), shard_adlers_h,
            payload_lens, shard_payload_lens)


def multihost_compress(data: bytes, lane: int = _LANE) -> bytes | None:
    """Full multi-host one-shot: global mesh over every device of every
    process. Returns the zlib stream on process 0, None elsewhere."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("d",))
    packed, totals, shard_adlers, payload_lens, shard_payload_lens = \
        compress_global(data, mesh, lane)
    if jax.process_index() != 0:
        return None
    return assemble_zlib_stream(packed, totals, payload_lens,
                                shard_adlers, shard_payload_lens)
