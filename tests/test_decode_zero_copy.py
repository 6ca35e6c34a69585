"""Zero-copy one-shot decode contract (round-3 verdict item 6).

The native one-shot path returns a memoryview into a per-thread warm
buffer pool instead of materializing bytes (the ~30% Python-wrapper decode
tax). These tests pin the safety properties that make that legal:

  * a held result is never overwritten by later decodes (refcount guard)
  * the canonical `out = decompress(...)` loop reuses warm buffers
    (ctypes keepalives must not form gc cycles — native._ptr regression)
  * the compat surfaces (stream.inflate.decompress, zng, pyzlib) still
    return real bytes
"""
import gc
import sys
import zlib

import numpy as np
import pytest

from zlibng_tpu.ops.inflate_tpu import decompress_tpu
from zlibng_tpu.stream import inflate_serial as ser


@pytest.fixture()
def data():
    raw = open("/root/reference/doc/rfc1951.txt", "rb").read()
    return raw * 4


def test_held_results_survive_later_decodes(data):
    a = decompress_tpu(zlib.compress(data[:50000], 6), engine="host")
    asnap = bytes(a)
    b = decompress_tpu(zlib.compress(data[50000:120000], 6), engine="host")
    bsnap = bytes(b)
    c = decompress_tpu(zlib.compress(data[120000:], 6), engine="host")
    assert bytes(a) == asnap == data[:50000]
    assert bytes(b) == bsnap == data[50000:120000]
    assert c == data[120000:]


def test_canonical_loop_reuses_warm_buffers(data):
    """`out = f()` in a loop holds the previous result during each call;
    the 2-slot pool must still serve warm buffers (no fresh allocation
    per call). Detect reuse by buffer address recurrence."""
    if ser._native() is None:
        pytest.skip("no native library")
    zc = zlib.compress(data, 6)
    gc.collect()
    addrs = []
    out = None
    for _ in range(6):
        out = decompress_tpu(zc, engine="host")
        assert isinstance(out, memoryview)
        arr = np.frombuffer(out, np.uint8)
        addrs.append(arr.__array_interface__["data"][0])
        del arr
    assert out == data
    # ping-pong: addresses must repeat (fresh allocation each call would
    # *usually* differ; recurrence proves pool hits). With 6 calls and 2
    # slots at least one address must appear 3 times.
    assert max(addrs.count(a) for a in addrs) >= 3, addrs


def test_native_ptr_keepalive_is_acyclic():
    """native._ptr must not build ctypes reference cycles: after the call
    returns and keepalives drop, the source buffer's refcount is back to
    baseline WITHOUT a gc pass."""
    from zlibng_tpu import native
    if not native.available():
        pytest.skip("no native library")
    a = np.zeros(4096, np.uint8)
    base = sys.getrefcount(a)
    mv = memoryview(a)[16:4000]
    native.adler32(mv)
    native.crc32(mv)
    del mv
    assert sys.getrefcount(a) == base


def test_compat_surfaces_return_bytes(data):
    from zlibng_tpu.stream.inflate import decompress
    from zlibng_tpu import pyzlib
    zc = zlib.compress(data[:30000], 6)
    assert type(decompress(zc)) is bytes
    assert type(pyzlib.decompress(zc)) is bytes
