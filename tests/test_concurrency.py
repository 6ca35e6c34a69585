"""Concurrent independent streams over the native (ctypes) boundary.

Reference analog: test/test_deflate_concurrency.cc (independent zng_stream
objects on separate threads) and the atomic functable init
(functable.c:17-39). Our seams under concurrency:
  * native decode hot loop + checksums release the GIL (zng_host.c) — many
    threads may be inside the .so at once
  * PCLMUL fold-constant self-test runs under pthread_once
  * per-stream state is plain Python data (no shared mutable globals)
"""
import threading
import zlib

import numpy as np
import pytest

from zlibng_tpu.checksum.adler32 import adler32
from zlibng_tpu.checksum.crc32 import crc32
from zlibng_tpu.stream.api import Deflate, Inflate, Z_FINISH
from zlibng_tpu.stream.deflate import compress as compress_host
from zlibng_tpu.stream.inflate import decompress as decompress_host

N_THREADS = 8
ROUNDS = 6


def _payload(seed: int, n: int) -> bytes:
    rng = np.random.default_rng(seed)
    words = [bytes(rng.integers(97, 123, rng.integers(3, 10), dtype=np.uint8))
             for _ in range(40)]
    out = bytearray()
    i = 0
    while len(out) < n:
        out += words[(i * 13) % 40] + b" "
        i += 1
    return bytes(out[:n])


def _run_threads(worker):
    errors = []
    barrier = threading.Barrier(N_THREADS)

    def wrapped(tid):
        try:
            barrier.wait()  # maximize overlap inside the native code
            worker(tid)
        except Exception as e:  # pragma: no cover - failure path
            errors.append((tid, repr(e)))

    ts = [threading.Thread(target=wrapped, args=(i,)) for i in range(N_THREADS)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors


def test_concurrent_oneshot_roundtrips():
    payloads = [_payload(100 + i, 150_000 + 1000 * i) for i in range(N_THREADS)]

    def worker(tid):
        data = payloads[tid]
        for r in range(ROUNDS):
            level = 1 + (tid + r) % 9
            z = compress_host(data, level=level)
            assert decompress_host(z) == data       # native decode path
            assert zlib.decompress(z) == data

    _run_threads(worker)


def test_concurrent_streaming_objects():
    payloads = [_payload(200 + i, 120_000) for i in range(N_THREADS)]

    def worker(tid):
        data = payloads[tid]
        d = Deflate(level=6)
        out = bytearray()
        for off in range(0, len(data), 17_000):
            out += d.compress(data[off:off + 17_000])
        out += d.flush(Z_FINISH)
        inf = Inflate()
        got = bytearray()
        for off in range(0, len(out), 7_001):
            got += inf.decompress(bytes(out[off:off + 7_001]))
        assert bytes(got) == data

    _run_threads(worker)


def test_concurrent_checksums_match_serial():
    payloads = [_payload(300 + i, 300_000) for i in range(N_THREADS)]
    expect = [(zlib.crc32(p), zlib.adler32(p)) for p in payloads]

    def worker(tid):
        p = payloads[tid]
        for _ in range(ROUNDS):
            c = crc32(p)
            a = adler32(p)
            # incremental form crosses the ctypes boundary repeatedly
            ci, ai = 0, 1
            for off in range(0, len(p), 37_003):
                chunk = p[off:off + 37_003]
                ci = crc32(chunk, ci)
                ai = adler32(chunk, ai)
            assert (c, a) == expect[tid] == (ci, ai)

    _run_threads(worker)


def test_concurrent_mixed_compress_decode():
    """Compressors and decompressors interleaved on the same payloads —
    independent streams must never observe each other's state."""
    payloads = [_payload(400 + i, 80_000) for i in range(N_THREADS)]
    blobs = [compress_host(p, level=6) for p in payloads]

    def worker(tid):
        for r in range(ROUNDS):
            j = (tid + r) % N_THREADS
            if (tid + r) % 2:
                assert decompress_host(blobs[j]) == payloads[j]
            else:
                z = compress_host(payloads[j], level=4)
                assert zlib.decompress(z) == payloads[j]

    _run_threads(worker)
