"""Round-3 parity tail: ZLIBNG_TPU_TRACE facility (zutil.h Trace analog +
trees.c:693 bit-accounting invariant) and the inflateBack caller-owned
window contract (infback.c:34-71)."""
import zlib

import numpy as np
import pytest


@pytest.fixture()
def corpus():
    return open("/root/reference/test/data/lcet10.txt", "rb").read()[:200000]


def test_trace_engine_routing_and_bits(corpus):
    from zlibng_tpu import trace as T
    from zlibng_tpu.ops import deflate_tpu as D
    from zlibng_tpu.ops.inflate_tpu import decompress_tpu

    lines = []
    T.enable(True, sink=lines.append)
    try:
        audit0 = dict(D.audit)
        c = D.compress_tpu(corpus, 6)
        assert zlib.decompress(c) == corpus
        out = decompress_tpu(zlib.compress(corpus, 6), engine="device")
        assert out == corpus
    finally:
        T.enable(False, sink=None)

    text = "\n".join(lines)
    # engine routing traced
    assert "inflate route=device" in text
    # per-dispatch spans traced with timings
    assert "deflate stage1 dispatch" in text and " ms" in text
    assert "deflate stage2-auto dispatch" in text
    # bit accounting: every huff group checked, none exceeded its
    # predicted header+body bits (demotion can only shrink a block)
    assert D.audit["groups_checked"] > audit0["groups_checked"]
    assert D.audit["bit_overruns"] == audit0["bit_overruns"], text
    assert "bits_sent=" in text


def test_trace_disabled_is_silent(corpus):
    from zlibng_tpu import trace as T
    lines = []
    T.enable(False, sink=lines.append)
    from zlibng_tpu.ops.inflate_tpu import decompress_tpu
    decompress_tpu(zlib.compress(corpus[:50000], 6))
    assert lines == []


def test_inflate_back_caller_window(corpus):
    """The writable-window contract: out_fn receives memoryviews INTO the
    caller's buffer; full-window chunks then one partial tail; the buffer
    holds the final window contents afterwards."""
    from zlibng_tpu.stream.inflate import inflate_back

    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(corpus) + co.flush()
    chunks = [raw[i:i + 997] for i in range(0, len(raw), 997)]
    it = iter(chunks + [b""])

    window = bytearray(1 << 15)
    got = bytearray()
    sizes = []

    def out_fn(view):
        assert isinstance(view, memoryview)
        # zero-copy contract: the view aliases the caller's window buffer
        assert view.obj is window or getattr(view, "obj", None) is None
        v = bytes(view)
        sizes.append(len(v))
        got.extend(v)

    inflate_back(lambda: next(it), out_fn, window=window)
    assert bytes(got) == corpus
    # all chunks except the last are exactly one window
    assert all(s == len(window) for s in sizes[:-1])
    assert 0 < sizes[-1] <= len(window)
    # the caller's buffer ends holding the last window of output: its
    # prefix is the final partial chunk
    assert bytes(window[:sizes[-1]]) == corpus[-sizes[-1]:]


def test_inflate_back_window_smaller_than_32k(corpus):
    from zlibng_tpu.stream.inflate import inflate_back

    data = corpus[:40000]
    co = zlib.compressobj(6, zlib.DEFLATED, -12)  # 4K history
    raw = co.compress(data) + co.flush()
    it = iter([raw, b""])
    window = bytearray(1 << 12)
    got = bytearray()
    inflate_back(lambda: next(it), lambda v: got.extend(v), window=window)
    assert bytes(got) == data


def test_inflate_back_bytes_window_still_seeds_history():
    """Compatibility shim: immutable bytes = preset history."""
    from zlibng_tpu.stream.inflate import inflate_back

    dict_ = b"the quick brown fox jumps over the lazy dog"
    data = b"the quick brown fox jumps over the lazy dog again and again"
    cobj = zlib.compressobj(6, zlib.DEFLATED, -15, 9, 0, dict_)
    raw = cobj.compress(data) + cobj.flush()
    it = iter([raw, b""])
    got = bytearray()
    inflate_back(lambda: next(it), lambda b: got.extend(b), window=dict_)
    assert bytes(got) == data
