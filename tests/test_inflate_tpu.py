"""TPU batch decoder (ops/inflate_tpu.py) vs the zlib oracle.

Mirrors the reference's inflate coverage strategy (SURVEY §4): round-trip
corpora across levels/strategies, preset dictionaries, stored/static/
dynamic block mixes, corrupt-stream rejection with zlib's exact error
messages, and the parallel segment engine. A no-fallback fixture proves
the device path (phase A speculative decode + chain walk, phase B
pointer-doubling LZ77) handles these streams itself rather than deferring
to the serial conformance decoder.
"""
import gzip
import zlib

import numpy as np
import pytest

import zlibng_tpu.stream.inflate_serial as _ser
from zlibng_tpu.errors import DataError
from zlibng_tpu.ops import inflate_tpu as itpu


@pytest.fixture
def no_serial_fallback(monkeypatch):
    def boom(*a, **k):
        raise AssertionError("device decode fell back to serial")
    monkeypatch.setattr(_ser, "inflate_raw", boom)


def _corpora():
    text = open("/root/reference/test/data/lcet10.txt", "rb").read()[:200_000]
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
    return {
        "text": text,
        "random": rand,
        "zeros": bytes(100_000),
        "runs": b"abcabcabc" * 10_000,
        "mixed": text[:50_000] + rand[:50_000] + bytes(40_000) + text[:50_000],
        "tiny": b"hello",
        "empty": b"",
    }


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_roundtrip_vs_zlib_levels(level, no_serial_fallback):
    for name, data in _corpora().items():
        c = zlib.compress(data, level)
        assert itpu.decompress_tpu(c) == data, (name, level)


def test_gzip_and_raw_framing(no_serial_fallback):
    data = _corpora()["text"]
    assert itpu.decompress_tpu(gzip.compress(data), wbits=31) == data
    assert itpu.decompress_tpu(gzip.compress(data), wbits=47) == data  # auto
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush()
    assert itpu.decompress_tpu(raw, wbits=-15) == data


def test_own_encoder_output(no_serial_fallback):
    from zlibng_tpu.ops.deflate_tpu import compress_tpu
    data = _corpora()["text"]
    for level in (1, 6):
        assert itpu.decompress_tpu(compress_tpu(data, level)) == data


def test_preset_dictionary(no_serial_fallback):
    data = _corpora()["text"]
    dictv = data[:30_000]
    co = zlib.compressobj(6, zlib.DEFLATED, -15, 8, 0, dictv)
    raw = co.compress(data) + co.flush()
    out, _ = itpu.inflate_raw_tpu(raw, 15, dictionary=dictv)
    assert out == data


def test_small_window_wbits9(no_serial_fallback):
    data = _corpora()["text"]
    co = zlib.compressobj(6, zlib.DEFLATED, -9)
    raw = co.compress(data) + co.flush()
    out, _ = itpu.inflate_raw_tpu(raw, 9)
    assert out == data


def test_multiblock_history_crosses_blocks(no_serial_fallback):
    # >64 KiB of repetitive data → multiple deflate blocks with matches
    # whose window reaches back into earlier blocks
    data = (open("/root/reference/test/data/lcet10.txt", "rb").read()[:300_000]
            * 2)
    c = zlib.compress(data, 6)
    assert itpu.decompress_tpu(c) == data


def test_segment_engine_parallel_waves(no_serial_fallback):
    from zlibng_tpu.parallel.index import compress_indexed
    data = _corpora()["text"] * 3
    blob, idx = compress_indexed(data, level=6, segment=1 << 17)
    assert len(idx.comp_offsets) - 1 >= 3
    outs = itpu.decompress_segments_tpu(blob, idx.comp_offsets[:-1])
    assert b"".join(outs) == data


def test_corrupt_streams_match_serial_errors():
    data = _corpora()["text"]
    base = zlib.compress(data, 6)
    for flip in (300, 1000, len(base) - 6):
        c = bytearray(base)
        c[flip] ^= 0xFF
        c = bytes(c)
        serial_err = device_err = None
        try:
            zlib.decompress(c)
        except zlib.error:
            pass  # oracle agrees it is corrupt (message formats differ)
        try:
            from zlibng_tpu.stream.inflate import decompress
            decompress(c)
        except DataError as e:
            serial_err = str(e)
        try:
            itpu.decompress_tpu(c)
        except DataError as e:
            device_err = str(e)
        assert device_err == serial_err  # fallback reruns serial exactly


def test_truncated_stream(no_serial_fallback, monkeypatch):
    # truncation must raise, via the serial path for the exact message
    monkeypatch.undo()
    data = _corpora()["text"]
    c = zlib.compress(data, 6)[:100]
    with pytest.raises(DataError):
        itpu.decompress_tpu(c)


def test_checksum_verification():
    data = _corpora()["text"]
    c = bytearray(zlib.compress(data, 6))
    c[-1] ^= 0xFF  # adler trailer
    with pytest.raises(DataError, match="incorrect data check"):
        itpu.decompress_tpu(bytes(c))
