"""Strategy semantics on the TPU encode path — VERDICT round-2 item 6.

The reference dispatches by strategy regardless of level
(deflate.c:1036-1043): Z_HUFFMAN_ONLY -> deflate_huff.c (literals only),
Z_RLE -> deflate_rle.c (distance-1 runs only), Z_FILTERED drops matches of
length <= 5. These tests pin the same semantics on compress_tpu output by
scanning the emitted DEFLATE token stream, not just round-tripping.
"""
import zlib

import numpy as np
import pytest

from zlibng_tpu.ops.deflate_tpu import compress_tpu
from zlibng_tpu.stream.deflate import (
    Z_FILTERED, Z_FIXED, Z_HUFFMAN_ONLY, Z_RLE,
)


def scan_tokens(raw: bytes):
    """Decode a raw DEFLATE stream into (kind, length, dist) tokens.

    kind: 'lit' | 'match' | 'stored'. Independent test-side scanner built
    on the serial parser's header/LUT machinery (packed sym<<4|nbits LUTs).
    """
    from zlibng_tpu.format.constants import (
        DIST_BASE, DIST_EXTRA, LENGTH_BASE, LENGTH_EXTRA,
    )
    from zlibng_tpu.stream.inflate_serial import (
        _S_BLOCK_HEADER, _S_HUFF, _S_STORED, NEED_INPUT, RawInflater,
    )

    inf = RawInflater()
    inf.feed(raw)
    data = np.frombuffer(raw, np.uint8)
    toks = []
    while True:
        inf.state = _S_BLOCK_HEADER
        r = inf._read_block_header(finish=True)
        assert r is not NEED_INPUT
        if inf.state == _S_STORED:
            n = inf.stored_remaining
            if n:
                toks.append(("stored", n, 0))
            inf.bitpos += 8 * n
            if inf.final_block:
                return toks
            continue
        assert inf.state == _S_HUFF
        wl, wd = inf._lut_bits
        lit = np.array(inf.lit_lut[: 1 << wl], np.int32)
        dist = np.array(inf.dist_lut[: 1 << wd], np.int32)

        def peek(nbits):
            byte = inf.bitpos >> 3
            acc = 0
            for i in range((nbits + 7 + (inf.bitpos & 7)) // 8 + 1):
                if byte + i < data.size:
                    acc |= int(data[byte + i]) << (8 * i)
            return (acc >> (inf.bitpos & 7)) & ((1 << nbits) - 1)

        while True:
            e = int(lit[peek(wl)])
            assert e >= 0, "invalid code"
            sym, nb = e >> 4, e & 15
            inf.bitpos += nb
            if sym < 256:
                toks.append(("lit", 1, 0))
                continue
            if sym == 256:
                break
            lx = int(LENGTH_EXTRA[sym - 257])
            length = int(LENGTH_BASE[sym - 257]) + (peek(lx) if lx else 0)
            inf.bitpos += lx
            de = int(dist[peek(wd)])
            assert de >= 0, "invalid dist code"
            dsym, dnb = de >> 4, de & 15
            inf.bitpos += dnb
            dx = int(DIST_EXTRA[dsym])
            d = int(DIST_BASE[dsym]) + (peek(dx) if dx else 0)
            inf.bitpos += dx
            toks.append(("match", length, d))
        if inf.final_block:
            return toks


@pytest.fixture(scope="module")
def corpus():
    text = open("/root/reference/test/data/lcet10.txt", "rb").read()[:131072]
    runs = (b"a" * 900 + b"bcd" + b"e" * 500 + bytes(range(256)) * 8) * 40
    return {"text": text, "runs": runs[:131072]}


@pytest.mark.parametrize("strategy",
                         [Z_FILTERED, Z_HUFFMAN_ONLY, Z_RLE, Z_FIXED])
@pytest.mark.parametrize("name", ["text", "runs"])
def test_tpu_strategy_roundtrip(corpus, strategy, name):
    data = corpus[name]
    c = compress_tpu(data, level=6, strategy=strategy)
    assert zlib.decompress(c) == data


def test_tpu_rle_emits_only_dist1(corpus):
    c = compress_tpu(corpus["runs"], level=6, strategy=Z_RLE, wbits=-15)
    toks = scan_tokens(c)
    dists = {d for k, _, d in toks if k == "match"}
    assert dists, "Z_RLE on run data must emit dist-1 matches"
    assert dists == {1}, f"Z_RLE emitted non-run distances: {sorted(dists)}"


def test_tpu_huffman_only_emits_no_matches(corpus):
    c = compress_tpu(corpus["runs"], level=6, strategy=Z_HUFFMAN_ONLY,
                     wbits=-15)
    toks = scan_tokens(c)
    assert all(k != "match" for k, _, _ in toks), \
        "Z_HUFFMAN_ONLY must not emit matches"


def test_tpu_filtered_drops_short_matches(corpus):
    c = compress_tpu(corpus["text"], level=6, strategy=Z_FILTERED, wbits=-15)
    toks = scan_tokens(c)
    lens = [ln for k, ln, _ in toks if k == "match"]
    assert lens, "text should still contain long matches under Z_FILTERED"
    assert min(lens) >= 6, f"Z_FILTERED emitted a len-{min(lens)} match"


def test_tpu_default_vs_rle_ordering(corpus):
    data = corpus["runs"]
    c_def = compress_tpu(data, 6)
    c_rle = compress_tpu(data, 6, strategy=Z_RLE)
    c_huf = compress_tpu(data, 6, strategy=Z_HUFFMAN_ONLY)
    assert len(c_def) <= len(c_rle) <= len(c_huf)


def test_tpu_tune_good_controls_escalation(corpus):
    """deflateTune's `good` is live on the device path: a higher threshold
    escalates more positions past the dense probe region (chain >
    DENSE_PROBES=16, the L7-L9 tier), so output is never larger, and a
    degenerate threshold (good<=4 => dense probes only) is valid but
    weaker."""
    from zlibng_tpu.stream.deflate import LevelConfig
    data = corpus["text"]
    lo = compress_tpu(data, 8, tune=LevelConfig(32, True, 64, 258, good=4))
    hi = compress_tpu(data, 8, tune=LevelConfig(32, True, 64, 258, good=16))
    assert zlib.decompress(lo) == data and zlib.decompress(hi) == data
    assert len(hi) <= len(lo)
    assert len(hi) < len(lo), "good threshold had no effect on text"


def test_tpu_full_lane_payload_roundtrip(corpus):
    """Regression: candidate positions are packed as (l16 << pos_bits) |
    cand, and pos_bits was hardcoded to 17 — any lane with more than 2^17
    positions (history + payload) silently corrupted every match past
    byte 98304 of the payload. Exercise payload lengths straddling a full
    lane at each level tier.

    The payload size must actually SELECT the 128 KiB lane bucket: the
    size-bucket chooser minimizes processed positions, and LANE_BLOCK+4096
    lands in the 64 KiB bucket (3 x 98304 < 2 x 163840 positions), where
    pos_bits stays 17 and the old bug is invisible. 2*LANE_BLOCK+4096
    selects 128 KiB lanes (3 x 163840 < 5 x 98304), so lanes exceed 2^17
    positions and pos_bits must widen to 18."""
    from zlibng_tpu.ops.deflate_tpu import LANE_BLOCK, LANE_HIST, LANE_BLOCKS

    n = 2 * LANE_BLOCK
    # pin the bucket selection itself: the chooser must pick the max lane
    picked = min(LANE_BLOCKS, key=lambda lb: (-(-n // lb) * (lb + LANE_HIST),
                                              -lb))
    assert picked == LANE_BLOCK, "payload no longer selects the max lane"
    data = (corpus["text"] * 9)[:n]
    for lvl in (1, 6):
        c = compress_tpu(data, lvl)
        assert zlib.decompress(c) == data, lvl
