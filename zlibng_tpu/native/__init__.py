"""Native host-runtime bindings (ctypes over zng_host.c).

The shared object is built on first use with the system C compiler and
cached next to the source, keyed by a source hash — the framework's
analog of the reference's compiled runtime (its whole library is C11).
Everything has a pure-Python/numpy fallback: `lib()` returns None when no
toolchain is available and callers must cope.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "zng_host.c")
_lib = None          # None = not tried, False = unavailable, else CDLL


_CFLAGS = ["-O3", "-march=native", "-fPIC", "-shared", "-lm"]
_CFLAGS_PORTABLE = ["-O3", "-fPIC", "-shared", "-lm"]


def _build(so_path: str) -> bool:
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang", "g++"):
        if not cc:
            continue
        for flags in (_CFLAGS, _CFLAGS_PORTABLE):
            cmd = [cc, *flags, "-o", so_path, _SRC]
            if cc.endswith("g++") or cc.endswith("clang++"):
                cmd.insert(1, "-x")
                cmd.insert(2, "c")
            try:
                r = subprocess.run(cmd, capture_output=True, timeout=120)
            except (OSError, subprocess.TimeoutExpired):
                continue
            if r.returncode == 0 and os.path.exists(so_path):
                return True
    return False


def lib():
    """Return the loaded native library, building it if needed, or None."""
    global _lib
    if _lib is not None:
        return _lib or None
    try:
        with open(_SRC, "rb") as f:
            key = f.read() + repr(_CFLAGS).encode()
        tag = hashlib.sha256(key).hexdigest()[:16]
        cache_dir = os.environ.get("ZLIBNG_TPU_NATIVE_DIR") or _HERE
        if not os.access(cache_dir, os.W_OK):
            cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                     "zlibng_tpu")
            os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"_zng_host_{tag}.so")
        if not os.path.exists(so_path) and not _build(so_path):
            _lib = False
            return None
        lb = ctypes.CDLL(so_path)
        lb.zng_adler32.restype = ctypes.c_uint32
        lb.zng_adler32.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.c_uint32]
        lb.zng_crc32.restype = ctypes.c_uint32
        lb.zng_crc32.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                 ctypes.c_uint32]
        lb.zng_fill_lut.restype = None
        lb.zng_fill_lut.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.c_int, ctypes.c_void_p]
        lb.zng_read_dyn_header.restype = ctypes.c_long
        lb.zng_read_dyn_header.argtypes = [
            ctypes.c_void_p, ctypes.c_long,                 # data, nbytes
            ctypes.POINTER(ctypes.c_long),                  # bitpos
            ctypes.c_void_p,                                # lengths out
            ctypes.POINTER(ctypes.c_long),                  # hlit
            ctypes.POINTER(ctypes.c_long),                  # hdist
            ctypes.c_void_p, ctypes.c_void_p,               # lit/dist LUTs
            ctypes.c_void_p,                                # lut_bits[2]
        ]
        lb.zng_inflate_stream.restype = ctypes.c_long
        lb.zng_inflate_stream.argtypes = [
            ctypes.c_void_p, ctypes.c_long,                 # data, nbytes
            ctypes.POINTER(ctypes.c_long),                  # bitpos
            ctypes.c_void_p,                                # state int64[8]
            ctypes.c_void_p, ctypes.c_long,                 # lit tbl2, cap
            ctypes.c_void_p, ctypes.c_long,                 # dist tbl2, cap
            ctypes.c_void_p, ctypes.c_long,                 # out, out_cap
            ctypes.POINTER(ctypes.c_long),                  # out_len
            ctypes.c_long, ctypes.c_int,                    # wsize, finish
            ctypes.POINTER(ctypes.c_long),                  # ncodes
            ctypes.c_int,                                   # stop_after_block
        ]
        lb.zng_decode_huff.restype = ctypes.c_long
        lb.zng_decode_huff.argtypes = [
            ctypes.c_void_p, ctypes.c_long,                 # data, nbytes
            ctypes.POINTER(ctypes.c_long),                  # bitpos
            ctypes.c_void_p, ctypes.c_void_p,               # lit/dist LUTs
            ctypes.c_void_p, ctypes.c_long,                 # out, out_cap
            ctypes.POINTER(ctypes.c_long),                  # out_len
            ctypes.c_long, ctypes.c_int,                    # wsize, finish
            ctypes.POINTER(ctypes.c_long),                  # ncodes
            ctypes.c_int, ctypes.c_int,                     # lit/dist bits
        ]
        lb.zng_huff_table.restype = None
        lb.zng_huff_table.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int,   # freqs,n,maxbits
            ctypes.c_void_p, ctypes.c_void_p,               # lengths, codes
        ]
        lb.zng_dyn_header.restype = ctypes.c_long
        lb.zng_dyn_header.argtypes = [
            ctypes.c_void_p, ctypes.c_long,                 # lit lengths, n
            ctypes.c_void_p, ctypes.c_long,                 # dist lengths, n
            ctypes.c_void_p, ctypes.c_void_p,               # tok val/bits
            ctypes.POINTER(ctypes.c_long),                  # total_bits
        ]
        lb.zng_est_block_bits.restype = ctypes.c_double
        lb.zng_est_block_bits.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib = lb
        return lb
    except Exception:
        _lib = False
        return None


def available() -> bool:
    return lib() is not None


def _ptr(data):
    """(address, nbytes, keepalive) for bytes/bytearray/memoryview/ndarray
    without copying.

    Deliberately avoids ctypes from_buffer/cast keepalives: they build
    reference CYCLES (the ctypes object's _objects dict), so the source
    buffer stays referenced until a gc pass — which defeated the
    refcount-guarded zero-copy scratch reuse in inflate_serial (a free
    buffer looked held and every decode cold-allocated). np.frombuffer
    holds the buffer via a plain acyclic base reference, released the
    moment the keepalive drops."""
    if hasattr(data, "ctypes"):                       # numpy ndarray
        return ctypes.c_void_p(data.ctypes.data), data.nbytes, data
    if isinstance(data, bytes):
        return ctypes.cast(ctypes.c_char_p(data), ctypes.c_void_p), \
            len(data), data
    import numpy as np
    arr = np.frombuffer(memoryview(data), np.uint8)
    return ctypes.c_void_p(arr.ctypes.data), arr.nbytes, arr


def huff_table(freqs, max_bits: int):
    """Native encode-side Huffman build: (lengths, lsb-first codes), both
    int32 arrays of len(freqs). Bit-identical to the numpy path (same
    tie-breaking); caller guarantees `available()` and len(freqs) <= 320."""
    import numpy as np
    f = np.ascontiguousarray(freqs, np.int64)
    lengths = np.empty(f.size, np.int32)
    codes = np.empty(f.size, np.int32)
    lib().zng_huff_table(ctypes.c_void_p(f.ctypes.data), f.size, max_bits,
                         ctypes.c_void_p(lengths.ctypes.data),
                         ctypes.c_void_p(codes.ctypes.data))
    return lengths, codes


def dyn_header(lit_lengths, dist_lengths):
    """Native dynamic-header build: (tok_val, tok_bits, total_bits)."""
    import numpy as np
    ll = np.ascontiguousarray(lit_lengths, np.int32)
    dl = np.ascontiguousarray(dist_lengths, np.int32)
    tv = np.empty(720, np.int32)
    tb = np.empty(720, np.int32)
    total = ctypes.c_long(0)
    nt = lib().zng_dyn_header(ctypes.c_void_p(ll.ctypes.data), ll.size,
                              ctypes.c_void_p(dl.ctypes.data), dl.size,
                              ctypes.c_void_p(tv.ctypes.data),
                              ctypes.c_void_p(tb.ctypes.data),
                              ctypes.byref(total))
    return tv[:nt], tb[:nt], int(total.value)


def est_block_bits(lfreq, dfreq) -> float:
    """Native dynamic-block size estimate; caller guarantees `available()`
    and shapes (286,), (30,) int64 contiguous."""
    return float(lib().zng_est_block_bits(
        ctypes.c_void_p(lfreq.ctypes.data),
        ctypes.c_void_p(dfreq.ctypes.data)))


def adler32(data, value: int = 1) -> int:
    """Native adler32; caller guarantees `available()`."""
    p, n, keep = _ptr(data)
    return int(lib().zng_adler32(p, n, value & 0xFFFFFFFF))


def crc32(data, value: int = 0) -> int:
    """Native crc32; caller guarantees `available()`."""
    p, n, keep = _ptr(data)
    return int(lib().zng_crc32(p, n, value & 0xFFFFFFFF))
