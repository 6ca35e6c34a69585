"""zlibng_tpu — TPU-native DEFLATE/zlib/gzip codec (zlib-ng capability set).

Public API re-exports live here; see stream/ (host conformance paths),
ops/ (device kernels), parallel/ (multi-chip sharding).
"""
import os

# Persistent XLA compilation cache: the codec's jitted stages are large
# fixed-shape programs; caching makes cold-process startup ~instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/zlibng_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _configure_jax_cache():
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_configure_jax_cache()

from .checksum.adler32 import adler32, adler32_combine          # noqa: E402
from .checksum.crc32 import (                                    # noqa: E402
    crc32, crc32_combine, crc32_combine_gen, crc32_combine_op,
)
from .errors import (                                            # noqa: E402
    BufError, DataError, Error, NeedDictError, StreamError,
)
from .stream.deflate import (                                    # noqa: E402
    Z_DEFAULT_STRATEGY, Z_FILTERED, Z_FIXED, Z_HUFFMAN_ONLY, Z_RLE,
    compress, compress_bound,
)
from .stream.inflate import decompress, gzip_decompress          # noqa: E402

__version__ = "0.1.0"
ZLIBNG_PARITY_VERSION = "2.2.2"  # capability target (reference zlib-ng.h.in:51)

from .stream.api import (                                        # noqa: E402
    Deflate, Inflate, Z_BLOCK, Z_FINISH, Z_FULL_FLUSH, Z_NO_FLUSH,
    Z_PARTIAL_FLUSH, Z_SYNC_FLUSH, Z_TREES,
)
from .stream.gzfile import GzFile, gzdopen, gzopen               # noqa: E402


def compress_tpu(data, level: int = 6, wbits: int = 15, strategy: int = 0,
                 dictionary=None) -> bytes:
    """One-shot compression on the TPU block-parallel pipeline (lazy import
    so pure-host users never touch jax)."""
    from .ops.deflate_tpu import compress_tpu as _ct
    return _ct(data, level=level, wbits=wbits, strategy=strategy,
               dictionary=dictionary)


def decompress_tpu(data, wbits: int = 15, dictionary=None):
    """One-shot decompression on the TPU batch decoder (ops/inflate_tpu:
    speculative token resolution + pointer-doubling LZ77); falls back to
    the serial conformance decoder for streams it cannot batch. Returns
    bytes-like (a zero-copy memoryview on the native host path — wrap with
    bytes() if a real bytes object is required)."""
    from .ops.inflate_tpu import decompress_tpu as _dt
    return _dt(data, wbits=wbits, dictionary=dictionary)
