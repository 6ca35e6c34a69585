"""gzFile layer + CLI round-trips, including interop with system gzip."""
import gzip as gz
import os
import subprocess
import sys

import numpy as np
import pytest

from zlibng_tpu.stream.gzfile import GzFile, gzopen

rng = np.random.default_rng(9)
DATA = b"gzfile layer test data with some repetition repetition\n" * 500


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.gz")
    with GzFile(p, "wb", level=6) as g:
        g.write(DATA)
    with GzFile(p, "rb") as g:
        assert g.read() == DATA


def test_interop_with_gzip_module(tmp_path):
    p = str(tmp_path / "t.gz")
    with GzFile(p, "wb9") as g:
        g.write(DATA)
    assert gz.open(p).read() == DATA
    # and reading files written by the gzip module
    p2 = str(tmp_path / "u.gz")
    with gz.open(p2, "wb") as f:
        f.write(DATA)
    with GzFile(p2, "rb") as g:
        assert g.read() == DATA


def test_system_gzip_interop(tmp_path):
    p = str(tmp_path / "t.gz")
    with GzFile(p, "wb") as g:
        g.write(DATA)
    r = subprocess.run(["gzip", "-t", p], capture_output=True)
    assert r.returncode == 0, r.stderr


def test_getc_gets_ungetc(tmp_path):
    p = str(tmp_path / "t.gz")
    with GzFile(p, "wb") as g:
        g.puts("line one\nline two\n")
        g.putc(ord("x"))
    g = GzFile(p, "rb")
    assert g.gets() == b"line one\n"
    c = g.getc()
    assert c == ord("l")
    g.ungetc(c)
    assert g.gets() == b"line two\n"
    assert g.getc() == ord("x")
    assert g.getc() == -1
    assert g.eof()
    g.close()


def test_seek_tell(tmp_path):
    p = str(tmp_path / "t.gz")
    with GzFile(p, "wb") as g:
        g.write(DATA)
    g = GzFile(p, "rb")
    g.seek(100)
    assert g.tell() == 100
    assert g.read(10) == DATA[100:110]
    g.seek(50)  # backward -> rewind+skip
    assert g.read(10) == DATA[50:60]
    g.close()


def test_write_seek_zeros(tmp_path):
    p = str(tmp_path / "t.gz")
    g = GzFile(p, "wb")
    g.write(b"abc")
    g.seek(10)
    g.write(b"xyz")
    g.close()
    assert gz.open(p).read() == b"abc" + bytes(7) + b"xyz"


def test_transparent_read(tmp_path):
    p = str(tmp_path / "plain.txt")
    open(p, "wb").write(b"not gzip data")
    g = GzFile(p, "rb")
    assert g.read() == b"not gzip data"
    assert g.direct()
    g.close()


def test_multimember_read(tmp_path):
    p = str(tmp_path / "mm.gz")
    open(p, "wb").write(gz.compress(b"first|") + gz.compress(b"second"))
    with GzFile(p, "rb") as g:
        assert g.read() == b"first|second"


def test_flush_midstream(tmp_path):
    p = str(tmp_path / "t.gz")
    g = GzFile(p, "wb")
    g.write(b"before flush ")
    g.flush()
    g.write(b"after flush")
    g.close()
    assert gz.open(p).read() == b"before flush after flush"


def test_setparams(tmp_path):
    p = str(tmp_path / "t.gz")
    g = GzFile(p, "wb1")
    g.write(DATA[:1000])
    g.set_params(9)
    g.write(DATA[1000:])
    g.close()
    assert gz.open(p).read() == DATA


def test_cli_minigzip(tmp_path):
    src = tmp_path / "file.txt"
    src.write_bytes(DATA)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "zlibng_tpu.cli.minigzip", "-k", "-9", str(src)],
        cwd="/root/repo", env=env, capture_output=True)
    assert r.returncode == 0, r.stderr
    assert gz.open(str(src) + ".gz").read() == DATA
    # decompress with system gzip for interop
    r = subprocess.run(["gzip", "-dc", str(src) + ".gz"], capture_output=True)
    assert r.stdout == DATA


def test_cli_minideflate_roundtrip(tmp_path):
    import zlib
    src = tmp_path / "file.txt"
    src.write_bytes(DATA)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "zlibng_tpu.cli.minideflate", "-w", "-15",
         "-4", str(src)], cwd="/root/repo", env=env, capture_output=True)
    assert r.returncode == 0, r.stderr
    assert zlib.decompress(r.stdout, -15) == DATA
    r2 = subprocess.run(
        [sys.executable, "-m", "zlibng_tpu.cli.minideflate", "-d", "-w", "-15"],
        cwd="/root/repo", env=env, input=r.stdout, capture_output=True)
    assert r2.stdout == DATA
