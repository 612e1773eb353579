"""ctypes bindings for the native host-edge components (native/).

Loads ``libwavcodec.so`` (building it with g++ on first use if the
toolchain is present), exposing the C WAV codec and the threaded batch
decoder.  Callers (utils/wavio.py) fall back to soundfile / stdlib when
the native library is unavailable — the reference's graceful-degradation
policy (``__init__.py:8-30``) applied to the native layer.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "native"


def _build(src_dir: Path) -> Optional[Path]:
    so = src_dir / "libwavcodec.so"
    srcs = [src_dir / "wavcodec.cc", src_dir / "flaccodec.cc"]
    srcs = [s for s in srcs if s.exists()]
    if not srcs:
        return None
    if so.exists() and so.stat().st_mtime >= max(s.stat().st_mtime for s in srcs):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
             "-pthread", "-o", str(so)] + [str(s) for s in srcs],
            check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """The wavcodec library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build(_native_dir())
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.wc_read.restype = ctypes.c_int
    lib.wc_read.argtypes = [ctypes.c_char_p,
                            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_long),
                            ctypes.POINTER(ctypes.c_int)]
    lib.wc_write.restype = ctypes.c_int
    lib.wc_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                             ctypes.c_int, ctypes.c_long, ctypes.c_int,
                             ctypes.c_int]
    lib.wc_read_batch.restype = None
    lib.wc_read_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                  ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_long),
                                  ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.wc_free.restype = None
    lib.wc_free.argtypes = [ctypes.c_void_p]
    lib.wc_last_error.restype = ctypes.c_char_p
    if hasattr(lib, "fc_read"):
        lib.fc_read.restype = ctypes.c_int
        lib.fc_read.argtypes = lib.wc_read.argtypes
        lib.fc_write.restype = ctypes.c_int
        lib.fc_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int, ctypes.c_long, ctypes.c_int]
        lib.fc_free.restype = None
        lib.fc_free.argtypes = [ctypes.c_void_p]
        lib.fc_last_error.restype = ctypes.c_char_p
    _LIB = lib
    return _LIB


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC via the native codec -> ([C, S] float32, sr)."""
    lib = load()
    if lib is None or not hasattr(lib, "fc_read"):
        raise RuntimeError("native flaccodec unavailable")
    data = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_int()
    frames = ctypes.c_long()
    sr = ctypes.c_int()
    rc = lib.fc_read(str(path).encode(), ctypes.byref(data), ctypes.byref(ch),
                     ctypes.byref(frames), ctypes.byref(sr))
    if rc != 0:
        raise RuntimeError(f"flaccodec read failed ({rc}): "
                           f"{lib.fc_last_error().decode()}")
    try:
        n = ch.value * frames.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.fc_free(data)
    return arr.reshape(ch.value, frames.value), sr.value


def write_flac(path: str, samples_cn: np.ndarray, sr: int) -> None:
    """Encode [C, S] float32 to 16-bit FLAC via the native codec."""
    lib = load()
    if lib is None or not hasattr(lib, "fc_write"):
        raise RuntimeError("native flaccodec unavailable")
    s = np.ascontiguousarray(samples_cn, dtype=np.float32)
    if s.ndim == 1:
        s = s[None, :]
    rc = lib.fc_write(str(path).encode(),
                      s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      s.shape[0], s.shape[1], int(sr))
    if rc != 0:
        raise RuntimeError(f"flaccodec write failed ({rc}): "
                           f"{lib.fc_last_error().decode()}")


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV via the native codec -> ([C, S] float32, sr).

    Raises RuntimeError on decode failure (caller may fall back)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native wavcodec unavailable")
    data = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_int()
    frames = ctypes.c_long()
    sr = ctypes.c_int()
    rc = lib.wc_read(str(path).encode(), ctypes.byref(data), ctypes.byref(ch),
                     ctypes.byref(frames), ctypes.byref(sr))
    if rc != 0:
        raise RuntimeError(f"wavcodec read failed ({rc}): "
                           f"{lib.wc_last_error().decode()}")
    try:
        n = ch.value * frames.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.wc_free(data)
    return arr.reshape(ch.value, frames.value), sr.value


def write_wav(path: str, samples_cn: np.ndarray, sr: int, bits: int = 16) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("native wavcodec unavailable")
    s = np.ascontiguousarray(samples_cn, dtype=np.float32)
    if s.ndim == 1:
        s = s[None, :]
    rc = lib.wc_write(str(path).encode(),
                      s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      s.shape[0], s.shape[1], int(sr), int(bits))
    if rc != 0:
        raise RuntimeError(f"wavcodec write failed ({rc}): "
                           f"{lib.wc_last_error().decode()}")


def read_wav_batch(paths: Sequence[str], n_threads: int = 0
                   ) -> List[Optional[Tuple[np.ndarray, int]]]:
    """Threaded parallel decode of many WAVs (host decode overlaps device
    compute in a pipeline).  Failed entries come back as None."""
    lib = load()
    if lib is None:
        raise RuntimeError("native wavcodec unavailable")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    datas = (ctypes.POINTER(ctypes.c_float) * n)()
    chans = (ctypes.c_int * n)()
    frames = (ctypes.c_long * n)()
    srs = (ctypes.c_int * n)()
    lib.wc_read_batch(c_paths, n, datas, chans, frames, srs, int(n_threads))
    out: List[Optional[Tuple[np.ndarray, int]]] = []
    for i in range(n):
        if not datas[i]:
            out.append(None)
            continue
        total = chans[i] * frames[i]
        arr = np.ctypeslib.as_array(datas[i], shape=(total,)).copy()
        lib.wc_free(datas[i])
        out.append((arr.reshape(chans[i], frames[i]), srs[i]))
    return out
