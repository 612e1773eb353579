"""Host-edge audio file IO (WAV always; FLAC/others via soundfile if present).

The reference leans on libsndfile through ``soundfile`` for all file IO
(``egregora_fat_llama_gpu.py:36, 291``).  Audio IO is host work, never
on-device (SURVEY.md #33): this module prefers soundfile when
importable and otherwise falls back to a dependency-free WAV codec
(PCM16/24/32 + float32) via the stdlib.
"""
from __future__ import annotations

import wave
from pathlib import Path
from typing import Tuple, Union

import numpy as np

PathLike = Union[str, Path]


def _have_soundfile() -> bool:
    try:
        import soundfile  # noqa: F401
        return True
    except Exception:
        return False


def read_audio(path: PathLike) -> Tuple[np.ndarray, int]:
    """Read an audio file -> (``[C, S]`` float32 in [-1, 1], sr).

    Backend order: native C++ wavcodec (native/wavcodec.cc) for WAV,
    then soundfile (any format), then the stdlib WAV fallback.
    """
    path = str(path)
    if path.lower().endswith(".wav"):
        try:
            from .native import read_wav
            return read_wav(path)
        except Exception:
            pass
    if path.lower().endswith(".flac"):
        try:
            from .native import read_flac
            return read_flac(path)
        except Exception:
            pass
    if _have_soundfile():
        import soundfile as sf
        data, sr = sf.read(path, dtype="float32", always_2d=True)  # [S, C]
        return np.ascontiguousarray(data.T), int(sr)
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif sw == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
    elif sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return np.ascontiguousarray(x.reshape(-1, ch).T), int(sr)


def write_audio(path: PathLike, samples_cn: np.ndarray, sr: int,
                subtype: str = "PCM_16") -> None:
    """Write ``[C, S]`` float32 to a file (format from the extension)."""
    path = str(path)
    s = np.asarray(samples_cn, dtype=np.float32)
    if s.ndim == 1:
        s = s[None, :]
    if path.lower().endswith(".wav"):
        try:
            from .native import write_wav
            bits = 32 if "32" in subtype or "FLOAT" in subtype.upper() else 16
            write_wav(path, s, int(sr), bits)
            return
        except Exception:
            pass
    if path.lower().endswith(".flac"):
        try:
            from .native import write_flac
            write_flac(path, s, int(sr))
            return
        except Exception:
            pass
    if _have_soundfile():
        import soundfile as sf
        sf.write(path, s.T, int(sr), subtype=subtype)
        return
    if not path.lower().endswith(".wav"):
        raise RuntimeError(
            f"soundfile unavailable; stdlib fallback writes WAV only (got {path})")
    q = np.clip(s.T, -1.0, 1.0)
    pcm = (q * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(s.shape[0])
        w.setsampwidth(2)
        w.setframerate(int(sr))
        w.writeframes(pcm.tobytes())
