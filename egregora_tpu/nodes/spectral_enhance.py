"""Spectral Enhance ("Fat Llama") nodes — one XLA engine, two node names.

The reference splits this into a CUDA/CuPy node
(``egregora_fat_llama_gpu.py:228-303``) and an FFTW/CPU node
(``egregora_fat_llama_cpu.py:136-194``), both shelling out to external
packages through temp WAV files.  Here one array-in/array-out engine
(ops/spectral.py) serves both node names for API parity; the "CPU"
variant simply pins the same program to the CPU backend.  No temp-file
round trips (the reference crosses process<->filesystem twice per call,
SURVEY.md §3.2).

Input handling keeps the reference's full surface: AUDIO dict, file
path, or URL (``_normalize_audio_input``, gpu :40-80), including the
[S,C] heuristic + peak clamp (``_to_cs``, gpu :18-32 — via
core.audio.to_cs).  ``target_format`` is accepted for parity; with no
file round-trip it only matters when the caller writes the result out.
"""
from __future__ import annotations

import tempfile
import time
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.audio import to_cs
from ..ops.spectral import spectral_enhance, upscale_factor
from .base import comfy_audio

FUNCTION = "run"
CATEGORY = "Egregora/Audio"


def _normalize_audio_input(AUDIO=None, audio_path: str = "",
                           audio_url: str = "") -> Tuple[np.ndarray, int]:
    """AUDIO dict / (arr, sr) / path / URL -> ([C, S] float32, sr)."""
    if isinstance(AUDIO, dict) and "waveform" in AUDIO and "sample_rate" in AUDIO:
        wf = AUDIO["waveform"]
        if hasattr(wf, "detach"):
            wf = wf.detach().cpu().numpy()
        wf = np.asarray(wf)
        if wf.ndim == 3:
            wf = wf[0]
        if wf.ndim != 2:
            raise RuntimeError(
                f"Unexpected AUDIO tensor shape: {wf.shape} (want [C,T])")
        return wf.astype(np.float32), int(AUDIO["sample_rate"])
    if isinstance(AUDIO, (list, tuple)) and len(AUDIO) == 2:
        arr, sr = AUDIO
        return to_cs(arr), int(sr)
    if audio_path:
        p = Path(audio_path)
        if not p.exists():
            raise RuntimeError(f"audio_path not found: {audio_path}")
        from ..utils.wavio import read_audio
        y, sr = read_audio(p)
        return to_cs(y), sr
    if audio_url:
        import requests
        r = requests.get(audio_url, timeout=60)
        r.raise_for_status()
        p = Path(tempfile.gettempdir()) / f"eg_url_{int(time.time()*1000)}.wav"
        p.write_bytes(r.content)
        from ..utils.wavio import read_audio
        y, sr = read_audio(p)
        return to_cs(y), sr
    raise RuntimeError("No AUDIO provided.")


def _run_engine(cs: np.ndarray, sr: int, max_iterations: int, threshold_value: float,
                target_bitrate_kbps: int, toggle_normalize: bool,
                toggle_autoscale: bool, device: Optional[str] = None):
    factor = upscale_factor(sr, cs.shape[0], int(target_bitrate_kbps))
    x = jnp.asarray(cs)
    platform = jax.devices()[0].platform
    if device is not None:
        devs = [d for d in jax.devices() if d.platform == device] or \
               jax.devices(device)
        x = jax.device_put(x, devs[0])
        platform = devs[0].platform
    # MXU matmul-FFT path on accelerators; native FFT on CPU where dense
    # DFT matmuls would be slower than FFTW-class transforms
    use_mm = platform not in ("cpu",)
    y = spectral_enhance(x, factor, int(max_iterations), float(threshold_value),
                         toggle_normalize=bool(toggle_normalize),
                         toggle_autoscale=bool(toggle_autoscale),
                         use_matmul_fft=use_mm)
    return np.asarray(y), sr * factor


class EgregoraFatLlamaTPU:
    """Spectral Enhance — accelerator path (the reference GPU node's
    signature, gpu :234-250, incl. normalize/autoscale toggles)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "target_format": (["wav", "flac"],),
                "max_iterations": ("INT", {"default": 300, "min": 1, "max": 5000}),
                "threshold_value": ("FLOAT", {"default": 0.6, "min": 0.0, "max": 1.0, "step": 0.01}),
                "target_bitrate_kbps": ("INT", {"default": 1411, "min": 64, "max": 5000}),
                "toggle_normalize": ("BOOLEAN", {"default": True}),
                "toggle_autoscale": ("BOOLEAN", {"default": True}),
            },
            "optional": {
                "AUDIO": ("AUDIO",),
                "audio_path": ("STRING", {"default": ""}),
                "audio_url": ("STRING", {"default": ""}),
            },
        }

    RETURN_TYPES = ("AUDIO",)
    FUNCTION = FUNCTION
    CATEGORY = CATEGORY
    OUTPUT_NODE = False
    _DEVICE: Optional[str] = None  # default backend (TPU when present)

    def run(self, target_format, max_iterations, threshold_value,
            target_bitrate_kbps, toggle_normalize=True, toggle_autoscale=True,
            AUDIO=None, audio_path="", audio_url=""):
        cs, sr = _normalize_audio_input(AUDIO, audio_path, audio_url)
        y, out_sr = _run_engine(cs, sr, max_iterations, threshold_value,
                                target_bitrate_kbps, toggle_normalize,
                                toggle_autoscale, device=self._DEVICE)
        return (comfy_audio(out_sr, y),)


class EgregoraFatLlamaCPU(EgregoraFatLlamaTPU):
    """Spectral Enhance — CPU backend (the reference CPU/FFTW node's
    signature: no normalize/autoscale toggles, default 800 iterations,
    cpu :143-156).  Same XLA program, pinned to the CPU backend."""

    _DEVICE = "cpu"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "target_format": (["wav", "flac"],),
                "max_iterations": ("INT", {"default": 800, "min": 1, "max": 10000}),
                "threshold_value": ("FLOAT", {"default": 0.6, "min": 0.0, "max": 1.0, "step": 0.01}),
                "target_bitrate_kbps": ("INT", {"default": 1411, "min": 64, "max": 5000}),
            },
            "optional": {
                "AUDIO": ("AUDIO",),
                "audio_path": ("STRING", {"default": ""}),
                "audio_url": ("STRING", {"default": ""}),
            },
        }

    def run(self, target_format, max_iterations, threshold_value,
            target_bitrate_kbps, AUDIO=None, audio_path="", audio_url=""):
        cs, sr = _normalize_audio_input(AUDIO, audio_path, audio_url)
        y, out_sr = _run_engine(cs, sr, max_iterations, threshold_value,
                                target_bitrate_kbps, True, False,
                                device=self._DEVICE)
        return (comfy_audio(out_sr, y),)


NODE_CLASS_MAPPINGS = {
    "EgregoraFatLlamaGPU": EgregoraFatLlamaTPU,   # reference key kept
    "EgregoraFatLlamaCPU": EgregoraFatLlamaCPU,
}
NODE_DISPLAY_NAME_MAPPINGS = {
    "EgregoraFatLlamaGPU": "🎛️ Spectral Enhance (Fat Llama — TPU)",
    "EgregoraFatLlamaCPU": "🎛️ Spectral Enhance (Fat Llama — CPU/XLA)",
}
