"""Node-layer interop: comfy-style AUDIO/IMAGE at the host boundary.

The node layer mirrors the reference's ComfyUI contract exactly
(classmethod ``INPUT_TYPES``, ``RETURN_TYPES``/``RETURN_NAMES``,
``FUNCTION``, ``CATEGORY``); all compute inside is jax.  AUDIO dicts
returned to callers carry a torch CPU ``waveform`` [1, C, T] (the
reference contract, e.g. ``egregora_null_test_suite.py:67-76``) plus
the eval pack's extended keys (``sr``/``samples``/``meta``) so either
consumer style works; inputs are coerced through core.audio.from_any.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..core.audio import AudioBuffer, from_any, normalize_cn


def to_buffer(x: Any, device: bool = True) -> AudioBuffer:
    """``device=False`` keeps samples host-side so the pipeline's
    dispatch edge can transfer in pcm16 wire format (core.audio)."""
    return from_any(x, device=device)


def comfy_audio(sr: int, samples_cn: Any, meta: Optional[dict] = None) -> Dict[str, Any]:
    """Extended AUDIO dict (reference ``make_audio``, eval pack :77-86).

    If the input arrived as a true ``[B, C, T]`` batch (B > 1), the
    fold is undone here so the returned ``waveform`` is ``[B, C, T]``
    again, matching the reference's batch semantics."""
    s = normalize_cn(samples_cn)
    meta = dict(meta or {})
    b = int(meta.get("batch", 1) or 1)
    if b > 1 and s.shape[0] % b == 0:
        arr = np.ascontiguousarray(s).reshape(b, s.shape[0] // b, s.shape[1])
    else:
        arr = np.ascontiguousarray(s)[None, ...]
    try:
        import torch
        wf = torch.from_numpy(arr.copy())
    except Exception:  # torch-less environments still get an array
        wf = arr
    return {
        "sr": int(sr),
        "sample_rate": int(sr),
        "samples": s,
        "waveform": wf,
        "meta": meta,
    }


def buffer_to_comfy(buf: AudioBuffer) -> Dict[str, Any]:
    return comfy_audio(buf.sample_rate, buf.numpy(), buf.meta)


def blank_image(h: int = 8, w: int = 8):
    """IMAGE [1, H, W, 3] zeros (reference ``_blank_image``)."""
    try:
        import torch
        return torch.zeros((1, h, w, 3), dtype=torch.float32)
    except Exception:
        return np.zeros((1, h, w, 3), dtype=np.float32)


def image_from_figure(fig):
    """Matplotlib figure -> IMAGE [1, H, W, 3] in 0..1 (reference
    ``image_from_figure``, null suite :97-112).  Host-side only —
    visualization is not TPU work (SURVEY.md #35)."""
    import io

    import matplotlib
    matplotlib.use("Agg")
    from PIL import Image

    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", dpi=110)
    try:
        fig.clf()
    except Exception:
        pass
    buf.seek(0)
    im = Image.open(buf).convert("RGB")
    arr = np.array(im).astype(np.float32) / 255.0
    try:
        import torch
        return torch.from_numpy(arr).unsqueeze(0)
    except Exception:
        return arr[None, ...]
