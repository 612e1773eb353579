"""AudioBuffer: the framework's on-device audio container.

TPU-native replacement for the reference's ``AUDIO`` dict contract
(``{"waveform": torch.Tensor[B,C,T], "sample_rate": int}``; see
reference ``egregora_audio_super_resolution.py:116-156`` and
``egregora_null_test_suite.py:67-94``).  Samples live in a single
``jnp.float32`` array shaped ``[C, S]`` (channels-first); the sample
rate and metadata are static Python values so that any function taking
an ``AudioBuffer`` can be ``jax.jit``-ed with the array as the only
traced leaf.

Shape-coercion semantics intentionally match the reference:

* ``_normalize_CN`` (null suite :41-56 / eval pack :60-74): squeeze,
  1-D -> [1, N], 2-D with more rows than cols -> transpose, >2-D ->
  move the longest axis last and flatten the rest into channels.
* ``_to_cs`` (fat_llama gpu :18-32): the [S, C] detection heuristic
  (``w <= 8 and h > w``) plus peak clamp to <= 1.0.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

ArrayLike = Union[np.ndarray, jnp.ndarray, list, tuple]


def _to_numpy(x: Any) -> np.ndarray:
    """Coerce torch tensors / jax arrays / lists to a numpy array."""
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, jnp.ndarray):
        return np.asarray(x)
    if hasattr(x, "detach") and hasattr(x, "cpu"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def normalize_cn(arr: ArrayLike) -> np.ndarray:
    """Coerce arbitrary shapes to channels-first ``[C, N]`` float32.

    Mirrors ``_normalize_CN`` in the reference null suite (:41-56).
    """
    a = np.asarray(_to_numpy(arr))
    a = np.squeeze(a)
    if a.ndim == 0:
        a = a.reshape(1, 1)
    elif a.ndim == 1:
        a = a[None, :]
    elif a.ndim == 2:
        if a.shape[0] > a.shape[1]:
            a = a.T
    else:
        t_axis = int(np.argmax(a.shape))
        a = np.moveaxis(a, t_axis, -1)
        c = int(np.prod(a.shape[:-1]))
        a = a.reshape(c, a.shape[-1])
    return np.ascontiguousarray(a, dtype=np.float32)


def to_cs(arr: ArrayLike, clamp_peak: bool = True) -> np.ndarray:
    """``[S] | [S,C] | [C,S]`` -> ``[C,S]`` float32, with optional peak clamp.

    Mirrors ``_to_cs`` in the reference fat_llama nodes (gpu :18-32).
    """
    a = np.asarray(_to_numpy(arr), dtype=np.float32)
    if a.ndim == 1:
        a = a[None, :]
    elif a.ndim == 2:
        h, w = a.shape
        if w <= 8 and h > w:  # frames-first (soundfile) -> channels-first
            a = a.T
    else:
        a = a.reshape(-1)[None, :]
    if clamp_peak and a.size:
        m = float(np.max(np.abs(a)))
        if m > 1.0:
            a = a / (m + 1e-8)
    return np.ascontiguousarray(a, dtype=np.float32)


# -- pcm16 wire format -------------------------------------------------------
# Host<->device audio transfers at 2 bytes/sample instead of 4: the
# reference hands tensors across an in-process boundary for free
# (``egregora_audio_super_resolution.py:388-431``), but this framework's
# host edge is a PCIe/relay link where bytes are the cost.  16-bit PCM
# quantization adds a -90 dBFS noise floor (1/32767 absolute error on
# the [-1, 1] contract) — far below every model/DSP stage's own error.

_PCM16_SCALE = 32767.0


def pcm16_encode(x: ArrayLike) -> np.ndarray:
    """float32 [-1, 1] -> int16 (clipping outside the PCM range)."""
    a = np.asarray(_to_numpy(x), dtype=np.float32)
    return np.rint(np.clip(a, -1.0, 1.0) * _PCM16_SCALE).astype(np.int16)


def pcm16_decode(x: ArrayLike) -> np.ndarray:
    """int16 -> float32 in [-1, 1] (inverse of ``pcm16_encode``)."""
    return np.asarray(_to_numpy(x), dtype=np.float32) / _PCM16_SCALE


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AudioBuffer:
    """On-device audio: ``samples`` [C, S] float32 + static sample rate/meta.

    ``samples`` may also be (a) a host ``np.ndarray`` — coercion helpers
    keep data host-side with ``device=False`` so the dispatch edge can
    pick the transfer format, and jax ops transfer implicitly on first
    use — or (b) an ``int16`` pcm16 wire array produced by a fused
    device program; ``numpy()``/``to_comfy()`` dequantize transparently.
    """

    samples: jnp.ndarray  # [C, S] float32
    sample_rate: int
    meta: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # -- pytree protocol: samples traced; sample_rate/meta static ----------
    def tree_flatten(self):
        return (self.samples,), (self.sample_rate, _freeze(self.meta))

    @classmethod
    def tree_unflatten(cls, aux, children):
        sr, meta = aux
        return cls(samples=children[0], sample_rate=sr, meta=_thaw(meta))

    # -- convenience --------------------------------------------------------
    @property
    def channels(self) -> int:
        return int(self.samples.shape[0])

    @property
    def num_samples(self) -> int:
        return int(self.samples.shape[-1])

    @property
    def duration_s(self) -> float:
        return self.num_samples / float(self.sample_rate)

    def mono(self) -> jnp.ndarray:
        """Channel-averaged mono signal ``[S]``."""
        return jnp.mean(self.samples, axis=0)

    def with_samples(self, samples: jnp.ndarray, sample_rate: Optional[int] = None,
                     meta: Optional[Dict[str, Any]] = None) -> "AudioBuffer":
        return AudioBuffer(
            samples=samples,
            sample_rate=int(sample_rate if sample_rate is not None else self.sample_rate),
            meta=dict(self.meta if meta is None else meta),
        )

    def numpy(self) -> np.ndarray:
        a = np.asarray(self.samples)
        if a.dtype == np.int16:          # pcm16 wire output
            dec = pcm16_decode(a)
            # over-full-scale outputs ride the wire divided by
            # meta["wire_scale"] = max(1, peak); multiply back here so
            # the wire path preserves >1 peaks like the f32 path
            scale = self.meta.get("wire_scale")
            if scale is not None:
                s = float(np.asarray(scale))
                if s != 1.0:
                    dec = dec * np.float32(s)
            return dec
        return a

    # -- interop with the reference AUDIO dict ------------------------------
    def to_comfy(self) -> Dict[str, Any]:
        """Export the reference node contract: waveform [1, C, T] + sample_rate.

        Extended keys (``sr``, ``samples``) match the reference eval pack's
        ``make_audio`` (eval pack :77-86) so downstream reference-style code
        can consume either flavor.
        """
        s = self.numpy().astype(np.float32)
        return {
            "waveform": s[None, ...],
            "sample_rate": int(self.sample_rate),
            "sr": int(self.sample_rate),
            "samples": s,
            "meta": dict(self.meta),
        }


def _freeze(obj: Any) -> Any:
    """Recursively convert dicts/lists to hashable tuples for pytree aux."""
    if isinstance(obj, Mapping):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return ("__list__",) + tuple(_freeze(v) for v in obj)
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        return ("__arr__", obj.shape, str(obj.dtype), tuple(np.asarray(obj).reshape(-1).tolist()))
    return obj


def _thaw(obj: Any) -> Any:
    if isinstance(obj, tuple):
        if len(obj) and obj[0] == "__list__":
            return [_thaw(v) for v in obj[1:]]
        if len(obj) == 4 and obj[0] == "__arr__":
            return np.array(obj[3], dtype=obj[2]).reshape(obj[1])
        if all(isinstance(v, tuple) and len(v) == 2 for v in obj):
            return {k: _thaw(v) for k, v in obj}
        return obj
    return obj


def make_audio(sr: int, samples_cn: ArrayLike, meta: Optional[dict] = None,
               device: bool = True) -> AudioBuffer:
    """Build an AudioBuffer from any array shape (reference ``make_audio``).

    ``device=False`` keeps samples as host numpy so the dispatch edge
    can choose the transfer format (pcm16 wire) instead of paying an
    eager float32 upload at coercion time."""
    s = normalize_cn(samples_cn)
    return AudioBuffer(samples=jnp.asarray(s) if device else s,
                       sample_rate=int(sr), meta=dict(meta or {}))


def from_any(x: Any, device: bool = True) -> AudioBuffer:
    """Accept any AUDIO-ish object and return an AudioBuffer.

    Handles (in order), mirroring the union of the reference's coercers
    (``_from_audio_dict`` sr node :125-156, ``to_internal_audio`` null
    suite :79-94, ``_coerce_audio`` extras :29-52):

    * AudioBuffer (pass-through)
    * dict with ``waveform`` + one of ``sample_rate``/``sr``/``rate``
    * dict with ``samples``/``audio``/``array`` + ``sr``/``sample_rate``
    * ``(array, sr)`` tuple
    * bare array (assumes 48 kHz, like extras :45-51)
    """
    if isinstance(x, AudioBuffer):
        return x
    if isinstance(x, dict) and "waveform" in x and any(k in x for k in ("sample_rate", "sr", "rate")):
        sr = int(x.get("sample_rate") or x.get("sr") or x.get("rate"))
        wf = _to_numpy(x["waveform"])
        meta = dict(x.get("meta", {}))
        if wf.ndim == 3:
            # true [B, C, T] batches (B > 1) fold onto the channel axis
            # for processing and are restored at the node boundary
            # (nodes/base.comfy_audio) — the reference preserves [B,C,T]
            # (egregora_audio_enhance_extras.py:29-64)
            b, c = int(wf.shape[0]), int(wf.shape[1])
            if b > 1:
                meta["batch"] = b
                wf = wf.reshape(b * c, wf.shape[-1])
            else:
                wf = wf[0]
        return make_audio(sr, wf, meta, device=device)
    if isinstance(x, dict) and ("sr" in x or "sample_rate" in x):
        sr = int(x.get("sr") or x.get("sample_rate"))
        buf = None
        for k in ("samples", "audio", "array"):
            if x.get(k) is not None:
                buf = x[k]
                break
        if buf is None:
            raise ValueError("Audio dict missing samples/waveform")
        return make_audio(sr, buf, x.get("meta", {}), device=device)
    if isinstance(x, (list, tuple)) and len(x) == 2 and not isinstance(x[0], (int, float)):
        arr, sr = x
        arr = _to_numpy(arr)
        if arr.ndim == 1:
            cs = arr[None, :]
        elif arr.ndim == 2:
            # frames-first heuristic (sr node :147-152)
            if arr.shape[0] >= arr.shape[1] and arr.shape[1] <= 8:
                cs = arr.T
            else:
                cs = arr
        else:
            cs = arr.reshape(1, -1)
        cs = np.ascontiguousarray(cs, dtype=np.float32)
        return AudioBuffer(jnp.asarray(cs) if device else cs, int(sr), {})
    if isinstance(x, (np.ndarray, jnp.ndarray)) or (hasattr(x, "detach") and hasattr(x, "cpu")):
        arr = _to_numpy(x)
        if arr.ndim == 3:
            arr = arr[0]
        return make_audio(48000, arr, {}, device=device)
    raise ValueError(f"Unsupported AUDIO object: {type(x)!r}")
