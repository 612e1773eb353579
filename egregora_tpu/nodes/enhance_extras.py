"""Enhance Extras nodes: RNNoise, WPE, DeepFilterNet, DAC encode/decode.

API parity with the reference module
(``egregora_audio_enhance_extras.py``): same node keys, widget schemas,
defaults, and meta-provenance recording.  All engines are in-framework
JAX (models/rnnoise, models/wpe, models/deepfilternet, models/dac) —
no C/Rust/torch backends; the VAD-adaptive mix machinery is shared
(ops/mix.py) instead of duplicated per node as in the reference.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core.audio import from_any
from ..ops.mix import adaptive_mix, post_gain_limit, rms_vad_probs
from ..ops.resample import resample
from .base import comfy_audio

CATEGORY = "Egregora/Enhance"


def _coerce_bct(x) -> Tuple[np.ndarray, int, dict]:
    """AUDIO -> ([C, T] jnp, sr, meta) — batch dim folded into channels
    (the reference carries [B,C,T] but iterates b and c identically)."""
    buf = from_any(x)
    return buf.samples, buf.sample_rate, dict(buf.meta)


def _batch_shape(folded_channels: int, meta: dict) -> Tuple[int, int]:
    """``(B, C)`` for a folded ``[B*C, T]`` array.

    The channel fold is correct for per-channel engines, but CROSS-channel
    ops (downmix, WPE's mic array) must not mix distinct batch items —
    the reference iterates batch items (extras :289-328, :400-440)."""
    b = int(meta.get("batch", 1) or 1)
    if b > 1 and folded_channels % b == 0:
        return b, folded_channels // b
    return 1, folded_channels


def _downmix_mono(x_bct: jnp.ndarray, meta: dict) -> jnp.ndarray:
    """Per-ITEM mono downmix of a folded ``[B*C, T]`` array -> ``[B, T]``
    (plain ``mean(axis=0)`` would average across batch items)."""
    b, c = _batch_shape(x_bct.shape[0], meta)
    if b == 1:
        return jnp.mean(x_bct, axis=0, keepdims=True)
    return jnp.mean(x_bct.reshape(b, c, -1), axis=1)


# ----------------------------
# RNNoise Denoise (reference :90-362)
# ----------------------------
class Egregora_RNNoise_Denoise:
    """48 kHz RNNoise-class denoiser with VAD-adaptive wet/dry mix."""

    _PARAMS = None  # class-level weight cache

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "audio": ("AUDIO",),
                "frame_ms": ("INT", {"default": 20, "min": 5, "max": 60, "step": 5}),
                "stereo_mode": (["per_channel", "downmix_mono"], {"default": "per_channel"}),
                "strength": ("FLOAT", {"default": 1.0, "min": 0.0, "max": 1.0, "step": 0.01}),
                "mix_curve": (["equal_power", "linear"], {"default": "equal_power"}),
                "adaptive_mode": (["off", "more_on_noise", "more_on_speech", "gate_on_noise"],
                                  {"default": "more_on_noise"}),
                "adaptive_amount": ("FLOAT", {"default": 0.5, "min": 0.0, "max": 1.0, "step": 0.01}),
                "vad_threshold": ("FLOAT", {"default": 0.90, "min": 0.0, "max": 1.0, "step": 0.01}),
                "vad_smooth_ms": ("INT", {"default": 50, "min": 0, "max": 500, "step": 5}),
                "post_gain_db": ("FLOAT", {"default": 0.0, "min": -24.0, "max": 24.0, "step": 0.1}),
                "limit_ceiling": ("BOOLEAN", {"default": True}),
                "ceiling": ("FLOAT", {"default": 0.999, "min": 0.1, "max": 1.0, "step": 0.001}),
            }
        }

    RETURN_TYPES = ("AUDIO",)
    FUNCTION = "execute"
    CATEGORY = CATEGORY

    @classmethod
    def _params(cls):
        if cls._PARAMS is None:
            from ..models.rnnoise.train import load_pretrained
            cls._PARAMS = load_pretrained()
            if cls._PARAMS is None:
                from ..models.rnnoise.model import init_params
                print("[egregora] WARNING: no shipped RNNoise weights "
                      "found — serving RANDOM-INIT denoiser params; "
                      "output will not be denoised", flush=True)
                cls._PARAMS = init_params(0)
        return cls._PARAMS

    def execute(self, audio, frame_ms=20, stereo_mode="per_channel", strength=1.0,
                mix_curve="equal_power", adaptive_mode="more_on_noise",
                adaptive_amount=0.5, vad_threshold=0.90, vad_smooth_ms=50,
                post_gain_db=0.0, limit_ceiling=True, ceiling=0.999):
        from ..models.rnnoise.model import FRAME, denoise

        cn, sr, meta = _coerce_bct(audio)
        x48 = resample(cn, sr, 48000) if sr != 48000 else cn
        if stereo_mode == "downmix_mono":
            x48 = _downmix_mono(x48, meta)

        t = x48.shape[1]
        pad = (-t) % FRAME
        xp = jnp.pad(x48, ((0, 0), (0, pad)))
        # EGREGORA_RNNOISE_SEGMENTS=N opts the node into the segmented
        # frame recurrence (throughput mode, ~N× fewer sequential GRU
        # steps; ~1 s state warm-up at internal boundaries — see
        # models/rnnoise/model._segment_scan).  Default stays the exact
        # sequential scan, matching the C library stream semantics.
        import os
        segs = max(1, int(os.environ.get("EGREGORA_RNNOISE_SEGMENTS", "1")))
        wet, vads = denoise(self._params(), xp, segments=segs)
        wet = wet[:, :t]

        # frame_ms sets the VAD DECISION granularity: the engine's frame
        # is fixed at 10 ms (the C library's contract), but the adaptive
        # mix can follow a coarser grid — vad probs mean-pool over
        # frame_ms/10 engine frames (the widget the reference accepts
        # but never wires, extras :563-571; wired here).
        group = max(1, int(frame_ms) // 10)
        if group > 1:
            f = vads.shape[1]
            pad_f = (-f) % group
            vp = jnp.pad(vads, ((0, 0), (0, pad_f)), mode="edge")
            vp = vp.reshape(vads.shape[0], -1, group).mean(axis=-1)
            vads = jnp.repeat(vp, group, axis=1)[:, :f]

        mixed = []
        for c in range(x48.shape[0]):
            y = adaptive_mix(x48[c], wet[c], vads[c], strength=float(strength),
                             mix_curve=str(mix_curve), adaptive_mode=str(adaptive_mode),
                             adaptive_amount=float(adaptive_amount),
                             vad_threshold=float(vad_threshold),
                             vad_smooth_ms=float(vad_smooth_ms), frame_hop=FRAME)
            mixed.append(y)
        y48 = jnp.stack(mixed)

        y = resample(y48, 48000, sr) if sr != 48000 else y48
        y = post_gain_limit(y, float(post_gain_db), bool(limit_ceiling), float(ceiling))

        meta2 = dict(meta)
        meta2["rnnoise"] = {
            "frame_ms": frame_ms, "stereo_mode": stereo_mode, "strength": strength,
            "mix_curve": mix_curve, "adaptive_mode": adaptive_mode,
            "adaptive_amount": adaptive_amount, "vad_threshold": vad_threshold,
            "vad_smooth_ms": vad_smooth_ms, "post_gain_db": post_gain_db,
            "limit_ceiling": bool(limit_ceiling), "ceiling": ceiling,
        }
        return (comfy_audio(sr, np.asarray(y), meta2),)


# ----------------------------
# WPE Dereverb (reference :368-443)
# ----------------------------
class Egregora_WPE_Dereverb:
    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "audio": ("AUDIO",),
                "taps": ("INT", {"default": 10, "min": 3, "max": 32}),
                "delay": ("INT", {"default": 3, "min": 1, "max": 16}),
                "iterations": ("INT", {"default": 3, "min": 1, "max": 10}),
                "n_fft": ("INT", {"default": 1024, "min": 256, "max": 4096, "step": 256}),
                "hop": ("INT", {"default": 256, "min": 64, "max": 1024, "step": 64}),
                "use_float32": ("BOOLEAN", {"default": True}),
            }
        }

    RETURN_TYPES = ("AUDIO",)
    FUNCTION = "execute"
    CATEGORY = CATEGORY

    def execute(self, audio, taps=10, delay=3, iterations=3, n_fft=1024, hop=256,
                use_float32=True):
        from ..models.wpe import wpe_dereverb

        cn, sr, meta = _coerce_bct(audio)
        try:
            # WPE's multichannel model is a MIC ARRAY: each batch item is
            # its own array of C mics (the reference iterates items,
            # extras :400-440) — running B*C folded channels as one array
            # would cross-predict between unrelated batch items
            b, c = _batch_shape(cn.shape[0], meta)
            items = cn.reshape(b, c, -1)
            z = jnp.concatenate(
                [wpe_dereverb(items[i], taps=int(taps), delay=int(delay),
                              iterations=int(iterations), n_fft=int(n_fft),
                              hop=int(hop))
                 for i in range(b)], axis=0)
        except Exception as e:  # graceful passthrough, reference :429-435
            print(f"Warning: WPE processing failed: {e}")
            z = cn
        meta2 = dict(meta)
        meta2["wpe"] = {"taps": taps, "delay": delay, "iterations": iterations,
                        "n_fft": n_fft, "hop": hop}
        return (comfy_audio(sr, np.asarray(z), meta2),)


# ----------------------------
# DeepFilterNet Denoise (reference :450-724)
# ----------------------------
class Egregora_DeepFilterNet_Denoise:
    _PARAMS = {}  # (model_name,) -> params, reference's class cache (:501)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "audio": ("AUDIO",),
                "dfn_model": (["DeepFilterNet2", "DeepFilterNet3"], {"default": "DeepFilterNet2"}),
                "device": (["auto", "cuda:0", "cpu"], {"default": "auto"}),
                "use_postfilter": ("BOOLEAN", {"default": False, "label_on": "postfilter on", "label_off": "postfilter off"}),
                "limit_ceiling": ("BOOLEAN", {"default": True, "label_on": "limit on", "label_off": "limit off"}),
                "stereo_mode": (["per_channel", "downmix_mono"], {"default": "per_channel"}),
                "frame_ms": ("INT", {"default": 20, "min": 5, "max": 60, "step": 5}),
                "strength": ("FLOAT", {"default": 0.65, "min": 0.0, "max": 1.0, "step": 0.01}),
                "mix_curve": (["equal_power", "linear"], {"default": "equal_power"}),
                "adaptive_vad_source": (["rms", "rnnoise", "none"], {"default": "rms"}),
                "adaptive_mode": (["off", "more_on_noise", "more_on_speech", "gate_on_noise"],
                                  {"default": "more_on_noise"}),
                "adaptive_amount": ("FLOAT", {"default": 0.45, "min": 0.0, "max": 1.0, "step": 0.01}),
                "vad_threshold": ("FLOAT", {"default": 0.90, "min": 0.0, "max": 1.0, "step": 0.01}),
                "vad_smooth_ms": ("INT", {"default": 60, "min": 0, "max": 500, "step": 5}),
                "post_gain_db": ("FLOAT", {"default": 0.5, "min": -24.0, "max": 24.0, "step": 0.1}),
                "ceiling": ("FLOAT", {"default": 0.98, "min": 0.1, "max": 1.0, "step": 0.001}),
            }
        }

    RETURN_TYPES = ("AUDIO",)
    FUNCTION = "execute"
    CATEGORY = CATEGORY

    @classmethod
    def _params(cls, model_name: str):
        if model_name not in cls._PARAMS:
            from ..models.deepfilternet.train import load_pretrained
            params = load_pretrained(model_name)
            if params is None:
                from ..models.deepfilternet.model import DFNConfig, init_params
                print(f"[egregora] WARNING: no shipped DeepFilterNet "
                      f"weights for {model_name!r} — serving RANDOM-INIT "
                      f"params; output will not be denoised", flush=True)
                params = init_params(0, DFNConfig.for_variant(model_name))
            cls._PARAMS[model_name] = params
        return cls._PARAMS[model_name]

    def execute(self, audio, dfn_model="DeepFilterNet2", device="auto",
                use_postfilter=False, limit_ceiling=True, stereo_mode="per_channel",
                frame_ms=20, strength=0.65, mix_curve="equal_power",
                adaptive_vad_source="rms", adaptive_mode="more_on_noise",
                adaptive_amount=0.45, vad_threshold=0.90, vad_smooth_ms=60,
                post_gain_db=0.5, ceiling=0.98):
        from ..models.deepfilternet.model import DFNConfig, enhance

        cn, sr, meta = _coerce_bct(audio)
        if stereo_mode == "downmix_mono":
            cn = _downmix_mono(cn, meta)
        x48 = resample(cn, sr, 48000) if sr != 48000 else cn

        params = self._params(str(dfn_model))
        wet48 = enhance(params, x48, DFNConfig.for_variant(str(dfn_model)),
                        post_filter=bool(use_postfilter))

        wet = resample(wet48, 48000, sr) if sr != 48000 else wet48
        dry = resample(x48, 48000, sr) if sr != 48000 else x48
        n = min(dry.shape[1], wet.shape[1])
        dry, wet = dry[:, :n], wet[:, :n]

        hop48 = 480
        out = []
        for c in range(dry.shape[0]):
            if adaptive_vad_source == "rnnoise":
                from ..models.rnnoise.model import FRAME, denoise_channel
                from .enhance_extras import Egregora_RNNoise_Denoise as _RN
                t48 = x48.shape[1]
                pad = (-t48) % FRAME
                _, probs = denoise_channel(_RN._params(),
                                           jnp.pad(x48[c], (0, pad)))
            elif adaptive_vad_source == "rms":
                probs = rms_vad_probs(x48[c], hop48)
            else:
                probs = None
            hop_sr = max(1, int(sr * 0.010))
            y = adaptive_mix(dry[c], wet[c], probs, strength=float(strength),
                             mix_curve=str(mix_curve), adaptive_mode=str(adaptive_mode),
                             adaptive_amount=float(adaptive_amount),
                             vad_threshold=float(vad_threshold),
                             vad_smooth_ms=float(vad_smooth_ms), frame_hop=hop_sr)
            out.append(y)
        y = jnp.stack(out)
        y = post_gain_limit(y, float(post_gain_db), bool(limit_ceiling), float(ceiling))

        meta2 = dict(meta)
        meta2["deepfilternet"] = {
            "model": dfn_model, "device": "tpu", "use_postfilter": bool(use_postfilter),
            "stereo_mode": stereo_mode, "frame_ms": frame_ms, "strength": strength,
            "mix_curve": mix_curve, "adaptive_vad_source": adaptive_vad_source,
            "adaptive_mode": adaptive_mode, "adaptive_amount": adaptive_amount,
            "vad_threshold": vad_threshold, "vad_smooth_ms": vad_smooth_ms,
            "post_gain_db": post_gain_db, "limit_ceiling": bool(limit_ceiling),
            "ceiling": ceiling,
        }
        return (comfy_audio(sr, np.asarray(y), meta2),)


# ----------------------------
# DAC encode / decode (reference :730-857)
# ----------------------------
class Egregora_DAC_Encode:
    _MODELS = {}

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "audio": ("AUDIO",),
                "model_type": (["44khz", "24khz", "16khz"], {"default": "44khz"}),
                "device": (["auto", "cpu", "cuda"], {"default": "auto"}),
            }
        }

    RETURN_TYPES = ("DICT", "STRING")
    RETURN_NAMES = ("codes", "log")
    FUNCTION = "execute"
    CATEGORY = "Egregora/Codecs"

    @classmethod
    def _model(cls, model_type: str):
        if model_type not in cls._MODELS:
            from ..models.dac.model import build_dac
            cls._MODELS[model_type] = build_dac(model_type)
        return cls._MODELS[model_type]

    def execute(self, audio, model_type="44khz", device="auto"):
        cn, sr, meta = _coerce_bct(audio)
        model, params, model_sr = self._model(str(model_type))
        x = resample(cn, sr, model_sr) if sr != model_sr else cn
        z, codes = model.encode(params, x)
        codes_dict = {
            "model_type": str(model_type),
            "sample_rate": int(sr),
            "model_sample_rate": int(model_sr),
            "latents": [[np.asarray(z)]],
            "codes": np.asarray(codes),
        }
        log = (f"DAC encode ok: model={model_type}, B=1, C={cn.shape[0]}, "
               f"sr={sr}->{model_sr}")
        return (codes_dict, log)


class Egregora_DAC_Decode:
    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "codes": ("DICT",),
                "device": (["auto", "cpu", "cuda"], {"default": "auto"}),
            }
        }

    RETURN_TYPES = ("AUDIO", "STRING")
    RETURN_NAMES = ("audio", "log")
    FUNCTION = "execute"
    CATEGORY = "Egregora/Codecs"

    def execute(self, codes, device="auto"):
        model_type = codes.get("model_type", "44khz")
        sr = int(codes.get("sample_rate", 48000))
        model_sr = int(codes.get("model_sample_rate", sr))
        latents_b = codes.get("latents", [])
        if not latents_b:
            raise ValueError("codes.latents empty")
        model, params, _ = Egregora_DAC_Encode._model(str(model_type))
        outs = []
        for z_list in latents_b:
            z = jnp.asarray(z_list[0])
            y = model.decode(params, z)
            outs.append(np.asarray(y))
        y_cat = np.concatenate(outs, axis=0)
        if model_sr != sr:
            y_cat = np.asarray(resample(jnp.asarray(y_cat), model_sr, sr))
        log = (f"DAC decode ok: model={model_type}, B={len(latents_b)}, "
               f"C={y_cat.shape[0]}, {model_sr}->{sr}")
        return (comfy_audio(sr, y_cat), log)


NODE_CLASS_MAPPINGS = {
    "Egregora_RNNoise_Denoise": Egregora_RNNoise_Denoise,
    "Egregora_WPE_Dereverb": Egregora_WPE_Dereverb,
    "Egregora_DeepFilterNet_Denoise": Egregora_DeepFilterNet_Denoise,
    "Egregora_DAC_Encode": Egregora_DAC_Encode,
    "Egregora_DAC_Decode": Egregora_DAC_Decode,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "Egregora_RNNoise_Denoise": "Egregora RNNoise Denoise",
    "Egregora_WPE_Dereverb": "Egregora WPE Dereverb",
    "Egregora_DeepFilterNet_Denoise": "Egregora DeepFilterNet Denoise",
    "Egregora_DAC_Encode": "Egregora DAC Encode",
    "Egregora_DAC_Decode": "Egregora DAC Decode",
}
