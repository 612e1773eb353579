"""FlashSR super-resolution node — API parity with the reference.

Mirrors ``EgregoraAudioSuperResolution`` (reference
``egregora_audio_super_resolution.py:372-431``): same inputs (``audio``,
``lowpass_input`` BOOLEAN, ``output_sr`` in {48000, 44100, 96000}),
same single-AUDIO output.  Unlike the reference, the pipeline object
(weights + compiled program) is cached at class level instead of being
rebuilt per call (the reference reconstructs its runner every run,
:393 — a documented inefficiency), and chunks run as one batched
sharded program rather than a sequential per-chunk loop.
"""
from __future__ import annotations

from typing import Optional

from ..models.flashsr.pipeline import FlashSRConfig, FlashSRPipeline
from .base import buffer_to_comfy, to_buffer

FUNCTION = "run"
CATEGORY = "Egregora/Audio"


class EgregoraAudioSuperResolution:
    _PIPE: Optional[FlashSRPipeline] = None

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "audio": ("AUDIO",),
                "lowpass_input": ("BOOLEAN", {"default": False}),
                "output_sr": (["48000", "44100", "96000"], {"default": "48000"}),
            }
        }

    RETURN_TYPES = ("AUDIO",)
    FUNCTION = FUNCTION
    CATEGORY = CATEGORY
    OUTPUT_NODE = False

    @classmethod
    def _pipeline(cls) -> FlashSRPipeline:
        if cls._PIPE is None:
            from ..models.flashsr.distill import resolve_flashsr
            cfg, params, source = resolve_flashsr()
            pipe = FlashSRPipeline(cfg, params=params)
            pipe.weight_source = source   # converted | distilled | random
            cls._PIPE = pipe
        return cls._PIPE

    def run(self, audio=None, lowpass_input=False, output_sr="48000"):
        # keep samples host-side: the pipeline's dispatch edge then moves
        # them as pcm16 wire (half the bytes each way) on accelerators
        buf = to_buffer(audio, device=False)
        pipe = self._pipeline()
        out = pipe.process(buf, lowpass_input=bool(lowpass_input),
                           output_sr=int(output_sr))
        return (buffer_to_comfy(out),)


NODE_CLASS_MAPPINGS = {"EgregoraAudioUpscaler": EgregoraAudioSuperResolution}
NODE_DISPLAY_NAME_MAPPINGS = {
    "EgregoraAudioUpscaler": "🎧 Audio Super Resolution (FlashSR)",
}
