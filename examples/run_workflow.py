"""Library-call equivalent of the example workflow graph
(examples/audio_super_resolution_workflow.json): load -> FlashSR ->
Fat Llama enhance -> save, entirely through the node registry.

Usage: python examples/run_workflow.py input.wav output.wav
"""
import sys

import numpy as np

import egregora_tpu
from egregora_tpu.nodes.base import comfy_audio
from egregora_tpu.utils.wavio import read_audio, write_audio


def main(in_path: str, out_path: str) -> None:
    cs, sr = read_audio(in_path)
    audio = comfy_audio(sr, cs)

    upscaler = egregora_tpu.NODE_CLASS_MAPPINGS["EgregoraAudioUpscaler"]()
    (sr48,) = upscaler.run(audio, lowpass_input=False, output_sr="48000")

    fat = egregora_tpu.NODE_CLASS_MAPPINGS["EgregoraFatLlamaGPU"]()
    (enhanced,) = fat.run("wav", 300, 0.6, 1411, True, True, AUDIO=sr48)

    write_audio(out_path, enhanced["samples"], enhanced["sample_rate"])
    print(f"wrote {out_path} @ {enhanced['sample_rate']} Hz")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
