"""Device-stack validation (SURVEY.md #7's TPU-native analog).

The reference ships 76 lines of Windows CUDA/CuPy DLL wiring plus an
``_ensure_gpu_stack`` precondition check with actionable error text
(``egregora_fat_llama_gpu.py:84-159``).  On TPU there is no DLL surgery
to do — backend discovery is jax-level — so the analog is a single
validation helper with the same fail-loud, tell-the-user-what-to-do
policy.
"""
from __future__ import annotations

from typing import List


def available_platforms() -> List[str]:
    import jax
    try:
        return sorted({d.platform for d in jax.devices()})
    except RuntimeError:
        return []


def ensure_accelerator(kind: str = "tpu") -> "object":
    """Return the first device of ``kind`` or raise with guidance.

    Mirrors the reference's ``_ensure_gpu_stack`` contract (gpu
    :132-159): validate early, fail with an actionable message, and
    point at the CPU-backend node as the fallback.
    """
    import jax
    try:
        devs = [d for d in jax.devices() if d.platform == kind]
    except RuntimeError as e:
        raise RuntimeError(
            f"No JAX backend initialized ({e}). Check JAX_PLATFORMS and that "
            "the TPU runtime/plugin is installed; CPU fallback: use the "
            "CPU-suffixed nodes or jax.config.update('jax_platforms','cpu').",
        ) from e
    if not devs:
        plats = ", ".join(available_platforms()) or "none"
        raise RuntimeError(
            f"No {kind.upper()} device detected (available platforms: {plats}). "
            "Spectral Enhance (TPU) needs an accelerator; for CPU use the "
            "Fat Llama CPU node — same engine on the CPU backend.")
    return devs[0]
