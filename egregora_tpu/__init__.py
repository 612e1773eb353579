"""egregora_tpu — TPU-native audio super-resolution / enhancement / eval
framework with the capabilities of the ComfyUI Egregora audio node pack.

Top-level registry mirrors the reference ``__init__.py:33-52``: merged
``NODE_CLASS_MAPPINGS`` / ``NODE_DISPLAY_NAME_MAPPINGS`` from every node
module, with per-module failures degrading to empty maps (reference
``__init__.py:8-30``) so one broken optional engine never takes down
the pack.
"""
from __future__ import annotations

__version__ = "0.1.0"

NODE_CLASS_MAPPINGS = {}
NODE_DISPLAY_NAME_MAPPINGS = {}


def _merge(module_name: str) -> None:
    try:
        import importlib
        mod = importlib.import_module(f".nodes.{module_name}", __name__)
        NODE_CLASS_MAPPINGS.update(mod.NODE_CLASS_MAPPINGS)
        NODE_DISPLAY_NAME_MAPPINGS.update(mod.NODE_DISPLAY_NAME_MAPPINGS)
    except Exception as e:  # graceful degradation, reference __init__.py:8-30
        print(f"[egregora_tpu] node module {module_name!r} unavailable: {e}")


for _m in ("super_resolution", "spectral_enhance", "enhance_extras",
           "eval_pack", "null_suite"):
    _merge(_m)

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS", "__version__"]
