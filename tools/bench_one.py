"""Run a single bench.py section (default: the full-config device
pipeline) without paying for the whole suite — for iterating on one
line between full driver runs.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_one.py [name]
"""
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "bench_device_pipeline"
    if not bench._backend_watchdog():
        return
    import jax.numpy as jnp  # noqa: F401

    from egregora_tpu.models.flashsr.pipeline import (FlashSRConfig,
                                                      FlashSRPipeline)
    fn = getattr(bench, name)
    if name in ("bench_fatllama", "bench_evalpack", "bench_nullsuite",
                "bench_rnnoise", "bench_dfn", "bench_link"):
        fn(jnp)
        return
    if name in ("bench_fullchain", "bench_node_path",
                "bench_serving_pipeline"):
        from egregora_tpu.models.flashsr.distill import resolve_flashsr
        cfg_s, params_s, src = resolve_flashsr()
        spipe = FlashSRPipeline(cfg_s, params=params_s)
        spipe.weight_source = src
        fn(spipe, jnp)
        return
    pipe = FlashSRPipeline(FlashSRConfig(), seed=0)
    fn(pipe, jnp)


if __name__ == "__main__":
    main()
