"""Smoke the bench programs' device code paths on CPU (tiny pipe, short
clips) so bench.py can't rot between TPU runs: the fullchain fused
program (BASELINE config #5) must trace/compile/produce finite output,
and the RNNoise engine bench path must run as one jitted program."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_pipe():
    from egregora_tpu.models.flashsr.pipeline import FlashSRConfig, FlashSRPipeline
    from egregora_tpu.models.flashsr.unet import UNetConfig
    from egregora_tpu.models.flashsr.vae import VAEConfig
    from egregora_tpu.models.flashsr.vocoder import VocoderConfig

    cfg = FlashSRConfig(
        vae=VAEConfig(base_channels=8, channel_mults=(1, 2, 2), latent_channels=4,
                      num_res_blocks=1, groups=4, mid_attn=False,
                      use_quant_conv=False),
        unet=UNetConfig(in_channels=8, out_channels=4, base_channels=8,
                        channel_mults=(1, 2), num_res_blocks=1, attn_levels=(),
                        num_heads=2, time_dim=16, groups=4),
        vocoder=VocoderConfig(upsample_initial=16, channel_floor=8),
    )
    return FlashSRPipeline(cfg, seed=0)


def test_bench_fullchain_runs(tiny_pipe, capsys):
    import bench
    bench.bench_fullchain(tiny_pipe, jnp, secs=12)
    out = capsys.readouterr().out
    assert '"fullchain_rtf_96k"' in out, out


def test_bench_dfn_runs(capsys):
    import bench
    bench.bench_dfn(jnp, secs=2)
    out = capsys.readouterr().out
    assert '"dfn2_rtf_48k"' in out, out


def test_bench_rnnoise_runs(capsys):
    import bench
    bench.bench_rnnoise(jnp, secs=5)
    out = capsys.readouterr().out
    assert '"rnnoise_rtf_48k"' in out, out


def test_bench_istft_pipeline_runs(tiny_pipe, capsys):
    from egregora_tpu.models.flashsr.vocoder import VocoderConfig

    import bench
    secs = 12
    x = jnp.asarray((np.random.default_rng(4)
                     .standard_normal((1, 16000 * secs)) * 0.1)
                    .astype(np.float32))
    bench.bench_istft_pipeline(tiny_pipe, jnp, x, secs,
                               vcfg=VocoderConfig(kind="istft", hidden=32,
                                                  depth=1))
    out = capsys.readouterr().out
    assert '"flashsr_pipeline_istft_rtf_48k"' in out, out


def test_backend_watchdog_cpu_ok(monkeypatch):
    import bench
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._backend_watchdog(120.0) is True


def test_backend_watchdog_reports_unreachable(monkeypatch, capsys):
    import bench

    class Hung:
        def is_alive(self):
            return True

        def terminate(self):
            pass

        def join(self, *a):
            pass

        def start(self):
            pass

    class Ctx:
        def Queue(self):
            return None

        def Process(self, **kw):
            return Hung()

    monkeypatch.setattr("multiprocessing.get_context", lambda *_: Ctx())
    assert bench._backend_watchdog(0.1) is False
    out = capsys.readouterr().out
    assert '"backend_unreachable"' in out
