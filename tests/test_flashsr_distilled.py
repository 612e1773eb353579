"""Shipped distilled FlashSR weights: quality gate + weight resolution.

The BASELINE.json north star is quality parity ("SI-SDR/LSD parity vs
the reference pipeline") — the reference node's eval contract is that
running it on band-limited audio measurably improves LSD against the
fullband truth (``egregora_audio_super_resolution.py:372-431`` feeding
the eval pack's metrics).  These tests hold the shipped weights to it.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egregora_tpu.models.flashsr.distill import (PRETRAINED, distilled_config,
                                                 load_pretrained,
                                                 load_pretrained_with_cfg,
                                                 resolve_flashsr,
                                                 synth_pair_batch)
from egregora_tpu.models.flashsr.pipeline import CHUNK_SAMPLES, FlashSRPipeline


needs_weights = pytest.mark.skipif(not PRETRAINED.exists(),
                                   reason="no shipped distilled weights")


def test_synth_pair_is_bandlimited():
    lr, hr = jax.jit(lambda k: synth_pair_batch(k, 2, 480 * 32))(
        jax.random.PRNGKey(0))
    lr, hr = np.asarray(lr), np.asarray(hr)
    assert np.isfinite(lr).all() and np.isfinite(hr).all()
    f = np.fft.rfftfreq(lr.shape[-1], 1 / 48000)
    hi = f > 13000
    e_lr = (np.abs(np.fft.rfft(lr[0]))[hi] ** 2).sum()
    e_hr = (np.abs(np.fft.rfft(hr[0]))[hi] ** 2).sum()
    assert e_lr < 1e-6 * e_hr        # LR hi-band removed
    assert e_hr > 0                  # HR has hi-band content


@needs_weights
def test_distilled_weights_improve_lsd():
    """The flagship quality gate: on a held-out synthetic pair, the
    model output's LSD to the fullband truth must beat the band-limited
    passthrough by a wide margin, without giving up much SI-SDR."""
    from egregora_tpu.eval.metrics import lsd_sisdr_report

    cfg, params = load_pretrained_with_cfg()
    pipe = FlashSRPipeline(cfg, params=params)
    lr, hr = synth_pair_batch(jax.random.PRNGKey(123), 1, CHUNK_SAMPLES)
    out = pipe._jit_forward(params, lr, lowpass_input=False)
    assert bool(jnp.all(jnp.isfinite(out)))

    rep_pt = lsd_sisdr_report(hr[0], lr[0])
    rep_md = lsd_sisdr_report(hr[0], out[0])
    lsd_pt, lsd_md = float(rep_pt["lsd_mean_db"]), float(rep_md["lsd_mean_db"])
    sisdr_md = float(rep_md["si_sdr_db"])
    # ABSOLUTE bars (VERDICT r2 #2): the shipped trio measures LSD
    # 5.2 dB / SI-SDR +8.8 dB on THIS pair, and 5.1-5.9 dB across the
    # evaluate() seeds (see pretrained.json) after the adaptive
    # crossover closed the [input-cutoff, 11 kHz] deletion hole and
    # envelope_match="replace" projected the vocoder magnitude onto
    # the predicted mel envelope — gate at 7 dB / +4 dB so any
    # regression in either postproc stage or the weights fails
    assert lsd_md < 7.0, f"absolute LSD {lsd_md:.2f} dB >= 7 dB gate"
    assert lsd_md < lsd_pt - 20.0, (lsd_md, lsd_pt)
    assert sisdr_md > 4.0, f"SI-SDR {sisdr_md:.2f} dB below +4 dB guard"


def test_distill_resume_requires_weights(tmp_path):
    """--resume against a missing npz must fail fast, not silently
    train from random init (the fine-tune path's one footgun)."""
    from egregora_tpu.models.flashsr.distill import distill

    with pytest.raises(FileNotFoundError):
        distill(steps=1, resume=True, out_path=tmp_path / "absent.npz")


@needs_weights
def test_resolve_flashsr_prefers_distilled(tmp_path, monkeypatch):
    """With no converted checkpoints on disk the resolver must pick
    shipped distilled weights — the istft trio by default (it gates
    better and runs faster), the HiFi-GAN trio under
    EGREGORA_FLASHSR_VARIANT=hifigan — never a random init."""
    from egregora_tpu.models.flashsr.distill import PRETRAINED_ISTFT

    monkeypatch.setenv("EGREGORA_TPU_WEIGHTS", str(tmp_path))
    cfg, params, source = resolve_flashsr()
    if PRETRAINED_ISTFT.exists():
        assert source == "distilled-istft"
        assert cfg.vocoder.kind == "istft"
    else:
        assert source == "distilled"
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert n < 20_000_000            # compact trio, not the 112M full config

    monkeypatch.setenv("EGREGORA_FLASHSR_VARIANT", "hifigan")
    cfg, params, source = resolve_flashsr()
    assert source == "distilled"
    assert cfg.vocoder.kind == "hifigan"
    assert cfg.unet.base_channels == load_pretrained_with_cfg()[0].unet.base_channels


# ---------------- complex-spectrum ("istft") vocoder variant ----------------

from egregora_tpu.models.flashsr.distill import PRETRAINED_ISTFT

needs_istft = pytest.mark.skipif(not PRETRAINED_ISTFT.exists(),
                                 reason="no shipped istft trio")


@needs_istft
def test_istft_trio_improves_lsd():
    """The DEFAULT-served trio's quality gate, at VERDICT r4 #3's bars:
    LSD < 7 absolute AND SI-SDR >= 8.79 (the HiFi-GAN trio's gate-pair
    value) on the seed-123 chunk pair.  Shipped metrics: LSD 5.29 /
    SI-SDR 9.63 here and LSD 5.44-6.19 across all evaluate() seeds
    (pretrained_istft.json) — the round-5 exciter head wins SI-SDR on
    every eval-v2 seed vs the r4 trio (avg +1.2 dB) at a deliberate
    +0.3-0.5 LSD cost (the two metrics trade on incoherent harmonic
    content; see the json comment)."""
    from egregora_tpu.eval.metrics import lsd_sisdr_report

    cfg, params = load_pretrained_with_cfg(PRETRAINED_ISTFT)
    assert cfg.vocoder.kind == "istft"
    pipe = FlashSRPipeline(cfg, params=params)
    lr, hr = synth_pair_batch(jax.random.PRNGKey(123), 1, CHUNK_SAMPLES)
    out = pipe._jit_forward(params, lr, lowpass_input=False)
    assert bool(jnp.all(jnp.isfinite(out)))

    rep_pt = lsd_sisdr_report(hr[0], lr[0])
    rep_md = lsd_sisdr_report(hr[0], out[0])
    lsd_pt, lsd_md = float(rep_pt["lsd_mean_db"]), float(rep_md["lsd_mean_db"])
    sisdr_md = float(rep_md["si_sdr_db"])
    assert lsd_md < 7.0, f"absolute LSD {lsd_md:.2f} dB >= 7 dB gate"
    assert lsd_md < lsd_pt - 20.0, (lsd_md, lsd_pt)
    assert sisdr_md > 8.79, (f"SI-SDR {sisdr_md:.2f} dB below the HiFi-GAN "
                             "trio's 8.79 gate (VERDICT r4 #3)")


@needs_istft
def test_istft_trio_monitor_beats_passthrough():
    """VERDICT r4 #3's second bar: on the recorded monitor eval the
    served trio does NOT lose SI-SDR to passthrough.  Asserts the
    shipped gate record (written by tools/istft_gate.py on the fixed
    eval-v2 seeds; recomputing evaluate() here would add ~10 CPU-min
    to the suite) plus its per-seed LSD bars."""
    import json as _json

    rec = _json.loads(PRETRAINED_ISTFT.with_suffix(".json").read_text())
    assert rec["sisdr_model"] >= rec["sisdr_passthrough"], rec
    assert rec["gate_pair_seed123"]["sisdr"] >= 8.79, rec
    spread = rec["eval_spread_n2"]
    assert spread and all(v["lsd_model"] <= 6.5 for v in spread.values())

def test_spectral_vocoder_forward_and_cfg_roundtrip():
    import dataclasses as dc

    from egregora_tpu.models.flashsr.distill import (_cfg_from_json,
                                                     _cfg_to_json,
                                                     distilled_config)
    from egregora_tpu.models.flashsr.vocoder import (SpectralVocoder,
                                                     VocoderConfig,
                                                     build_vocoder)

    vcfg = VocoderConfig(kind="istft", hidden=32, depth=1)
    voc = build_vocoder(vcfg)
    assert isinstance(voc, SpectralVocoder)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 256))
    params = voc.init(jax.random.PRNGKey(1), mel)
    wav = voc.apply(params, mel)
    assert wav.shape == (2, 16 * 480)
    assert np.isfinite(np.asarray(wav)).all()

    cfg = dc.replace(distilled_config(), vocoder=vcfg)
    rt = _cfg_from_json(_cfg_to_json(cfg))
    assert rt.vocoder.kind == "istft"
    assert rt.vocoder.hidden == 32 and rt.vocoder.depth == 1
    assert rt == cfg


@needs_weights
def test_distill_vocoder_smoke(tmp_path, monkeypatch):
    """Two optimizer steps of the vocoder-only trainer end-to-end
    (frozen shipped trio load -> loss -> scan -> save -> reload):
    guards the wiring that long TPU runs depend on.  The final
    full-chunk evaluate() is stubbed — it is the dominant cost on a
    1-core CI box and is gated by test_shipped_* already."""
    from egregora_tpu.models.flashsr import distill as dmod

    monkeypatch.setattr(dmod, "evaluate",
                        lambda *a, **k: {"lsd_model": 0.0, "sisdr_model": 0.0})
    out = tmp_path / "istft_trio.npz"
    m = dmod.distill_vocoder(steps=2, batch=1, frames=16, lr=1e-4,
                             scan_size=2, hidden=16, depth=1, out_path=out)
    assert np.isfinite(m["loss_last"])
    cfg, params = dmod.load_pretrained_with_cfg(out)
    assert cfg.vocoder.kind == "istft"
    assert set(params) == {"vae", "student_ldm", "sr_vocoder"}

    # --resume against the written trio continues rather than crashing
    m2 = dmod.distill_vocoder(steps=2, batch=1, frames=16, lr=1e-4,
                              scan_size=2, out_path=out, resume=True)
    assert np.isfinite(m2["loss_last"])


def test_resolve_flashsr_variant_env(tmp_path, monkeypatch, capsys):
    """The istft trio serves by default when shipped; requesting it
    explicitly while it's absent warns and falls back loudly."""
    import dataclasses as dc

    from egregora_tpu.models.flashsr import distill as dmod
    from egregora_tpu.models.flashsr.pipeline import FlashSRModules
    from egregora_tpu.models.flashsr.vocoder import VocoderConfig

    monkeypatch.setenv("EGREGORA_TPU_WEIGHTS", str(tmp_path))  # no converted
    monkeypatch.setenv("EGREGORA_FLASHSR_VARIANT", "istft")

    # absent istft trio -> warn + fall back to the HiFi-GAN shipped trio
    monkeypatch.setattr(dmod, "PRETRAINED_ISTFT", tmp_path / "absent.npz")
    cfg, params, source = dmod.resolve_flashsr()
    assert source in ("distilled", "random")
    assert "EGREGORA_FLASHSR_VARIANT" in capsys.readouterr().out

    # shipped istft trio -> selected BY DEFAULT (no env), geometry
    # round-trips through the self-describing npz
    monkeypatch.delenv("EGREGORA_FLASHSR_VARIANT")
    icfg = dc.replace(dmod.distilled_config(),
                      vocoder=VocoderConfig(kind="istft", hidden=32, depth=1))
    ipath = tmp_path / "pretrained_istft.npz"
    dmod.save_pretrained(FlashSRModules(icfg).init_params(0), ipath, cfg=icfg)
    monkeypatch.setattr(dmod, "PRETRAINED_ISTFT", ipath)
    cfg, params, source = dmod.resolve_flashsr()
    assert source == "distilled-istft"
    assert cfg.vocoder.kind == "istft" and cfg.vocoder.hidden == 32


def test_pipeline_runs_with_istft_vocoder():
    import dataclasses as dc

    from egregora_tpu.models.flashsr.distill import distilled_config
    from egregora_tpu.models.flashsr.pipeline import FlashSRModules
    from egregora_tpu.models.flashsr.vocoder import VocoderConfig

    cfg = dc.replace(distilled_config(),
                     vocoder=VocoderConfig(kind="istft", hidden=32, depth=1))
    pipe = FlashSRPipeline(cfg, params=FlashSRModules(cfg).init_params(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (CHUNK_SAMPLES,)) * 0.1
    y = np.asarray(pipe.chunk_forward(pipe.params, x[None], lowpass_input=False))
    assert y.shape == (1, CHUNK_SAMPLES)
    assert np.isfinite(y).all()


def test_pipeline_runs_with_phase_cond_istft_vocoder():
    """phase_cond=True threads the input chunk into the vocoder through
    chunk_forward (init_params, distill and the fused paths share it)."""
    import dataclasses as dc

    from egregora_tpu.models.flashsr.distill import distilled_config
    from egregora_tpu.models.flashsr.pipeline import FlashSRModules
    from egregora_tpu.models.flashsr.vocoder import VocoderConfig

    cfg = dc.replace(distilled_config(),
                     vocoder=VocoderConfig(kind="istft", hidden=32, depth=1,
                                           phase_cond=True))
    pipe = FlashSRPipeline(cfg, params=FlashSRModules(cfg).init_params(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (CHUNK_SAMPLES,)) * 0.1
    y = np.asarray(pipe.chunk_forward(pipe.params, x[None], lowpass_input=False))
    assert y.shape == (1, CHUNK_SAMPLES)
    assert np.isfinite(y).all()
