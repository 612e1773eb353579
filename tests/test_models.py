"""Model-engine tests: tiny-config golden behaviors (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.models.flashsr.pipeline import (CHUNK_SAMPLES, FlashSRConfig,
                                                  FlashSRPipeline, HOP_SAMPLES)
from egregora_tpu.models.flashsr.unet import UNetConfig
from egregora_tpu.models.flashsr.vae import VAEConfig
from egregora_tpu.models.flashsr.vocoder import VocoderConfig


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = FlashSRConfig(
        vae=VAEConfig(base_channels=8, channel_mults=(1, 2, 2), latent_channels=4,
                      num_res_blocks=1, groups=4),
        unet=UNetConfig(in_channels=8, out_channels=4, base_channels=8,
                        channel_mults=(1, 2), num_res_blocks=1, attn_levels=(1,),
                        num_heads=2, time_dim=16, groups=4),
        vocoder=VocoderConfig(upsample_initial=16, channel_floor=8),
    )
    return FlashSRPipeline(cfg, seed=0)


def test_flashsr_ldm_unet_pipeline_forward():
    """The default (upstream LDM UNet) architecture runs the chunk
    forward end to end: FlashSRModules picks LDMUNet for LDMUNetConfig."""
    from egregora_tpu.models.flashsr.ldm_unet import LDMUNet, LDMUNetConfig
    cfg = FlashSRConfig(
        vae=VAEConfig(base_channels=8, channel_mults=(1, 2, 2), latent_channels=4,
                      num_res_blocks=1, groups=4, mid_attn=False,
                      use_quant_conv=False),
        unet=LDMUNetConfig(in_channels=8, out_channels=4, model_channels=8,
                           channel_mult=(1, 2), num_res_blocks=1,
                           attention_resolutions=(2,), num_heads=2, groups=4),
        vocoder=VocoderConfig(upsample_initial=16, channel_floor=8),
    )
    pipe = FlashSRPipeline(cfg, seed=0)
    assert isinstance(pipe.modules.unet, LDMUNet)
    x = jnp.zeros((1, CHUNK_SAMPLES), jnp.float32)
    y = pipe._jit_forward(pipe.params, x, lowpass_input=False)
    assert y.shape == (1, CHUNK_SAMPLES)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_mel_envelope_match_identity_and_gain():
    """mel_envelope_match must be ~identity when the waveform already
    matches the target envelope, and recover amplitude when it doesn't
    (the zero-training LSD lever — see mel.py docstring)."""
    from egregora_tpu.models.flashsr.mel import log_mel, mel_envelope_match

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((1, 48000)) * 0.1).astype(np.float32))
    tgt = log_mel(x)
    y = mel_envelope_match(x, tgt)
    assert y.shape == x.shape
    rel = float(jnp.sqrt(jnp.mean((y - x) ** 2) / jnp.mean(x ** 2)))
    assert rel < 0.05, rel
    # halved input matched to the full-level envelope recovers ~4x energy
    y2 = mel_envelope_match(x * 0.5, tgt)
    ratio = float(jnp.mean(y2 ** 2) / jnp.mean((x * 0.5) ** 2))
    assert 3.0 < ratio < 5.0, ratio
    # the real contract, both modes: the output's mel comes back to the
    # target (replace mode reproduces band sums exactly by construction)
    for replace in (False, True):
        yr = mel_envelope_match(x * 0.5, tgt, replace=replace)
        err = float(jnp.mean(jnp.abs(log_mel(yr) - tgt)))
        assert err < 0.25, (replace, err)


def test_flashsr_envelope_match_flag(tiny_pipe):
    """envelope_match=True runs through chunk_forward and changes the
    high band (the low band is re-imposed by the crossover either way)."""
    import dataclasses as dc

    cfg = dc.replace(tiny_pipe.cfg, envelope_match=True)
    pipe = FlashSRPipeline(cfg, params=tiny_pipe.params)
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((1, CHUNK_SAMPLES)) * 0.05)
                    .astype(np.float32))
    y_on = pipe._jit_forward(pipe.params, x, lowpass_input=False)
    y_off = tiny_pipe._jit_forward(tiny_pipe.params, x, lowpass_input=False)
    assert y_on.shape == y_off.shape == (1, CHUNK_SAMPLES)
    assert bool(jnp.all(jnp.isfinite(y_on)))
    assert not np.allclose(np.asarray(y_on), np.asarray(y_off))


def test_bandwidth_mask_tracks_cutoff():
    """The pred-referenced edge detector must localize even a
    BRICK-WALL input cutoff (whose STFT leakage skirt defeats a global
    peak-relative threshold by 1-4 kHz) across the synth draw range,
    and cap at crossover_hz for full-band input.  The prediction here
    is the truth mel — the UNet's job; its accuracy is gated by the
    distilled-weights tests."""
    from egregora_tpu.models.flashsr.mel import log_mel
    from egregora_tpu.models.flashsr.pipeline import _bandwidth_mask_vs_pred
    from egregora_tpu.ops.stft import stft_conv

    sr, n_fft = 48000, 2048
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    mel_true = log_mel(jnp.asarray(x)[None])

    def mask_mid(xs):
        pad = n_fft // 2
        xp = jnp.pad(jnp.asarray(xs, jnp.float32)[None], ((0, 0), (pad, pad)),
                     mode="reflect")
        rl, il = stft_conv(xp, n_fft, 512)
        w = np.asarray(_bandwidth_mask_vs_pred(rl, il, mel_true, sr,
                                               11000.0, n_fft))[0, 0]
        return np.interp(0.5, w[::-1], np.arange(len(w))[::-1]) * (sr / n_fft)

    for cut_hz in (5000, 6500, 8000, 10000):
        spec = np.fft.rfft(x)
        f = np.fft.rfftfreq(len(x), 1 / sr)
        xs = np.fft.irfft(np.where(f <= cut_hz, spec, 0), n=len(x))
        mid = mask_mid(xs)
        # overshoot deletes model content; allow generous undershoot
        assert cut_hz - 800 < mid < cut_hz + 350, (cut_hz, mid)
    # full-band noise: mask midpoint pinned at the crossover cap
    mid = mask_mid(x)
    assert abs(mid - 11000.0) < 350, mid


def test_bandwidth_mask_hot_prediction_keeps_low_band():
    """OOD guard: a prediction uniformly HOTTER than the input (every
    band > delta above it, so nothing reads as active) must fall back
    to the fixed crossover — not return w ~= 0 and delete the real
    observed low band (review finding)."""
    from egregora_tpu.models.flashsr.mel import log_mel
    from egregora_tpu.models.flashsr.pipeline import _bandwidth_mask_vs_pred
    from egregora_tpu.ops.stft import stft_conv

    sr, n_fft = 48000, 2048
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(sr) * 0.001).astype(np.float32)  # very quiet
    # prediction from a LOUD version: ~60 dB above the input everywhere
    mel_hot = log_mel(jnp.asarray(x * 1000.0)[None])
    pad = n_fft // 2
    xp = jnp.pad(jnp.asarray(x)[None], ((0, 0), (pad, pad)), mode="reflect")
    rl, il = stft_conv(xp, n_fft, 512)
    w = np.asarray(_bandwidth_mask_vs_pred(rl, il, mel_hot, sr,
                                           11000.0, n_fft))[0, 0]
    mid = np.interp(0.5, w[::-1], np.arange(len(w))[::-1]) * (sr / n_fft)
    assert abs(mid - 11000.0) < 350, mid       # fixed-crossover fallback
    assert w[: int(5000 / (sr / n_fft))].min() > 0.99  # low band preserved


def test_flashsr_constants_match_reference():
    # egregora_audio_super_resolution.py:255-258, 401
    assert CHUNK_SAMPLES == 245760
    assert HOP_SAMPLES == 221760


def test_flashsr_chunk_forward_shape(tiny_pipe):
    x = jnp.zeros((1, CHUNK_SAMPLES), jnp.float32)
    y = tiny_pipe._jit_forward(tiny_pipe.params, x, lowpass_input=False)
    assert y.shape == (1, CHUNK_SAMPLES)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_flashsr_preserves_low_band(tiny_pipe):
    """Fixed-frequency crossover merge keeps the observed low band
    bit-accurately-ish (adaptive_crossover=False pins the round-2
    semantics; the adaptive default lowers the merge point to the
    measured input bandwidth — covered by the hole-fill test below)."""
    import dataclasses as dc

    sr = 48000
    t = np.arange(CHUNK_SAMPLES) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    pipe = FlashSRPipeline(dc.replace(tiny_pipe.cfg, adaptive_crossover=False),
                           params=tiny_pipe.params)
    y = np.asarray(pipe._jit_forward(pipe.params, jnp.asarray(x),
                                     lowpass_input=False))
    # below crossover (11 kHz) the output must be the input tone
    xs = np.fft.rfft(x[0])
    ys = np.fft.rfft(y[0])
    freqs = np.fft.rfftfreq(CHUNK_SAMPLES, 1 / sr)
    low = freqs < 10000
    err = np.abs(xs[low] - ys[low]).max() / np.abs(xs).max()
    assert err < 1e-3


def test_flashsr_adaptive_crossover_fills_hole(tiny_pipe):
    """The adaptive merge must (a) keep the observed band below the
    input's real spectral edge and (b) hand the band between that edge
    and crossover_hz to the model instead of deleting it — the fixed
    merge filled [input-cutoff, 11 kHz] with the input's silence, which
    was 94.9% of the LSD mass on a 6 kHz-cutoff eval draw.

    Drives _postprocess directly with the truth mel as the prediction
    (tiny_pipe's random weights predict garbage mel, which correctly
    degrades the pred-referenced detector toward the fixed merge; the
    shipped weights' prediction accuracy is gated in
    test_flashsr_distilled.py)."""
    from egregora_tpu.models.flashsr.mel import log_mel
    from egregora_tpu.models.flashsr.pipeline import MEL_FRAMES

    sr = 48000
    rng = np.random.default_rng(3)
    full = (rng.standard_normal(CHUNK_SAMPLES) * 0.1).astype(np.float32)
    freqs = np.fft.rfftfreq(CHUNK_SAMPLES, 1 / sr)
    spec = np.fft.rfft(full)
    x = np.fft.irfft(np.where(freqs <= 9000, spec, 0),
                     n=CHUNK_SAMPLES).astype(np.float32)[None]
    wav = (rng.standard_normal((1, CHUNK_SAMPLES)) * 0.1).astype(np.float32)
    mel_pred = log_mel(jnp.asarray(full)[None])[:, :MEL_FRAMES, :]
    assert tiny_pipe.cfg.adaptive_crossover      # the default
    y = np.asarray(tiny_pipe._postprocess(jnp.asarray(x), jnp.asarray(wav),
                                          mel_pred))
    xs, ys = np.fft.rfft(x[0]), np.fft.rfft(y[0])
    low = freqs < 8000
    err = np.abs(xs[low] - ys[low]).max() / np.abs(xs).max()
    assert err < 1e-2, err                        # observed band kept
    hole = (freqs > 9500) & (freqs < 10800)
    e_in = float(np.mean(np.abs(xs[hole]) ** 2))
    e_out = float(np.mean(np.abs(ys[hole]) ** 2))
    assert e_out > 10.0 * max(e_in, 1e-12), (e_in, e_out)
    # above crossover_hz the model band passes through regardless
    hi = freqs > 11500
    assert float(np.mean(np.abs(ys[hi]) ** 2)) > 10.0 * max(
        float(np.mean(np.abs(xs[hi]) ** 2)), 1e-12)


def test_flashsr_process_end_to_end(tiny_pipe):
    from egregora_tpu.core.audio import AudioBuffer
    x = np.random.default_rng(0).standard_normal((2, CHUNK_SAMPLES // 3)).astype(np.float32) * 0.1
    buf = AudioBuffer(jnp.asarray(x), 24000, {})
    # mesh=None: the 8-virtual-device auto-mesh path is covered by
    # test_flashsr_process_mesh_matches_single; padding 1 chunk to 8
    # here would 8x this test's cost for no extra coverage
    out = tiny_pipe.process(buf, output_sr=44100, mesh=None)
    assert out.sample_rate == 44100
    # 24k -> 48k doubles, 48->44.1 scales by 0.91875
    expect = int(np.ceil(x.shape[1] * 2 * 44100 / 48000))
    assert abs(out.samples.shape[1] - expect) <= 2
    assert bool(jnp.all(jnp.isfinite(out.samples)))


def test_flashsr_deterministic(tiny_pipe):
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, CHUNK_SAMPLES)),
                    jnp.float32) * 0.05
    y1 = np.asarray(tiny_pipe._jit_forward(tiny_pipe.params, x, lowpass_input=False))
    y2 = np.asarray(tiny_pipe._jit_forward(tiny_pipe.params, x, lowpass_input=False))
    np.testing.assert_array_equal(y1, y2)


# ---------------- RNNoise ----------------

def test_rnnoise_contract():
    from egregora_tpu.models.rnnoise.model import FRAME, denoise, init_params
    params = init_params(0)
    t = FRAME * 20
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, t)), jnp.float32) * 0.1
    y, vad = denoise(params, x)
    assert y.shape == (2, t)
    assert vad.shape == (2, 20)
    assert bool(jnp.all(jnp.isfinite(y)))
    assert bool(jnp.all((vad >= 0) & (vad <= 1)))


def test_rnnoise_deterministic_and_state():
    from egregora_tpu.models.rnnoise.model import FRAME, denoise_channel, init_params
    params = init_params(0)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(FRAME * 10), jnp.float32) * 0.2
    y1, v1 = denoise_channel(params, x)
    y2, v2 = denoise_channel(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # VAD evolves over frames (GRU state is actually carried)
    assert np.std(np.asarray(v1)) >= 0.0


# ---------------- WPE ----------------

def test_wpe_reduces_reverb():
    """Bursty source through synthetic reverb: WPE must cut the reverb
    tail energy in the silent gaps.  (WPE exploits source
    non-stationarity — a stationary source is unpredictable-from-past
    by construction, so the test source is on/off noise bursts.)"""
    from egregora_tpu.models.wpe import wpe_dereverb
    rng = np.random.default_rng(0)
    n = 32000
    env = np.zeros(n, np.float32)
    for s in range(0, n, 4000):
        env[s: s + 2000] = 1.0
    dry = rng.standard_normal(n).astype(np.float32) * 0.3 * env
    ir = np.zeros(2000, np.float32)
    ir[0] = 1.0
    ir[100:] = rng.standard_normal(1900).astype(np.float32) * np.exp(
        -np.arange(1900) / 300.0) * 0.5
    wet = np.convolve(dry, ir)[:n].astype(np.float32)

    out = np.asarray(wpe_dereverb(jnp.asarray(wet[None]), taps=10, delay=2,
                                  iterations=3, n_fft=512, hop=128))[0]
    gap = env < 0.5
    gap_wet = float(np.mean(wet[gap] ** 2))
    gap_wpe = float(np.mean(out[gap] ** 2))
    assert gap_wpe < 0.9 * gap_wet  # >=10% reverb-tail reduction
    assert np.abs(out).max() < 10.0  # no edge blowup


def test_wpe_shapes_and_finite():
    from egregora_tpu.models.wpe import wpe_dereverb
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4000)), jnp.float32)
    y = wpe_dereverb(x, taps=4, delay=1, iterations=2, n_fft=256, hop=64)
    assert y.shape == (2, 4000)
    assert bool(jnp.all(jnp.isfinite(y)))


# ---------------- DAC ----------------

def test_dac_shapes_and_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("EGREGORA_TPU_WEIGHTS", str(tmp_path))
    from egregora_tpu.models.dac import model as dacm
    dacm._CACHE.clear()
    model, params, sr = dacm.build_dac("16khz")
    assert sr == 16000
    hop = model.cfg.hop
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, hop * 6 - 5)),
                    jnp.float32) * 0.3
    z, codes = model.encode(params, x)
    assert z.shape == (1, 6, model.cfg.latent_dim)
    assert codes.shape == (1, model.cfg.n_codebooks, 6)
    y = model.decode(params, z)
    assert y.shape == (1, hop * 6)
    assert bool(jnp.all(jnp.isfinite(y)))
    # same model object cached
    model2, _, _ = dacm.build_dac("16khz")
    assert model2 is model
    dacm._CACHE.clear()


# ---------------- DFN ----------------

def test_dfn_enhance_shapes():
    from egregora_tpu.models.deepfilternet.model import DFNConfig, enhance, init_params
    params = init_params(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 9600)), jnp.float32) * 0.2
    y = enhance(params, x)
    assert y.shape == (1, 9600)
    assert bool(jnp.all(jnp.isfinite(y)))
    y_pf = enhance(params, x, post_filter=True)
    assert y_pf.shape == (1, 9600)


# ---------------- mesh parallelism ----------------

def test_chunk_parallel_matches_single_device(tiny_pipe):
    from egregora_tpu.ops.wola import chunk_batch, wola_stitch
    from egregora_tpu.parallel.mesh import chunk_parallel, make_chunk_mesh

    mesh = make_chunk_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual cpu devices

    x = np.random.default_rng(0).standard_normal(
        (1, CHUNK_SAMPLES + 3 * HOP_SAMPLES)).astype(np.float32) * 0.1
    chunks, starts, lengths = chunk_batch(jnp.asarray(x), CHUNK_SAMPLES,
                                          HOP_SAMPLES, pad_to_multiple=mesh.size)
    flat = chunks[:, 0, :]  # mono

    fn = lambda p, c: tiny_pipe.chunk_forward(p, c, lowpass_input=False)
    sharded = chunk_parallel(fn, mesh)
    y_sharded = np.asarray(sharded(tiny_pipe.params, flat))
    y_single = np.asarray(tiny_pipe._jit_forward(tiny_pipe.params, flat,
                                                 lowpass_input=False))
    np.testing.assert_allclose(y_sharded, y_single, atol=2e-2, rtol=1e-2)

    out = wola_stitch(y_sharded[:, None, :], starts, lengths, x.shape[1],
                      CHUNK_SAMPLES)
    assert out.shape == x.shape


def test_flashsr_streaming_matches_oneshot(tiny_pipe):
    """max_batch streaming (running weighted-sum accumulators) must match
    one-shot processing (noise latent is batch-position invariant)."""
    from egregora_tpu.core.audio import AudioBuffer
    # 2 chunks with max_batch=1: the smallest input that still streams
    # through MULTIPLE accumulator folds (wall time on the 1-core box)
    x = np.random.default_rng(5).standard_normal(
        (1, CHUNK_SAMPLES + HOP_SAMPLES)).astype(np.float32) * 0.1
    buf = AudioBuffer(jnp.asarray(x), 48000, {})
    a = tiny_pipe.process(buf, mesh=None)
    b = tiny_pipe.process(buf, max_batch=1, mesh=None)
    np.testing.assert_allclose(np.asarray(a.samples), np.asarray(b.samples),
                               atol=1e-6, rtol=1e-6)


def test_flashsr_process_mesh_matches_single(tiny_pipe):
    """process() with the chunk batch sharded over the 8-virtual-device
    mesh (the default when >1 device is visible) must match the forced
    single-device path — the production analog of
    test_chunk_parallel_matches_single_device."""
    from egregora_tpu.core.audio import AudioBuffer
    x = np.random.default_rng(6).standard_normal(
        (1, CHUNK_SAMPLES + 2 * HOP_SAMPLES)).astype(np.float32) * 0.1
    buf = AudioBuffer(jnp.asarray(x), 48000, {})
    a = tiny_pipe.process(buf, mesh=None)
    b = tiny_pipe.process(buf)           # auto -> 8-device mesh
    assert len(jax.devices()) == 8
    np.testing.assert_allclose(np.asarray(a.samples), np.asarray(b.samples),
                               atol=2e-2, rtol=1e-2)


def test_flashsr_process_mesh_streaming_matches_single(tiny_pipe):
    """mesh x streaming (max_batch) — the combination the dryrun also
    checks (VERDICT r4 #7): the fixed-shape streaming accumulator path
    with its chunk batches sharded over the 8-device mesh must equal
    the single-device one-shot result."""
    from egregora_tpu.core.audio import AudioBuffer
    x = np.random.default_rng(8).standard_normal(
        (1, CHUNK_SAMPLES + 2 * HOP_SAMPLES)).astype(np.float32) * 0.1
    buf = AudioBuffer(jnp.asarray(x), 48000, {})
    a = tiny_pipe.process(buf, mesh=None)
    b = tiny_pipe.process(buf, max_batch=8)   # auto mesh + streaming fold
    assert len(jax.devices()) == 8
    np.testing.assert_allclose(np.asarray(a.samples), np.asarray(b.samples),
                               atol=1e-5, rtol=1e-5)


def test_flashsr_process_pcm16_wire_matches_f32(tiny_pipe):
    """wire="pcm16" (int16 at both host<->device edges) must match the
    float32 path within the -90 dBFS quantization floor, return int16
    wire samples, and dequantize through AudioBuffer.numpy()."""
    from egregora_tpu.core.audio import AudioBuffer, pcm16_decode, pcm16_encode

    x = np.random.default_rng(7).standard_normal(
        (1, CHUNK_SAMPLES + HOP_SAMPLES)).astype(np.float32) * 0.1
    buf = AudioBuffer(x, 48000, {})            # host numpy samples
    a = tiny_pipe.process(buf, mesh=None, wire="f32")
    b = tiny_pipe.process(buf, mesh=None, wire="pcm16")
    assert np.asarray(b.samples).dtype == np.int16
    assert b.meta.get("wire") == "pcm16"
    y = b.numpy()
    assert y.dtype == np.float32
    # one quantize step on input (-90 dBFS) through the model + one on
    # output: comfortably inside 1e-3 absolute for 0.1-RMS audio
    np.testing.assert_allclose(np.asarray(a.samples), y, atol=1e-3)

    # encode/decode roundtrip: exact to one LSB
    v = np.linspace(-1.2, 1.2, 101).astype(np.float32)
    rt = pcm16_decode(pcm16_encode(v))
    np.testing.assert_allclose(rt, np.clip(v, -1, 1), atol=1.0 / 32767.0)


def test_flashsr_pcm16_wire_preserves_over_fullscale_peaks(tiny_pipe):
    """Outputs exceeding full scale must survive the pcm16 wire
    (VERDICT r4 #4): the wire program divides by max(1, peak) before the
    int16 cast and meta["wire_scale"] multiplies back at decode — the
    old encoding hard-clipped what the f32 path preserved (the
    reference returns unclipped floats,
    egregora_audio_super_resolution.py:431)."""
    import dataclasses as _dc

    from egregora_tpu.core.audio import AudioBuffer

    # fixed crossover so the low band passes through verbatim (the
    # adaptive detector would park the merge edge on a lone test tone);
    # a 1.25-peak low-frequency input then forces a >1-peak output
    pipe = FlashSRPipeline(_dc.replace(tiny_pipe.cfg, adaptive_crossover=False),
                           params=tiny_pipe.params)
    t = np.arange(CHUNK_SAMPLES + HOP_SAMPLES, dtype=np.float32) / 48000.0
    x = (1.25 * np.sin(2 * np.pi * 200.0 * t)).astype(np.float32)[None, :]
    buf = AudioBuffer(x, 48000, {})            # host numpy samples
    a = pipe.process(buf, mesh=None, wire="f32")
    b = pipe.process(buf, mesh=None, wire="pcm16")
    ay = np.asarray(a.samples)
    peak = float(np.max(np.abs(ay)))
    assert peak > 1.0, f"fixture no longer produces >1 peaks ({peak})"
    assert np.asarray(b.samples).dtype == np.int16
    scale = float(np.asarray(b.meta["wire_scale"]))
    # the wire input is the quantized x, so the output peak (and hence
    # the carried scale) matches the f32 path's to quantization noise
    assert abs(scale - peak) < 1e-2 and scale > 1.0
    y = b.numpy()
    # bounded delta: one input LSB + one scaled output LSB of quantization
    np.testing.assert_allclose(ay, y, atol=3e-3 * scale)
    assert float(np.max(np.abs(y))) > 1.0


def test_from_any_device_false_keeps_host():
    """device=False coercion keeps numpy samples (the node layer's way
    to let process() pick the pcm16 transfer format)."""
    from egregora_tpu.core.audio import from_any

    x = np.zeros((1, 2, 480), np.float32)
    buf = from_any({"waveform": x, "sample_rate": 48000}, device=False)
    assert isinstance(buf.samples, np.ndarray)
    d = buf.to_comfy()
    assert d["waveform"].shape == (1, 2, 480)
