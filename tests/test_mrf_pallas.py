"""The Pallas fused channel-major MRF kernel (ops/mrf_pallas.py) must
match the flax module vocoder path it replaces on TPU backends
(models/flashsr/vocoder.py) — layout, halos, residual alignment,
branch mean, and the full apply_fused composition."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.models.flashsr.vocoder import (SRVocoder, VocoderConfig,
                                                 apply_fused)
from egregora_tpu.ops.mrf_pallas import (branch_halo, mrf_fused_cm,
                                         pack_resblock_weights)


def _cfg(dtype):
    return VocoderConfig(n_mels=8, upsample_initial=32,
                         upsample_factors=(2, 2, 3), upsample_kernels=(4, 4, 6),
                         channel_floor=8, dtype=dtype)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-4), (jnp.bfloat16, 3e-2)])
def test_apply_fused_matches_module(dtype, atol):
    cfg = _cfg(dtype)
    _check_fused(cfg, dtype, atol)


def test_apply_fused_mixed_wide_stage():
    """Stages over the C<=64 threshold run the flax MRF module inside
    apply_fused (the C=256 full-geometry stage compiles pathologically
    as one unrolled kernel); the composition must still match."""
    cfg = VocoderConfig(n_mels=8, upsample_initial=160,
                        upsample_factors=(2, 2), upsample_kernels=(4, 4),
                        channel_floor=8, dtype=jnp.float32)
    _check_fused(cfg, jnp.float32, 2e-4)


def test_apply_fused_rejects_heterogeneous_dilations():
    """The fused kernel applies one dilation schedule to every branch;
    configs with per-branch schedules must fail loudly instead of
    silently convolving with wrong receptive fields."""
    cfg = dataclasses.replace(
        _cfg(jnp.float32), resblock_dilations=((1, 3, 5), (1, 3, 5), (2, 6, 12)))
    voc = SRVocoder(cfg)
    mel = jnp.zeros((1, 16, 8), jnp.float32)
    params = voc.init(jax.random.PRNGKey(0), mel)
    with pytest.raises(NotImplementedError, match="resblock_dilations"):
        apply_fused(params, mel, cfg, interpret=True)


def _check_fused(cfg, dtype, atol):
    voc = SRVocoder(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    params = voc.init(jax.random.PRNGKey(1), mel)
    ref = voc.apply(params, mel)
    got = apply_fused(params, mel, cfg, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=atol)


def test_tiling_invariance_and_halo():
    """Multi-tile output must equal single-tile output exactly — pins
    the overlap-framing halo bookkeeping."""
    c, t = 8, 384
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, c, t)).astype(np.float32))
    kernels, dils = (3, 7, 11), (1, 3, 5)
    weights = []
    for k in kernels:
        for _ in dils:
            w1 = rng.standard_normal((k * c, c)).astype(np.float32) * 0.2
            w2 = rng.standard_normal((k * c, c)).astype(np.float32) * 0.2
            b1 = rng.standard_normal((c, 1)).astype(np.float32) * 0.1
            b2 = rng.standard_normal((c, 1)).astype(np.float32) * 0.1
            weights.append(tuple(jnp.asarray(a) for a in (w1, b1, w2, b2)))
    one = mrf_fused_cm(x, weights, kernels, dils, block_t=512, interpret=True)
    tiled = mrf_fused_cm(x, weights, kernels, dils, block_t=96, interpret=True)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(one),
                               rtol=1e-5, atol=1e-5)
    assert branch_halo(11, dils) == 60
    assert branch_halo(3, dils) == 12


def test_mrf_dense_matches_pallas_and_module(monkeypatch):
    """ops/mrf_dense.mrf_dense_cm is a drop-in for the Pallas kernel
    (same weight list, same zero-padded semantics); apply_fused with
    EGREGORA_MRF_PATH=dense must match the flax module too."""
    from egregora_tpu.ops.mrf_dense import mrf_dense_cm

    c, t = 8, 384
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, c, t)).astype(np.float32))
    kernels, dils = (3, 7, 11), (1, 3, 5)
    weights = []
    for k in kernels:
        for _ in dils:
            w1 = rng.standard_normal((k * c, c)).astype(np.float32) * 0.2
            w2 = rng.standard_normal((k * c, c)).astype(np.float32) * 0.2
            b1 = rng.standard_normal((c, 1)).astype(np.float32) * 0.1
            b2 = rng.standard_normal((c, 1)).astype(np.float32) * 0.1
            weights.append(tuple(jnp.asarray(a) for a in (w1, b1, w2, b2)))
    ref = mrf_fused_cm(x, weights, kernels, dils, block_t=512, interpret=True)
    got = mrf_dense_cm(x, weights, kernels, dils)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    monkeypatch.setenv("EGREGORA_MRF_PATH", "dense")
    cfg = _cfg(jnp.float32)
    _check_fused(cfg, jnp.float32, 2e-4)


def test_pipeline_env_gate(monkeypatch):
    """The Pallas fused vocoder path is opt-in (EGREGORA_FUSED_VOCODER;
    round-4 kernel lab measured plain XLA faster at channel floor 64),
    never active on CPU, and EGREGORA_NO_FUSED_VOCODER always wins."""
    from egregora_tpu.models.flashsr import pipeline as P
    assert P._fused_vocoder_enabled() is False     # default OFF
    monkeypatch.setenv("EGREGORA_FUSED_VOCODER", "1")
    assert P._fused_vocoder_enabled() is False     # CPU test env
    monkeypatch.setenv("EGREGORA_NO_FUSED_VOCODER", "1")
    assert P._fused_vocoder_enabled() is False     # NO_ wins over opt-in


def test_mrf_packed_matches_module(monkeypatch):
    """ops/mrf_packed: batch-packed grouped convs are BIT-exact vs the
    flax MRF module (same conv op, same f32 accumulation — grouping
    only relabels which lane a batch item occupies), and apply_fused
    with EGREGORA_MRF_PATH=packed matches the module end-to-end,
    staying packed through the 1-channel post conv."""
    from egregora_tpu.models.flashsr.vocoder import MRF
    from egregora_tpu.ops.mrf_packed import (mrf_packed, pack_batch,
                                             unpack_batch)

    c, t = 8, 384
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, t, c)).astype(np.float32))
    kernels, dils = (3, 7, 11), (1, 3, 5)
    mod = MRF(c, kernels, (dils,) * 3, jnp.float32)
    params = mod.init(jax.random.PRNGKey(2), x[:1, :64])
    ref = mod.apply(params, x)

    # pack/unpack roundtrip + per-item independence under packing
    assert np.array_equal(np.asarray(unpack_batch(pack_batch(x, 2), 2)),
                          np.asarray(x))
    got = unpack_batch(mrf_packed(pack_batch(x, 2), params["params"], 2,
                                  kernels, dils), 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    monkeypatch.setenv("EGREGORA_MRF_PATH", "packed")
    cfg = _cfg(jnp.float32)
    _check_fused(cfg, jnp.float32, 2e-4)


# ---------------- NWC fused-chain engine (ops/mrf_rows.py) ----------------

def test_mrf_rows_matches_flax():
    """Halo-framed fused-chain kernel == flax MRF (bf16 tolerance),
    including the per-conv zero-pad boundary semantics at tile 0/S-1."""
    import numpy as np

    from egregora_tpu.models.flashsr.vocoder import MRF
    from egregora_tpu.ops.mrf_rows import mrf_rows

    rng = np.random.default_rng(0)
    kernels, dils = (3, 7, 11), ((1, 3, 5),) * 3
    for b, t, c, tile in [(2, 512, 64, 256), (1, 768, 128, 256)]:
        x = jnp.asarray(rng.standard_normal((b, t, c)) * 0.3, jnp.bfloat16)
        m = MRF(c, kernels, dils, jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(m.apply(p, x), np.float32)
        got = np.asarray(mrf_rows(x, p["params"], kernels, dils,
                                  tile=tile, interpret=True), np.float32)
        assert np.abs(ref - got).max() <= 0.05, (b, t, c)


def test_apply_fused_rows_engine():
    """EGREGORA_MRF_PATH=rows end-to-end through apply_fused."""
    import os

    import numpy as np

    from egregora_tpu.models.flashsr.vocoder import (SRVocoder,
                                                     VocoderConfig,
                                                     apply_fused)
    from egregora_tpu.utils.weights import fast_init_like

    cfg = VocoderConfig(upsample_initial=128)
    model = SRVocoder(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 16, cfg.n_mels))
                      .astype(np.float32))
    p = fast_init_like(
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mel)), 0)
    ref = np.asarray(model.apply(p, mel), np.float32)
    os.environ["EGREGORA_MRF_PATH"] = "rows"
    try:
        got = np.asarray(apply_fused(p, mel, cfg, interpret=True),
                         np.float32)
    finally:
        os.environ.pop("EGREGORA_MRF_PATH", None)
    assert np.abs(ref - got).max() <= 0.01
