"""Weight store tests: .pth-style conversion, npz cache, fast init."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.utils.weights import (convert_state_dict, fast_init_like,
                                        load_params, save_params)


def _target_tree():
    rng = np.random.default_rng(0)
    return {
        "encoder": {
            "conv1": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros((8,))},
            "dense": {"kernel": jnp.zeros((16, 32)), "bias": jnp.zeros((32,))},
        },
        "norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }


def test_convert_torch_conventions():
    """torch [O,I,kh,kw] convs and [out,in] linears map onto flax layout."""
    rng = np.random.default_rng(1)
    torch_sd = {
        "encoder.conv1.weight": rng.standard_normal((8, 4, 3, 3)).astype(np.float32),
        "encoder.conv1.bias": rng.standard_normal(8).astype(np.float32),
        "encoder.dense.weight": rng.standard_normal((32, 16)).astype(np.float32),
        "encoder.dense.bias": rng.standard_normal(32).astype(np.float32),
        "norm.scale": rng.standard_normal(8).astype(np.float32),
        "norm.bias": rng.standard_normal(8).astype(np.float32),
    }
    out = convert_state_dict(torch_sd, _target_tree())
    np.testing.assert_array_equal(
        np.asarray(out["encoder"]["conv1"]["kernel"]),
        np.transpose(torch_sd["encoder.conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(out["encoder"]["dense"]["kernel"]),
        torch_sd["encoder.dense.weight"].T)
    np.testing.assert_array_equal(np.asarray(out["norm"]["bias"]),
                                  torch_sd["norm.bias"])


def test_convert_fails_loud_on_partial():
    torch_sd = {"encoder.conv1.weight": np.zeros((8, 4, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="unmatched"):
        convert_state_dict(torch_sd, _target_tree())


def test_convert_explicit_name_map():
    rng = np.random.default_rng(2)
    torch_sd = {"weird.name.w": rng.standard_normal((32, 16)).astype(np.float32),
                "skip.me": np.zeros(3, np.float32)}
    tree = {"dense": {"kernel": jnp.zeros((16, 32))}}

    def name_map(k):
        return "dense/kernel" if k == "weird.name.w" else None

    out = convert_state_dict(torch_sd, tree, name_map=name_map)
    np.testing.assert_array_equal(np.asarray(out["dense"]["kernel"]),
                                  torch_sd["weird.name.w"].T)


def test_npz_roundtrip(tmp_path):
    tree = _target_tree()
    save_params(tree, tmp_path / "p.npz")
    back = load_params(tmp_path / "p.npz")
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fast_init_like_scales():
    shapes = jax.eval_shape(lambda: _target_tree())
    p = fast_init_like(shapes, seed=3)
    # biases zero, scales one
    assert float(jnp.sum(jnp.abs(p["norm"]["bias"]))) == 0.0
    np.testing.assert_array_equal(np.asarray(p["norm"]["scale"]), 1.0)
    # kernels ~ lecun: std approx 1/sqrt(fan_in)
    k = np.asarray(p["encoder"]["conv1"]["kernel"])
    assert abs(k.std() - 1.0 / np.sqrt(3 * 3 * 4)) < 0.05
    # deterministic per seed
    p2 = fast_init_like(shapes, seed=3)
    np.testing.assert_array_equal(np.asarray(p2["encoder"]["dense"]["kernel"]),
                                  np.asarray(p["encoder"]["dense"]["kernel"]))


# ---------------- realistic upstream layouts (VERDICT r1 #6) ----------------

def _synthetic_torch_sd(name_map_dict, flat_target, rng, weight_norm=False):
    """Build a torch-layout state dict for every (torch key -> flax path)
    entry, inverting the converter's transposes, optionally wrapped as
    weight_norm (weight_g/weight_v) pairs."""
    sd = {}
    for tk, fk in name_map_dict.items():
        perm = None
        if isinstance(fk, tuple):
            fk, perm = fk
        shape = tuple(flat_target[fk].shape)
        w = rng.standard_normal(shape).astype(np.float32)
        if callable(perm):
            # inverse of the torch-GRU gate-order transforms: our (z,r,n)
            # blocks -> torch (r,z,n), then the torch [3h, d] orientation
            if tk.endswith(("weight_ih_l0", "weight_hh_l0")):
                h = w.shape[1] // 3
                t = np.concatenate([w[:, h:2 * h], w[:, :h], w[:, 2 * h:]],
                                   axis=1).T
            elif tk.endswith("bias_ih_l0"):
                h = w.shape[0] // 3
                t = np.concatenate([w[h:2 * h], w[:h], w[2 * h:]])
            else:
                raise NotImplementedError(f"no inverse for transform on {tk}")
        elif perm is not None:                    # flax -> torch inverse perm
            inv = np.argsort(perm)
            t = np.transpose(w, inv)
        elif len(shape) == 2 and tk.endswith("weight"):
            t = w.T
        elif len(shape) >= 3 and tk.endswith("weight"):
            inv = np.argsort(tuple(range(2, len(shape))) + (1, 0))
            t = np.transpose(w, inv)
        else:
            t = w
        if weight_norm and tk.endswith("weight") and t.ndim >= 2:
            axes = tuple(range(1, t.ndim))
            g = np.sqrt(np.sum(t ** 2, axis=axes, keepdims=True)) + 1e-12
            sd[tk[:-len("weight")] + "weight_v"] = 3.0 * t
            sd[tk[:-len("weight")] + "weight_g"] = g
        else:
            sd[tk] = t
    return sd


def test_hifigan_checkpoint_layout_loads():
    """A weight-normalized state dict in the upstream HiFi-GAN layout
    (conv_pre / ups.N / resblocks.N.convsX.D / conv_post) fully loads
    into the SRVocoder tree through the documented name map."""
    import jax as _jax
    import jax.numpy as _jnp
    from egregora_tpu.models.flashsr.vocoder import (SRVocoder, VocoderConfig,
                                                     hifigan_name_map)
    from egregora_tpu.utils.weights import _flatten

    cfg = VocoderConfig(n_mels=16, upsample_initial=16,
                        upsample_factors=(4, 4), upsample_kernels=(8, 8),
                        channel_floor=8)
    voc = SRVocoder(cfg)
    target = voc.init(_jax.random.PRNGKey(0), _jnp.zeros((1, 8, 16)))
    flat = _flatten(target)

    # rebuild the raw dict behind the .get-style map
    nm = hifigan_name_map(cfg)
    raw = {k: nm(k) for k in [
        "conv_pre.weight", "conv_pre.bias", "conv_post.weight", "conv_post.bias"]
        + [f"ups.{i}.{s}" for i in range(2) for s in ("weight", "bias")]
        + [f"resblocks.{idx}.convs{c}.{d}.{s}" for idx in range(6)
           for c in (1, 2) for d in range(3) for s in ("weight", "bias")]}
    rng = np.random.default_rng(7)
    sd = _synthetic_torch_sd(raw, flat, rng, weight_norm=True)
    sd["extra.discriminator.weight"] = np.zeros((4, 4), np.float32)  # dropped

    out = convert_state_dict(sd, target, name_map=nm)
    got = {k: np.asarray(v) for k, v in _flatten(out).items()}
    assert set(got) == set(flat)
    # ConvTranspose orientation: torch [in, out, k] -> flax [k, in, out]
    t = sd.get("ups.0.weight_v")
    g = sd["ups.0.weight_g"]
    folded = g * t / (np.sqrt(np.sum(t ** 2, axis=(1, 2), keepdims=True)) + 1e-12)
    np.testing.assert_allclose(got["params/ConvTranspose_0/kernel"],
                               np.transpose(folded, (2, 0, 1)), rtol=1e-5)


def test_audioldm_vae_checkpoint_layout_loads():
    """encoder.down.* / decoder.up.* (SD AutoencoderKL naming, reversed
    decoder indexing) fully loads into the MelVAE tree."""
    import jax as _jax
    import jax.numpy as _jnp
    from egregora_tpu.models.flashsr.vae import (MelVAE, VAEConfig,
                                                 audioldm_vae_name_map)
    from egregora_tpu.utils.weights import _flatten

    cfg = VAEConfig(base_channels=8, channel_mults=(1, 2, 4), latent_channels=4,
                    num_res_blocks=1, groups=4)
    vae = MelVAE(cfg)
    target = vae.init(_jax.random.PRNGKey(0), _jnp.zeros((1, 16, 32, 1)))
    flat = _flatten(target)

    nm = audioldm_vae_name_map(cfg)
    raw = nm.__self__   # the underlying dict behind dict.get
    assert set(raw.values()) == set(flat), (
        sorted(set(flat) - set(raw.values()))[:5],
        sorted(set(raw.values()) - set(flat))[:5])
    rng = np.random.default_rng(8)
    sd = _synthetic_torch_sd(raw, flat, rng)
    sd["loss.logvar"] = np.zeros((1,), np.float32)  # upstream-only extra, dropped

    out = convert_state_dict(sd, target, name_map=nm)
    got = {k: np.asarray(v) for k, v in _flatten(out).items()}
    assert set(got) == set(flat)
    np.testing.assert_array_equal(
        got["params/encoder/ResBlock_0/GroupNorm_0/scale"],
        sd["encoder.down.0.block.0.norm1.weight"])


def test_ldm_unet_checkpoint_layout_loads():
    """CompVis UNetModel naming (time_embed.{0,2} / input_blocks.N.M
    in_layers/emb_layers/out_layers/skip_connection / AttentionBlock
    norm/qkv/proj_out / Downsample op / Upsample conv / out.{0,2})
    fully loads into the LDMUNet tree, and the converted params run."""
    import jax as _jax
    import jax.numpy as _jnp
    from egregora_tpu.models.flashsr.ldm_unet import (LDMUNet, LDMUNetConfig,
                                                      ldm_unet_name_map)
    from egregora_tpu.utils.weights import _flatten

    cfg = LDMUNetConfig(in_channels=8, out_channels=4, model_channels=8,
                        channel_mult=(1, 2, 4), num_res_blocks=2,
                        attention_resolutions=(2, 4), num_heads=2, groups=4)
    unet = LDMUNet(cfg)
    z = _jnp.zeros((1, 16, 8, 8))
    target = unet.init(_jax.random.PRNGKey(0), z, _jnp.zeros((1,)))
    flat = _flatten(target)

    nm = ldm_unet_name_map(cfg)
    raw = nm.__self__
    flax_paths = set(p[0] if isinstance(p, tuple) else p for p in raw.values())
    assert flax_paths == set(flat), (
        sorted(set(flat) - flax_paths)[:6], sorted(flax_paths - set(flat))[:6])
    rng = np.random.default_rng(12)
    H = cfg.num_heads
    sd = {}
    for tk, fk in raw.items():
        tr = None
        if isinstance(fk, tuple):
            fk, tr = fk
        w = rng.standard_normal(flat[fk].shape).astype(np.float32)
        if callable(tr) and tk.endswith("qkv.weight"):
            # inverse of attn_qkv_transforms kernel: flax [Cin, 3C]
            # slot-major -> torch conv1d [3C, Cin, 1] head-major
            oc = w.shape[1]
            hd = oc // (3 * H)
            t = w.T.reshape(3, H, hd, -1).transpose(1, 0, 2, 3).reshape(oc, -1)
            sd[tk] = t[:, :, None]
        elif callable(tr) and tk.endswith("qkv.bias"):
            sd[tk] = (w.reshape(3, H, -1).transpose(1, 0, 2).reshape(-1))
        elif callable(tr):      # dense_t: Linear [out,in] or conv1d [out,in,1]
            sd[tk] = w.T[:, :, None] if "proj_out" in tk else w.T
        elif w.ndim >= 3 and tk.endswith("weight"):
            sd[tk] = np.transpose(w, np.argsort(tuple(range(2, w.ndim)) + (1, 0)))
        elif w.ndim == 2 and tk.endswith("weight"):
            sd[tk] = w.T
        else:
            sd[tk] = w
    out = convert_state_dict(sd, target, name_map=nm)
    got = {k: np.asarray(v) for k, v in _flatten(out).items()}
    assert set(got) == set(flat)
    y = unet.apply(out, z, _jnp.ones((1,)))
    assert y.shape == (1, 16, 8, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_dfn2_checkpoint_layout_loads():
    """DFN2-style torch names (enc.erb_convN / emb_gru.gru_i / df_dec)
    load into the DFN param tree through DF_NAME_MAP."""
    from egregora_tpu.models.deepfilternet.model import (DF_NAME_MAP, DFNConfig,
                                                         grouped_gru_name_map,
                                                         init_params)
    from egregora_tpu.utils.weights import _flatten

    cfg = DFNConfig()
    target = init_params(0, cfg)
    flat = _flatten(target)
    raw = dict(DF_NAME_MAP)
    raw.update(grouped_gru_name_map(cfg.gru_groups))
    paths = set(p[0] if isinstance(p, tuple) else p for p in raw.values())
    assert paths == set(flat), (sorted(set(flat) - paths)[:5],
                                sorted(paths - set(flat))[:5])
    rng = np.random.default_rng(9)
    sd = _synthetic_torch_sd(raw, flat, rng)
    out = convert_state_dict(sd, target, name_map=raw.get)
    got = {k: np.asarray(v) for k, v in _flatten(out).items()}
    assert set(got) == set(flat)


def test_dac_checkpoint_layout_loads():
    """descript-audio-codec naming (encoder.block.* Sequential indices,
    decoder.model.*, quantizer.quantizers.{q}) loads through
    dac_name_map, incl. [1,C,1] Snake alphas and 1x1-conv projections."""
    from egregora_tpu.models.dac.model import DACConfig, DACModel, dac_name_map
    from egregora_tpu.utils.weights import _flatten

    cfg = DACConfig(encoder_dim=8, strides=(2, 4), decoder_dim=64, n_codebooks=2)
    target = DACModel(cfg).init_params(0)
    flat = _flatten(target)
    nm = dac_name_map(cfg)
    raw = nm.__self__
    assert set(p[0] if isinstance(p, tuple) else p for p in raw.values()) == set(flat), (
        sorted(set(flat) - set(p[0] if isinstance(p, tuple) else p for p in raw.values()))[:5])

    rng = np.random.default_rng(11)
    sd = {}
    for tk, fk in raw.items():
        tr = None
        if isinstance(fk, tuple):
            fk, tr = fk
        w = rng.standard_normal(flat[fk].shape).astype(np.float32)
        if callable(tr):
            if tk.endswith("alpha"):
                sd[tk] = w.reshape(1, -1, 1)         # Snake1d layout
            else:
                sd[tk] = w.T[:, :, None]             # 1x1 WNConv1d layout
        elif tr is not None:
            sd[tk] = np.transpose(w, np.argsort(tr))
        elif tk.endswith("codebook.weight"):
            sd[tk] = w                               # Embedding: [K, d] direct
        elif w.ndim == 2 and tk.endswith("weight"):
            sd[tk] = w.T
        elif w.ndim >= 3 and tk.endswith("weight"):
            sd[tk] = np.transpose(w, np.argsort(tuple(range(2, w.ndim)) + (1, 0)))
        else:
            sd[tk] = w

    out = convert_state_dict(sd, target, name_map=nm)
    got = {k: np.asarray(v) for k, v in _flatten(out).items()}
    assert set(got) == set(flat)
    np.testing.assert_array_equal(
        got["rvq/params/codebook_0"], sd["quantizer.quantizers.0.codebook.weight"])
    np.testing.assert_array_equal(
        got["encoder/params/EncoderBlock_0/Snake_0/alpha"],
        sd["encoder.block.1.block.3.alpha"].reshape(-1))


def test_ldm_attention_legacy_qkv_order():
    """Converted AttentionBlock params reproduce the UPSTREAM forward —
    an independent numpy implementation of CompVis AttentionBlock with
    QKVAttentionLegacy's HEAD-MAJOR fused-qkv channel order (head0:
    q,k,v | head1: q,k,v | ...), the layout real student_ldm.pth
    checkpoints use (use_new_attention_order=False default)."""
    from egregora_tpu.models.flashsr.ldm_unet import (LDMAttentionBlock,
                                                      attn_qkv_transforms)

    B, F, M, C, H, G = 1, 4, 3, 8, 2, 4
    N, hd = F * M, C // H
    rng = np.random.default_rng(3)
    gn_w = rng.standard_normal(C).astype(np.float32)
    gn_b = rng.standard_normal(C).astype(np.float32)
    qkv_w = rng.standard_normal((3 * C, C, 1)).astype(np.float32)
    qkv_b = rng.standard_normal(3 * C).astype(np.float32)
    pr_w = rng.standard_normal((C, C, 1)).astype(np.float32)
    pr_b = rng.standard_normal(C).astype(np.float32)
    x = rng.standard_normal((B, C, N)).astype(np.float32)  # torch [B,C,N]

    # --- upstream forward in numpy ---
    xg = x.reshape(B, G, C // G, N)
    mu = xg.mean(axis=(2, 3), keepdims=True)
    var = xg.var(axis=(2, 3), keepdims=True)
    h = ((xg - mu) / np.sqrt(var + 1e-6)).reshape(B, C, N)
    h = h * gn_w[None, :, None] + gn_b[None, :, None]
    qkv = np.einsum("oc,bcn->bon", qkv_w[:, :, 0], h) + qkv_b[None, :, None]
    # QKVAttentionLegacy: reshape [B*H, 3*hd, N], split into q/k/v
    qkv = qkv.reshape(B * H, 3 * hd, N)
    q, k, v = qkv[:, :hd], qkv[:, hd:2 * hd], qkv[:, 2 * hd:]
    scale = 1.0 / np.sqrt(np.sqrt(hd))
    w = np.einsum("bct,bcs->bts", q * scale, k * scale)
    w = np.exp(w - w.max(axis=-1, keepdims=True))
    w = w / w.sum(axis=-1, keepdims=True)
    a = np.einsum("bts,bcs->bct", w, v).reshape(B, C, N)
    proj = np.einsum("oc,bcn->bon", pr_w[:, :, 0], a) + pr_b[None, :, None]
    ref = x + proj

    # --- ours, through the converter transforms ---
    blk = LDMAttentionBlock(num_heads=H, groups=G, dtype=jnp.float32)
    x_nhwc = jnp.asarray(x.reshape(B, C, F, M).transpose(0, 2, 3, 1))
    target = blk.init(jax.random.PRNGKey(0), x_nhwc)
    kt, bt = attn_qkv_transforms(H)
    sd = {"norm.weight": gn_w, "norm.bias": gn_b,
          "qkv.weight": qkv_w, "qkv.bias": qkv_b,
          "proj_out.weight": pr_w, "proj_out.bias": pr_b}
    nm = {"norm.weight": "params/norm/scale", "norm.bias": "params/norm/bias",
          "qkv.weight": ("params/qkv/kernel", kt),
          "qkv.bias": ("params/qkv/bias", bt),
          "proj_out.weight": ("params/proj_out/kernel",
                              lambda v: v[:, :, 0].T),
          "proj_out.bias": "params/proj_out/bias"}
    params = convert_state_dict(sd, target, name_map=nm.get)
    y = np.asarray(blk.apply(params, x_nhwc))
    y_bcn = y.transpose(0, 3, 1, 2).reshape(B, C, N)
    np.testing.assert_allclose(y_bcn, ref, atol=2e-4)


def test_torch_gru_gate_order_parity():
    """Converted GRU weights reproduce the UPSTREAM torch GRU step —
    torch lays gates out (r, z, n); ours is (z, r, n).  Independent
    numpy implementation of torch's GRUCell (bias_hh = 0, which the
    name maps drop)."""
    from egregora_tpu.models.deepfilternet.model import (_gru_step,
                                                         _torch_gru_bias,
                                                         _torch_gru_kernel)

    d, hdim = 6, 4
    rng = np.random.default_rng(5)
    w_ih = rng.standard_normal((3 * hdim, d)).astype(np.float32)   # [r|z|n]
    w_hh = rng.standard_normal((3 * hdim, hdim)).astype(np.float32)
    b_ih = rng.standard_normal(3 * hdim).astype(np.float32)
    x = rng.standard_normal(d).astype(np.float32)
    h = rng.standard_normal(hdim).astype(np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    gi = w_ih @ x + b_ih
    gh = w_hh @ h
    r = sig(gi[:hdim] + gh[:hdim])
    z = sig(gi[hdim:2 * hdim] + gh[hdim:2 * hdim])
    n = np.tanh(gi[2 * hdim:] + r * gh[2 * hdim:])
    ref = (1 - z) * n + z * h

    p = {"kernel": jnp.asarray(_torch_gru_kernel(w_ih)),
         "recurrent": jnp.asarray(_torch_gru_kernel(w_hh)),
         "bias": jnp.asarray(_torch_gru_bias(b_ih))}
    ours = np.asarray(_gru_step(p, jnp.asarray(h), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_dfn3_checkpoint_layout_loads():
    """DFN3 squeezed-GRU naming (emb_gru.linear_in/gru/linear_out) loads
    into the DFN3 param tree through dfn3_name_map; the converted params
    run and the variant is topologically distinct from DFN2."""
    from egregora_tpu.models.deepfilternet.model import (DFNConfig,
                                                         dfn3_name_map,
                                                         enhance_mono,
                                                         init_params)
    from egregora_tpu.utils.weights import _flatten

    cfg3 = DFNConfig.for_variant("DeepFilterNet3")
    assert cfg3.squeezed and cfg3.variant == "DeepFilterNet3"
    target = init_params(0, cfg3)
    flat = _flatten(target)
    assert any(k.startswith("gru_squeezed/") for k in flat)
    cfg2 = DFNConfig.for_variant("DeepFilterNet2")
    flat2 = _flatten(init_params(0, cfg2))
    assert set(flat) != set(flat2)   # genuinely different models

    raw = dfn3_name_map()
    paths = set(p[0] if isinstance(p, tuple) else p for p in raw.values())
    assert paths == set(flat), (sorted(set(flat) - paths)[:5],
                                sorted(paths - set(flat))[:5])
    rng = np.random.default_rng(13)
    sd = _synthetic_torch_sd(raw, flat, rng)
    # grouped-linear weights are [G, in/G, out/G] on BOTH sides (no
    # transpose) — override the helper's generic ndim>=3 conv inversion
    for tk in ("emb_gru.linear_in.weight", "emb_gru.linear_out.weight"):
        fk = raw[tk] if not isinstance(raw[tk], tuple) else raw[tk][0]
        sd[tk] = rng.standard_normal(flat[fk].shape).astype(np.float32)
    out = convert_state_dict(sd, target, name_map=raw.get)
    got = {k: np.asarray(v) for k, v in _flatten(out).items()}
    assert set(got) == set(flat)
    # grouped linear weights load unchanged
    np.testing.assert_array_equal(got["gru_squeezed/lin_in/weight"],
                                  sd["emb_gru.linear_in.weight"])
    y = enhance_mono(out, jnp.asarray(
        rng.standard_normal(4800).astype(np.float32) * 0.1))
    assert y.shape == (4800,)
    assert np.isfinite(np.asarray(y)).all()
