"""Training step, checkpoint/resume, and multihost helper tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egregora_tpu.models.flashsr.pipeline import FlashSRConfig, FlashSRModules
from egregora_tpu.models.flashsr.train import (load_checkpoint, make_optimizer,
                                               make_train_step, save_checkpoint)
from egregora_tpu.models.flashsr.unet import UNetConfig
from egregora_tpu.models.flashsr.vae import VAEConfig
from egregora_tpu.models.flashsr.vocoder import VocoderConfig
from egregora_tpu.parallel.mesh import make_chunk_mesh


@pytest.fixture(scope="module")
def tiny_setup():
    hop, n_mels = 64, 32
    cfg = FlashSRConfig(
        vae=VAEConfig(base_channels=8, channel_mults=(1, 2, 2), latent_channels=4,
                      num_res_blocks=1, groups=4, mid_attn=False,
                      use_quant_conv=False),
        unet=UNetConfig(in_channels=8, out_channels=4, base_channels=8,
                        channel_mults=(1, 2), num_res_blocks=1, attn_levels=(1,),
                        num_heads=2, time_dim=16, groups=4),
        vocoder=VocoderConfig(n_mels=n_mels, upsample_initial=16,
                              upsample_factors=(4, 4, 4), upsample_kernels=(8, 8, 8),
                              channel_floor=8),
    )
    modules = FlashSRModules(cfg)
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "vae": modules.vae.init(k[0], jnp.zeros((1, 16, n_mels, 1))),
        "student_ldm": modules.unet.init(k[1], jnp.zeros((1, 4, n_mels // 4, 8)),
                                         jnp.zeros((1,))),
        "sr_vocoder": modules.vocoder.init(k[2], jnp.zeros((1, 16, n_mels))),
    }
    return modules, params, hop, n_mels


def test_train_step_decreases_loss(tiny_setup):
    modules, params, hop, n_mels = tiny_setup
    mesh = make_chunk_mesh()
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(modules, tx, mesh, hop=hop, n_mels=n_mels)
    rng = np.random.default_rng(0)
    batch = mesh.size
    lr_w = jnp.asarray(rng.standard_normal((batch, hop * 16)), jnp.float32) * 0.1
    hr_w = jnp.asarray(rng.standard_normal((batch, hop * 16)), jnp.float32) * 0.1
    losses = []
    for i in range(4):
        params, opt_state, loss = step(params, opt_state, lr_w, hr_w,
                                       jax.random.PRNGKey(5))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizing the same batch must descend


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    modules, params, hop, n_mels = tiny_setup
    tx = make_optimizer()
    opt_state = tx.init(params)
    save_checkpoint(tmp_path / "ck", params, opt_state, step=7)
    p2, o2, step = load_checkpoint(tmp_path / "ck", opt_state)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (jax.tree_util.tree_structure(o2)
            == jax.tree_util.tree_structure(opt_state))


def test_multihost_helpers_single_process():
    from egregora_tpu.parallel.multihost import (local_batch_slice,
                                                 make_global_chunk_mesh)
    mesh = make_global_chunk_mesh()
    assert mesh.axis_names == ("chunk",)
    assert mesh.size == len(jax.devices())
    sl = local_batch_slice(10)
    assert sl == slice(0, 10)  # single process owns everything
