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
