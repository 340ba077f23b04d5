"""Portable npz weight snapshots (utils/weights.py): roundtrip fidelity,
bf16 handling, and mismatch detection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.utils.weights import load_npz_into, save_npz


def _tree(seed=0, dtype=jnp.float32):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 3)
    return {
        "params": {
            "conv": {"kernel": jax.random.normal(ks[0], (3, 3, 4, 8), dtype),
                     "bias": jnp.zeros((8,), dtype)},
            "dense": {"kernel": jax.random.normal(ks[1], (8, 16), dtype)},
        },
        "batch_stats": {"bn": {"mean": jax.random.normal(ks[2], (8,))}},
    }


def test_roundtrip_exact(tmp_path):
    tree = _tree()
    path = str(tmp_path / "w.npz")
    save_npz(path, tree)
    template = jax.tree.map(jnp.zeros_like, tree)
    loaded = load_npz_into(template, path)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_cast(tmp_path):
    tree = _tree(dtype=jnp.bfloat16)
    path = str(tmp_path / "w.npz")
    save_npz(path, tree)
    loaded = load_npz_into(jax.tree.map(jnp.zeros_like, tree), path)
    assert loaded["params"]["conv"]["kernel"].dtype == jnp.bfloat16
    # bf16 -> f32 -> bf16 is lossless
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["conv"]["kernel"], np.float32),
        np.asarray(loaded["params"]["conv"]["kernel"], np.float32),
    )


def test_mismatch_rejected(tmp_path):
    tree = _tree()
    path = str(tmp_path / "w.npz")
    save_npz(path, tree)
    bad = dict(tree)
    bad["params"] = dict(tree["params"])
    bad["params"]["extra_layer"] = {"kernel": jnp.zeros((2, 2))}
    with pytest.raises(KeyError):
        load_npz_into(bad, path)
    wrong_shape = jax.tree.map(jnp.zeros_like, tree)
    wrong_shape["params"]["dense"]["kernel"] = jnp.zeros((8, 17))
    with pytest.raises(ValueError):
        load_npz_into(wrong_shape, path)


def test_none_subtree_ok(tmp_path):
    tree = {"params": {"w": jnp.ones((2,))}, "batch_stats": None}
    path = str(tmp_path / "w.npz")
    save_npz(path, tree)
    out = load_npz_into({"params": {"w": jnp.zeros((2,))},
                         "batch_stats": None}, path)
    assert out["batch_stats"] is None
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), [1, 1])
