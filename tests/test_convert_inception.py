"""Inception converter round-trip against a synthetic torchvision-layout
state dict.

Real torchvision ``inception_v3`` weights cannot be downloaded in this
environment, so (as with the LPIPS converter,
``tests/test_lpips.py::test_convert_lpips_state_dict_roundtrip``) the
converter is validated structurally: a state dict with torchvision's exact
key layout (``Mixed_5b.branch1x1.conv.weight`` OIHW, ``.bn.{weight,bias,
running_mean,running_var}``, plus ``fc.*``/``AuxLogits.*`` entries that
must be skipped) is fabricated from a randomized Flax tree; converting it
must reproduce the tree bit-for-bit and the model's pool_3 output must be
unchanged. Standard-FID parity vs ``z_fid.py`` therefore holds conditional
on user-supplied torchvision weights (documented in docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ganleaks_tpu.ops.inception import InceptionV3Pool3
from ganleaks_tpu.tools.convert_inception import convert_state_dict
from ganleaks_tpu.utils.checkpoint import load_params_npz, save_params_npz


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _randomized_variables(rng):
    model = InceptionV3Pool3()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    return jax.tree_util.tree_map(
        lambda x: np.asarray(
            rng.standard_normal(x.shape) * 0.05, np.float32), variables)


def _to_torchvision_sd(variables) -> dict:
    """Emit the torchvision checkpoint layout from the Flax tree."""
    sd = {}
    for path, leaf in _flatten(variables["params"]).items():
        assert path[-1] == "conv" or path[-2] == "bn", path
        if path[-1] == "conv":
            sd[".".join(path) + ".weight"] = leaf.transpose(3, 2, 0, 1)
        elif path[-1] == "scale":
            sd[".".join(path[:-1]) + ".weight"] = leaf
        else:
            sd[".".join(path[:-1]) + ".bias"] = leaf
    for path, leaf in _flatten(variables["batch_stats"]).items():
        name = {"mean": "running_mean", "var": "running_var"}[path[-1]]
        sd[".".join(path[:-1]) + "." + name] = leaf
    return sd


def test_convert_inception_roundtrip(rng, tmp_path):
    variables = _randomized_variables(rng)
    sd = _to_torchvision_sd(variables)
    # entries the pool_3 converter must skip (present in the real file)
    sd["fc.weight"] = rng.standard_normal((1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.standard_normal((1000,)).astype(np.float32)
    sd["AuxLogits.conv0.conv.weight"] = rng.standard_normal(
        (128, 768, 1, 1)).astype(np.float32)
    sd["AuxLogits.conv0.bn.weight"] = rng.standard_normal(
        (128,)).astype(np.float32)

    converted = convert_state_dict(sd)

    want = _flatten(variables)
    got = _flatten(converted)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_array_equal(got[key], want[key], err_msg=str(key))


def test_convert_inception_npz_and_forward(rng, tmp_path):
    """Through the CLI's npz save/load path, the converted weights must
    drive the pool_3 tower to the same activations as the source tree."""
    variables = _randomized_variables(rng)
    converted = convert_state_dict(_to_torchvision_sd(variables))

    path = str(tmp_path / "inception_pool3.npz")
    save_params_npz(path, converted)
    loaded = load_params_npz(path)

    model = InceptionV3Pool3()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 75, 75, 3)), jnp.float32)
    out_src = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), x)
    out_cvt = model.apply(
        jax.tree_util.tree_map(jnp.asarray, loaded), x)
    np.testing.assert_array_equal(np.asarray(out_src), np.asarray(out_cvt))
    assert out_src.shape == (2, 2048)
