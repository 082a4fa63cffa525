"""Numerical parity of ops/nn primitives against the torch oracle.

torch (CPU) is available in the image purely as a *test oracle* — the
framework itself never imports it. These tests pin the layout conventions the
checkpoint converter relies on (OIHW/IOHW -> HWIO etc.).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ganleaks_tpu.ops import nn as gnn

TOL = dict(rtol=1e-5, atol=1e-5)


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(a: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())


@pytest.mark.parametrize("stride,padding", [(1, 0), (2, 1), (1, 1)])
def test_conv2d_matches_torch(rng, stride, padding):
    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    w = rng.standard_normal((5, 3, 4, 4), dtype=np.float32)  # OIHW
    b = rng.standard_normal(5, dtype=np.float32)

    ref = F.conv2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=padding)

    mod = gnn.Conv2dTorch(5, 4, stride, padding)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)


@pytest.mark.parametrize("stride,padding,k", [(1, 0, 4), (2, 1, 4), (2, 1, 3)])
def test_conv_transpose2d_matches_torch(rng, stride, padding, k):
    x = rng.standard_normal((2, 4, 4, 6), dtype=np.float32)
    w = rng.standard_normal((6, 5, k, k), dtype=np.float32)  # IOHW
    b = rng.standard_normal(5, dtype=np.float32)

    ref = F.conv_transpose2d(_nchw(x), torch.from_numpy(w),
                             torch.from_numpy(b), stride=stride,
                             padding=padding)

    mod = gnn.ConvTranspose2dTorch(5, k, stride, padding)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),
                         "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)


def test_batchnorm_eval_matches_torch(rng):
    x = rng.standard_normal((4, 6, 6, 3), dtype=np.float32)
    bn = torch.nn.BatchNorm2d(3)
    bn.weight.data = torch.from_numpy(
        rng.standard_normal(3, dtype=np.float32))
    bn.bias.data = torch.from_numpy(rng.standard_normal(3, dtype=np.float32))
    bn.running_mean = torch.from_numpy(
        rng.standard_normal(3, dtype=np.float32))
    bn.running_var = torch.from_numpy(
        rng.random(3, dtype=np.float32) + 0.5)
    bn.eval()
    ref = bn(_nchw(x))

    mod = gnn.BatchNormTorch(use_running_average=True)
    variables = {
        "params": {"bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                          "bias": jnp.asarray(bn.bias.detach().numpy())}},
        "batch_stats": {"bn": {"mean": jnp.asarray(bn.running_mean.numpy()),
                               "var": jnp.asarray(bn.running_var.numpy())}},
    }
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)


def test_instancenorm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 5, 4), dtype=np.float32)
    inorm = torch.nn.InstanceNorm2d(4, affine=True)
    inorm.weight.data = torch.from_numpy(
        rng.standard_normal(4, dtype=np.float32))
    inorm.bias.data = torch.from_numpy(
        rng.standard_normal(4, dtype=np.float32))
    ref = inorm(_nchw(x))

    mod = gnn.InstanceNorm2d()
    params = {"params": {"scale": jnp.asarray(inorm.weight.detach().numpy()),
                         "bias": jnp.asarray(inorm.bias.detach().numpy())}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)


def test_pixel_norm_matches_torch(rng):
    x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
    xt = _nchw(x)
    ref = xt / torch.sqrt(torch.mean(xt ** 2, dim=1, keepdim=True) + 1e-8)
    out = gnn.pixel_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)


def test_minibatch_std_matches_torch(rng):
    x = rng.standard_normal((4, 4, 4, 8), dtype=np.float32)
    xt = _nchw(x)
    stats = torch.std(xt, dim=0).mean().expand(4, 1, 4, 4)
    ref = torch.cat([xt, stats], dim=1)
    out = gnn.minibatch_std(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)


def test_upsample_and_avgpool_match_torch(rng):
    x = rng.standard_normal((2, 4, 4, 3), dtype=np.float32)
    up_ref = F.interpolate(_nchw(x), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(
        np.asarray(gnn.upsample_nearest_2x(jnp.asarray(x))),
        _nhwc(up_ref), **TOL)
    pool_ref = F.avg_pool2d(_nchw(x), 2, 2)
    np.testing.assert_allclose(
        np.asarray(gnn.avg_pool_2x(jnp.asarray(x))), _nhwc(pool_ref), **TOL)


def test_wsconv_matches_reference_formula(rng):
    """WSConv2d: conv(x * scale) + bias (``pggan/model_torch.py:8-22``)."""
    x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    w = rng.standard_normal((6, 4, 3, 3), dtype=np.float32)
    scale = (2.0 / (4 * 9)) ** 0.5
    ref = F.conv2d(_nchw(x) * scale, torch.from_numpy(w), None,
                   stride=1, padding=1)

    mod = gnn.WSConv2d(6, 3, 1, 1)
    params = {"params": {
        "conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
        "bias": jnp.zeros(6)}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)


def test_self_attention_matches_torch(rng):
    """SelfAttention forward (``vaegan/ops.py:86-120``)."""
    c = 16
    x = rng.standard_normal((2, 4, 4, c), dtype=np.float32)
    wq = rng.standard_normal((c // 8, c, 1, 1), dtype=np.float32)
    wk = rng.standard_normal((c // 8, c, 1, 1), dtype=np.float32)
    wv = rng.standard_normal((c, c, 1, 1), dtype=np.float32)
    bq = rng.standard_normal(c // 8, dtype=np.float32)
    bk = rng.standard_normal(c // 8, dtype=np.float32)
    bv = rng.standard_normal(c, dtype=np.float32)
    gamma = 0.7

    xt = _nchw(x)
    n, C, h, w = xt.shape
    q = F.conv2d(xt, torch.from_numpy(wq), torch.from_numpy(bq)) \
        .view(n, -1, h * w).permute(0, 2, 1)
    k = F.conv2d(xt, torch.from_numpy(wk), torch.from_numpy(bk)) \
        .view(n, -1, h * w)
    attn = torch.softmax(torch.bmm(q, k), dim=-1)
    v = F.conv2d(xt, torch.from_numpy(wv), torch.from_numpy(bv)) \
        .view(n, -1, h * w)
    out_t = torch.bmm(v, attn.permute(0, 2, 1)).view(n, C, h, w)
    ref = gamma * out_t + xt

    mod = gnn.SelfAttention()
    params = {"params": {
        "query_conv": {"kernel": jnp.asarray(wq.transpose(2, 3, 1, 0)),
                       "bias": jnp.asarray(bq)},
        "key_conv": {"kernel": jnp.asarray(wk.transpose(2, 3, 1, 0)),
                     "bias": jnp.asarray(bk)},
        "value_conv": {"kernel": jnp.asarray(wv.transpose(2, 3, 1, 0)),
                       "bias": jnp.asarray(bv)},
        "gamma": jnp.asarray([gamma])}}
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref),
                               rtol=1e-4, atol=1e-4)


def test_spectral_norm_conv_matches_torch_formula(rng):
    """One power iteration from fixed u,v must divide by the same sigma as
    the reference's ``_update_u_v`` (``vaegan/ops.py:32-44``)."""
    cin, cout, k = 4, 6, 3
    x = rng.standard_normal((2, 8, 8, cin), dtype=np.float32)
    w = rng.standard_normal((cout, cin, k, k), dtype=np.float32)  # OIHW
    b = rng.standard_normal(cout, dtype=np.float32)
    u0 = rng.standard_normal(cout, dtype=np.float32)
    v0 = rng.standard_normal(cin * k * k, dtype=np.float32)
    u0 /= np.linalg.norm(u0)
    v0 /= np.linalg.norm(v0)

    wt = torch.from_numpy(w)
    wm = wt.view(cout, -1)
    v1 = torch.mv(wm.t(), torch.from_numpy(u0))
    v1 = v1 / (v1.norm() + 1e-12)
    u1 = torch.mv(wm, v1)
    u1 = u1 / (u1.norm() + 1e-12)
    sigma = u1.dot(wm.mv(v1))
    ref = F.conv2d(_nchw(x), wt / sigma, torch.from_numpy(b), 1, 1)

    mod = gnn.SNConv2d(features=cout, kernel_size=k, stride=1, padding=1)
    variables = {
        "params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                   "bias": jnp.asarray(b)},
        "spectral": {"u": jnp.asarray(u0), "v": jnp.asarray(v0)},
    }
    out, mutated = mod.apply(variables, jnp.asarray(x),
                             mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), **TOL)
    # u/v advanced by the power iteration
    np.testing.assert_allclose(np.asarray(mutated["spectral"]["u"]),
                               u1.numpy(), **TOL)


def test_batchnorm_running_stats_match_torch_train_mode(rng):
    """Train-mode BN: normalization uses the BIASED batch variance, but
    the running stats accumulate the UNBIASED one (torch semantics).
    Regression: flax's nn.BatchNorm stores the biased variance, leaving
    running_var low by (n-1)/n per step — 3% at batch 32."""
    x = rng.standard_normal((8, 4, 4, 3)).astype(np.float32)
    tb = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tb.train()
    with torch.no_grad():
        t_out = tb(torch.from_numpy(x).permute(0, 3, 1, 2))

    bn = gnn.BatchNormTorch(use_running_average=False)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))
    out, mut = bn.apply(variables, jnp.asarray(x),
                        mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out), t_out.permute(0, 2, 3, 1).numpy(),
        rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["var"]),
        tb.running_var.numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["mean"]),
        tb.running_mean.numpy(), rtol=1e-5, atol=1e-7)
    # eval mode then normalizes with those stats, matching torch
    tb.eval()
    with torch.no_grad():
        t_eval = tb(torch.from_numpy(x).permute(0, 3, 1, 2))
    e_vars = {"params": variables["params"],
              "batch_stats": mut["batch_stats"]}
    ours = gnn.BatchNormTorch(use_running_average=True).apply(
        e_vars, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               t_eval.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-5, atol=2e-6)


def test_vaegan_bce_backward_matches_torch_at_saturation():
    """torch BCELoss clamps its backward DENOMINATOR at 1e-12
    (binary_cross_entropy_backward), so a fully saturated sigmoid
    (p == 0.0 in f32) yields a finite ~1e12/N gradient. The port's bce
    once lacked this and one saturated Dl output turned the whole
    VAE-GAN non-finite in 4 steps (round-5 A/B: the reference's own
    torch run trains through the identical saturation). Oracle values
    recorded from torch 2.13 BCELoss on this exact input."""
    import jax
    import jax.numpy as jnp

    from ganleaks_tpu.train.vaegan import bce

    p = jnp.asarray([0.0, 1e-30, 0.5], jnp.float32)
    val, grad = jax.value_and_grad(lambda x: bce(x, 1.0))(p)
    np.testing.assert_allclose(float(val), 56.59022903442383, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad),
        [-333333331968.0, -333333331968.0, -0.6666666865348816],
        rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(grad)))

    val0, grad0 = jax.value_and_grad(lambda x: bce(x, 0.0))(
        jnp.asarray([1.0, 0.5], jnp.float32))
    np.testing.assert_allclose(np.asarray(grad0), [5e11, 1.0], rtol=1e-6)
