"""Neural block tests: conv parity vs torch, spline invertibility, flow
invertibility, attention shape/mask behavior."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.nn import (
    WN,
    Conv1d,
    ConvTranspose1d,
    DDSConv,
    LayerNorm,
    MultiHeadAttention,
    ResBlock1,
    TransformerEncoder,
    flip_channels,
)
from mb_istft_vits_tpu.nn.flows import ConvFlow, ElementwiseAffine, ResidualCouplingLayer
from mb_istft_vits_tpu.nn.transforms import piecewise_rational_quadratic_transform


def test_conv1d_matches_torch(rng):
    """Conv1d with dilation/groups/padding == torch.nn.Conv1d."""
    x = rng.randn(2, 20, 8).astype(np.float32)
    for dilation, groups, k, pad in [(1, 1, 3, 1), (3, 1, 5, 6), (1, 4, 3, 1)]:
        m = Conv1d(features=8, kernel_size=k, dilation=dilation, groups=groups,
                   padding=pad)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(m.apply(params, jnp.asarray(x)))

        tc = torch.nn.Conv1d(8, 8, k, dilation=dilation, groups=groups,
                             padding=pad)
        w = np.asarray(params["params"]["kernel"])  # [k, in/g, out]
        tc.weight.data = torch.from_numpy(w.transpose(2, 1, 0))
        tc.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
        yt = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
        np.testing.assert_allclose(y, yt.transpose(0, 2, 1), atol=1e-5)


def test_conv_transpose1d_matches_torch(rng):
    """ConvTranspose1d == torch.nn.ConvTranspose1d (decoder upsamplers)."""
    x = rng.randn(2, 10, 6).astype(np.float32)
    for stride, k in [(4, 16), (2, 4)]:
        pad = (k - stride) // 2
        m = ConvTranspose1d(features=4, kernel_size=k, stride=stride,
                            padding=pad)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(m.apply(params, jnp.asarray(x)))
        assert y.shape == (2, 10 * stride, 4)

        tc = torch.nn.ConvTranspose1d(6, 4, k, stride=stride, padding=pad)
        w = np.asarray(params["params"]["kernel"])  # [k, in, out]
        tc.weight.data = torch.from_numpy(w.transpose(1, 2, 0))  # [in, out, k]
        tc.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
        yt = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
        np.testing.assert_allclose(y, yt.transpose(0, 2, 1), atol=1e-5)


def test_weight_norm_conv_equivalence(rng):
    """Weight-normed conv == plain conv at init (g = ||v||)."""
    x = jnp.asarray(rng.randn(2, 20, 8).astype(np.float32))
    m = Conv1d(features=16, kernel_size=3, padding=1, weight_norm=True)
    params = m.init(jax.random.PRNGKey(3), x)
    v = params["params"]["v"]
    g = params["params"]["g"]
    np.testing.assert_allclose(
        np.asarray(g), np.sqrt(np.sum(np.asarray(v) ** 2, axis=(0, 1))),
        rtol=1e-6,
    )
    y = m.apply(params, x)
    m2 = Conv1d(features=16, kernel_size=3, padding=1)
    p2 = {"params": {"kernel": v, "bias": params["params"]["bias"]}}
    y2 = m2.apply(p2, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_layernorm_matches_torch(rng):
    x = rng.randn(2, 7, 16).astype(np.float32)
    m = LayerNorm()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))
    yt = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.ones(16), torch.zeros(16), 1e-5
    ).numpy()
    np.testing.assert_allclose(y, yt, atol=1e-5)


def test_spline_invertibility(rng):
    """fwd∘inv == id inside and outside tails (transforms.py contract)."""
    shape = (2, 11, 1)
    x = rng.uniform(-8, 8, size=shape).astype(np.float32)
    uw = rng.randn(*shape, 10).astype(np.float32) * 0.3
    uh = rng.randn(*shape, 10).astype(np.float32) * 0.3
    ud = rng.randn(*shape, 9).astype(np.float32) * 0.3

    y, ld = piecewise_rational_quadratic_transform(
        jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud),
        inverse=False, tails="linear", tail_bound=5.0,
    )
    x2, ld_inv = piecewise_rational_quadratic_transform(
        y, jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud),
        inverse=True, tails="linear", tail_bound=5.0,
    )
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-4)


def test_spline_matches_torch_reference(rng):
    """Numerical parity with the reference transforms.py run in torch."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import transforms as ref_transforms
    finally:
        sys.path.pop(0)

    shape = (3, 9)
    x = rng.uniform(-6, 6, size=shape).astype(np.float32)
    uw = (rng.randn(*shape, 10) * 0.5).astype(np.float32)
    uh = (rng.randn(*shape, 10) * 0.5).astype(np.float32)
    ud = (rng.randn(*shape, 9) * 0.5).astype(np.float32)

    for inverse in (False, True):
        y_ref, ld_ref = ref_transforms.piecewise_rational_quadratic_transform(
            torch.from_numpy(x.copy()), torch.from_numpy(uw.copy()),
            torch.from_numpy(uh.copy()), torch.from_numpy(ud.copy()),
            inverse=inverse, tails="linear", tail_bound=5.0,
        )
        y, ld = piecewise_rational_quadratic_transform(
            jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud),
            inverse=inverse, tails="linear", tail_bound=5.0,
        )
        np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), atol=1e-4)


def test_residual_coupling_invertible(rng):
    x = jnp.asarray(rng.randn(2, 14, 8).astype(np.float32))
    mask = jnp.ones((2, 14, 1), jnp.float32)
    m = ResidualCouplingLayer(channels=8, hidden_channels=16, kernel_size=5,
                              dilation_rate=1, n_layers=2, mean_only=True)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    y, logdet = m.apply(params, x, mask)
    assert logdet.shape == (2,)
    x2 = m.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    # mean-only coupling: logdet must be 0
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-6)


def test_conv_flow_invertible(rng):
    x = jnp.asarray(rng.randn(2, 9, 2).astype(np.float32))
    mask = jnp.ones((2, 9, 1), jnp.float32)
    m = ConvFlow(in_channels=2, filter_channels=16, kernel_size=3, n_layers=3)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    y, _ = m.apply(params, x, mask)
    x2 = m.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_elementwise_affine_invertible(rng):
    x = jnp.asarray(rng.randn(2, 9, 2).astype(np.float32))
    mask = jnp.ones((2, 9, 1), jnp.float32)
    m = ElementwiseAffine(channels=2)
    params = {"params": {"m": jnp.asarray([0.5, -0.2]),
                         "logs": jnp.asarray([0.3, -0.1])}}
    y, _ = m.apply(params, x, mask)
    x2 = m.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_flip():
    x = jnp.asarray(np.arange(12).reshape(1, 2, 6).astype(np.float32))
    y = flip_channels(x)
    np.testing.assert_array_equal(np.asarray(y[0, 0]), [5, 4, 3, 2, 1, 0])


def test_wn_masked(rng):
    x = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(12)[None, :, None] < np.array([12, 7])[:, None, None])
    ).astype(jnp.float32)
    m = WN(hidden_channels=8, kernel_size=5, dilation_rate=1, n_layers=3)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    y = np.asarray(m.apply(params, x, mask))
    assert y.shape == (2, 12, 8)
    assert np.all(y[1, 7:] == 0)


def test_wn_conditioning(rng):
    x = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    mask = jnp.ones((2, 12, 1), jnp.float32)
    g = jnp.asarray(rng.randn(2, 1, 4).astype(np.float32))
    m = WN(hidden_channels=8, kernel_size=5, dilation_rate=2, n_layers=3,
           gin_channels=4)
    params = m.init(jax.random.PRNGKey(0), x, mask, g=g)
    y = m.apply(params, x, mask, g=g)
    y2 = m.apply(params, x, mask, g=g * 2)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_transformer_encoder_mask_invariance(rng):
    """Padding must not influence valid positions."""
    x = rng.randn(2, 16, 32).astype(np.float32)
    lengths = np.array([16, 10])
    mask = (np.arange(16)[None, :, None] < lengths[:, None, None]).astype(
        np.float32
    )
    m = TransformerEncoder(hidden_channels=32, filter_channels=64, n_heads=2,
                           n_layers=2, kernel_size=3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    y1 = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    x_perturbed = x.copy()
    x_perturbed[1, 10:] += 100.0  # garbage in the padded region
    y2 = np.asarray(
        m.apply(params, jnp.asarray(x_perturbed), jnp.asarray(mask))
    )
    np.testing.assert_allclose(y1[1, :10], y2[1, :10], atol=1e-4)
    assert np.all(y1[1, 10:] == 0)


def test_resblock_shapes(rng):
    x = jnp.asarray(rng.randn(2, 32, 16).astype(np.float32))
    m = ResBlock1(channels=16, kernel_size=3, dilation=(1, 3, 5))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_dds_conv(rng):
    x = jnp.asarray(rng.randn(2, 10, 8).astype(np.float32))
    mask = jnp.ones((2, 10, 1), jnp.float32)
    m = DDSConv(channels=8, kernel_size=3, n_layers=3)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    y = m.apply(params, x, mask)
    assert y.shape == x.shape
