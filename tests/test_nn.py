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


def test_conv_relu_norm_identity_at_init(rng):
    """Zero-initialized proj makes the block the identity at init
    (reference modules.py:54-56)."""
    from mb_istft_vits_tpu.nn import ConvReluNorm

    x = rng.randn(2, 12, 16).astype(np.float32)
    mask = np.ones((2, 12, 1), np.float32)
    mask[1, 8:] = 0.0
    m = ConvReluNorm(hidden_channels=16, out_channels=16, kernel_size=5,
                     n_layers=3, p_dropout=0.1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    y = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(y, x * mask, atol=1e-6)


def test_mha_proximal_init_copies_qk(rng):
    """proximal_init starts conv_k as a copy of conv_q
    (reference attentions.py:141-144)."""
    x = jnp.asarray(rng.randn(1, 8, 16).astype(np.float32))
    m = MultiHeadAttention(16, 16, 2, window_size=None, proximal_init=True)
    params = m.init(jax.random.PRNGKey(3), x)["params"]
    np.testing.assert_array_equal(
        np.asarray(params["conv_q"]["kernel"]),
        np.asarray(params["conv_k"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(params["conv_q"]["bias"]),
        np.asarray(params["conv_k"]["bias"]),
    )
    # and still distinct leaves: perturbing k must not change q
    assert params["conv_q"]["kernel"] is not params["conv_k"]["kernel"]


def test_mha_proximal_bias_matches_oracle(rng):
    """Full numpy oracle of plain attention + the -log1p(|i-j|) proximal
    bias (reference attentions.py:151-153,245-254)."""
    b, t, c, h = 1, 6, 8, 2
    x = rng.randn(b, t, c).astype(np.float32)
    m = MultiHeadAttention(c, c, h, window_size=None, proximal_bias=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    p = params["params"]

    def conv1x1(z, name):
        w = np.asarray(p[name]["kernel"])[0]  # [in, out]
        return z @ w + np.asarray(p[name]["bias"])

    d_k = c // h
    q = conv1x1(x, "conv_q").reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
    k = conv1x1(x, "conv_k").reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
    v = conv1x1(x, "conv_v").reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d_k)
    r = np.arange(t, dtype=np.float32)
    scores = scores - np.log1p(np.abs(r[None, :] - r[:, None]))[None, None]
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, c)
    np.testing.assert_allclose(y, conv1x1(out, "conv_o"), atol=1e-4)


def test_mha_block_length_limits_attention(rng):
    """block_length band-limits self-attention (reference attentions.py:156-159):
    tokens farther than the block cannot influence the output."""
    b, t, c = 1, 12, 16
    x = rng.randn(b, t, c).astype(np.float32)
    mask = jnp.ones((b, 1, t, t), jnp.float32)
    m = MultiHeadAttention(c, c, 2, window_size=None, block_length=2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)
    y1 = np.asarray(m.apply(params, jnp.asarray(x), mask))
    x2 = x.copy()
    x2[0, 11] += 50.0  # far from position 0 (distance 11 > block 2)
    y2 = np.asarray(m.apply(params, jnp.asarray(x2), mask))
    np.testing.assert_allclose(y1[0, :3], y2[0, :3], atol=1e-4)
    assert not np.allclose(y1[0, 10:], y2[0, 10:])


def test_mha_cross_attention(rng):
    """context= routes K/V from the encoder side (reference Decoder encdec
    path, attentions.py:161-169)."""
    b, tq, ts, c = 2, 7, 5, 16
    x = jnp.asarray(rng.randn(b, tq, c).astype(np.float32))
    ctx = rng.randn(b, ts, c).astype(np.float32)
    m = MultiHeadAttention(c, c, 2, window_size=None)
    params = m.init(jax.random.PRNGKey(0), x, context=jnp.asarray(ctx))
    y1 = np.asarray(m.apply(params, x, context=jnp.asarray(ctx)))
    assert y1.shape == (b, tq, c)
    y2 = np.asarray(m.apply(params, x, context=jnp.asarray(ctx * 2)))
    assert not np.allclose(y1, y2)
    # masking a context position makes its value irrelevant
    mask = np.ones((b, 1, tq, ts), np.float32)
    mask[:, :, :, 4] = 0.0
    ctx3 = ctx.copy()
    ctx3[:, 4] += 100.0
    ya = np.asarray(m.apply(params, x, jnp.asarray(mask),
                            context=jnp.asarray(ctx)))
    yb = np.asarray(m.apply(params, x, jnp.asarray(mask),
                            context=jnp.asarray(ctx3)))
    np.testing.assert_allclose(ya, yb, atol=1e-4)


def test_transformer_decoder_causal(rng):
    """The Decoder stack (reference attentions.py:50-98) is causal: a change
    at position j cannot affect outputs before j; the encoder memory is
    wired in via cross-attention."""
    from mb_istft_vits_tpu.nn import TransformerDecoder

    b, t, ts, c = 1, 10, 6, 16
    x = rng.randn(b, t, c).astype(np.float32)
    h = rng.randn(b, ts, c).astype(np.float32)
    x_mask = jnp.ones((b, t, 1), jnp.float32)
    h_mask = jnp.ones((b, ts, 1), jnp.float32)
    m = TransformerDecoder(hidden_channels=c, filter_channels=32, n_heads=2,
                           n_layers=2, kernel_size=3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), x_mask,
                    jnp.asarray(h), h_mask)
    y1 = np.asarray(m.apply(params, jnp.asarray(x), x_mask,
                            jnp.asarray(h), h_mask))
    x2 = x.copy()
    x2[0, 6] += 10.0
    y2 = np.asarray(m.apply(params, jnp.asarray(x2), x_mask,
                            jnp.asarray(h), h_mask))
    np.testing.assert_allclose(y1[0, :6], y2[0, :6], atol=1e-4)
    assert not np.allclose(y1[0, 6:], y2[0, 6:])
    y3 = np.asarray(m.apply(params, jnp.asarray(x), x_mask,
                            jnp.asarray(h * 2), h_mask))
    assert not np.allclose(y1, y3)


def test_attention_heads_share_false_per_head(rng):
    """heads_share=False must use each head's OWN rel-pos table
    (reference attentions.py broadcasts head-for-head). Regression: the
    einsum contracted over the table axis, summing every head's table
    into every head's scores — with both heads' tables set equal, that
    bug doubles the rel logits vs the shared-table model."""
    c, h, t = 16, 2, 10
    x = jnp.asarray(rng.randn(2, t, c).astype(np.float32))

    m_shared = MultiHeadAttention(c, c, h, window_size=4, heads_share=True)
    p_shared = m_shared.init(jax.random.PRNGKey(0), x)

    m_per = MultiHeadAttention(c, c, h, window_size=4, heads_share=False)
    m_per.init(jax.random.PRNGKey(0), x)  # shape sanity only

    # same conv weights; per-head tables = the shared table repeated
    shared = p_shared["params"]
    per = {
        k: (jnp.concatenate([v] * h, axis=0) if k.startswith("emb_rel")
            else v)
        for k, v in shared.items()
    }
    y_shared = np.asarray(m_shared.apply({"params": shared}, x))
    y_per = np.asarray(m_per.apply({"params": per}, x))
    np.testing.assert_allclose(y_per, y_shared, atol=1e-6)

    # and genuinely different tables must change only via their own head:
    # zeroing head-1's key table with head-0's kept must not equal the
    # all-equal case
    per2 = dict(per)
    per2["emb_rel_k"] = per["emb_rel_k"].at[1].set(0.0)
    y_zero = np.asarray(m_per.apply({"params": per2}, x))
    assert not np.allclose(y_zero, y_shared)


def test_coupling_and_convflow_identity_at_init(rng):
    """Both flow layers zero-init their final conv (weight AND bias), so
    each is the identity transform at init with zero logdet — the
    reference's training-start dynamics (modules.py:331-332,370-371)."""
    x = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    mask = jnp.ones((2, 12, 1), jnp.float32)

    m = ResidualCouplingLayer(channels=8, hidden_channels=16, kernel_size=5,
                              dilation_rate=1, n_layers=2, mean_only=True)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    y, logdet = m.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-6)

    # ConvFlow at init is the *uniform* spline (not exactly identity —
    # softplus(0) derivatives — same as the reference); parity requires
    # the proj conv to start at zero weight AND bias
    # (reference modules.py:370-371)
    cf = ConvFlow(in_channels=8, filter_channels=16, kernel_size=3,
                  n_layers=2)
    params = cf.init(jax.random.PRNGKey(1), x, mask)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["proj"]["kernel"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["proj"]["bias"]), 0.0)
    y, _ = cf.apply(params, x, mask)
    # the zero-init warp is input-value dependent but x0 passes through
    np.testing.assert_allclose(np.asarray(y)[..., :4],
                               np.asarray(x)[..., :4], atol=1e-6)
