"""End-to-end model tests on a tiny config (mini MB-iSTFT shape)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.config import ModelConfig
from mb_istft_vits_tpu.models import MultiPeriodDiscriminator, Synthesizer

TINY = dict(
    n_vocab=40,
    spec_channels=513,
    segment_size=8,  # frames
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=1,
    kernel_size=3,
    p_dropout=0.1,
    resblock="1",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4),
    upsample_initial_channel=32,
    upsample_kernel_sizes=(16, 16),
    gen_istft_n_fft=16,
    gen_istft_hop_size=4,
)


def tiny_cfg(**kw):
    d = dict(TINY)
    d.update(kw)
    return ModelConfig(**d)


def make_batch(rng, b=2, t_x=11, t_y=40, spec_ch=513):
    x = rng.randint(1, 40, size=(b, t_x)).astype(np.int32)
    x_lengths = np.array([t_x, t_x - 3], np.int32)
    y = rng.randn(b, t_y, spec_ch).astype(np.float32) ** 2
    y_lengths = np.array([t_y, t_y - 8], np.int32)
    return (jnp.asarray(x), jnp.asarray(x_lengths), jnp.asarray(y),
            jnp.asarray(y_lengths))


def init_model(cfg, batch, sid=None):
    model = Synthesizer(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
            "slice": jax.random.PRNGKey(3)}
    variables = model.init(rngs, *batch, sid=sid, train=False)
    return model, variables


@pytest.mark.parametrize("kind", ["mb_istft", "ms_istft", "istft"])
def test_training_forward_shapes(rng, kind):
    cfg = tiny_cfg(
        mb_istft_vits=(kind == "mb_istft"),
        ms_istft_vits=(kind == "ms_istft"),
        istft_vits=(kind == "istft"),
        upsample_rates=(4, 4) if kind != "istft" else (8, 8),
    )
    batch = make_batch(rng)
    model, variables = init_model(cfg, batch)
    rngs = {"noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "slice": jax.random.PRNGKey(3)}
    out = model.apply(variables, *batch, train=True, rngs=rngs)
    o, o_mb, l_length, attn, ids_slice, x_mask, y_mask, latents = out
    # segment 8 frames * hop 256 worth of samples:
    # upsample 16x (subbands join x4) or 64x istft -> 8*16*... all = 2048*? ;
    # contract: total upsampling factor * istft hop == data hop (256)
    assert o.shape[0] == 2 and o.shape[2] == 1
    assert o.shape[1] == 8 * 256  # segment_size frames * hop
    assert l_length.shape == (2,)
    assert attn.shape == (2, 40, 11)
    z, z_p, m_p, logs_p, m_q, logs_q = latents
    assert z.shape == (2, 40, cfg.inter_channels)
    assert m_p.shape == (2, 40, cfg.inter_channels)  # expanded prior
    assert np.all(np.isfinite(np.asarray(o)))


def test_infer_shapes_and_determinism(rng):
    cfg = tiny_cfg(mb_istft_vits=True)
    batch = make_batch(rng)
    model, variables = init_model(cfg, batch)
    x, x_lengths = batch[0], batch[1]

    def run(seed):
        return model.apply(
            variables, x, x_lengths, max_frames=64,
            method=Synthesizer.infer,
            rngs={"noise": jax.random.PRNGKey(seed)},
        )

    out1 = run(7)
    out2 = run(7)
    out3 = run(8)
    assert out1.o.shape == (2, 64 * 256, 1)
    np.testing.assert_array_equal(np.asarray(out1.o), np.asarray(out2.o))
    assert not np.allclose(np.asarray(out1.o), np.asarray(out3.o))
    assert np.all(np.asarray(out1.y_lengths) >= 1)
    # decoder only sees z*y_mask; padded frames produce silence-ish output
    assert np.all(np.isfinite(np.asarray(out1.o)))


def test_infer_z_only_then_decode_matches_infer(rng):
    """z-roundtrip invariant (reference run_synthesis_z.py:15-39)."""
    cfg = tiny_cfg(mb_istft_vits=True)
    batch = make_batch(rng)
    model, variables = init_model(cfg, batch)
    x, x_lengths = batch[0], batch[1]
    rngs = {"noise": jax.random.PRNGKey(7)}

    full = model.apply(variables, x, x_lengths, max_frames=64,
                       method=Synthesizer.infer, rngs=rngs)
    attn, y_mask, y_lengths, (z, *_rest) = model.apply(
        variables, x, x_lengths, max_frames=64,
        method=Synthesizer.infer_z_only, rngs=rngs)
    o2, *_ = model.apply(variables, z, None, y_mask,
                         method=Synthesizer.decode)
    np.testing.assert_allclose(np.asarray(full.o), np.asarray(o2), atol=1e-5)


def test_multispeaker_and_voice_conversion(rng):
    cfg = tiny_cfg(ms_istft_vits=True, n_speakers=4, gin_channels=8)
    x, x_lengths, y, y_lengths = make_batch(rng)
    sid = jnp.asarray([0, 2])
    model = Synthesizer(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "slice": jax.random.PRNGKey(3)}
    variables = model.init(rngs, x, x_lengths, y, y_lengths, sid=sid,
                           train=False)

    out = model.apply(variables, x, x_lengths, sid=sid, max_frames=32,
                      method=Synthesizer.infer,
                      rngs={"noise": jax.random.PRNGKey(4)})
    assert out.o.shape[0] == 2

    o_hat, o_hat_mb, y_mask, _ = model.apply(
        variables, y, y_lengths, jnp.asarray([0, 1]), jnp.asarray([2, 3]),
        method=Synthesizer.voice_conversion,
        rngs={"noise": jax.random.PRNGKey(5)})
    assert o_hat.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(o_hat)))


def test_flow_invertibility_in_model(rng):
    cfg = tiny_cfg(mb_istft_vits=True)
    batch = make_batch(rng)
    model, variables = init_model(cfg, batch)
    z = jnp.asarray(rng.randn(2, 20, cfg.inter_channels).astype(np.float32))
    mask = jnp.ones((2, 20, 1), jnp.float32)

    flow_params = {"params": variables["params"]["flow"]}
    from mb_istft_vits_tpu.models.synthesizer import ResidualCouplingBlock

    flow = ResidualCouplingBlock(cfg.inter_channels, cfg.hidden_channels,
                                 5, 1, 4, gin_channels=cfg.gin_channels)
    z_p = flow.apply(flow_params, z, mask)
    z_rec = flow.apply(flow_params, z_p, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z), atol=1e-4)


def test_discriminator_shapes(rng):
    d = MultiPeriodDiscriminator()
    y = jnp.asarray(rng.randn(2, 2048, 1).astype(np.float32))
    y_hat = jnp.asarray(rng.randn(2, 2048, 1).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), y, y_hat)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = d.apply(params, y, y_hat)
    assert len(y_d_rs) == 6 and len(fmap_rs) == 6
    assert all(len(f) == 6 for f in fmap_rs[1:])  # P-discs: 6 fmaps
    assert len(fmap_rs[0]) == 7  # S-disc: 7 fmaps


def test_sdp_forward_and_reverse(rng):
    cfg = tiny_cfg(mb_istft_vits=True, use_sdp=True)
    batch = make_batch(rng)
    model, variables = init_model(cfg, batch)
    rngs = {"noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "slice": jax.random.PRNGKey(3)}
    out = model.apply(variables, *batch, train=True, rngs=rngs)
    l_length = out[2]
    assert l_length.shape == (2,)
    assert np.all(np.isfinite(np.asarray(l_length)))
    inf = model.apply(variables, batch[0], batch[1], max_frames=64,
                      method=Synthesizer.infer,
                      rngs={"noise": jax.random.PRNGKey(4)})
    assert np.all(np.isfinite(np.asarray(inf.o)))


def test_fake_slice_matches_full_forward(rng):
    """Synthesizer.fake_slice (the trimmed D-step forward) must reproduce
    the full training forward's fake slice bit-for-bit under the same rngs
    — the two jitted train programs rely on this identity."""
    cfg = tiny_cfg(mb_istft_vits=True)
    batch = make_batch(rng)
    model, variables = init_model(cfg, batch)
    rngs = {"noise": jax.random.PRNGKey(7),
            "dropout": jax.random.PRNGKey(8),
            "slice": jax.random.PRNGKey(9)}
    out = model.apply(variables, *batch, train=True, rngs=rngs)
    o_full, ids_full = out[0], out[4]
    o_fake, ids_fake = model.apply(
        variables, batch[2], batch[3], train=True,
        method=Synthesizer.fake_slice, rngs=rngs,
    )
    np.testing.assert_array_equal(np.asarray(ids_full), np.asarray(ids_fake))
    np.testing.assert_array_equal(np.asarray(o_full), np.asarray(o_fake))


def test_reconstruct_copy_synthesis(rng):
    """reconstruct = enc_q -> dec: output is time-aligned with the input
    spectrogram (upsample-factor x T_spec samples) and deterministic
    under a fixed noise rng."""
    cfg = tiny_cfg(mb_istft_vits=True)
    batch = make_batch(rng)
    model, variables = init_model(cfg, batch)
    _, _, y, y_lengths = batch
    kw = dict(method=Synthesizer.reconstruct,
              rngs={"noise": jax.random.PRNGKey(7)})
    o, y_mask = model.apply(variables, y, y_lengths, **kw)
    up = (int(np.prod(cfg.upsample_rates)) * cfg.gen_istft_hop_size
          * cfg.subbands)  # MB decoder: per-band iSTFT then PQMF interleave
    assert o.shape == (y.shape[0], y.shape[1] * up, 1)
    assert np.all(np.isfinite(np.asarray(o)))
    o2, _ = model.apply(variables, y, y_lengths, **kw)
    np.testing.assert_array_equal(np.asarray(o), np.asarray(o2))
    # masked frames beyond y_lengths decode from z=0 latents: the tail
    # past the valid region must carry (near-)silence, not content
    assert np.abs(np.asarray(o)[1, (y.shape[1] - 2) * up:, 0]).mean() < \
        np.abs(np.asarray(o)[1, : int(y_lengths[1]) * up, 0]).mean() * 2
