"""MAS and segment-op tests against the reference DP transcribed in numpy."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.ops import (
    generate_path,
    maximum_path,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)
from mb_istft_vits_tpu.ops.mas import maximum_path_numpy


def _random_mas_problem(rng, b=4, t_y=37, t_x=19):
    neg_cent = rng.randn(b, t_y, t_x).astype(np.float32)
    t_ys = rng.randint(t_x + 2, t_y + 1, size=b)
    t_xs = rng.randint(3, t_x + 1, size=b)
    t_ys = np.maximum(t_ys, t_xs)  # need t_y >= t_x for a valid path
    mask = (
        (np.arange(t_y)[None, :, None] < t_ys[:, None, None])
        & (np.arange(t_x)[None, None, :] < t_xs[:, None, None])
    ).astype(np.float32)
    return neg_cent, mask


def test_maximum_path_matches_reference_dp(rng):
    neg_cent, mask = _random_mas_problem(rng)
    ours = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    oracle = maximum_path_numpy(neg_cent, mask)
    np.testing.assert_array_equal(ours, oracle)


def test_maximum_path_under_jit(rng):
    neg_cent, mask = _random_mas_problem(rng, b=2, t_y=25, t_x=11)
    f = jax.jit(maximum_path)
    ours = np.asarray(f(jnp.asarray(neg_cent), jnp.asarray(mask)))
    oracle = maximum_path_numpy(neg_cent, mask)
    np.testing.assert_array_equal(ours, oracle)


def test_maximum_path_properties(rng):
    """Each valid frame maps to exactly one token; path is monotone."""
    neg_cent, mask = _random_mas_problem(rng, b=3)
    path = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    t_ys = mask.sum(axis=1)[:, 0].astype(int)
    t_xs = mask.sum(axis=2)[:, 0].astype(int)
    for i in range(path.shape[0]):
        p = path[i, : t_ys[i], : t_xs[i]]
        assert np.all(p.sum(axis=1) == 1)
        tok = p.argmax(axis=1)
        assert np.all(np.diff(tok) >= 0)
        assert np.all(np.diff(tok) <= 1)
        assert tok[0] == 0 and tok[-1] == t_xs[i] - 1
        assert path[i, t_ys[i] :, :].sum() == 0
        assert path[i, :, t_xs[i] :].sum() == 0


def test_generate_path_matches_torch(rng):
    """vs reference commons.generate_path run in torch."""
    b, t_x, t_y = 3, 7, 30
    dur = rng.randint(1, 5, size=(b, t_x)).astype(np.float32)
    t_ys = dur.sum(axis=1).astype(int)
    mask = (
        (np.arange(t_y)[None, :, None] < t_ys[:, None, None])
        & np.ones((1, 1, t_x), bool)
    ).astype(np.float32)

    ours = np.asarray(generate_path(jnp.asarray(dur), jnp.asarray(mask)))

    # torch transcription of commons.py:128-143
    dt = torch.from_numpy(dur).unsqueeze(1)  # [b,1,t_x]
    mt = torch.from_numpy(mask).unsqueeze(1)  # [b,1,t_y,t_x]
    cum = torch.cumsum(dt, -1).view(b * t_x)
    path = (
        torch.arange(t_y)[None, :] < cum[:, None]
    ).float().view(b, t_x, t_y)
    path = path - torch.nn.functional.pad(path, (0, 0, 1, 0))[:, :-1]
    ref = (path.unsqueeze(1).transpose(2, 3) * mt)[:, 0].numpy()
    np.testing.assert_array_equal(ours, ref)


def test_slice_segments(rng):
    x = rng.randn(4, 50, 3).astype(np.float32)
    ids = np.array([0, 5, 10, 46 - 8])
    seg = np.asarray(slice_segments(jnp.asarray(x), jnp.asarray(ids), 8))
    for i in range(4):
        np.testing.assert_array_equal(seg[i], x[i, ids[i] : ids[i] + 8])


def test_rand_slice_segments_in_bounds(rng):
    x = rng.randn(4, 50, 3).astype(np.float32)
    lengths = jnp.asarray([50, 40, 33, 20])
    seg, ids = rand_slice_segments(
        jnp.asarray(x), jax.random.PRNGKey(0), lengths, segment_size=16
    )
    assert seg.shape == (4, 16, 3)
    ids = np.asarray(ids)
    assert np.all(ids >= 0) and np.all(ids + 16 <= np.asarray(lengths) + 16)


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.asarray([1, 3, 5]), 5))
    assert m.sum() == 9
    assert m[0, 0] and not m[0, 1] and m[2, 4]


def test_maximum_path_pallas_interpret(rng, monkeypatch):
    """Pallas MAS kernel (interpret mode on CPU) vs the reference DP."""
    from jax.experimental import pallas as pl

    import mb_istft_vits_tpu.ops.mas_pallas as mp

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mp.pl, "pallas_call", interp)

    neg_cent, mask = _random_mas_problem(rng, b=4, t_y=33, t_x=17)
    oracle = maximum_path_numpy(neg_cent, mask)
    # both implementations: fused (decisions in VMEM scratch, K-row
    # macro-steps incl. the T_y % K != 0 padding path) and two-pass
    for force in ("fused", "two_pass"):
        ours = np.asarray(
            mp.maximum_path_pallas(jnp.asarray(neg_cent), jnp.asarray(mask),
                                   force=force)
        )
        np.testing.assert_array_equal(ours, oracle, err_msg=force)


def test_maximum_path_native_cpp(rng):
    """C++/OpenMP host MAS (native/mas.cpp) vs the reference DP."""
    from mb_istft_vits_tpu.ops.mas_native import maximum_path_native

    neg_cent, mask = _random_mas_problem(rng, b=6, t_y=41, t_x=23)
    ours = maximum_path_native(neg_cent, mask)
    oracle = maximum_path_numpy(neg_cent, mask)
    np.testing.assert_array_equal(ours, oracle)


def test_maximum_path_native_degenerate_extents(rng):
    """Degenerate per-item extents must stay in-bounds: t_x == 0 used to
    write path[y*stride - 1] (corrupting the previous item's slab), and
    t_x > t_y read out of bounds in both DP and backtrack (UB shared
    with the reference core.pyx). Item order pins the corruption case:
    a valid item FOLLOWED by a t_x==0 item."""
    from mb_istft_vits_tpu.ops.mas_native import maximum_path_native

    b, t_y, t_x = 3, 12, 8
    neg_cent = rng.randn(b, t_y, t_x).astype(np.float32)
    mask = np.zeros((b, t_y, t_x), np.float32)
    mask[0, :10, :6] = 1.0   # valid item
    mask[1, :10, :0] = 1.0   # t_x == 0 (fully masked text)
    mask[2, :5, :8] = 1.0    # t_x > t_y (no monotonic alignment)
    paths = maximum_path_native(neg_cent, mask)
    # item 0 matches the oracle and is NOT corrupted by item 1
    oracle0 = maximum_path_numpy(neg_cent[:1], mask[:1])
    np.testing.assert_array_equal(paths[:1], oracle0)
    # t_x == 0: empty path
    assert paths[1].sum() == 0
    # t_x > t_y: defined 1:1 prefix — one token per frame, clamped to
    # the first t_y tokens, nothing outside the item's valid region
    assert np.array_equal(paths[2].sum(axis=1)[:5], np.ones(5))
    assert paths[2][:, 5:].sum() == 0
    assert paths[2][5:, :].sum() == 0


def test_timing_signal_matches_reference_formula():
    """Sinusoid position signal vs an independent numpy transcription of
    the transformer formula (reference commons.py:67-94)."""
    import numpy as np

    from mb_istft_vits_tpu.ops import (
        add_timing_signal_1d,
        cat_timing_signal_1d,
        get_timing_signal_1d,
    )

    length, channels = 13, 10
    sig = np.asarray(get_timing_signal_1d(length, channels))[0]  # [T, C]

    pos = np.arange(length, dtype=np.float64)
    n_ts = channels // 2
    inv = 1.0 * np.exp(
        np.arange(n_ts) * -(np.log(1e4 / 1.0) / (n_ts - 1))
    )
    st = pos[:, None] * inv[None, :]
    want = np.concatenate([np.sin(st), np.cos(st)], axis=1)
    np.testing.assert_allclose(sig, want, atol=1e-5)

    # odd channel count pads one zero column
    sig_odd = np.asarray(get_timing_signal_1d(8, 7))[0]
    assert sig_odd.shape == (8, 7)
    np.testing.assert_array_equal(sig_odd[:, -1], np.zeros(8))

    import jax.numpy as jnp

    x = jnp.ones((2, length, channels))
    np.testing.assert_allclose(
        np.asarray(add_timing_signal_1d(x))[0], 1.0 + sig, atol=1e-5
    )
    cat = cat_timing_signal_1d(x)
    assert cat.shape == (2, length, 2 * channels)
    np.testing.assert_allclose(np.asarray(cat)[1, :, channels:], sig,
                               atol=1e-5)
