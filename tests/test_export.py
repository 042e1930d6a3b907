"""Serialized serving artifacts (infer/export.py).

jax.export round trip in a single-device subprocess (the suite runs on
8 virtual devices; the artifact path is a single-chip serving surface),
plus cross-platform lowering and param-dtype fidelity in-process.
"""

import json
import os
import textwrap

import numpy as np
import pytest

from tests.subproc import run_worker as _run

pytestmark = pytest.mark.slow  # subprocess drives / full-program compiles

WORKER = textwrap.dedent("""
    import os, sys, hashlib, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from mb_istft_vits_tpu.infer.synthesis import SynthesisModule
    from mb_istft_vits_tpu.infer.export import export_serving, load_serving

    cfg_path, art_dir = sys.argv[1], sys.argv[2]
    text = "k o N n i t i w a"

    m = SynthesisModule(cfg_path, seed=0)
    m.TEXT_BUCKETS = (32, 64)
    m.FRAME_BUCKETS = (64, 128, 256)
    manifest = export_serving(m, art_dir)
    print("n_pairs", len(manifest["pairs"]))

    ref, _ = m.synthesize(text, seed=7)

    s = load_serving(art_dir)
    audio, timings = s.synthesize(text, seed=7)
    print("sr", s.sampling_rate)
    print("match", int(len(audio) == len(ref)
                       and np.array_equal(audio, ref)))
    audio2, _ = s.synthesize(text, seed=7)
    print("deterministic", int(np.array_equal(audio, audio2)))
    # default (no seed): rolling rng — two requests draw different noise
    r1, _ = s.synthesize(text)
    r2, _ = s.synthesize(text)
    print("rolling", int(len(r1) != len(r2) or not np.array_equal(r1, r2)))
    # frames beyond every exported bucket must REFUSE, not silently
    # truncate (the live module grows its bucket; an artifact can't)
    try:
        s.synthesize(text, seed=7, length_scale=50.0)
        print("overflow none")
    except ValueError:
        print("overflow raised")
""")


def test_export_round_trip(tmp_path):
    from tests.test_infer import TINY_CONFIG

    cfg = tmp_path / "tiny.json"
    cfg.write_text(json.dumps(TINY_CONFIG))
    art = tmp_path / "artifact"
    r = _run(WORKER, str(cfg), str(art))
    # artifact audio must be BIT-identical to the live module's (same
    # computation, same rng, replayed from serialized StableHLO)
    assert r["match"] == ["1"]
    assert r["deterministic"] == ["1"]
    assert r["n_pairs"] == ["2"]
    assert r["overflow"] == ["raised"]
    assert r["rolling"] == ["1"]
    names = sorted(os.listdir(art))
    assert "manifest.json" in names and "params.npz" in names
    assert any(n.startswith("infer_t") for n in names)
    assert any(n.startswith("probe_t") for n in names)


def test_export_param_dtype_fidelity(tmp_path):
    """bf16 params survive the npz round trip (npz alone erases
    extension dtypes to void)."""
    import jax

    import ml_dtypes
    from mb_istft_vits_tpu.infer.export import (
        _flatten_params,
        _unflatten_params,
    )

    params = {"layer": {"w": np.ones((3,), ml_dtypes.bfloat16),
                        "b": np.zeros((2,), np.float32)}}
    flat = _flatten_params(params)
    npz = tmp_path / "p.npz"
    np.savez(npz, **flat)
    dtypes = {k: str(v.dtype) for k, v in flat.items()}
    loaded = np.load(npz)
    fixed = {}
    for k in loaded.files:
        a = loaded[k]
        if str(a.dtype) != dtypes[k]:
            a = a.view(np.dtype(dtypes[k]))
        fixed[k] = a
    out = _unflatten_params(fixed)
    assert out["layer"]["w"].dtype == ml_dtypes.bfloat16
    assert np.array_equal(out["layer"]["w"],
                          params["layer"]["w"])
    assert jax.tree.structure(out) == jax.tree.structure(params)


def test_export_cross_platform_lowering():
    """A CPU host can produce a TPU-loadable artifact: lowering for
    platforms=('cpu','tpu') must serialize without TPU hardware."""
    import jax

    if jax.default_backend() != "cpu":
        import pytest

        pytest.skip("cross-platform check exercises the CPU->TPU path")
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.tanh(x @ x.T))
    exp = jax.export.export(f, platforms=("cpu", "tpu"))(
        jax.ShapeDtypeStruct((4, 4), jnp.float32))
    blob = exp.serialize()
    assert len(blob) > 0
    re = jax.export.deserialize(blob)
    out = np.asarray(re.call(jnp.ones((4, 4), jnp.float32)))
    assert np.allclose(out, np.tanh(np.full((4, 4), 4.0)))
