"""Every shipped config variant (the compatibility contract, reference
configs/*.json) must load and wire a full model. Uses jax.eval_shape so
all 11 full-size models are checked at shape level without FLOPs."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.config import Config
from mb_istft_vits_tpu.models import Synthesizer

CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "configs", "*.json")
))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)[:-5]
                                               for p in CONFIGS])
def test_config_builds_model(path):
    cfg = Config.from_json(path)
    # exactly one decoder variant selected
    kinds = [cfg.model.mb_istft_vits, cfg.model.ms_istft_vits,
             cfg.model.istft_vits]
    assert sum(bool(k) for k in kinds) == 1, path
    model = Synthesizer(cfg.model)

    b, t_x = 2, 12
    t_spec = cfg.model.segment_size + 8
    x = jnp.zeros((b, t_x), jnp.int32)
    xl = jnp.full((b,), t_x, jnp.int32)
    y = jnp.zeros((b, t_spec, cfg.model.spec_channels), jnp.float32)
    yl = jnp.full((b,), t_spec, jnp.int32)
    sid = jnp.zeros((b,), jnp.int32) if cfg.model.n_speakers else None

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "slice": jax.random.PRNGKey(3)}
    shapes = jax.eval_shape(
        lambda: model.init(rngs, x, xl, y, yl, sid=sid, train=False)
    )
    params = shapes["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_params > 1e5, (path, n_params)
    # decoder variant actually instantiated
    assert "dec" in params, list(params)
    # speaker embedding present iff multi-speaker
    assert ("emb_g" in params) == (cfg.model.n_speakers > 1), path
