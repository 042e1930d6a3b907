"""Gold parity test: initialize the *reference torch model*, import its
weights via the .pth importer, and compare full inference outputs.

This is the checkpoint-compatibility contract for public pretrained
checkpoints (reference README.md:13).
"""

import sys
import types

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # live-torch reference parity (builds full torch models)

import jax
import jax.numpy as jnp

from mb_istft_vits_tpu.config import ModelConfig
from mb_istft_vits_tpu.models import Synthesizer
from mb_istft_vits_tpu.train.checkpoint import (
    import_torch_discriminator,
    import_torch_generator,
)


def _stub_reference_deps(monkeypatch):
    """The reference imports librosa and a compiled monotonic_align, neither
    needed for inference — stub them."""
    librosa = types.ModuleType("librosa")
    librosa_util = types.ModuleType("librosa.util")
    librosa_util.pad_center = lambda x, n, **kw: x
    librosa_util.tiny = lambda x: np.finfo(np.float32).tiny
    librosa_util.normalize = lambda x, **kw: x
    librosa.util = librosa_util
    librosa_filters = types.ModuleType("librosa.filters")
    librosa_filters.mel = lambda *a, **k: np.zeros((1, 1))
    librosa.filters = librosa_filters
    monkeypatch.setitem(sys.modules, "librosa", librosa)
    monkeypatch.setitem(sys.modules, "librosa.util", librosa_util)
    monkeypatch.setitem(sys.modules, "librosa.filters", librosa_filters)
    ma = types.ModuleType("monotonic_align")
    ma.maximum_path = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "monotonic_align", ma)
    # reference PQMF calls .cuda(device) at construction (pqmf.py:78-88);
    # neutralize on CPU-only torch
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, device=None: self, raising=False)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


MODEL_KW = dict(
    inter_channels=192,
    hidden_channels=96,
    filter_channels=768,
    n_heads=2,
    n_layers=1,          # shrunk from mini's 3 for CPU test speed
    kernel_size=3,
    p_dropout=0.1,
    resblock="1",
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    upsample_rates=[4, 4],
    upsample_initial_channel=64,  # shrunk from 256
    upsample_kernel_sizes=[16, 16],
    gen_istft_n_fft=16,
    gen_istft_hop_size=4,
    use_sdp=False,
)


@pytest.mark.parametrize("variant", ["mb_istft_vits", "istft_vits",
                                     "ms_istft_vits"])
def test_torch_checkpoint_roundtrip_inference(tmp_path, rng, monkeypatch,
                                              variant):
    _stub_reference_deps(monkeypatch)
    import importlib

    import models as ref_models  # /root/reference/models.py

    importlib.reload(ref_models)

    kw = dict(MODEL_KW)
    kw[variant] = True
    if variant == "istft_vits":
        kw["upsample_rates"] = [8, 8]
        kw["subbands"] = False
    else:
        kw["subbands"] = 4

    torch.manual_seed(0)
    ref = ref_models.SynthesizerTrn(40, 513, 32, **kw)
    ref.eval()

    ckpt_path = tmp_path / "G_test.pth"
    torch.save({"model": ref.state_dict(), "iteration": 1,
                "learning_rate": 2e-4, "optimizer": {}}, ckpt_path)

    cfg = ModelConfig(
        n_vocab=40, spec_channels=513, segment_size=32,
        mb_istft_vits=(variant == "mb_istft_vits"),
        ms_istft_vits=(variant == "ms_istft_vits"),
        istft_vits=(variant == "istft_vits"),
        subbands=4,
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in MODEL_KW.items()
           if k not in ("upsample_rates",)},
        upsample_rates=tuple(kw["upsample_rates"]),
    )
    params = import_torch_generator(str(ckpt_path), cfg)

    # run reference inference (deterministic: noise scales 0, eval mode)
    x = rng.randint(1, 40, size=(1, 13)).astype(np.int64)
    x_len = np.array([13], np.int64)
    with torch.no_grad():
        o_ref, o_mb_ref, spec_ref, phase_ref, attn_ref, y_mask_ref, \
            (z_ref, *_), _ = ref.infer(
                torch.from_numpy(x), torch.from_numpy(x_len),
                noise_scale=0.0, noise_scale_w=0.0, max_len=None)
    t_y = int(y_mask_ref.sum())

    model = Synthesizer(cfg)
    out = model.apply(
        {"params": params},
        jnp.asarray(x.astype(np.int32)), jnp.asarray(x_len.astype(np.int32)),
        noise_scale=0.0, noise_scale_w=0.0, max_frames=t_y,
        method=Synthesizer.infer,
        rngs={"noise": jax.random.PRNGKey(0)},
    )

    assert int(out.y_lengths[0]) == t_y
    np.testing.assert_array_equal(
        np.asarray(out.attn[0]), attn_ref[0, 0].numpy()
    )
    z_ours = np.asarray(out.latents[0][0])  # [T, C]
    np.testing.assert_allclose(z_ours, z_ref[0].numpy().T, atol=2e-4)

    o_ours = np.asarray(out.o[0, :, 0])
    o_r = o_ref[0, 0].numpy()
    n = min(len(o_ours), len(o_r))
    np.testing.assert_allclose(o_ours[:n], o_r[:n], atol=5e-3, rtol=0)
    # spectral closeness (the fidelity contract): relative L2 < 1%
    rel = np.linalg.norm(o_ours[:n] - o_r[:n]) / (np.linalg.norm(o_r[:n]) + 1e-9)
    assert rel < 0.01, rel
    # the BASELINE.md north-star: MCD vs the torch reference < 0.5 dB
    from mb_istft_vits_tpu.utils.metrics import mel_cepstral_distortion

    mcd = mel_cepstral_distortion(o_ours[:n], o_r[:n], 22050,
                                  n_fft=512, hop_length=128, win_length=512)
    assert mcd < 0.5, mcd

    # export round-trip: our params -> reference .pth; every parameter
    # (buffers excluded — the reference rebuilds those in __init__) must
    # equal the original torch state dict exactly
    from mb_istft_vits_tpu.train.checkpoint import export_torch_generator

    out_path = tmp_path / "G_export.pth"
    export_torch_generator(params, cfg, str(out_path))
    exported = torch.load(out_path, weights_only=False)["model"]
    orig = {k: v for k, v in ref.state_dict().items()}
    buffers = {k for k, _ in ref.named_buffers()}
    param_keys = set(orig) - buffers
    assert param_keys == set(exported), (
        sorted(param_keys ^ set(exported))[:10])
    for k in sorted(param_keys):
        np.testing.assert_array_equal(
            exported[k].numpy(), orig[k].numpy(), err_msg=k)


def test_torch_deploy_checkpoint_import(tmp_path, rng, monkeypatch):
    """Deploy checkpoints — saved AFTER the reference's remove_weight_norm
    (models.py:299-306), so weight-normed convs carry a plain `weight`
    instead of (weight_v, weight_g) — must import to the same effective
    weights as the training-time checkpoint."""
    _stub_reference_deps(monkeypatch)
    import importlib

    import models as ref_models

    importlib.reload(ref_models)

    kw = dict(MODEL_KW)
    kw["mb_istft_vits"] = True
    kw["subbands"] = 4
    torch.manual_seed(0)
    ref = ref_models.SynthesizerTrn(40, 513, 32, **kw)
    ref.eval()
    sd = ref.state_dict()

    normal_path = tmp_path / "G_train.pth"
    torch.save({"model": sd}, normal_path)

    # simulate remove_weight_norm over the whole state dict: fold every
    # (weight_v, weight_g) pair into a plain weight (torch dim=0 norm)
    folded = {}
    for k, v in sd.items():
        if k.endswith(".weight_v"):
            g = sd[k[: -len("_v")] + "_g"]
            norm = v.norm(dim=tuple(range(1, v.dim())), keepdim=True)
            folded[k[: -len(".weight_v")] + ".weight"] = g * v / norm
        elif k.endswith(".weight_g"):
            continue
        else:
            folded[k] = v
    deploy_path = tmp_path / "G_deploy.pth"
    torch.save({"model": folded}, deploy_path)

    cfg = ModelConfig(
        n_vocab=40, spec_channels=513, segment_size=32,
        mb_istft_vits=True, subbands=4,
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in MODEL_KW.items()},
    )
    p_train = import_torch_generator(str(normal_path), cfg)
    p_deploy = import_torch_generator(str(deploy_path), cfg)

    def flatten(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from flatten(v, prefix + (k,))
            else:
                yield prefix + (k,), v

    t_train = dict(flatten(p_train))
    t_deploy = dict(flatten(p_deploy))
    assert set(t_train) == set(t_deploy)

    def effective(tree):
        """Reconstruct w = v * g / ||v|| the way the layers do."""
        out = {}
        for path, v in tree.items():
            if path[-1] == "v":
                g = tree[path[:-1] + ("g",)]
                # the only ConvTranspose1d layers are the decoder
                # upsamplers (ups_*): per-IN-channel g; convs: per-OUT
                if path[-2].startswith("ups_"):
                    axes, bc = (0, 2), (1, -1, 1)
                else:
                    axes, bc = (0, 1), (1, 1, -1)
                n = np.sqrt((np.asarray(v) ** 2).sum(axis=axes) + 1e-12)
                out[path[:-1]] = np.asarray(v) * (
                    np.asarray(g) / n
                ).reshape(bc)
            elif path[-1] != "g":
                out[path] = np.asarray(v)
        return out

    w_train = effective(t_train)
    w_deploy = effective(t_deploy)
    for path in w_train:
        np.testing.assert_allclose(
            w_deploy[path], w_train[path], atol=1e-6,
            err_msg="/".join(path),
        )


def test_torch_discriminator_import(tmp_path, rng, monkeypatch):
    _stub_reference_deps(monkeypatch)
    import importlib

    import models as ref_models

    importlib.reload(ref_models)

    torch.manual_seed(1)
    ref_d = ref_models.MultiPeriodDiscriminator()
    ref_d.eval()
    path = tmp_path / "D_test.pth"
    torch.save({"model": ref_d.state_dict()}, path)

    params = import_torch_discriminator(str(path))

    from mb_istft_vits_tpu.models import MultiPeriodDiscriminator

    y = rng.randn(1, 1024, 1).astype(np.float32) * 0.1
    y_hat = rng.randn(1, 1024, 1).astype(np.float32) * 0.1
    disc = MultiPeriodDiscriminator()
    outs = disc.apply({"params": params}, jnp.asarray(y), jnp.asarray(y_hat))
    with torch.no_grad():
        ref_outs = ref_d(torch.from_numpy(y.transpose(0, 2, 1)),
                         torch.from_numpy(y_hat.transpose(0, 2, 1)))
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(outs[0][i]).reshape(-1),
            ref_outs[0][i].numpy().reshape(-1), atol=2e-4,
        )
