"""Checkpointing: orbax-based save/restore of (params, opt_state, step) and
an importer for the reference's PyTorch `.pth` layout.

Behavior contract: reference `utils.py:22-79` — G_<step>.pth / D_<step>.pth
with {model, iteration, optimizer, learning_rate}; lenient key-wise copy;
latest checkpoint by highest step. Here: orbax checkpoints per step under
<model_dir>/ckpt/<step>, plus `import_torch_generator/discriminator` so
public pretrained checkpoints (reference README.md:13) can be loaded for
parity tests.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax save/restore
# ---------------------------------------------------------------------------

_CKPTR = None  # persistent: keeps the orbax async write thread alive


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        # StandardCheckpointer IS an AsyncCheckpointer wrapper: save()
        # gathers the arrays to host synchronously (a collective under
        # multi-host) and runs the file write in a background thread
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(model_dir: str, step: int, state, wait: bool = True
                    ) -> str:
    """Save (params, opt_state, step) under model_dir/ckpt/<step>.

    wait=False returns once the arrays are gathered to host — the file
    write overlaps the next train steps (the trainer's periodic saves);
    wait=True blocks until the checkpoint is durable on disk (final and
    SIGTERM saves). Orbax finalizes via tmp-dir rename, so
    latest_checkpoint_step never sees a half-written step dir."""
    path = os.path.abspath(os.path.join(model_dir, "ckpt", str(step)))
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def wait_for_pending_checkpoint() -> None:
    """Block until any async save has finalized (call before exiting or
    before restoring from the same model dir)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def prune_checkpoints(model_dir: str, keep_last: int = 3,
                      keep_every: int = 25000,
                      keep_steps: tuple = ()) -> list:
    """Bound a long run's disk footprint: delete ckpt/<step> dirs except
    the newest `keep_last` and every multiple of `keep_every` (milestone
    checkpoints a later analysis can restore). A flagship checkpoint is
    ~0.9 GB (params + both optimizers' moments), so an unbounded
    200k-step run at eval-interval cadence would write ~10x the disk the
    reference's G/D .pth pair does (reference keeps every save too, but
    its utils.py latest_checkpoint_path only ever reads the newest).

    Only finalized step dirs are touched — orbax finalizes via tmp-dir
    rename, and the newest step (a possibly in-flight async save) is
    always in the kept set. `keep_steps` protects additional steps —
    the train loop passes the best-by-eval step (best_checkpoint_step)
    so a run that ends inside a GAN-dominant episode (the r4 200k run's
    120-140k MCD-24 window) never ships only the damaged latest weights.
    Returns the pruned step numbers."""
    root = os.path.join(model_dir, "ckpt")
    if not os.path.isdir(root):
        return []
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    keep = set(steps[-keep_last:] if keep_last else [])
    if keep_every:
        keep.update(s for s in steps if s % keep_every == 0)
    keep.update(int(s) for s in keep_steps)
    pruned = []
    for s in steps:
        if s not in keep:
            shutil.rmtree(os.path.join(root, str(s)), ignore_errors=True)
            pruned.append(s)
    return pruned


def record_best_checkpoint(model_dir: str, step: int, metric: str,
                           value: float) -> None:
    """Persist which checkpoint is best-by-eval (lower = better). Written
    by the train loop when an eval improves on the stored value; read by
    prune_checkpoints (protection) and by serving/eval tools via
    best_checkpoint_step. The reference ships only latest
    (utils.py:50-79) — its manual listening workflow papered over runs
    that end mid-GAN-episode; an objective eval lets us do better."""
    import json

    path = os.path.join(model_dir, "ckpt", "best.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"step": int(step), "metric": metric,
                   "value": float(value)}, f)
    os.replace(tmp, path)  # atomic: a reader never sees a partial file


def best_checkpoint_step(model_dir: str) -> Optional[dict]:
    """The recorded best-by-eval checkpoint ({step, metric, value}), or
    None. Only returns a step whose directory still exists."""
    import json

    path = os.path.join(model_dir, "ckpt", "best.json")
    if not os.path.exists(path):
        return None
    try:
        rec = json.load(open(path))
    except (ValueError, OSError):
        return None
    if not os.path.isdir(os.path.join(model_dir, "ckpt",
                                      str(int(rec.get("step", -1))))):
        return None
    return rec


def latest_checkpoint_step(model_dir: str) -> Optional[int]:
    root = os.path.join(model_dir, "ckpt")
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


def load_checkpoint(model_dir: str, step: int, target) -> Any:
    wait_for_pending_checkpoint()  # same-process async save may be in flight
    path = os.path.abspath(os.path.join(model_dir, "ckpt", str(step)))
    return _checkpointer().restore(path, target=target)


def load_generator_params(path: str) -> Any:
    """Generator params from an orbax checkpoint for serving — accepts a
    model dir (logs/<name>), its ckpt/ root, or a specific ckpt/<step>
    directory; picks the latest step for the first two. Restores without a
    target tree and returns the `params_g` subtree."""

    def _is_ckpt_dir(p: str) -> bool:
        # an orbax step directory carries its metadata files
        return os.path.isdir(p) and any(
            os.path.exists(os.path.join(p, m))
            for m in ("_CHECKPOINT_METADATA", "_METADATA", "manifest.ocdbt")
        )

    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "ckpt")):
        step = latest_checkpoint_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}/ckpt")
        path = os.path.join(path, "ckpt", str(step))
    elif os.path.isdir(path) and not _is_ckpt_dir(path):
        # a ckpt/ root (digit-named step subdirs that ARE checkpoints)
        steps = [int(d) for d in os.listdir(path)
                 if d.isdigit() and _is_ckpt_dir(os.path.join(path, d))]
        if not steps:
            raise FileNotFoundError(
                f"{path} is neither a model dir with ckpt/, a ckpt/ root, "
                f"nor an orbax checkpoint directory"
            )
        path = os.path.join(path, str(max(steps)))
    # Target-less restore MUST be forced to host numpy: orbax records the
    # saving run's device/sharding metadata per leaf, and replaying it
    # (a) fails outright on a different platform ("Device TPU v5 lite0
    # was not found in jax.local_devices()") and (b) on a remote-dispatch
    # runtime turns the restore into ~1800 per-leaf device placements
    # over the tunnel (observed: serving load hung for 20+ minutes).
    # The tree structure for the restore_args comes from the step dir's
    # _METADATA tree_metadata (the public metadata() API of the pytree
    # handler does not return the item tree); numpy leaves are exactly
    # what serving wants — it device-puts the params itself.
    import ast

    import orbax.checkpoint as ocp

    with open(os.path.join(path, "_METADATA")) as f:
        tree_meta = json.load(f)["tree_metadata"]
    restore_args: Dict[str, Any] = {}
    for key_str in tree_meta:
        keypath = ast.literal_eval(key_str)
        node = restore_args
        for k in keypath[:-1]:
            node = node.setdefault(k, {})
        node[keypath[-1]] = ocp.RestoreArgs(restore_type=np.ndarray)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        state = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    if "params_g" not in state:
        raise KeyError(f"checkpoint at {path} has no params_g "
                       f"(keys: {list(state)})")
    return state["params_g"]


# ---------------------------------------------------------------------------
# PyTorch .pth import
# ---------------------------------------------------------------------------

def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    # weights_only=True: reference .pth files are plain tensor dicts (+
    # scalars), which load fine without unpickling arbitrary objects —
    # and the documented use case is PUBLIC pretrained checkpoints, so
    # opting out of torch's safe loader would be an arbitrary-code-
    # execution hole on downloaded files
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^module\.", "", k)
        out[k] = v.detach().cpu().numpy()
    return out


def _conv1d_w(w: np.ndarray) -> np.ndarray:
    """torch [out, in, k] -> flax [k, in, out]."""
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _convT1d_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] -> our [k, in, out]."""
    return np.ascontiguousarray(w.transpose(2, 0, 1))


def _conv2d_w(w: np.ndarray) -> np.ndarray:
    """torch [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_torch_generator(path: str, cfg) -> Dict:
    """Map a reference G_*.pth state dict onto our Synthesizer param tree.

    Weight-normed torch convs store (weight_g, weight_v); our layers store
    (g, v) with g squeezed to a vector:
      Conv1d:          g [out,1,1] -> [out],  v [out,in,k] -> [k,in,out]
      ConvTranspose1d: g [in,1,1]  -> [in],   v [in,out,k] -> [k,in,out]
    """
    sd = _load_torch_state_dict(path)
    params: Dict = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    def plain_conv(dst, src):
        _set(params, dst + ("kernel",), _conv1d_w(take(src + ".weight")))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), take(src + ".bias"))

    def wn_conv(dst, src, transpose=False):
        if src + ".weight_v" in sd:
            v = take(src + ".weight_v")
            g = take(src + ".weight_g")
        else:
            # checkpoint saved after remove_weight_norm (the reference's
            # deploy path, models.py:299-306): plain .weight — refactor
            # back into (v, g) with g = ||w|| along torch dim=0 so the
            # reconstructed w = v * g / ||v|| equals w exactly
            v = take(src + ".weight")
            g = np.sqrt((v.astype(np.float64) ** 2)
                        .sum(axis=tuple(range(1, v.ndim)))).astype(v.dtype)
        if transpose:
            _set(params, dst + ("v",), _convT1d_w(v))
            _set(params, dst + ("g",), g.reshape(-1))  # per-in-channel
        else:
            _set(params, dst + ("v",), _conv1d_w(v))
            _set(params, dst + ("g",), g.reshape(-1))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), take(src + ".bias"))

    def layernorm(dst, src):
        _set(params, dst + ("gamma",), take(src + ".gamma"))
        _set(params, dst + ("beta",), take(src + ".beta"))

    def dds_conv(dst, src, n_layers=3):
        for i in range(n_layers):
            plain_conv(dst + (f"convs_sep_{i}",), f"{src}.convs_sep.{i}")
            plain_conv(dst + (f"convs_1x1_{i}",), f"{src}.convs_1x1.{i}")
            layernorm(dst + (f"norms_1_{i}",), f"{src}.norms_1.{i}")
            layernorm(dst + (f"norms_2_{i}",), f"{src}.norms_2.{i}")

    def wn_block(dst, src, n_layers, has_cond):
        if has_cond:
            wn_conv(dst + ("cond_layer",), f"{src}.cond_layer")
        for i in range(n_layers):
            wn_conv(dst + (f"in_layers_{i}",), f"{src}.in_layers.{i}")
            wn_conv(dst + (f"res_skip_layers_{i}",),
                    f"{src}.res_skip_layers.{i}")

    def conv_flow(dst, src):
        plain_conv(dst + ("pre",), f"{src}.pre")
        dds_conv(dst + ("convs",), f"{src}.convs")
        plain_conv(dst + ("proj",), f"{src}.proj")

    gin = cfg.gin_channels

    # ---- enc_p --------------------------------------------------------
    _set(params, ("enc_p", "emb", "embedding"), take("enc_p.emb.weight"))
    for i in range(cfg.n_layers):
        base = ("enc_p", "encoder", f"attn_layers_{i}")
        src = f"enc_p.encoder.attn_layers.{i}"
        for name in ("conv_q", "conv_k", "conv_v", "conv_o"):
            plain_conv(base + (name,), f"{src}.{name}")
        _set(params, base + ("emb_rel_k",), take(f"{src}.emb_rel_k"))
        _set(params, base + ("emb_rel_v",), take(f"{src}.emb_rel_v"))
        layernorm(("enc_p", "encoder", f"norm_layers_1_{i}"),
                  f"enc_p.encoder.norm_layers_1.{i}")
        layernorm(("enc_p", "encoder", f"norm_layers_2_{i}"),
                  f"enc_p.encoder.norm_layers_2.{i}")
        plain_conv(("enc_p", "encoder", f"ffn_layers_{i}", "conv_1"),
                   f"enc_p.encoder.ffn_layers.{i}.conv_1")
        plain_conv(("enc_p", "encoder", f"ffn_layers_{i}", "conv_2"),
                   f"enc_p.encoder.ffn_layers.{i}.conv_2")
    plain_conv(("enc_p", "proj"), "enc_p.proj")

    # ---- enc_q --------------------------------------------------------
    plain_conv(("enc_q", "pre"), "enc_q.pre")
    plain_conv(("enc_q", "proj"), "enc_q.proj")
    wn_block(("enc_q", "enc"), "enc_q.enc", 16, gin != 0)

    # ---- flow ---------------------------------------------------------
    for i in range(4):
        base = ("flow", f"coupling_{i}")
        src = f"flow.flows.{2 * i}"  # odd indices are Flip (no params)
        plain_conv(base + ("pre",), f"{src}.pre")
        plain_conv(base + ("post",), f"{src}.post")
        wn_block(base + ("enc",), f"{src}.enc", 4, gin != 0)

    # ---- duration predictor -------------------------------------------
    if cfg.use_sdp:
        _set(params, ("dp", "flows_0", "m"),
             take("dp.flows.0.m").reshape(-1))
        _set(params, ("dp", "flows_0", "logs"),
             take("dp.flows.0.logs").reshape(-1))
        for i in range(4):
            conv_flow(("dp", f"flows_cf_{i}"), f"dp.flows.{1 + 2 * i}")
        _set(params, ("dp", "post_flows_0", "m"),
             take("dp.post_flows.0.m").reshape(-1))
        _set(params, ("dp", "post_flows_0", "logs"),
             take("dp.post_flows.0.logs").reshape(-1))
        for i in range(4):
            conv_flow(("dp", f"post_flows_cf_{i}"),
                      f"dp.post_flows.{1 + 2 * i}")
        for name in ("pre", "proj", "post_pre", "post_proj"):
            plain_conv(("dp", name), f"dp.{name}")
        dds_conv(("dp", "convs"), "dp.convs")
        dds_conv(("dp", "post_convs"), "dp.post_convs")
        if gin:
            plain_conv(("dp", "cond"), "dp.cond")
    else:
        for name in ("conv_1", "conv_2", "proj"):
            plain_conv(("dp", name), f"dp.{name}")
        layernorm(("dp", "norm_1"), "dp.norm_1")
        layernorm(("dp", "norm_2"), "dp.norm_2")
        if gin:
            plain_conv(("dp", "cond"), "dp.cond")

    # ---- decoder ------------------------------------------------------
    trunk = ("dec", "trunk")
    wn_conv(trunk + ("conv_pre",), "dec.conv_pre")
    for i in range(len(cfg.upsample_rates)):
        wn_conv(trunk + (f"ups_{i}",), f"dec.ups.{i}", transpose=True)
    n_res = len(cfg.resblock_kernel_sizes) * len(cfg.upsample_rates)
    for i in range(n_res):
        base = trunk + (f"resblocks_{i}",)
        src = f"dec.resblocks.{i}"
        if cfg.resblock == "1":
            for j in range(3):
                wn_conv(base + (f"convs1_{j}",), f"{src}.convs1.{j}")
                wn_conv(base + (f"convs2_{j}",), f"{src}.convs2.{j}")
        else:
            for j in range(2):
                wn_conv(base + (f"convs_{j}",), f"{src}.convs.{j}")
        if gin and f"{src}.cond.weight" in sd:
            plain_conv(base + ("cond",), f"{src}.cond")
    kind = cfg.decoder_kind
    if kind == "istft":
        wn_conv(("dec", "conv_post"), "dec.conv_post")
    else:
        wn_conv(("dec", "subband_conv_post"), "dec.subband_conv_post")
    if kind == "ms_istft":
        wn_conv(("dec", "multistream_conv_post"), "dec.multistream_conv_post")
        consumed.add("dec.updown_filter")  # identity buffer, trace-time here
    if kind == "mb_istft":
        pass  # PQMF buffers are trace-time constants

    # ---- speaker embedding ---------------------------------------------
    if cfg.n_speakers > 1:
        _set(params, ("emb_g", "embedding"), take("emb_g.weight"))

    # buffers we intentionally don't import
    for k in list(sd):
        if k.endswith(("stft.window", "updown_filter", "analysis_filter",
                       "synthesis_filter")):
            consumed.add(k)

    leftover = sorted(set(sd) - consumed)
    if leftover:
        raise ValueError(f"unmapped torch keys: {leftover[:20]}"
                         f"{'...' if len(leftover) > 20 else ''}")
    return jax.tree.map(np.asarray, params)


def _get(tree: Dict, path: Tuple[str, ...]) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def export_torch_generator(params: Dict, cfg, path: str,
                           iteration: int = 0,
                           learning_rate: float = 2e-4) -> str:
    """Inverse of import_torch_generator: write our Synthesizer param tree
    as a reference-format G_*.pth ({model, iteration, learning_rate,
    optimizer}) loadable by the reference's lenient utils.load_checkpoint
    (utils.py:22-47) — for INFERENCE/fine-tune-from-weights use: we have
    no torch AdamW state to export, so `optimizer` is None and the
    reference loader must be called with optimizer=None (passing one
    would load_state_dict(None) and raise, same as its own
    `_fixed`-trainer weights-only semantics). Buffers (stft window, PQMF
    filters, updown_filter) are rebuilt by the reference modules'
    constructors and need not be exported."""
    import torch

    sd: Dict[str, "torch.Tensor"] = {}

    def put(key, arr):
        sd[key] = torch.from_numpy(np.ascontiguousarray(np.asarray(arr)))

    def plain_conv(src, dst):
        put(dst + ".weight", _get(params, src + ("kernel",)).transpose(2, 1, 0))
        node = _get_node(params, src)
        if "bias" in node:
            put(dst + ".bias", node["bias"])

    def wn_conv(src, dst, transpose=False):
        node = _get_node(params, src)
        v = np.asarray(node["v"])
        g = np.asarray(node["g"])
        if transpose:
            # ours [k, in, out] -> torch ConvTranspose1d [in, out, k]
            put(dst + ".weight_v", v.transpose(1, 2, 0))
            put(dst + ".weight_g", g.reshape(-1, 1, 1))
        else:
            # ours [k, in, out] -> torch Conv1d [out, in, k]
            put(dst + ".weight_v", v.transpose(2, 1, 0))
            put(dst + ".weight_g", g.reshape(-1, 1, 1))
        if "bias" in node:
            put(dst + ".bias", node["bias"])

    def _get_node(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    def layernorm(src, dst):
        put(dst + ".gamma", _get(params, src + ("gamma",)))
        put(dst + ".beta", _get(params, src + ("beta",)))

    def dds_conv(src, dst, n_layers=3):
        for i in range(n_layers):
            plain_conv(src + (f"convs_sep_{i}",), f"{dst}.convs_sep.{i}")
            plain_conv(src + (f"convs_1x1_{i}",), f"{dst}.convs_1x1.{i}")
            layernorm(src + (f"norms_1_{i}",), f"{dst}.norms_1.{i}")
            layernorm(src + (f"norms_2_{i}",), f"{dst}.norms_2.{i}")

    def wn_block(src, dst, n_layers, has_cond):
        if has_cond:
            wn_conv(src + ("cond_layer",), f"{dst}.cond_layer")
        for i in range(n_layers):
            wn_conv(src + (f"in_layers_{i}",), f"{dst}.in_layers.{i}")
            wn_conv(src + (f"res_skip_layers_{i}",),
                    f"{dst}.res_skip_layers.{i}")

    def conv_flow(src, dst):
        plain_conv(src + ("pre",), f"{dst}.pre")
        dds_conv(src + ("convs",), f"{dst}.convs")
        plain_conv(src + ("proj",), f"{dst}.proj")

    gin = cfg.gin_channels

    put("enc_p.emb.weight", _get(params, ("enc_p", "emb", "embedding")))
    for i in range(cfg.n_layers):
        base = ("enc_p", "encoder", f"attn_layers_{i}")
        dst = f"enc_p.encoder.attn_layers.{i}"
        for name in ("conv_q", "conv_k", "conv_v", "conv_o"):
            plain_conv(base + (name,), f"{dst}.{name}")
        put(f"{dst}.emb_rel_k", _get(params, base + ("emb_rel_k",)))
        put(f"{dst}.emb_rel_v", _get(params, base + ("emb_rel_v",)))
        layernorm(("enc_p", "encoder", f"norm_layers_1_{i}"),
                  f"enc_p.encoder.norm_layers_1.{i}")
        layernorm(("enc_p", "encoder", f"norm_layers_2_{i}"),
                  f"enc_p.encoder.norm_layers_2.{i}")
        plain_conv(("enc_p", "encoder", f"ffn_layers_{i}", "conv_1"),
                   f"enc_p.encoder.ffn_layers.{i}.conv_1")
        plain_conv(("enc_p", "encoder", f"ffn_layers_{i}", "conv_2"),
                   f"enc_p.encoder.ffn_layers.{i}.conv_2")
    plain_conv(("enc_p", "proj"), "enc_p.proj")

    plain_conv(("enc_q", "pre"), "enc_q.pre")
    plain_conv(("enc_q", "proj"), "enc_q.proj")
    wn_block(("enc_q", "enc"), "enc_q.enc", 16, gin != 0)

    for i in range(4):
        base = ("flow", f"coupling_{i}")
        dst = f"flow.flows.{2 * i}"
        plain_conv(base + ("pre",), f"{dst}.pre")
        plain_conv(base + ("post",), f"{dst}.post")
        wn_block(base + ("enc",), f"{dst}.enc", 4, gin != 0)

    if cfg.use_sdp:
        put("dp.flows.0.m", _get(params, ("dp", "flows_0", "m")))
        put("dp.flows.0.logs", _get(params, ("dp", "flows_0", "logs")))
        for i in range(4):
            conv_flow(("dp", f"flows_cf_{i}"), f"dp.flows.{1 + 2 * i}")
        put("dp.post_flows.0.m", _get(params, ("dp", "post_flows_0", "m")))
        put("dp.post_flows.0.logs",
            _get(params, ("dp", "post_flows_0", "logs")))
        for i in range(4):
            conv_flow(("dp", f"post_flows_cf_{i}"),
                      f"dp.post_flows.{1 + 2 * i}")
        for name in ("pre", "proj", "post_pre", "post_proj"):
            plain_conv(("dp", name), f"dp.{name}")
        dds_conv(("dp", "convs"), "dp.convs")
        dds_conv(("dp", "post_convs"), "dp.post_convs")
        if gin:
            plain_conv(("dp", "cond"), "dp.cond")
    else:
        for name in ("conv_1", "conv_2", "proj"):
            plain_conv(("dp", name), f"dp.{name}")
        layernorm(("dp", "norm_1"), "dp.norm_1")
        layernorm(("dp", "norm_2"), "dp.norm_2")
        if gin:
            plain_conv(("dp", "cond"), "dp.cond")

    trunk = ("dec", "trunk")
    wn_conv(trunk + ("conv_pre",), "dec.conv_pre")
    for i in range(len(cfg.upsample_rates)):
        wn_conv(trunk + (f"ups_{i}",), f"dec.ups.{i}", transpose=True)
    n_res = len(cfg.resblock_kernel_sizes) * len(cfg.upsample_rates)
    for i in range(n_res):
        base = trunk + (f"resblocks_{i}",)
        dst = f"dec.resblocks.{i}"
        node = _get_node(params, base)
        if cfg.resblock == "1":
            for j in range(3):
                wn_conv(base + (f"convs1_{j}",), f"{dst}.convs1.{j}")
                wn_conv(base + (f"convs2_{j}",), f"{dst}.convs2.{j}")
        else:
            for j in range(2):
                wn_conv(base + (f"convs_{j}",), f"{dst}.convs.{j}")
        if "cond" in node:
            plain_conv(base + ("cond",), f"{dst}.cond")
    kind = cfg.decoder_kind
    if kind == "istft":
        wn_conv(("dec", "conv_post"), "dec.conv_post")
    else:
        wn_conv(("dec", "subband_conv_post"), "dec.subband_conv_post")
    if kind == "ms_istft":
        wn_conv(("dec", "multistream_conv_post"),
                "dec.multistream_conv_post")

    if cfg.n_speakers > 1:
        put("emb_g.weight", _get(params, ("emb_g", "embedding")))

    torch.save(
        {"model": sd, "iteration": iteration,
         "learning_rate": learning_rate, "optimizer": None},
        path,
    )
    return path


def import_torch_discriminator(path: str) -> Dict:
    """Map a reference D_*.pth onto our MultiPeriodDiscriminator tree."""
    sd = _load_torch_state_dict(path)
    params: Dict = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    def wn1(dst, src):
        _set(params, dst + ("v",), _conv1d_w(take(src + ".weight_v")))
        _set(params, dst + ("g",), take(src + ".weight_g").reshape(-1))
        _set(params, dst + ("bias",), take(src + ".bias"))

    def wn2(dst, src):
        _set(params, dst + ("v",), _conv2d_w(take(src + ".weight_v")))
        _set(params, dst + ("g",), take(src + ".weight_g").reshape(-1))
        _set(params, dst + ("bias",), take(src + ".bias"))

    # discriminators.0 = S, 1..5 = P{2,3,5,7,11}
    for i in range(7):
        wn1(("disc_s", f"convs_{i}" if i < 6 else "conv_post"),
            f"discriminators.0.convs.{i}" if i < 6
            else "discriminators.0.conv_post")
    for pi, period in enumerate([2, 3, 5, 7, 11]):
        src = f"discriminators.{pi + 1}"
        for i in range(5):
            wn2((f"disc_p{period}", f"convs_{i}"), f"{src}.convs.{i}")
        wn2((f"disc_p{period}", "conv_post"), f"{src}.conv_post")

    leftover = sorted(set(sd) - consumed)
    if leftover:
        raise ValueError(f"unmapped torch keys: {leftover[:20]}")
    return jax.tree.map(np.asarray, params)
