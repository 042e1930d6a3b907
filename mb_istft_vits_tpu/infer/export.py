"""Serialized serving artifacts (jax.export / versioned StableHLO).

A deployment story the reference lacks: its `.pth` checkpoints carry
weights only, so deployed numerics silently track whatever the model
code does at load time. Here `export_serving` snapshots the *compiled
computation itself* — the duration-probe and bucketed infer programs —
as versioned StableHLO (jax.export's compatibility-guaranteed format),
plus the generator params and a manifest. `load_serving` replays the
artifact bit-for-bit: later edits to the model code cannot change what
a deployed artifact computes.

Cross-platform lowering is supported: a CPU CI box can produce a TPU
serving artifact with ``platforms=("cpu", "tpu")`` — no TPU needed at
export time; XLA compiles the StableHLO on the target machine at load.

Artifact layout (one directory)::

    manifest.json            buckets, frontend config, jax/format versions
    params.npz               generator params ('/'-joined flat keys)
    probe_t{TB}.jaxexp       duration probe per text bucket
    infer_t{TB}_f{FB}.jaxexp infer program per (text, frame) bucket

CLI: scripts/export_serving.py.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mb_istft_vits_tpu.models import Synthesizer

_FORMAT = 1


def _flatten_params(params) -> Dict[str, np.ndarray]:
    from flax.traverse_util import flatten_dict

    return {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(params).items()}


def _unflatten_params(flat: Dict[str, np.ndarray]):
    from flax.traverse_util import unflatten_dict

    return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


def _scalar(v) -> float:
    """Plain Python float = WEAK-typed f32 scalar, at export and call
    time alike. Weak typing matters: live serving passes Python floats,
    and under compute_dtype=bf16 a weak scalar keeps `x * scale` in
    bf16 while a strong np.float32 would promote the whole tail to f32
    — diverging artifact numerics from the live module."""
    return float(v)


def export_serving(
    module,
    out_dir: str,
    pairs: Optional[Sequence[Tuple[int, int]]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Write a serving artifact for `module` (a SynthesisModule).

    pairs: (text_bucket, frame_bucket) program shapes to export; default
    mirrors `warmup()` — each text bucket with its expected output-frame
    bucket. platforms: jax.export lowering platforms (e.g.
    ``("cpu", "tpu")``); default = the current backend only.
    """
    from mb_istft_vits_tpu.infer.synthesis import _next_bucket

    if pairs is None:
        pairs = [
            (tb, _next_bucket(int(tb * module._frames_per_token),
                              module.FRAME_BUCKETS))
            for tb in module.TEXT_BUCKETS
        ]
    os.makedirs(out_dir, exist_ok=True)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)

    model = module.model
    multi_speaker = module.cfg.n_speakers > 0

    def probe_fn(params, x, x_lengths, sid, length_scale, noise_scale_w,
                 rng):
        return model.apply(
            {"params": params}, x, x_lengths, sid=sid,
            length_scale=length_scale, noise_scale_w=noise_scale_w,
            method=Synthesizer.predict_frames, rngs={"noise": rng},
        )

    def make_infer_fn(max_frames: int):
        def fn(params, x, x_lengths, sid, noise_scale, length_scale,
               noise_scale_w, rng):
            out = model.apply(
                {"params": params}, x, x_lengths, sid=sid,
                noise_scale=noise_scale, length_scale=length_scale,
                noise_scale_w=noise_scale_w, max_frames=max_frames,
                method=Synthesizer.infer, rngs={"noise": rng},
            )
            pcm = jnp.clip(out.o[..., 0].astype(jnp.float32), -1.0, 1.0)
            pcm16 = jnp.round(pcm * 32767.0).astype(jnp.int16)
            # plain tuple out: the artifact must not depend on this
            # package's pytree registrations to deserialize
            return pcm16, out.y_lengths

        return fn

    rng = jax.random.PRNGKey(0)
    sid = jnp.zeros((1,), jnp.int32) if multi_speaker else None
    files = []
    exported_pairs = []
    for tb, fb in pairs:
        x = jax.ShapeDtypeStruct((1, tb), jnp.int32)
        xl = jax.ShapeDtypeStruct((1,), jnp.int32)
        probe_path = f"probe_t{tb}.jaxexp"
        if not any(f == probe_path for f, _ in files):
            exp = jax.export.export(jax.jit(probe_fn), **kwargs)(
                module.params, x, xl, sid, _scalar(1.0), _scalar(0.8), rng)
            with open(os.path.join(out_dir, probe_path), "wb") as fh:
                fh.write(exp.serialize())
            files.append((probe_path, "probe"))
        infer_path = f"infer_t{tb}_f{fb}.jaxexp"
        exp = jax.export.export(jax.jit(make_infer_fn(fb)), **kwargs)(
            module.params, x, xl, sid, _scalar(0.667), _scalar(1.0),
            _scalar(0.8), rng)
        with open(os.path.join(out_dir, infer_path), "wb") as fh:
            fh.write(exp.serialize())
        files.append((infer_path, "infer"))
        exported_pairs.append([tb, fb])

    flat = _flatten_params(module.params)
    np.savez(os.path.join(out_dir, "params.npz"), **flat)
    # npz erases extension dtypes (bf16 loads back as void '|V2') —
    # record them so load can view-cast
    param_dtypes = {k: str(v.dtype) for k, v in flat.items()}

    d = module.data_cfg
    # the EFFECTIVE raw-text cleaners, mirroring SynthesisModule
    # .text_to_ids: raw Japanese goes through the serving cleaner, not
    # the config's training cleaners (which can't tokenize plain text) —
    # recorded at export time so the artifact tokenizes identically
    serving_cleaners = (["japanese_cleaners_revised"]
                        if d.text_module == "text_JP"
                        else list(d.text_cleaners))
    manifest = {
        "format": _FORMAT,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else
        [jax.devices()[0].platform],
        "pairs": exported_pairs,
        "param_dtypes": param_dtypes,
        "sampling_rate": d.sampling_rate,
        "hop_length": d.hop_length,
        "n_speakers": module.cfg.n_speakers,
        "frontend": {
            "text_module": d.text_module,
            "text_cleaners": list(d.text_cleaners),
            "serving_cleaners": serving_cleaners,
            "add_blank": d.add_blank,
            "cleaned_text": d.cleaned_text,
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


class ExportedServing:
    """Serve from an `export_serving` artifact: text -> waveform using
    only the serialized programs + params (model code never runs)."""

    def __init__(self, artifact_dir: str, seed: int = 0):
        self._rng = jax.random.PRNGKey(seed)
        with open(os.path.join(artifact_dir, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        if self.manifest["format"] != _FORMAT:
            raise ValueError(
                f"artifact format {self.manifest['format']} != {_FORMAT}")
        flat = np.load(os.path.join(artifact_dir, "params.npz"))
        dtypes = self.manifest.get("param_dtypes", {})
        loaded = {}
        for k in flat.files:
            a = flat[k]
            want = dtypes.get(k)
            if want is not None and str(a.dtype) != want:
                import ml_dtypes  # noqa: F401  (registers bf16 etc.)

                a = a.view(np.dtype(want))
            loaded[k] = a
        self.params = _unflatten_params(loaded)
        self.sampling_rate = self.manifest["sampling_rate"]
        self.hop_length = self.manifest["hop_length"]
        self._probe = {}
        self._infer = {}
        for tb, fb in self.manifest["pairs"]:
            p = os.path.join(artifact_dir, f"probe_t{tb}.jaxexp")
            # jit the deserialized module's call ONCE: Exported.call is a
            # staging callable that re-lowers and re-COMPILES on every
            # invocation (measured 224x live-serving latency when called
            # raw); under jit the compiled executable is cached per aval
            # and steady-state calls are a single cached dispatch
            if tb not in self._probe:
                with open(p, "rb") as fh:
                    self._probe[tb] = jax.jit(
                        jax.export.deserialize(fh.read()).call)
            with open(os.path.join(artifact_dir,
                                   f"infer_t{tb}_f{fb}.jaxexp"), "rb") as fh:
                self._infer[(tb, fb)] = jax.jit(
                    jax.export.deserialize(fh.read()).call)

    # -- frontend (the SAME host-side path as SynthesisModule) ----------
    def text_to_ids(self, text: str,
                    cleaned: Optional[bool] = None) -> np.ndarray:
        from mb_istft_vits_tpu.text import frontend_ids

        fe = self.manifest["frontend"]
        cleaned = fe["cleaned_text"] if cleaned is None else cleaned
        # raw text uses the SERVING cleaners recorded at export time
        # (mirrors SynthesisModule.text_to_ids's raw-Japanese override)
        cleaners = fe.get("serving_cleaners", fe["text_cleaners"])
        return np.asarray(
            frontend_ids(text, fe["text_module"], cleaners,
                         fe["add_blank"], cleaned),
            np.int32,
        )

    def _buckets_for(self, n_ids: int) -> Tuple[int, list]:
        tbs = sorted({tb for tb, _ in self._infer})
        fit = [tb for tb in tbs if tb >= n_ids]
        if not fit:
            raise ValueError(
                f"text of {n_ids} tokens exceeds every exported text "
                f"bucket {tbs}")
        tb = fit[0]
        fbs = sorted(fb for t, fb in self._infer if t == tb)
        return tb, fbs

    def synthesize(self, text: str, sid: Optional[int] = None,
                   noise_scale: float = 0.667, length_scale: float = 1.0,
                   noise_scale_w: float = 0.8, seed: Optional[int] = None,
                   cleaned: Optional[bool] = None):
        t0 = time.perf_counter()
        ids = self.text_to_ids(text, cleaned)
        tb, fbs = self._buckets_for(len(ids))
        x = np.zeros((1, tb), np.int32)
        x[0, : len(ids)] = ids
        xl = np.asarray([len(ids)], np.int32)
        sid_arr = (np.asarray([0 if sid is None else int(sid)], np.int32)
                   if self.manifest["n_speakers"] > 0 else None)
        # rolling rng like the live module's _next_rng: a fixed default
        # seed would draw identical noise for every request (same
        # prosody sample, byte-identical repeats); explicit seeds stay
        # deterministic
        if seed is not None:
            rng = jax.random.PRNGKey(seed)
        else:
            self._rng, rng = jax.random.split(self._rng)
        frames = int(np.asarray(self._probe[tb](
            self.params, x, xl, sid_arr, _scalar(length_scale),
            _scalar(noise_scale_w), rng))[0])
        fb = next((b for b in fbs if b >= frames), None)
        if fb is None:
            # the live SynthesisModule grows its bucket and retries here;
            # an artifact has a fixed program set, so truncating silently
            # would diverge from live serving — refuse instead
            raise ValueError(
                f"predicted {frames} frames exceeds every exported frame "
                f"bucket {fbs} for text bucket {tb}; re-export with larger "
                f"--pairs or lower length_scale")
        pcm16, y_lengths = self._infer[(tb, fb)](
            self.params, x, xl, sid_arr, _scalar(noise_scale),
            _scalar(length_scale), _scalar(noise_scale_w), rng)
        y_len = min(int(np.asarray(y_lengths)[0]), fb)
        audio = np.asarray(pcm16[0], np.float32)[: y_len * self.hop_length]
        audio = audio / 32767.0
        elapsed = time.perf_counter() - t0
        return audio, {
            "total": elapsed,
            "audio_seconds": len(audio) / self.sampling_rate,
            "rtf": elapsed / max(len(audio) / self.sampling_rate, 1e-9),
            "frame_bucket": fb,
        }


def load_serving(artifact_dir: str) -> ExportedServing:
    return ExportedServing(artifact_dir)
