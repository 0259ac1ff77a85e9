"""Serving export: AOT-compile `predict` to portable StableHLO artifacts.

The reference has no serving story (eager python + a live checkpoint).
For production deployment the TPU-native equivalent is `jax.export`: the
jitted `predict(image, image_hw)` is traced once per static image bucket
with the trained params baked in as constants, serialized to StableHLO,
and reloaded anywhere (same or newer jax, matching platform) without the
model code or checkpoint — the artifact IS the model.

Layout of an export directory:

    meta.json                    {model_type, backbone, num_classes,
                                  buckets, platforms, format_version}
    predict_{H}x{W}.stablehlo    one Exported blob per config bucket

`load_predict` reloads the blobs and returns a callable that dispatches on
the padded image shape and re-wraps the output as `Detections`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tf_eager_object_detection_tpu.ops.prediction import Detections

__all__ = ["export_predict", "load_predict"]

_FORMAT_VERSION = 1


def export_predict(
    detector,
    params,
    out_dir: str,
    platforms: Optional[Sequence[str]] = None,
    bake_params: bool = True,
) -> str:
    """Export jitted predict for every config image bucket.

    platforms: e.g. ("tpu",), ("cpu", "tpu") for a multi-platform artifact;
    None exports for the current default backend.

    bake_params=True (default) folds the trained params into the StableHLO
    as constants — the artifact IS the model, but weighs roughly the model
    size per bucket. bake_params=False exports `predict(params, image,
    image_hw)` with params as call INPUTS: the StableHLO shrinks ~1000x
    (program only), and the weights ship once as `params.npz` next to it.
    Prefer non-baked for multi-bucket exports and for transports with
    request-size caps (e.g. remote-compile tunnels; BENCHLOG round 2's
    HTTP 413 on a 548 MB baked artifact).

    Note: the FPN `tpu_roi_align_impl='auto'` setting normally resolves
    its einsum-vs-Pallas choice from `jax.default_backend()` at TRACE
    time. When `platforms` is given, export resolves 'auto' from the
    REQUESTED platforms instead (tpu-only -> 'pallas' — the kernel's
    measured serving win, BENCHLOG.md; any non-tpu platform -> 'einsum',
    since a baked Pallas kernel only runs on TPU), so exporting from a
    CPU host for TPU serving no longer silently bakes the slower path.
    An explicit 'pallas'/'einsum' setting is always honored.
    """
    os.makedirs(out_dir, exist_ok=True)
    if platforms and detector.cfg.get("tpu_roi_align_impl") == "auto":
        resolved_impl = (
            "pallas" if set(platforms) == {"tpu"} else "einsum"
        )
        # A FRESH detector, not a cfg mutation on the caller's: predict is
        # jitted with `self` static, so a mutated cfg would be defeated by
        # (and would pollute) any already-populated trace cache on the
        # caller's detector.
        detector = type(detector)(
            detector.backbone,
            {**detector.cfg, "tpu_roi_align_impl": resolved_impl},
        )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    buckets = [tuple(b) for b in detector.cfg["tpu_image_buckets"]]

    # NamedTuples need registration; plain tuples don't
    if bake_params:
        def fn(image, image_hw):
            return tuple(detector.predict(params, image, image_hw))

        def args_for(h, w):
            return (
                jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
                jax.ShapeDtypeStruct((2,), jnp.int32),
            )
    else:
        def fn(p, image, image_hw):
            return tuple(detector.predict(p, image, image_hw))

        p_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        )

        def args_for(h, w):
            return (
                p_spec,
                jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
                jax.ShapeDtypeStruct((2,), jnp.int32),
            )

        from tf_eager_object_detection_tpu.training.checkpoints import save_params

        save_params(os.path.join(out_dir, "params.npz"), jax.device_get(params))

    for h, w in buckets:
        exp = jax.export.export(
            jax.jit(fn),
            platforms=list(platforms) if platforms else None,
        )(*args_for(h, w))
        with open(
            os.path.join(out_dir, f"predict_{h}x{w}.stablehlo"), "wb"
        ) as f:
            f.write(exp.serialize())
    meta = {
        "format_version": _FORMAT_VERSION,
        "model_type": detector.model_type,
        "backbone": detector.backbone,
        "num_classes": detector.num_classes,
        "buckets": [list(b) for b in buckets],
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "params_baked": bake_params,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_predict(export_dir: str):
    """Load an export directory -> (predict callable, meta dict).

    The callable takes (padded_image [H, W, 3] f32, image_hw [2] i32) where
    (H, W) must be one of the exported buckets, and returns `Detections`.
    """
    with open(os.path.join(export_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported export format {meta.get('format_version')}")
    fns: Dict[Tuple[int, int], object] = {}
    for h, w in (tuple(b) for b in meta["buckets"]):
        with open(os.path.join(export_dir, f"predict_{h}x{w}.stablehlo"), "rb") as f:
            fns[(h, w)] = jax.export.deserialize(bytearray(f.read()))

    params = None
    if not meta.get("params_baked", True):
        from tf_eager_object_detection_tpu.training.checkpoints import load_params

        params = jax.tree_util.tree_map(
            jnp.asarray, load_params(os.path.join(export_dir, "params.npz"))
        )

    def predict(image, image_hw) -> Detections:
        key = tuple(int(d) for d in image.shape[:2])
        if key not in fns:
            raise ValueError(
                f"image shape {key} is not an exported bucket {sorted(fns)}"
            )
        if params is None:
            out = fns[key].call(jnp.asarray(image), jnp.asarray(image_hw))
        else:
            out = fns[key].call(params, jnp.asarray(image), jnp.asarray(image_hw))
        return Detections(*out)

    return predict, meta
