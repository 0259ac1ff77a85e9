"""CLI wiring for third-party checkpoint import (parity-day entry points).

The reference evaluates imported tf-faster-rcnn / FPN_Tensorflow checkpoints
directly from its eval CLIs (scripts/eval_pascal.py:194-200,
eval_coco.py:224-238: `--use_tf_faster_rcnn_model`,
`--use_fpn_tensorflow_model`) and fetches keras-applications backbone weights
by URL+hash when training from scratch (resnet_faster_rcnn.py:9-28,122-131;
vgg16_faster_rcnn.py:348-355). This module gives our CLIs the same one-command
surface:

- `add_import_flags(parser)` — the flag set shared by eval/infer CLIs.
- `load_checkpoint_params(detector, ckpt, args)` — dispatch: orbax dir /
  params `.npz` / TF-checkpoint import via the name maps / keras `.h5`.
  Returns `(params, image_format)`; FPN_Tensorflow models were trained on RGB
  input, so that path flips the eval-image channel order exactly like the
  reference (eval_pascal.py:226 `image_format = 'rgb'`).
- `load_backbone_weights(detector, params, path_or_url)` — keras-applications
  `.h5` (local path, or URL downloaded with md5 verification like
  `tf.keras.utils.get_file`) into the backbone modules, for fresh training.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Tuple

__all__ = [
    "add_import_flags",
    "load_checkpoint_params",
    "load_backbone_weights",
    "KERAS_WEIGHT_URLS",
]

# keras-applications release files the reference pulls by URL+hash
# (resnet_faster_rcnn.py:9-28: notop md5 is WEIGHTS_HASHES[name][1];
# vgg16_faster_rcnn.py:348-355).
_KERAS_RESNET_BASE = (
    "https://github.com/keras-team/keras-applications/releases/download/resnet/"
)
_KERAS_VGG_BASE = (
    "https://github.com/fchollet/deep-learning-models/releases/download/v0.1/"
)
KERAS_WEIGHT_URLS: Dict[str, Tuple[str, str]] = {
    "vgg16": (
        _KERAS_VGG_BASE + "vgg16_weights_tf_dim_ordering_tf_kernels.h5",
        "64373286793e3c8b2b4e3219cbf3544b",
    ),
    "resnet50": (
        _KERAS_RESNET_BASE + "resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5",
        "4d473c1dd8becc155b73f8504c6f6626",
    ),
    "resnet101": (
        _KERAS_RESNET_BASE + "resnet101_weights_tf_dim_ordering_tf_kernels_notop.h5",
        "88cf7a10940856eca736dc7b7e228a21",
    ),
    "resnet152": (
        _KERAS_RESNET_BASE + "resnet152_weights_tf_dim_ordering_tf_kernels_notop.h5",
        "ee4c566cf9a93f14d82f913c2dc6dd0c",
    ),
}


def add_import_flags(parser):
    parser.add_argument(
        "--use_tf_faster_rcnn_model",
        action="store_true",
        help="CKPT is a tf-faster-rcnn TF checkpoint (vgg16/resnet backbones)",
    )
    parser.add_argument(
        "--use_fpn_tensorflow_model",
        action="store_true",
        help="CKPT is an FPN_Tensorflow TF checkpoint (resnet backbones; "
        "evaluates with RGB input like the reference)",
    )
    parser.add_argument(
        "--keras_h5",
        action="store_true",
        help="CKPT is a keras-applications .h5 file (backbone weights only; "
        "detection heads stay at init — for smoke tests, not mAP)",
    )
    return parser


def _keras_modules(detector) -> Tuple[str, ...]:
    """Modules the keras-applications file covers. For resnet C4 Faster R-CNN
    the conv5 stack lives in the RoI head and the reference loads it from the
    same notop file (resnet_faster_rcnn.py:161-185)."""
    if detector.model_type == "faster_rcnn" and detector.backbone.startswith(
        "resnet"
    ):
        return ("extractor", "roi_head")
    return ("extractor",)


def _backbone_depth(backbone: str) -> int:
    return int(backbone.replace("resnet", ""))


def load_checkpoint_params(detector, ckpt: str, args) -> Tuple[Dict, str]:
    """Resolve CKPT via the CLI flags -> (params pytree, eval image_format)."""
    import jax

    from tf_eager_object_detection_tpu.ref_import import name_maps
    from tf_eager_object_detection_tpu.ref_import.importers import (
        apply_name_map,
        load_keras_h5,
        load_tf_checkpoint_dict,
    )

    n_import_flags = sum(
        bool(getattr(args, f, False))
        for f in ("use_tf_faster_rcnn_model", "use_fpn_tensorflow_model", "keras_h5")
    )
    if n_import_flags > 1:
        raise ValueError("pass at most one third-party-checkpoint flag")

    def init():
        return jax.device_get(detector.init_params(jax.random.PRNGKey(0)))

    if getattr(args, "use_tf_faster_rcnn_model", False):
        if detector.model_type != "faster_rcnn":
            raise ValueError("--use_tf_faster_rcnn_model needs --model_type faster_rcnn")
        tensors = load_tf_checkpoint_dict(ckpt)
        if detector.backbone == "vgg16":
            name_map = name_maps.vgg16_tf_faster_rcnn_map()
        else:
            name_map = name_maps.resnet_tf_faster_rcnn_map(
                _backbone_depth(detector.backbone)
            )
        return apply_name_map(init(), tensors, name_map), "bgr"

    if getattr(args, "use_fpn_tensorflow_model", False):
        if detector.model_type != "fpn":
            raise ValueError("--use_fpn_tensorflow_model needs --model_type fpn")
        tensors = load_tf_checkpoint_dict(ckpt)
        name_map = name_maps.fpn_tensorflow_map(_backbone_depth(detector.backbone))
        return apply_name_map(init(), tensors, name_map), "rgb"

    if getattr(args, "keras_h5", False):
        return load_keras_h5(init(), ckpt, _keras_modules(detector)), None

    # default: our own checkpoints (orbax dir or params .npz)
    from tf_eager_object_detection_tpu.training.checkpoints import (
        CheckpointManager,
        load_params,
    )
    from tf_eager_object_detection_tpu.training.optimizer import make_optimizer
    from tf_eager_object_detection_tpu.training.train_step import TrainState

    if ckpt.endswith(".npz"):
        return load_params(ckpt), None
    import jax.numpy as jnp

    params = detector.init_params(jax.random.PRNGKey(0))
    opt = make_optimizer(detector.cfg, params, detector.backbone, detector.model_type)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(ckpt)
    if mgr.latest_step() is None:
        # restore() would silently return the random-init state
        raise FileNotFoundError(
            f"no orbax checkpoint steps under {ckpt!r} (pass the training "
            "--logs_dir, a step dir's parent, or a params .npz)"
        )
    state = mgr.restore(state)
    return state.params, None


def _download(url: str, dest: str, md5: str = "") -> str:
    """`tf.keras.utils.get_file` analogue: fetch once, verify md5 if known."""
    import urllib.request

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if not os.path.exists(dest):
        urllib.request.urlretrieve(url, dest)  # noqa: S310 - https release URL
    if md5:
        digest = hashlib.md5(open(dest, "rb").read()).hexdigest()
        if digest != md5:
            raise ValueError(f"{dest}: md5 {digest} != expected {md5}")
    return dest


def _is_tf_checkpoint(path: str) -> bool:
    """TF-Saver checkpoints are a `<path>.index` + `<path>.data-*` family
    (the `path` itself is a prefix, not a file)."""
    import glob as _glob

    return os.path.exists(path + ".index") or bool(
        _glob.glob(path + ".data-0000*")
    )


def load_backbone_weights(detector, params: Dict, path_or_url: str) -> Dict:
    """Fresh-training pretrained-backbone load.

    Accepts a keras-applications .h5 local file, an explicit https URL, the
    literal string 'keras' (resolve the reference's URL for the detector's
    backbone and download — requires network egress; local files don't), or
    a slim vgg_16 TF-Saver checkpoint prefix (the reference's alternative
    fresh-training init, vgg16_faster_rcnn.py:357-390: slim names mapped to
    backbone layers with the RGB->BGR input-channel flip on conv1_1).
    """
    from tf_eager_object_detection_tpu.ref_import.importers import load_keras_h5

    if _is_tf_checkpoint(path_or_url):
        if detector.backbone != "vgg16":
            raise ValueError(
                "slim TF-checkpoint backbone init is the reference's vgg16 "
                f"path (vgg16_faster_rcnn.py:357-390); got {detector.backbone}"
            )
        from tf_eager_object_detection_tpu.ref_import.importers import (
            apply_name_map,
            load_tf_checkpoint_dict,
        )
        from tf_eager_object_detection_tpu.ref_import.name_maps import (
            vgg16_slim_backbone_map,
        )

        tensors = load_tf_checkpoint_dict(path_or_url)
        return apply_name_map(
            params,
            tensors,
            vgg16_slim_backbone_map(),
            bgr_flip_layers=(("extractor", "block1_conv1"),),
        )

    path = path_or_url
    if path_or_url == "keras":
        url, md5 = KERAS_WEIGHT_URLS[detector.backbone]
        path = _download(
            url,
            os.path.join(
                os.path.expanduser("~"), ".cache", "tpu_od", os.path.basename(url)
            ),
            md5,
        )
    elif path_or_url.startswith("http://"):
        raise ValueError(
            "refusing plain-http backbone weights URL (no transport "
            "integrity): use https://, or append '#md5=<hex>' to pin a "
            "digest, or download manually and pass a local path"
        )
    elif path_or_url.startswith("https://"):
        # optional '#md5=<hex>' fragment pins a digest for arbitrary URLs
        url, _, frag = path_or_url.partition("#")
        md5 = frag[len("md5="):] if frag.startswith("md5=") else None
        if md5 is None:
            import warnings

            warnings.warn(
                f"downloading backbone weights from {url} WITHOUT checksum "
                "verification; append '#md5=<hex>' to the URL to verify",
                stacklevel=2,
            )
        path = _download(
            url,
            os.path.join(
                os.path.expanduser("~"),
                ".cache",
                "tpu_od",
                os.path.basename(url),
            ),
            md5,
        )
    return load_keras_h5(params, path, _keras_modules(detector))
