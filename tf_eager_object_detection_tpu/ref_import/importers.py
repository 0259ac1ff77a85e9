"""Checkpoint importers: keras .h5 / slim-TF ckpt / raw dict -> flax params.

Reproduces the reference import paths (SURVEY.md §3.5):
- `load_keras_h5`: keras-applications weight files by layer name (the
  reference's pretrained-backbone path, resnet_faster_rcnn.py:122-131).
- `load_tf_checkpoint_dict`: read a TF checkpoint into {name: ndarray}
  (requires tensorflow, gated import); combine with a name map from
  ref_import.name_maps and `apply_name_map` for the tf-faster-rcnn /
  FPN_Tensorflow / slim-vgg import paths.
- `apply_name_map`: pure-numpy application of a {prefix: (module, layer)}
  map onto the params pytree — BGR conv1 flip (vgg16_faster_rcnn.py:378-383)
  and zero-bias fill for slim convs (resnet_faster_rcnn.py:385-388)
  included.
"""

from __future__ import annotations

import copy
from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "load_keras_h5",
    "load_tf_checkpoint_dict",
    "apply_name_map",
]

_BN_SUFFIXES = {
    "gamma": "gamma",
    "beta": "beta",
    "moving_mean": "moving_mean",
    "moving_variance": "moving_variance",
}


def _reshape_to(value: np.ndarray, target_shape) -> np.ndarray:
    value = np.asarray(value)
    if tuple(value.shape) == tuple(target_shape):
        return value
    if value.size == int(np.prod(target_shape)):
        # e.g. slim fc6 conv weights [7,7,512,4096] -> Dense [25088, 4096]
        return value.reshape(target_shape)
    raise ValueError(f"shape mismatch: {value.shape} vs {target_shape}")


def apply_name_map(
    params: Dict,
    tensors: Mapping[str, np.ndarray],
    name_map: Mapping[str, Tuple[str, str]],
    bgr_flip_layers: Tuple[Tuple[str, str], ...] = (),
    strict: bool = True,
) -> Dict:
    """Write checkpoint tensors into a (copied) params pytree.

    tensors: flat {ckpt_name: array}; name_map: {prefix: (module, layer)}.
    bgr_flip_layers: layers whose conv kernel input channels are reversed
    (RGB-trained conv1 consuming BGR input).
    """
    params = copy.deepcopy(params)
    for prefix, (module, layer) in name_map.items():
        target = params[module].get(layer)
        if target is None:
            if strict:
                raise KeyError(f"params[{module}] has no layer {layer}")
            continue
        if "gamma" in target:  # FrozenBatchNorm
            for suffix, pname in _BN_SUFFIXES.items():
                name = prefix + suffix
                if name not in tensors:
                    raise KeyError(f"missing {name}")
                target[pname] = _reshape_to(tensors[name], target[pname].shape)
        else:
            wname = prefix + "weights"
            if wname not in tensors:
                raise KeyError(f"missing {wname}")
            kernel = np.asarray(tensors[wname])
            if (module, layer) in bgr_flip_layers:
                kernel = kernel[:, :, ::-1, :]
            target["kernel"] = _reshape_to(kernel, target["kernel"].shape)
            if "bias" in target:
                bname = prefix + "biases"
                if bname in tensors:
                    target["bias"] = _reshape_to(tensors[bname], target["bias"].shape)
                else:  # slim convs have no biases -> zeros
                    target["bias"] = np.zeros_like(np.asarray(target["bias"]))
    return params


def load_tf_checkpoint_dict(ckpt_path: str) -> Dict[str, np.ndarray]:
    """TF checkpoint -> flat {var_name/: ndarray} (needs tensorflow)."""
    try:
        from tensorflow.python.training import py_checkpoint_reader

        reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "reading TF checkpoints requires tensorflow; alternatively "
            "convert the checkpoint to a pickle/npz dict offline"
        ) from e
    out = {}
    for name in reader.get_variable_to_shape_map():
        out[name] = reader.get_tensor(name)
    # allow prefix+suffix lookups without the ':0'
    return out


def load_keras_h5(params: Dict, h5_path: str, modules: Tuple[str, ...]) -> Dict:
    """Load keras-applications .h5 weights by layer name into params.

    Walks each layer in params[module]; if the h5 file has a matching layer
    group, datasets are matched by suffix (kernel/bias/gamma/...). Layers
    without a match are left untouched (keras `by_name=True` semantics).
    """
    import h5py

    params = copy.deepcopy(params)
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for module in modules:
            for layer, ptree in params[module].items():
                if layer not in root:
                    continue
                group = root[layer]
                datasets: Dict[str, np.ndarray] = {}

                def visit(name, obj):
                    if hasattr(obj, "shape"):
                        datasets[name] = np.asarray(obj)

                group.visititems(visit)
                for pname in list(ptree.keys()):
                    suffix_map = {
                        "kernel": ("kernel:0", "W:0", "W_1:0"),
                        "bias": ("bias:0", "b:0", "b_1:0"),
                        "gamma": ("gamma:0",),
                        "beta": ("beta:0",),
                        "moving_mean": ("moving_mean:0",),
                        "moving_variance": ("moving_variance:0",),
                    }[pname]
                    for ds_name, value in datasets.items():
                        if any(ds_name.endswith(s) for s in suffix_map):
                            ptree[pname] = _reshape_to(value, ptree[pname].shape)
                            break
    return params
