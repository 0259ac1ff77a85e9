"""Optimizer matching the reference trainer semantics (scripts/train.py:22-50).

- piecewise-constant LR over `learning_rate_multi_decay_steps` / `_lrs`
- SGD momentum 0.9, or Adam via cfg `optimizer_type='adam'`
  (`_get_default_optimizer`, train.py:43-50)
- bias gradients x2 when `learning_rate_bias_double` (train.py:29-36)
- L2 weight decay on trainable kernels via add_decayed_weights(2*wd)
  (keras l2(wd) penalty contributes grad 2*wd*w)
- frozen params (models/freeze.py) receive zero updates
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from tf_eager_object_detection_tpu.models.freeze import (
    trainable_mask,
    weight_decay_mask,
)

__all__ = ["make_optimizer", "make_lr_schedule"]


def make_lr_schedule(cfg: Dict[str, Any]):
    lrs = list(cfg["learning_rate_multi_lrs"])
    steps = list(cfg["learning_rate_multi_decay_steps"])
    # tf.train.piecewise_constant keeps values[i] while step <= boundary[i]
    # (inclusive), so the switch lands on boundary+1; optax switches AT the
    # given step. Shift by one to match the reference exactly (oracle-pinned
    # in tests/test_reference_oracle_grad.py).
    scales = {int(s) + 1: lrs[i + 1] / lrs[i] for i, s in enumerate(steps)}
    return optax.piecewise_constant_schedule(lrs[0], scales)


def _bias_double():
    def update(updates, state, params=None):
        del params

        def f(path, u):
            names = [getattr(k, "key", str(k)) for k in path]
            return u * 2.0 if names and names[-1] == "bias" else u

        return jax.tree_util.tree_map_with_path(f, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def make_optimizer(cfg: Dict[str, Any], params, backbone: str, model_type: str = "faster_rcnn"):
    lr = make_lr_schedule(cfg)
    tmask = trainable_mask(params, backbone, model_type)
    wdmask = weight_decay_mask(params, backbone, model_type)
    chain = [
        optax.add_decayed_weights(2.0 * cfg["weight_decay"], mask=lambda p: wdmask),
    ]
    if cfg.get("learning_rate_bias_double", False):
        chain.append(_bias_double())
    opt_type = cfg.get("optimizer_type", "momentum")
    if opt_type == "adam":
        chain.append(optax.adam(lr))
    elif opt_type == "momentum":
        chain.append(optax.sgd(lr, momentum=cfg["optimizer_momentum"]))
    else:
        raise ValueError(
            f"optimizer_type={opt_type!r}: expected 'momentum' or 'adam'"
        )
    opt = optax.chain(*chain)
    # Zero out updates for frozen params (keras trainable=False).
    return optax.chain(
        opt,
        optax.masked(
            optax.set_to_zero(),
            lambda p: jax.tree_util.tree_map(lambda m: not m, tmask),
        ),
    )
