"""Optimizer matching the reference trainer semantics (scripts/train.py:22-50).

- piecewise-constant LR over `learning_rate_multi_decay_steps` / `_lrs`
- SGD momentum 0.9, or Adam via cfg `optimizer_type='adam'`
  (`_get_default_optimizer`, train.py:43-50)
- bias gradients x2 when `learning_rate_bias_double` (train.py:29-36)
- L2 weight decay on trainable kernels via add_decayed_weights(2*wd)
  (keras l2(wd) penalty contributes grad 2*wd*w)
- frozen params (models/freeze.py) receive zero updates

Two implementations of the momentum path:

- the optax chain (`_make_chain_optimizer`) — four sequential stages
  (decay / bias-double / trace+scale / frozen-zero), which XLA compiles
  into multiple full passes over the ~25M f32 params (~8 ms/step of pure
  HBM traffic in the round-3 trace anatomy, BENCHLOG);
- a fused single-expression variant (`tpu_fused_optimizer`, default on)
  that computes the whole per-leaf update `(-lr) * (g + 2wd*p [*2 for
  bias] + mu*t)` in one tree_map so XLA emits ONE fusion per leaf (reads
  g/p/t, writes t'/p') — bit-identical math in the same operation order,
  pinned by tests/test_faster_rcnn.py::test_fused_optimizer_equivalence.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tf_eager_object_detection_tpu.models.freeze import (
    trainable_mask,
    weight_decay_mask,
)

__all__ = ["make_optimizer", "make_lr_schedule", "FusedMomentumState"]


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


class FusedMomentumState(NamedTuple):
    """State of the fused momentum optimizer: the velocity tree + LR-schedule
    step count (same information as the optax chain's TraceState +
    ScaleByScheduleState, flattened)."""

    trace: Any
    count: jax.Array


def _is_bias(path) -> bool:
    names = [getattr(k, "key", str(k)) for k in path]
    return bool(names) and names[-1] == "bias"


def _make_fused_momentum(cfg: Dict[str, Any], params, backbone: str, model_type: str):
    """Single-fusion SGD-momentum matching the optax chain bit-for-bit.

    Per trainable leaf, one expression producing (update, new_trace):
      u  = g + 2wd*p            (wdmask leaves; keras l2(wd) grad, train.py:37-42)
      u *= 2                    (bias leaves when learning_rate_bias_double)
      t' = u + mu*t             (optax.trace semantics)
      update = -lr(count) * t'  (scale_by_learning_rate semantics)
    Frozen leaves get zero updates; their grads are already zero (freeze.py
    stop_frozen_gradients) so their trace stays at its zero init, identical
    to the chain's behavior.
    """
    lr = make_lr_schedule(cfg)
    tmask = trainable_mask(params, backbone, model_type)
    wdmask = weight_decay_mask(params, backbone, model_type)
    wd2 = 2.0 * cfg["weight_decay"]
    mu = cfg["optimizer_momentum"]
    bias2 = bool(cfg.get("learning_rate_bias_double", False))

    def init(params):
        return FusedMomentumState(
            trace=jax.tree_util.tree_map(jnp.zeros_like, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update(grads, state: FusedMomentumState, params=None):
        if params is None:
            raise ValueError("fused momentum optimizer requires params")
        lr_t = lr(state.count)
        neg_lr = -lr_t

        def leaf_trace(path, g, p, t, wdm):
            u = g + wd2 * p if wdm else g
            if bias2 and _is_bias(path):
                u = u * 2.0
            return u + mu * t

        new_trace = jax.tree_util.tree_map_with_path(
            leaf_trace, grads, params, state.trace, wdmask
        )
        updates = jax.tree_util.tree_map(
            lambda t_new, tm: neg_lr * t_new if tm else jnp.zeros_like(t_new),
            new_trace,
            tmask,
        )
        count = optax.safe_int32_increment(state.count)
        return updates, FusedMomentumState(trace=new_trace, count=count)

    return optax.GradientTransformation(init, update)


def _make_chain_optimizer(cfg: Dict[str, Any], params, backbone: str, model_type: str):
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


def make_optimizer(cfg: Dict[str, Any], params, backbone: str, model_type: str = "faster_rcnn"):
    opt_type = cfg.get("optimizer_type", "momentum")
    if opt_type == "momentum" and cfg.get("tpu_fused_optimizer", True):
        return _make_fused_momentum(cfg, params, backbone, model_type)
    return _make_chain_optimizer(cfg, params, backbone, model_type)
