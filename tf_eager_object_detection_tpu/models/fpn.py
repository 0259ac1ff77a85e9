"""FPN detector (ResNet-50/101/152): multi-level TPU-native re-design.

Re-implements the reference's `BaseFPN` + `ResnetV1Fpn`
(`object_detection/model/fpn/base_fpn_model.py:202-276`,
`model/fpn/resnet_fpn.py`) with padded fixed shapes:

- extractor: multi-output ResNet (c2..c5) — `get_resnet_v1_extractor`
  (resnet_fpn.py:262-289),
- neck: 1x1 laterals, TF1-semantics bilinear upsample, **0.5/0.5 weighted
  fusion** (resnet_fpn.py:389,395,401), post-fusion 3x3 convs on p2..p4,
  p6 = stride-2 max pool of p5 (:346,383),
- shared RPN head over p2..p6 with the FPN score layout ([A, 2] per cell,
  base_fpn_model.py:429), one NMS over the concatenation of all levels,
- level assignment floor(4 + log2(sqrt(wh)/224)) clamped to [2, 5]
  (base_fpn_model.py:309-313). Instead of the reference's dynamic per-level
  gather + re-sort (:249-252), each roi is cropped from every level and the
  right one is selected by a one-hot over levels — static shapes, no
  reordering, identical numerics,
- RoI head: flatten -> fc1024 -> fc1024 -> heads (`ResnetRoiHead`,
  resnet_fpn.py:292-336; dropout disabled as in the reference :330-332).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tf_eager_object_detection_tpu.core.anchors import (
    make_level_anchors,
    valid_anchor_mask,
)
from tf_eager_object_detection_tpu.models.backbones.resnet import ResNetBackbone
from tf_eager_object_detection_tpu.models.heads import RpnHead
from tf_eager_object_detection_tpu.ops.losses import cls_loss, smooth_l1_loss
from tf_eager_object_detection_tpu.ops.prediction import Detections, post_ops_prediction
from tf_eager_object_detection_tpu.ops.region_proposal import region_proposal
from tf_eager_object_detection_tpu.ops.roi_align import (
    max_pool_2x2_same,
    roi_crop_fpn,
)
from tf_eager_object_detection_tpu.ops.sampling import anchor_target, proposal_target

__all__ = ["FPNDetector", "ResnetFpnNeck", "FpnRoiHead", "resize_bilinear_tf1"]

_RESNET_DEPTHS = {"resnet50": 50, "resnet101": 101, "resnet152": 152}


def _tf1_interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """TF1 resize_bilinear (align_corners=False) weights [out, in].

    Legacy semantics: sample at i * in/out (no half-pixel offset), clamped.
    """
    scale = in_size / out_size
    coords = np.arange(out_size, dtype=np.float64) * scale
    cells = np.arange(in_size, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(coords[:, None] - cells[None, :]))
    # clamp: coords beyond in_size-1 keep full weight on the last cell
    w[coords >= in_size - 1, :] = 0.0
    w[coords >= in_size - 1, in_size - 1] = 1.0
    return w.astype(np.float32)


def resize_bilinear_tf1(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., out_h, out_w, C] with TF1 legacy semantics."""
    h, w = x.shape[-3], x.shape[-2]
    wy = jnp.asarray(_tf1_interp_matrix(out_h, h))
    wx = jnp.asarray(_tf1_interp_matrix(out_w, w))
    x = jnp.einsum("oh,...hwc->...owc", wy, x)
    return jnp.einsum("pw,...owc->...opc", wx, x)


class ResnetFpnNeck(nn.Module):
    """(c2, c3, c4, c5) -> (p2, p3, p4, p5, p6). resnet_fpn.py:339-407."""

    top_down_dims: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c2, c3, c4, c5 = inputs
        conv = functools.partial(
            nn.Conv,
            self.top_down_dims,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
        )
        p5 = conv((1, 1), name="build_p5")(c5)
        # p6: stride-2 max pool with pool_size 1 == subsample every other px
        p6 = p5[:, ::2, ::2, :]

        def fuse(p_up, c, name):
            up = resize_bilinear_tf1(p_up, c.shape[-3], c.shape[-2])
            lat = conv((1, 1), name=f"build_{name}_reduce_dims")(c)
            return up * 0.5 + lat * 0.5

        p4 = fuse(p5, c4, "p4")
        p3 = fuse(p4, c3, "p3")
        p2 = fuse(p3, c2, "p2")
        p4 = conv((3, 3), padding="SAME", name="build_p4")(p4)
        p3 = conv((3, 3), padding="SAME", name="build_p3")(p3)
        p2 = conv((3, 3), padding="SAME", name="build_p2")(p2)
        return p2, p3, p4, p5, p6


class FpnRoiHead(nn.Module):
    """[N, 7, 7, 256] -> (scores [N, C], deltas [N, 4C]). resnet_fpn.py:292-336."""

    num_classes: int = 21
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        n = x.shape[0]
        x = x.reshape(n, -1)
        x = nn.relu(nn.Dense(1024, name="fc1", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(1024, name="fc2", dtype=self.dtype)(x))
        x = x.astype(jnp.float32)
        score = nn.Dense(
            self.num_classes,
            name="roi_head_score",
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        boxes = nn.Dense(
            4 * self.num_classes,
            name="roi_head_bboxes",
            kernel_init=nn.initializers.normal(0.001),
        )(x)
        return score, boxes


class FPNDetector:
    """Multi-level two-stage detector with the reference FPN semantics."""

    model_type = "fpn"

    def __init__(self, backbone: str, config: Dict[str, Any]):
        self.cfg = dict(config)
        self.backbone = backbone
        cfg = self.cfg
        self.num_classes = cfg["num_classes"]
        self.strides = list(cfg["anchor_stride_list"])
        self.base_sizes = list(cfg["base_anchor_size_list"])
        self.min_level = cfg["min_level"]
        self.max_level = cfg["max_level"]
        self.num_anchors = len(cfg["ratios"]) * len(cfg["scales"])
        impl = cfg.get("tpu_roi_align_impl", "einsum")
        if impl not in ("einsum", "pallas", "pallas_interpret", "auto"):
            raise ValueError(
                f"tpu_roi_align_impl={impl!r}: expected one of "
                "'einsum', 'pallas', 'pallas_interpret', 'auto'"
            )
        self.compute_dtype = (
            jnp.bfloat16
            if cfg.get("tpu_compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        if cfg.get("tpu_fpn_backbone_style", "keras") == "slim":
            from tf_eager_object_detection_tpu.models.backbones.resnet import (
                SlimResNetBackbone,
            )

            self.extractor = SlimResNetBackbone(
                depth=_RESNET_DEPTHS[backbone], dtype=self.compute_dtype
            )
        else:
            self.extractor = ResNetBackbone(
                depth=_RESNET_DEPTHS[backbone],
                return_stages=("c2", "c3", "c4", "c5"),
                include_c5=True,
                dtype=self.compute_dtype,
            )
        self.neck = ResnetFpnNeck(
            top_down_dims=cfg["top_down_dims"], dtype=self.compute_dtype
        )
        self.rpn_head = RpnHead(
            num_anchors=self.num_anchors, box_init_std=0.001,
            dtype=self.compute_dtype,
        )
        self.roi_head = FpnRoiHead(
            num_classes=self.num_classes, dtype=self.compute_dtype
        )
        self._anchor_cache: dict = {}

    def init_params(self, rng, image_size=(64, 64)):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        variables = self.extractor.init(r1, dummy)
        p_ext = variables["params"]
        c_shapes = jax.eval_shape(
            lambda p, x: self.extractor.apply({"params": p}, x), p_ext, dummy
        )
        p_neck = self.neck.init(
            r2, tuple(jnp.zeros(s.shape, s.dtype) for s in c_shapes)
        )["params"]
        td = self.cfg["top_down_dims"]
        p_rpn = self.rpn_head.init(r3, jnp.zeros((1, 4, 4, td)))["params"]
        p_roi = self.roi_head.init(r4, jnp.zeros((1, 7, 7, td)))["params"]
        return {
            "extractor": p_ext,
            "neck": p_neck,
            "rpn_head": p_rpn,
            "roi_head": p_roi,
        }

    # --------------------------------------------------------------- anchors
    def anchors_for_grids(self, grids) -> np.ndarray:
        """grids: tuple of (gh, gw) per level -> concat [A_total, 4]."""
        key = tuple(grids)
        if key not in self._anchor_cache:
            per_level = [
                make_level_anchors(
                    self.base_sizes[i],
                    self.cfg["scales"],
                    self.cfg["ratios"],
                    gh,
                    gw,
                    self.strides[i],
                )
                for i, (gh, gw) in enumerate(grids)
            ]
            self._anchor_cache[key] = np.concatenate(per_level, axis=0)
        return self._anchor_cache[key]

    def _level_valid_mask(self, grids, image_hw):
        """Concatenated anchor-validity over all level grids (traced hw)."""
        h, w = image_hw[0], image_hw[1]
        masks = []
        for i, (gh, gw) in enumerate(grids):
            s = self.strides[i]
            masks.append(
                valid_anchor_mask(
                    gh, gw, self.num_anchors, (h + s - 1) // s, (w + s - 1) // s
                )
            )
        return jnp.concatenate(masks, axis=0)

    # ----------------------------------------------------------- shared path
    def _backbone_neck_rpn(self, params, images):
        c_list = self.extractor.apply({"params": params["extractor"]}, images)
        p_list = self.neck.apply({"params": params["neck"]}, c_list)
        score_list, bbox_list = [], []
        for p in p_list:
            s, b = self.rpn_head.apply({"params": params["rpn_head"]}, p)
            score_list.append(s.astype(jnp.float32))
            bbox_list.append(b.astype(jnp.float32))
        return p_list, score_list, bbox_list

    @staticmethod
    def _flatten_levels(score_list, bbox_list):
        """Per-image flatten+concat: scores [A_total, 2], deltas [A_total, 4]."""
        scores = jnp.concatenate(
            [s.reshape(-1, 2) for s in score_list], axis=0
        )
        deltas = jnp.concatenate(
            [b.reshape(-1, 4) for b in bbox_list], axis=0
        )
        return scores, deltas

    def _proposals(self, scores2, deltas, anchors, avalid, image_hw, training,
                   grids=None):
        cfg = self.cfg
        probs = jax.nn.softmax(scores2, axis=-1)[:, 1]
        if training:
            pre, post = (
                cfg["rpn_proposal_train_pre_nms_sample_number"],
                cfg["rpn_proposal_train_after_nms_sample_number"],
            )
        else:
            pre, post = (
                cfg["rpn_proposal_test_pre_nms_sample_number"],
                cfg["rpn_proposal_test_after_nms_sample_number"],
            )
        if grids is not None and cfg.get("tpu_fpn_per_level_prenms", False):
            # Index-exact pre-NMS reduction: the global top-`pre` of the
            # level concatenation (reference semantics — it sorts the
            # concat, base_fpn_model.py:202-276) is a subset of the union
            # of per-level top-`pre` sets, so selecting per level first
            # shrinks the expensive ordering op from A_total (~163k at the
            # stock bucket) to ~sum(min(pre, A_level)) (~34k) with zero
            # semantic delta. Tie order is preserved too: per-level top_k
            # breaks score ties index-ascending and the reduced array is
            # level-major, so equal-score candidates keep their original
            # concat order for the inner top_k (pinned by oracle test).
            sizes = [gh * gw * self.num_anchors for gh, gw in grids]
            if pre < deltas.shape[0] and len(sizes) > 1:
                masked = jnp.where(avalid, probs, -jnp.inf)
                cand, off = [], 0
                for n in sizes:
                    kk = min(pre, n)
                    _, li = jax.lax.top_k(
                        jax.lax.slice_in_dim(masked, off, off + n), kk
                    )
                    cand.append(li.astype(jnp.int32) + off)
                    off += n
                cand = jnp.concatenate(cand)
                deltas = deltas[cand]
                anchors = jnp.asarray(anchors)[cand]
                probs = probs[cand]
                avalid = avalid[cand]
        return region_proposal(
            deltas,
            anchors,
            probs,
            avalid,
            image_hw[0],
            image_hw[1],
            num_post_nms=post,
            nms_iou_threshold=cfg["rpn_proposal_nms_iou_threshold"],
            num_pre_nms=min(pre, deltas.shape[0]),
            target_means=cfg["rpn_proposal_means"],
            target_stds=cfg["rpn_proposal_stds"],
            clip_deltas=not cfg.get("strict_reference_parity", False),
        )

    def _roi_levels(self, rois):
        """Pyramid level per roi: floor(4 + log2(sqrt(wh)/224)) clamped
        (base_fpn_model.py:309-313). rois: [..., 4] xyxy."""
        wq = jnp.maximum(0.0, rois[..., 2] - rois[..., 0])
        hq = jnp.maximum(0.0, rois[..., 3] - rois[..., 1])
        levels = jnp.floor(4.0 + jnp.log2(jnp.sqrt(wq * hq + 1e-8) / 224.0))
        return jnp.clip(levels, self.min_level, self.max_level).astype(jnp.int32)

    def _use_pallas_roi_align(self, training: bool = False) -> bool:
        impl = self.cfg.get("tpu_roi_align_impl", "einsum")
        if impl == "auto":
            # Measured (BENCHLOG.md round 3 eval re-contest): the fused
            # windowed kernel wins eval even vs large_first einsum
            # (predict b4 f32: 63.0 vs 72.8 ms/step; b8 bf16: 93.6 vs
            # 118.3) but loses training (the custom_vjp backward pays the
            # einsum transpose either way), so 'auto' is phase-aware.
            return jax.default_backend() == "tpu" and not training
        return impl in ("pallas", "pallas_interpret")

    def _pallas_interpret(self) -> bool:
        return self.cfg.get("tpu_roi_align_impl") == "pallas_interpret"

    def _pallas_window_dtype(self):
        import jax.numpy as _jnp

        name = self.cfg.get("tpu_roi_align_window_dtype", "float32")
        if name not in ("float32", "bfloat16"):
            raise ValueError(f"unknown tpu_roi_align_window_dtype {name!r}")
        return _jnp.bfloat16 if name == "bfloat16" else _jnp.float32

    def _pallas_window(self) -> int:
        return int(self.cfg.get("tpu_roi_align_window", 64))

    def _contract_order(self) -> str:
        """Einsum RoIAlign contraction order (ops/roi_align.py).

        FPN's 'auto' is large_first for BOTH compute dtypes — measured
        on-chip (BENCHLOG round 3 "FPN contraction order"): b1 train
        einsum f32 22.2 vs 20.5 img/s, bf16 23.3 vs 21.6. This differs
        from Faster R-CNN's dtype-conditional rule (w_first loses f32
        there): FPN contracts at pyramid-level shapes where keeping the
        smaller spatial axis in the [N,S,ax,C] intermediate wins in
        every measured regime.
        """
        mode = self.cfg.get("tpu_roi_align_contract", "auto")
        if mode == "auto":
            return "large_first"
        if mode not in ("h_first", "w_first", "large_first"):
            raise ValueError(f"unknown tpu_roi_align_contract {mode!r}")
        return mode

    def _roi_features(self, p_list_i, rois, image_hw, training: bool = False):
        """Level-assigned RoIAlign via one-hot select over levels.

        p_list_i: per-level [h, w, c] maps for ONE image (p2..p5 used).
        NOTE: only safe under jax.vmap on the einsum path; batched callers
        on the pallas path must use `_roi_features_batched`.
        """
        levels = self._roi_levels(rois)
        if self._use_pallas_roi_align(training):
            s2 = 2 * self.cfg["roi_pooling_size"]
            n_lvl = self.max_level - self.min_level + 1
            if self.cfg.get("tpu_roi_align_fused_levels", True):
                from tf_eager_object_detection_tpu.ops.pallas.roi_align_pallas import (
                    pallas_roi_align_multilevel,
                )

                total = pallas_roi_align_multilevel(
                    tuple(f[None] for f in p_list_i[:n_lvl]),
                    rois[None],
                    (levels - self.min_level)[None],
                    image_hw[0], image_hw[1], s2,
                    strides=self.strides[:n_lvl],
                    interpret=self._pallas_interpret(),
                    window_dtype=self._pallas_window_dtype(),
                    window=self._pallas_window(),
                )[0]
                return max_pool_2x2_same(total)
            from tf_eager_object_detection_tpu.ops.pallas.roi_align_pallas import (
                pallas_roi_align_window,
            )

            total = 0.0
            for i, lvl in enumerate(range(self.min_level, self.max_level + 1)):
                total = total + pallas_roi_align_window(
                    p_list_i[i], rois, levels == lvl,
                    image_hw[0], image_hw[1], s2,
                    interpret=self._pallas_interpret(),
                    level_stride=self.strides[i],
                    window_dtype=self._pallas_window_dtype(),
                    window=self._pallas_window(),
                )
            return max_pool_2x2_same(total)
        feats = 0.0
        for i, lvl in enumerate(range(self.min_level, self.max_level + 1)):
            crop = roi_crop_fpn(
                p_list_i[i], rois, image_hw[0], image_hw[1],
                self.cfg["roi_pooling_size"],
                level_stride=self.strides[i],
                order=self._contract_order(),
            )
            feats = feats + jnp.where(
                (levels == lvl)[:, None, None, None], crop, 0.0
            )
        return feats

    def _roi_features_batched(self, p_list, rois, image_hw, training: bool = False):
        """Batched level-assigned RoIAlign.

        p_list: per-level [B, h, w, c]; rois: [B, N, 4]; image_hw: [B, 2].
        Returns [B, N, ps, ps, C]. The pallas kernel cannot be vmapped
        (scalar prefetch + manual DMA), so it takes the batch directly via
        row folding; the einsum path is vmapped as before.
        """
        if not self._use_pallas_roi_align(training):
            if rois.shape[0] >= 4:
                # the einsum path's per-image [N, S, W, C] intermediate is
                # ~3.7 GB at P2 with 1000 test rois; vmap materializes it
                # for every image at once and OOMs HBM at eval batch 6
                # (measured). Sequential per-image crops cap the peak at
                # one image's worth.
                return jax.lax.map(
                    lambda args: self._roi_features(
                        args[0], args[1], args[2], training
                    ),
                    (tuple(p_list), rois, image_hw),
                )
            return jax.vmap(
                lambda pl_, r_, hw_: self._roi_features(pl_, r_, hw_, training)
            )(tuple(p_list), rois, image_hw)
        levels = self._roi_levels(rois)  # [B, N]
        s2 = 2 * self.cfg["roi_pooling_size"]
        n_lvl = self.max_level - self.min_level + 1
        if self.cfg.get("tpu_roi_align_fused_levels", True):
            from tf_eager_object_detection_tpu.ops.pallas.roi_align_pallas import (
                pallas_roi_align_multilevel,
            )

            total = pallas_roi_align_multilevel(
                tuple(p_list[:n_lvl]),
                rois,
                levels - self.min_level,
                image_hw[:, 0], image_hw[:, 1], s2,
                strides=self.strides[:n_lvl],
                interpret=self._pallas_interpret(),
                window_dtype=self._pallas_window_dtype(),
                window=self._pallas_window(),
            )
        else:
            from tf_eager_object_detection_tpu.ops.pallas.roi_align_pallas import (
                pallas_roi_align_window,
            )

            total = 0.0
            for i, lvl in enumerate(range(self.min_level, self.max_level + 1)):
                total = total + pallas_roi_align_window(
                    p_list[i], rois, levels == lvl,
                    image_hw[:, 0], image_hw[:, 1], s2,
                    interpret=self._pallas_interpret(),
                    level_stride=self.strides[i],
                    window_dtype=self._pallas_window_dtype(),
                    window=self._pallas_window(),
                )
        b, n = total.shape[:2]
        pooled = max_pool_2x2_same(total.reshape((b * n,) + total.shape[2:]))
        return pooled.reshape((b, n) + pooled.shape[1:])

    # ------------------------------------------------------------------ loss
    def loss_fn(self, params, images, image_hw, gt_boxes, gt_mask, gt_labels, rng):
        cfg = self.cfg
        b = images.shape[0]
        p_list, score_list, bbox_list = self._backbone_neck_rpn(params, images)
        grids = tuple((p.shape[1], p.shape[2]) for p in p_list)
        anchors = self.anchors_for_grids(grids)
        rngs = jax.random.split(rng, b)

        def per_image(score_i, bbox_i, hw_i, gt_i, gtm_i, gtl_i, rng_i):
            r_at, r_pt = jax.random.split(rng_i)
            scores2, deltas = self._flatten_levels(score_i, bbox_i)
            avalid = self._level_valid_mask(grids, hw_i)
            rois, roi_valid = self._proposals(
                scores2, deltas, anchors, avalid, hw_i, training=True,
                grids=grids,
            )
            at = anchor_target(
                anchors,
                gt_i,
                gtm_i,
                hw_i[0],
                hw_i[1],
                r_at,
                pos_iou_threshold=cfg["rpn_pos_iou_threshold"],
                neg_iou_threshold=cfg["rpn_neg_iou_threshold"],
                total_num_samples=cfg["rpn_total_sample_number"],
                max_pos_samples=cfg["rpn_pos_sample_max_number"],
                target_means=tuple(cfg["rpn_proposal_means"]),
                target_stds=tuple(cfg["rpn_proposal_stds"]),
            )
            rpn_cls = cls_loss(scores2, at.labels, at.labels >= 0)
            rpn_reg = smooth_l1_loss(
                deltas, at.bbox_targets, at.in_weights, at.out_weights,
                sigma=cfg["rpn_sigma"], dim=(0, 1),
            )
            pt = proposal_target(
                rois,
                roi_valid,
                gt_i,
                gtm_i,
                gtl_i,
                r_pt,
                num_classes=self.num_classes,
                pos_iou_threshold=cfg["roi_pos_iou_threshold"],
                neg_iou_threshold=cfg["roi_neg_iou_threshold"],
                total_num_samples=cfg["roi_total_sample_number"],
                max_pos_samples=cfg["roi_pos_sample_max_number"],
                target_means=tuple(cfg["roi_proposal_means"]),
                target_stds=tuple(cfg["roi_proposal_stds"]),
                strict_class_column=bool(
                    cfg.get("strict_reference_parity", False)
                ),
            )
            counts = {
                "num_proposals": jnp.sum(roi_valid.astype(jnp.float32)),
                "num_rpn_fg": jnp.sum((at.labels == 1).astype(jnp.float32)),
                "num_rpn_bg": jnp.sum((at.labels == 0).astype(jnp.float32)),
                "num_roi_fg": jnp.sum((pt.labels > 0).astype(jnp.float32)),
            }
            return rpn_cls, rpn_reg, pt, counts

        rpn_cls, rpn_reg, pt, counts = jax.vmap(per_image)(
            tuple(score_list),
            tuple(bbox_list),
            image_hw,
            gt_boxes,
            gt_mask,
            gt_labels,
            rngs,
        )
        roi_feats = self._roi_features_batched(
            tuple(p_list[: self.max_level - self.min_level + 1]),
            pt.rois,
            image_hw,
            training=True,
        )
        s = cfg["roi_total_sample_number"]
        roi_feats = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
        roi_scores, roi_deltas = self.roi_head.apply(
            {"params": params["roi_head"]}, roi_feats, train=True
        )
        roi_cls = cls_loss(roi_scores, pt.labels.reshape(-1))
        roi_reg = smooth_l1_loss(
            roi_deltas,
            pt.bbox_targets.reshape(b * s, -1),
            pt.in_weights.reshape(b * s, -1),
            pt.out_weights.reshape(b * s, -1),
            sigma=cfg["roi_sigma"],
            dim=(1,),
        )
        metrics = {
            "rpn_cls_loss": jnp.mean(rpn_cls),
            "rpn_reg_loss": jnp.mean(rpn_reg),
            "roi_cls_loss": roi_cls,
            "roi_reg_loss": roi_reg,
        }
        total = sum(metrics.values())
        metrics["total_loss"] = total
        for k, v in counts.items():
            metrics[k] = jnp.mean(v)
        return total, metrics

    # --------------------------------------------------------------- predict
    def _rois_for_image(self, score_list_i, bbox_list_i, grids, image_hw):
        anchors = self.anchors_for_grids(grids)
        scores2, deltas = self._flatten_levels(score_list_i, bbox_list_i)
        avalid = self._level_valid_mask(grids, image_hw)
        return self._proposals(
            scores2, deltas, anchors, avalid, image_hw, training=False,
            grids=grids,
        )

    def _roi_forward(self, params, p_list_i, score_list_i, bbox_list_i, image_hw):
        grids = tuple((p.shape[0], p.shape[1]) for p in p_list_i)
        rois, roi_valid = self._rois_for_image(
            score_list_i, bbox_list_i, grids, image_hw
        )
        roi_feats = self._roi_features(
            p_list_i[: self.max_level - self.min_level + 1], rois, image_hw
        )
        roi_scores, roi_deltas = self.roi_head.apply(
            {"params": params["roi_head"]}, roi_feats, train=False
        )
        return rois, roi_valid, jax.nn.softmax(roi_scores, -1), roi_deltas

    @functools.partial(jax.jit, static_argnums=(0,))
    def predict(self, params, image, image_hw) -> Detections:
        cfg = self.cfg
        p_list, score_list, bbox_list = self._backbone_neck_rpn(params, image[None])
        rois, roi_valid, roi_softmax, roi_deltas = self._roi_forward(
            params,
            [p[0] for p in p_list],
            [s[0] for s in score_list],
            [b_[0] for b_ in bbox_list],
            image_hw,
        )
        return post_ops_prediction(
            roi_softmax,
            roi_deltas.reshape(-1, self.num_classes, 4),
            rois,
            roi_valid,
            image_hw[0],
            image_hw[1],
            target_means=tuple(cfg["roi_proposal_means"]),
            target_stds=tuple(cfg["roi_proposal_stds"]),
            max_num_per_class=cfg["max_objects_per_class_per_image"],
            max_num_per_image=cfg["max_objects_per_image"],
            nms_iou_threshold=cfg["prediction_nms_iou_threshold"],
            score_threshold=cfg["prediction_score_threshold"],
            min_edge=16.0,  # base_fpn_model.py:275 hardcodes stride 16
            num_classes=self.num_classes,
            clip_deltas=not cfg.get("strict_reference_parity", False),
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def im_detect_batch(self, params, images, image_hw, scales):
        """Batched im_detect: batched backbone/neck, vmapped proposal path,
        then one batched RoIAlign + head (pallas-compatible, see
        `_roi_features_batched`)."""
        p_list, score_list, bbox_list = self._backbone_neck_rpn(params, images)
        grids = tuple((p.shape[1], p.shape[2]) for p in p_list)

        def one(score_i, bbox_i, hw_i):
            return self._rois_for_image(list(score_i), list(bbox_i), grids, hw_i)

        rois, roi_valid = jax.vmap(one)(
            tuple(score_list), tuple(bbox_list), image_hw
        )
        roi_feats = self._roi_features_batched(
            tuple(p_list[: self.max_level - self.min_level + 1]), rois, image_hw
        )
        b, n = roi_feats.shape[:2]
        roi_scores, roi_deltas = self.roi_head.apply(
            {"params": params["roi_head"]},
            roi_feats.reshape((b * n,) + roi_feats.shape[2:]),
            train=False,
        )
        return (
            jax.nn.softmax(roi_scores, -1).reshape(b, n, -1),
            roi_deltas.reshape(b, n, self.num_classes, 4),
            rois / scales[:, None, None],
            roi_valid,
        )

    def predict_rpns(self, params, image, image_hw, gt_boxes, gt_mask, rng):
        """Positive RPN anchors for one image (debug API mirroring
        base_fpn_model.py:326-339). Returns (anchors [A,4], positive_mask [A])
        over the concatenation of all pyramid levels."""
        cfg = self.cfg
        p_list, _, _ = self._backbone_neck_rpn(params, image[None])
        grids = tuple((p.shape[1], p.shape[2]) for p in p_list)
        anchors = self.anchors_for_grids(grids)
        at = anchor_target(
            anchors, gt_boxes, gt_mask, image_hw[0], image_hw[1], rng,
            pos_iou_threshold=cfg["rpn_pos_iou_threshold"],
            neg_iou_threshold=cfg["rpn_neg_iou_threshold"],
            total_num_samples=cfg["rpn_total_sample_number"],
            max_pos_samples=cfg["rpn_pos_sample_max_number"],
        )
        return jnp.asarray(anchors), at.labels == 1

    def predict_rois(
        self, params, image, image_hw, gt_boxes, gt_mask, gt_labels, rng
    ):
        """Proposal-target training batch for one image (debug API mirroring
        base_fpn_model.py:341-362)."""
        cfg = self.cfg
        p_list, score_list, bbox_list = self._backbone_neck_rpn(
            params, image[None]
        )
        grids = tuple((p.shape[1], p.shape[2]) for p in p_list)
        rois, roi_valid = self._rois_for_image(
            [s[0] for s in score_list], [b_[0] for b_ in bbox_list],
            grids, image_hw,
        )
        return proposal_target(
            rois, roi_valid, gt_boxes, gt_mask, gt_labels, rng,
            num_classes=self.num_classes,
            pos_iou_threshold=cfg["roi_pos_iou_threshold"],
            neg_iou_threshold=cfg["roi_neg_iou_threshold"],
            total_num_samples=cfg["roi_total_sample_number"],
            max_pos_samples=cfg["roi_pos_sample_max_number"],
            target_means=tuple(cfg["roi_proposal_means"]),
            target_stds=tuple(cfg["roi_proposal_stds"]),
            strict_class_column=bool(cfg.get("strict_reference_parity", False)),
        )

    def test_one_image(
        self, params, img_path, preprocessing_type="caffe", image_format=None,
        predict_fn=None,
    ):
        """Load + preprocess + predict one image file (debug API; the
        faster_rcnn twin mirrors base_faster_rcnn_model.py:267-277)."""
        from tf_eager_object_detection_tpu.models.faster_rcnn import (
            test_one_image_impl,
        )

        return test_one_image_impl(
            self, params, img_path, preprocessing_type, image_format,
            predict_fn=predict_fn,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def im_detect(self, params, image, image_hw, scale):
        p_list, score_list, bbox_list = self._backbone_neck_rpn(params, image[None])
        rois, roi_valid, roi_softmax, roi_deltas = self._roi_forward(
            params,
            [p[0] for p in p_list],
            [s[0] for s in score_list],
            [b_[0] for b_ in bbox_list],
            image_hw,
        )
        return (
            roi_softmax,
            roi_deltas.reshape(-1, self.num_classes, 4),
            rois / scale,
            roi_valid,
        )
