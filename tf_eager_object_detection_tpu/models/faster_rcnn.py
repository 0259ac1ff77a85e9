"""Faster R-CNN detector: jit-compiled train loss / predict / im_detect.

TPU-native re-design of the reference's `BaseFasterRcnn`
(`object_detection/model/faster_rcnn/base_faster_rcnn_model.py:126-306`).
Instead of an eager `call(training=?)` with dynamic shapes, the detector
exposes pure functions over padded fixed-shape tensors:

- `loss_fn(params, batch, rng)` — extractor -> RPN head -> (vmapped
  per-image) proposals + anchor/proposal targets -> RoI head -> 4 losses
  (+ L2), mirroring the training path at base_faster_rcnn_model.py:157-198.
- `predict(params, image, image_hw)` — the eval path (:179-198) ending in
  `post_ops_prediction`, returning padded Detections.
- `im_detect(params, image, image_hw, scale)` — raw-head outputs with rois
  rescaled by 1/scale (:279-306), used by the VOC/COCO eval writers.

Batching: the backbone/heads run batched on the MXU; the per-image detection
logic (NMS, target sampling, RoI crop) is vmapped over the batch axis. Image
tensors are padded to a static bucket shape; `image_hw` carries the valid
extent, and anchors over the padding are masked via score = -inf.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from tf_eager_object_detection_tpu.core.anchors import (
    generate_anchor_base,
    shift_anchor_base,
    valid_anchor_mask,
)
from tf_eager_object_detection_tpu.models.backbones.resnet import (
    ResNetBackbone,
    ResNetRoiHead,
)
from tf_eager_object_detection_tpu.models.backbones.vgg import (
    Vgg16Extractor,
    Vgg16RoiHead,
)
from tf_eager_object_detection_tpu.models.heads import (
    RpnHead,
    frcnn_score_logits,
    reshuffle_frcnn_scores,
)
from tf_eager_object_detection_tpu.ops.losses import cls_loss, smooth_l1_loss
from tf_eager_object_detection_tpu.ops.prediction import Detections, post_ops_prediction
from tf_eager_object_detection_tpu.ops.region_proposal import region_proposal
from tf_eager_object_detection_tpu.ops.roi_align import roi_crop_faster_rcnn
from tf_eager_object_detection_tpu.ops.sampling import anchor_target, proposal_target

__all__ = ["FasterRCNNDetector"]

_RESNET_DEPTHS = {"resnet50": 50, "resnet101": 101, "resnet152": 152}


def _is_concrete_array(x) -> bool:
    """True iff `x` is POSITIVELY identified as a concrete (non-traced)
    array. Used by `im_detect_batch` to pick the two-jit host path; any
    uncertain answer must return False so unknown types fall through to
    the single-program lax.map path, which cannot reinstate the b8-bf16
    TPU-runtime crash (see `im_detect_batch` docstring / BENCHLOG r4)."""
    if isinstance(x, (np.ndarray, np.generic)):
        return True
    if not isinstance(x, jax.Array):
        return False  # unknown/duck-typed object: not positively concrete
    # x is a jax.Array — but tracers are jax.Array instances too, so
    # discriminate explicitly. jax.core.is_concrete treats arbitrary
    # non-tracer OBJECTS as concrete, which is why it is only consulted
    # after the jax.Array gate above.
    is_concrete = getattr(jax.core, "is_concrete", None)
    if is_concrete is not None:
        try:
            return bool(is_concrete(x))
        except Exception:
            return False
    tracer_t = getattr(jax.core, "Tracer", None)
    return tracer_t is not None and not isinstance(x, tracer_t)


class FasterRCNNDetector:
    """Bundles flax modules + config + anchors; all compute paths are pure."""

    model_type = "faster_rcnn"

    def __init__(self, backbone: str, config: Dict[str, Any]):
        self.cfg = dict(config)
        self.backbone = backbone
        cfg = self.cfg
        self.num_classes = cfg["num_classes"]
        self.stride = cfg["extractor_stride"]
        self.compute_dtype = (
            jnp.bfloat16
            if cfg.get("tpu_compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        self.num_anchors = len(cfg["ratios"]) * len(cfg["scales"])
        self.anchor_base = generate_anchor_base(
            self.stride, cfg["ratios"], cfg["scales"]
        )

        if backbone == "vgg16":
            self.extractor = Vgg16Extractor(dtype=self.compute_dtype)
            self.roi_head = Vgg16RoiHead(
                num_classes=self.num_classes,
                keep_rate=cfg["roi_head_keep_dropout_rate"],
                dtype=self.compute_dtype,
            )
            self.roi_feature_channels = cfg["vgg16_roi_feature_size"][-1]
            self.roi_max_pooling = cfg["vgg16_roi_pooling_max_pooling_flag"]
        elif backbone in _RESNET_DEPTHS:
            self.extractor = ResNetBackbone(
                depth=_RESNET_DEPTHS[backbone], dtype=self.compute_dtype
            )
            self.roi_head = ResNetRoiHead(
                num_classes=self.num_classes, dtype=self.compute_dtype
            )
            self.roi_feature_channels = cfg["resnet_roi_feature_size"][-1]
            self.roi_max_pooling = cfg["resnet_roi_pooling_max_pooling_flag"]
        else:
            raise ValueError(f"unknown backbone {backbone}")
        self.rpn_head = RpnHead(
            num_anchors=self.num_anchors, dtype=self.compute_dtype
        )
        self._anchor_cache: dict = {}

    # ------------------------------------------------------------------ init
    def init_params(self, rng, image_size=(64, 64)):
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        p_ext = self.extractor.init(r1, dummy)["params"]
        feat_ch = 512 if self.backbone == "vgg16" else 1024
        p_rpn = self.rpn_head.init(r2, jnp.zeros((1, 4, 4, feat_ch)))["params"]
        p_roi = self.roi_head.init(
            r3, jnp.zeros((1, 7, 7, self.roi_feature_channels))
        )["params"]
        return {"extractor": p_ext, "rpn_head": p_rpn, "roi_head": p_roi}

    # --------------------------------------------------------------- anchors
    def anchors_for_grid(self, grid_h: int, grid_w: int) -> np.ndarray:
        # Cached as numpy so repeated traces fold it as a constant (a jnp
        # array created under one trace must not leak into another).
        key = (grid_h, grid_w)
        if key not in self._anchor_cache:
            self._anchor_cache[key] = shift_anchor_base(
                self.anchor_base, self.stride, grid_h, grid_w
            )
        return self._anchor_cache[key]

    def _contract_order(self) -> str:
        """RoIAlign einsum contraction order (see ops/roi_align.py).

        Measured on-chip (BENCHLOG round 3): w_first is +6.3% at b8-bf16
        (the copy-bound regime) but -17% at b1-f32, so 'auto' keys off the
        compute dtype.
        """
        mode = self.cfg.get("tpu_roi_align_contract", "auto")
        if mode == "auto":
            # 'large_first' resolves per feature-map shape, so it does the
            # right thing for both landscape and portrait buckets
            return (
                "large_first"
                if self.compute_dtype == jnp.bfloat16
                else "h_first"
            )
        if mode not in ("h_first", "w_first", "large_first"):
            raise ValueError(f"unknown tpu_roi_align_contract {mode!r}")
        return mode

    # ----------------------------------------------------------- shared path
    def _backbone_rpn(self, params, images):
        apply_extractor = lambda p, x: self.extractor.apply({"params": p}, x)
        if self.cfg.get("tpu_remat", False):
            # rematerialize backbone activations on the backward pass: trades
            # ~30% extra FLOPs for the memory to fit larger batches
            apply_extractor = jax.checkpoint(apply_extractor)
        feats = apply_extractor(params["extractor"], images)
        score_map, bbox_map = self.rpn_head.apply(
            {"params": params["rpn_head"]}, feats
        )
        # detection geometry runs in f32 regardless of the compute dtype
        return feats, score_map.astype(jnp.float32), bbox_map.astype(jnp.float32)

    def _proposals(
        self, score_map, bbox_map, anchors, image_hw, grid_hw, training: bool
    ):
        """Per-image proposal generation. score_map/bbox_map: [h, w, *]."""
        cfg = self.cfg
        h, w = image_hw[0], image_hw[1]
        gh, gw = grid_hw
        scores = reshuffle_frcnn_scores(score_map, self.num_anchors)
        deltas = bbox_map.reshape(-1, 4)
        avalid = valid_anchor_mask(
            gh, gw, self.num_anchors, (h + self.stride - 1) // self.stride,
            (w + self.stride - 1) // self.stride,
        )
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
        rois, roi_valid = region_proposal(
            deltas,
            anchors,
            scores,
            avalid,
            h,
            w,
            num_post_nms=post,
            nms_iou_threshold=cfg["rpn_proposal_nms_iou_threshold"],
            num_pre_nms=min(pre, deltas.shape[0]),
            target_means=cfg["rpn_proposal_means"],
            target_stds=cfg["rpn_proposal_stds"],
            clip_deltas=not cfg.get("strict_reference_parity", False),
        )
        return rois, roi_valid, avalid

    # ------------------------------------------------------------------ loss
    def loss_fn(self, params, images, image_hw, gt_boxes, gt_mask, gt_labels, rng):
        """Training losses for a padded batch.

        images: [B, Hp, Wp, 3] preprocessed+padded; image_hw: [B, 2] int32;
        gt_boxes: [B, G, 4] xyxy pixels; gt_mask: [B, G]; gt_labels: [B, G].
        Returns (total_loss, metrics dict).
        """
        cfg = self.cfg
        b = images.shape[0]
        feats, score_map, bbox_map = self._backbone_rpn(params, images)
        gh, gw = feats.shape[1], feats.shape[2]
        anchors = self.anchors_for_grid(gh, gw)
        rngs = jax.random.split(rng, b + 1)
        img_rngs, dropout_rng = rngs[:b], rngs[b]

        def per_image(feat_i, score_i, bbox_i, hw_i, gt_i, gtm_i, gtl_i, rng_i):
            r_at, r_pt = jax.random.split(rng_i)
            rois, roi_valid, _ = self._proposals(
                score_i, bbox_i, anchors, hw_i, (gh, gw), training=True
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
            rpn_logits = frcnn_score_logits(score_i, self.num_anchors)
            rpn_cls = cls_loss(rpn_logits, at.labels, at.labels >= 0)
            rpn_reg = smooth_l1_loss(
                bbox_i.reshape(-1, 4),
                at.bbox_targets,
                at.in_weights,
                at.out_weights,
                sigma=cfg["rpn_sigma"],
                dim=(0, 1),
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
            roi_feats = roi_crop_faster_rcnn(
                feat_i, pt.rois, self.stride, cfg["roi_pooling_size"],
                self.roi_max_pooling, order=self._contract_order(),
            )
            counts = {
                "num_proposals": jnp.sum(roi_valid.astype(jnp.float32)),
                "num_rpn_fg": jnp.sum((at.labels == 1).astype(jnp.float32)),
                "num_rpn_bg": jnp.sum((at.labels == 0).astype(jnp.float32)),
                "num_roi_fg": jnp.sum((pt.labels > 0).astype(jnp.float32)),
            }
            return rpn_cls, rpn_reg, roi_feats, pt, counts

        rpn_cls, rpn_reg, roi_feats, pt, counts = jax.vmap(per_image)(
            feats, score_map, bbox_map, image_hw, gt_boxes, gt_mask, gt_labels,
            img_rngs,
        )
        s = cfg["roi_total_sample_number"]
        roi_feats = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
        roi_scores, roi_deltas = self.roi_head.apply(
            {"params": params["roi_head"]},
            roi_feats,
            train=True,
            rngs={"dropout": dropout_rng},
        )
        labels = pt.labels.reshape(-1)
        roi_cls = cls_loss(roi_scores, labels)
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
        # debug count series (the reference's tf_logging.debug counters,
        # anchor_target.py:85 / region_proposal.py:78, as metrics)
        for k, v in counts.items():
            metrics[k] = jnp.mean(v)
        return total, metrics

    # ------------------------------------------------------------- debug APIs
    def predict_rpn(self, params, image, image_hw, gt_boxes, gt_mask, rng):
        """Positive RPN anchors for one image (debug API mirroring
        base_faster_rcnn_model.py:226-241). Returns (anchors [A,4],
        positive_mask [A])."""
        feats, _, _ = self._backbone_rpn(params, image[None])
        gh, gw = feats.shape[1], feats.shape[2]
        anchors = jnp.asarray(self.anchors_for_grid(gh, gw))
        cfg = self.cfg
        at = anchor_target(
            anchors, gt_boxes, gt_mask, image_hw[0], image_hw[1], rng,
            pos_iou_threshold=cfg["rpn_pos_iou_threshold"],
            neg_iou_threshold=cfg["rpn_neg_iou_threshold"],
            total_num_samples=cfg["rpn_total_sample_number"],
            max_pos_samples=cfg["rpn_pos_sample_max_number"],
        )
        return anchors, at.labels == 1

    def predict_roi(self, params, image, image_hw, gt_boxes, gt_mask, gt_labels, rng):
        """Proposal-target training batch for one image (debug API mirroring
        base_faster_rcnn_model.py:243-265)."""
        cfg = self.cfg
        feats, score_map, bbox_map = self._backbone_rpn(params, image[None])
        gh, gw = feats.shape[1], feats.shape[2]
        anchors = self.anchors_for_grid(gh, gw)
        rois, roi_valid, _ = self._proposals(
            score_map[0], bbox_map[0], anchors, image_hw, (gh, gw), training=True
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
        """Load + preprocess + predict one image file (debug API mirroring
        base_faster_rcnn_model.py:267-277). Host-side convenience."""
        return test_one_image_impl(
            self, params, img_path, preprocessing_type, image_format,
            predict_fn=predict_fn,
        )

    # --------------------------------------------------------------- predict
    def _roi_forward(self, params, feats, score_map, bbox_map, image_hw):
        """Single-image eval path up to raw RoI head outputs."""
        gh, gw = feats.shape[0], feats.shape[1]
        anchors = self.anchors_for_grid(gh, gw)
        rois, roi_valid, _ = self._proposals(
            score_map, bbox_map, anchors, image_hw, (gh, gw), training=False
        )
        roi_feats = roi_crop_faster_rcnn(
            feats, rois, self.stride, self.cfg["roi_pooling_size"],
            self.roi_max_pooling, order=self._contract_order(),
        )
        roi_scores, roi_deltas = self.roi_head.apply(
            {"params": params["roi_head"]}, roi_feats, train=False
        )
        roi_softmax = jax.nn.softmax(roi_scores, axis=-1)
        return rois, roi_valid, roi_softmax, roi_deltas

    @functools.partial(jax.jit, static_argnums=(0,))
    def predict(self, params, image, image_hw) -> Detections:
        """Single padded image [Hp, Wp, 3] -> padded Detections.

        Mirrors `call(training=False)` (base_faster_rcnn_model.py:179-198).
        """
        cfg = self.cfg
        feats, score_map, bbox_map = self._backbone_rpn(params, image[None])
        rois, roi_valid, roi_softmax, roi_deltas = self._roi_forward(
            params, feats[0], score_map[0], bbox_map[0], image_hw
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
            min_edge=float(self.stride),
            num_classes=self.num_classes,
            clip_deltas=not cfg.get("strict_reference_parity", False),
        )

    def im_detect_batch(self, params, images, image_hw, scales):
        """Batched im_detect: images [B, Hp, Wp, 3], image_hw [B, 2],
        scales [B] -> per-image stacked outputs. The backbone runs batched on
        the MXU; the per-image proposal/RoI path is vmapped.

        Two implementations, picked by calling context:

        - Host-called (the eval CLIs / batched_inference): TWO jitted
          programs (backbone+RPN, then the vmapped RoI stage). Fusing them
          as one program with the *vmapped* RoI stage deterministically
          kills the XLA:TPU runtime at batch 8 + bfloat16 compute. Round-4
          bisection (scripts/repro_b8_bf16_fused.py, BENCHLOG) localized
          the fault to the NMS->RoIAlign->RoI-head chain compiled together
          under vmap: proposals alone, crop alone, and the head alone all
          run fine; an optimization_barrier between crop and head HANGS the
          runtime instead. The split also lets GSPMD shard each stage's
          batch axis for --data_parallel eval. The extra dispatch is noise
          at eval cadence.

        - Traced under an OUTER jit/shard_map (serving export, user
          composition): the split would be inlined away, so instead the RoI
          stage runs as a `lax.map` over images inside the one program —
          measured crash-free AND at split-equal throughput at the fault
          point (124.2 vs 124.8 img/s b8-bf16, BENCHLOG round 4). A scan
          body serializes over images, so prefer the host path (or shard
          over images) for multi-chip batch-parallel eval.
        """
        # Fail-safe dispatch: only a POSITIVELY-identified concrete array
        # takes the two-jit host path; anything else (tracers, or unknown
        # array types under a future jax release) gets the lax.map body,
        # which is crash-free by construction at the b8-bf16 fault point.
        if not _is_concrete_array(images):
            return self._im_detect_batch_scan(
                params, images, image_hw, scales
            )
        feats, score_map, bbox_map = self._backbone_rpn_jit(params, images)
        return self._im_detect_roi_stage(
            params, feats, score_map, bbox_map, image_hw, scales
        )

    def _im_detect_batch_scan(self, params, images, image_hw, scales):
        """Single-program im_detect_batch with the RoI stage as a lax.map
        (scan) over images: bounded per-iteration intermediates and a
        fusion structure that sidesteps the b8-bf16 vmap fault. Safe to
        inline under any outer jit/shard_map; numerics match the host path
        up to XLA's batch-shape conv reassociation."""

        feats, score_map, bbox_map = self._backbone_rpn(params, images)

        def one(args):
            feat_i, score_i, bbox_i, hw_i, scale_i = args
            rois, roi_valid, roi_softmax, roi_deltas = self._roi_forward(
                params, feat_i, score_i, bbox_i, hw_i
            )
            return (
                roi_softmax,
                roi_deltas.reshape(-1, self.num_classes, 4),
                rois / scale_i,
                roi_valid,
            )

        return jax.lax.map(
            one, (feats, score_map, bbox_map, image_hw, scales)
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _backbone_rpn_jit(self, params, images):
        return self._backbone_rpn(params, images)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _im_detect_roi_stage(
        self, params, feats, score_map, bbox_map, image_hw, scales
    ):
        def one(feat_i, score_i, bbox_i, hw_i, scale_i):
            rois, roi_valid, roi_softmax, roi_deltas = self._roi_forward(
                params, feat_i, score_i, bbox_i, hw_i
            )
            return (
                roi_softmax,
                roi_deltas.reshape(-1, self.num_classes, 4),
                rois / scale_i,
                roi_valid,
            )

        return jax.vmap(one)(feats, score_map, bbox_map, image_hw, scales)

    @functools.partial(jax.jit, static_argnums=(0,))
    def im_detect(self, params, image, image_hw, scale):
        """Raw-head eval API (base_faster_rcnn_model.py:279-306).

        Returns (roi_softmax [R, C], roi_deltas [R, C, 4], rois/scale [R, 4],
        roi_valid [R]) for the external eval writers.
        """
        feats, score_map, bbox_map = self._backbone_rpn(params, image[None])
        rois, roi_valid, roi_softmax, roi_deltas = self._roi_forward(
            params, feats[0], score_map[0], bbox_map[0], image_hw
        )
        return (
            roi_softmax,
            roi_deltas.reshape(-1, self.num_classes, 4),
            rois / scale,
            roi_valid,
        )


def test_one_image_impl(
    detector, params, img_path, preprocessing_type="caffe", image_format=None,
    predict_fn=None,
):
    """Shared load + preprocess + predict for any detector with a jitted
    `predict(params, image, image_hw)` (reference
    base_faster_rcnn_model.py:267-277). Returns (boxes/scale, labels, scores)
    for valid detections, on the raw image's coordinates.

    predict_fn: optional (params, image, image_hw) -> Detections override —
    e.g. a spatially-partitioned predict (parallel/spatial.py) for
    more-chips-than-images serving."""
    import numpy as np_

    from tf_eager_object_detection_tpu.data.preprocessing import (
        preprocess_eval_image,
    )

    try:
        import cv2

        img = cv2.imread(img_path)[..., ::-1]
    except Exception:
        from PIL import Image

        img = np_.asarray(Image.open(img_path).convert("RGB"))
    padded, hw, scale, _, _ = preprocess_eval_image(
        img, detector.cfg, preprocessing_type, image_format=image_format
    )
    fn = detector.predict if predict_fn is None else predict_fn
    det = fn(params, jnp.asarray(padded), jnp.asarray(hw))
    v = np_.asarray(det.valid)
    return (
        np_.asarray(det.boxes)[v] / scale,
        np_.asarray(det.labels)[v],
        np_.asarray(det.scores)[v],
    )
