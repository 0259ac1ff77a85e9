"""FPN config preset (same key inventory as the reference fpn_config.py)."""


def get_default_pascal_fpn_config():
    return {
        # backbone
        "resnet_roi_feature_size": (7, 7, 256),
        "roi_head_keep_dropout_rate": 0.5,
        # base configs
        "num_classes": 21,
        # fpn-specific
        "level_name_list": ["p2", "p3", "p4", "p5", "p6"],
        "min_level": 2,
        "max_level": 5,
        "top_down_dims": 256,
        # preprocessing configs
        "image_max_size": 1000,
        "image_min_size": 600,
        "bgr_pixel_means": [103.939, 116.779, 123.68],
        # predict & evaluate configs
        "evaluate_iou_threshold": 0.5,
        "max_objects_per_class_per_image": 50,
        "max_objects_per_image": 50,
        "prediction_nms_iou_threshold": 0.3,
        "prediction_score_threshold": 0.0,
        "show_image_score_threshold": 0.3,
        # anchors configs
        "ratios": [0.5, 1.0, 2.0],
        "scales": [1.0],
        "anchor_stride_list": [4, 8, 16, 32, 64],
        "base_anchor_size_list": [32, 64, 128, 256, 512],
        # training configs
        "learning_rate_multi_decay_steps": [60000, 80000],
        "learning_rate_multi_lrs": [1e-3, 1e-4, 1e-5],
        "optimizer_momentum": 0.9,
        "learning_rate_bias_double": False,
        "weight_decay": 0.0001,
        "epochs": 30,
        # rpn net configs
        "rpn_proposal_means": [0, 0, 0, 0],
        "rpn_proposal_stds": [1.0, 1.0, 1.0, 1.0],
        "rpn_sigma": 3.0,
        "rpn_pos_iou_threshold": 0.7,
        "rpn_neg_iou_threshold": 0.3,
        "rpn_total_sample_number": 256,
        "rpn_pos_sample_max_number": 128,
        "rpn_proposal_train_pre_nms_sample_number": 12000,
        "rpn_proposal_train_after_nms_sample_number": 2000,
        "rpn_proposal_test_pre_nms_sample_number": 6000,
        "rpn_proposal_test_after_nms_sample_number": 1000,
        "rpn_proposal_nms_iou_threshold": 0.7,
        "roi_pooling_size": 7,
        "roi_pooling_max_pooling_flag": True,
        # roi net configs
        "roi_proposal_means": [0, 0, 0, 0],
        "roi_proposal_stds": [0.1, 0.1, 0.2, 0.2],
        "roi_sigma": 1.0,
        "roi_pos_iou_threshold": 0.5,
        "roi_neg_iou_threshold": 0.0,
        "roi_total_sample_number": 256,
        "roi_pos_sample_max_number": 64,
        # see faster_rcnn_config.py: reference-quirk parity mode (the
        # proposal_target class-column indexing + unclamped decode)
        "strict_reference_parity": False,
        # --- TPU-native additions ---
        # multiples of 64 so every pyramid level (stride 4..64) tiles evenly
        "tpu_image_buckets": [[640, 1024], [1024, 640]],
        "tpu_max_gt_boxes": 100,
        "tpu_train_batch_size_per_device": 1,
        "tpu_compute_dtype": "float32",  # or "bfloat16" (MXU-native, ~2x conv throughput)
        # window dtype for the pallas RoIAlign (tpu_roi_align_impl='pallas'):
        # "bfloat16" halves the per-roi window DMA traffic (the kernel's
        # bottleneck) at ~2^-8 relative interpolation error
        "tpu_roi_align_window_dtype": "float32",
        # cells per side of the pallas RoIAlign per-roi window DMA. FPN level
        # assignment bounds an assigned roi's span to < 28 cells at its level
        # (base_fpn_model.py:309-313), so 64 is exact up to aspect ~5; 48
        # covers aspect ~3 and 32 aspect ~1.3, cutting DMA quadratically.
        # Must be a multiple of 16.
        "tpu_roi_align_window": 64,
        # fuse the 4 pyramid levels into ONE pallas launch per RoIAlign
        # (every roi is assigned exactly one level, so the per-level kernels
        # spend 3/4 of their grid steps writing zero blocks + a 4-way sum)
        "tpu_roi_align_fused_levels": True,
        # einsum RoIAlign contraction order; FPN 'auto' = large_first
        # (wins both dtypes on-chip, see models/fpn.py::_contract_order)
        "tpu_roi_align_contract": "auto",
        # single-fusion SGD-momentum update (one HBM pass over params/trace
        # instead of the optax chain's several) — bit-identical math, see
        # training/optimizer.py
        "tpu_fused_optimizer": True,
        # index-exact per-level pre-NMS top-k prefilter: shrinks the global
        # ordering op over the level concat (~163k anchors at the stock
        # bucket) to the union of per-level top-k sets (~34k) before the
        # pre-NMS selection; provably the same proposals incl. score-tie
        # order (tests/test_fpn.py::test_per_level_prenms_prefilter_exact).
        # Default OFF: measured on-chip it LOSES 4.4% at b8-bf16 train
        # (46.7 vs 48.8 img/s) and is throughput-neutral at eval — the
        # 163k one-shot top-k was never the bottleneck (the step is HBM
        # bandwidth-bound; BENCHLOG round 5 roofline). Kept as an opt-in
        # for shapes where the global ordering does dominate.
        "tpu_fpn_per_level_prenms": False,
        # fused C++ host pipeline — see faster_rcnn_config.py
        "tpu_native_decode": False,
    }


PASCAL_CONFIG = get_default_pascal_fpn_config()
