"""Public model construction API, reference-compatible signature
(`object_detection/model/model_factory.py:8-30`):

    model_factory(model_type, backbone, config) -> detector

model_type in {'faster_rcnn', 'fpn'}; backbone in {'vgg16', 'resnet50',
'resnet101', 'resnet152'} ('vgg16' only for faster_rcnn).
"""

from __future__ import annotations

from tf_eager_object_detection_tpu.models.faster_rcnn import FasterRCNNDetector

__all__ = ["model_factory"]


def model_factory(model_type: str, backbone: str, config: dict):
    if model_type == "faster_rcnn":
        if backbone not in ("vgg16", "resnet50", "resnet101", "resnet152"):
            raise ValueError(f"unknown backbone {backbone} for faster_rcnn")
        return FasterRCNNDetector(backbone, config)
    if model_type == "fpn":
        from tf_eager_object_detection_tpu.models.fpn import FPNDetector

        if backbone not in ("resnet50", "resnet101", "resnet152"):
            raise ValueError(f"unknown backbone {backbone} for fpn")
        return FPNDetector(backbone, config)
    raise ValueError(f"unknown model type {model_type}")
