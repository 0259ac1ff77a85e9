"""Label-map (.pbtxt) parsing without protoc codegen.

The reference ships `StringIntLabelMap` protos + generated python
(`object_detection/protos/string_int_label_map.proto:5-20`,
`dataset/utils/label_map_utils.py:8-22`); here the pbtxt text format is
parsed directly (it only contains `item { id: N name: '...' }` entries), so
no protoc step is required. Validation matches the reference: id 0 is
reserved for background.
"""

from __future__ import annotations

import re
from typing import Dict, List

__all__ = ["parse_label_map", "get_label_map_dict", "create_category_index", "PASCAL_CLASSES"]

PASCAL_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)

_ITEM_RE = re.compile(r"item\s*\{([^}]*)\}", re.S)
_FIELD_RE = re.compile(r"(\w+)\s*:\s*('[^']*'|\"[^\"]*\"|\S+)")


def parse_label_map(text: str) -> List[dict]:
    items = []
    for block in _ITEM_RE.finditer(text):
        item: dict = {}
        for m in _FIELD_RE.finditer(block.group(1)):
            key, val = m.group(1), m.group(2)
            if val[0] in "'\"":
                item[key] = val[1:-1]
            else:
                try:
                    item[key] = int(val)
                except ValueError:
                    item[key] = val
        if item:
            items.append(item)
    return items


def get_label_map_dict(path_or_text: str, use_display_name: bool = False) -> Dict[str, int]:
    """name -> id. Accepts a file path or raw pbtxt text."""
    try:
        with open(path_or_text) as f:
            text = f.read()
    except (OSError, ValueError):
        text = path_or_text
    items = parse_label_map(text)
    out = {}
    for item in items:
        if item.get("id", -1) < 0:
            raise ValueError("label map ids must be >= 0")
        name = item.get("display_name" if use_display_name else "name")
        out[name] = item["id"]
    return out


def create_category_index(path_or_text: str) -> Dict[int, dict]:
    """id -> {'id': id, 'name': name} (TF-OD-API category helper shape)."""
    return {
        v: {"id": v, "name": k} for k, v in get_label_map_dict(path_or_text).items()
    }


def pascal_label_map_dict() -> Dict[str, int]:
    """The standard 20-class VOC label map (ids 1..20, background 0)."""
    return {name: i + 1 for i, name in enumerate(PASCAL_CLASSES)}
