"""Pairwise box IoU utilities (reference model/matrix_nms.py:15-47)."""
from __future__ import annotations

import jax.numpy as jnp


def pairwise_intersect(box_a, box_b):
    """Intersection areas between two box sets. [A,4] x [B,4] -> [A,B] (xyxy)."""
    max_xy = jnp.minimum(box_a[:, None, 2:], box_b[None, :, 2:])
    min_xy = jnp.maximum(box_a[:, None, :2], box_b[None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(box_a, box_b, eps: float = 0.0):
    """IoU matrix [A,B].  ``eps`` guards the 0/0 case for padded zero-boxes
    (the reference divides unguarded, matrix_nms.py:47; eps=0 reproduces it)."""
    inter = pairwise_intersect(box_a, box_b)
    area_a = (box_a[:, 2] - box_a[:, 0]) * (box_a[:, 3] - box_a[:, 1])
    area_b = (box_b[:, 2] - box_b[:, 0]) * (box_b[:, 3] - box_b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / (union + eps)
