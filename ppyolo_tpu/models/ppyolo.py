"""PPYOLO composite model: backbone + head with dual-mode forward.

Parity with reference model/ppyolo.py:13-29 (eval -> get_prediction, train ->
get_loss) and the string->class registry of config/get_model.py:16-40.
"""
from __future__ import annotations

from typing import Any, Dict

import jax

from ..ops.module import Ctx, flatten_tree
from .resnet_vd import ResNet50Vd, ResNet18Vd
from .head import YOLOv3Head

BACKBONES = {"Resnet50Vd": ResNet50Vd, "Resnet18Vd": ResNet18Vd}


def select_backbone(name: str):
    return BACKBONES[name]


def select_head(name: str):
    """String->class head registry (reference get_model.py:22-26)."""
    return {"YOLOv3Head": YOLOv3Head}[name]


def select_loss(name: str):
    """String->class loss registry (reference get_model.py:28-35)."""
    from ..train.losses import YOLOv3Loss, IouLoss, IouAwareLoss

    return {"YOLOv3Loss": YOLOv3Loss, "IouLoss": IouLoss,
            "IouAwareLoss": IouAwareLoss}[name]


class PPYOLO:
    """Composite detector (reference model/ppyolo.py)."""

    def __init__(self, backbone, head: YOLOv3Head):
        self.backbone = backbone
        self.head = head

    @classmethod
    def from_config(cls, cfg) -> "PPYOLO":
        bb = select_backbone(cfg.backbone_type)(**cfg.backbone, prefix="backbone")
        head = YOLOv3Head(**cfg.head, nms_cfg=cfg.nms_cfg, prefix="head")
        return cls(bb, head)

    def init(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        return {"backbone": self.backbone.init(k1), "head": self.head.init(k2)}

    def param_policy(self) -> Dict[str, Any]:
        return {
            "backbone": self.backbone.param_policy(),
            "head": self.head.param_policy(),
        }

    def flat_policy(self) -> Dict[str, Any]:
        return flatten_tree(self.param_policy())

    # -- forward modes ------------------------------------------------------
    def features(self, params, images, ctx: Ctx):
        return self.backbone.apply(params["backbone"], images, ctx)

    def outputs(self, params, images, ctx: Ctx):
        """Raw per-level head maps (train-path forward)."""
        feats = self.features(params, images, ctx)
        return self.head.get_outputs(params["head"], feats, ctx)

    def predict(self, params, images, im_size, ctx: Ctx = None):
        """images [N,H,W,3] preprocessed; im_size [N,2] original (h,w).
        Returns [N, keep_top_k, 6] detections, fully on device."""
        ctx = ctx or Ctx(train=False)
        feats = self.features(params, images, ctx)
        return self.head.get_prediction(params["head"], feats, im_size, ctx)
