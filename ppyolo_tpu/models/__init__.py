from .resnet_vd import ResNet50Vd, ResNet18Vd, ConvBlock, IdentityBlock, BasicBlock
from .head import YOLOv3Head, DetectionBlock
from .ppyolo import PPYOLO, select_backbone, select_head, select_loss
