from .module import Ctx, Module, ParamPolicy, flatten_tree, unflatten_tree, merge_updates, tree_get, tree_set
from .conv import ConvNormAct, conv2d, batch_norm, group_norm, apply_act, mish
from .blocks import max_pool2d, avg_pool2d, upsample_nearest_2x, coord_conv, spp, drop_block
from .deform_conv import deform_conv2d
from .yolo_box import yolo_box, yolo_box_serving, iou_aware_score, de_sigmoid
from .matrix_nms import matrix_nms
from .iou import pairwise_iou, pairwise_intersect
