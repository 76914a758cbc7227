from .detector import Detector
from .coco_eval import (coco_eval, evaluate_detections, detections_to_coco,
                        COCO_CLSID2CATID, COCO_CATID2CLSID, get_classes)
from .coco_metric import evaluate_map
from .visualize import draw, get_colors
