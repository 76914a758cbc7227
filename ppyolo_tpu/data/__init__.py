from .coco import CocoJson, category_maps, data_clean, get_samples
from .targets import gt2yolo_targets
from .loader import (build_sample_transforms, apply_sample_transforms,
                     assemble_batch, train_batches, Prefetcher, DevicePrefetcher)
from . import transforms
