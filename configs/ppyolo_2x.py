"""PPYOLO 2x (ResNet50-vd) config — every field of reference
config/ppyolo_2x.py:13-236, adapted to the TPU build (NHWC, jit shape
bucketing) without changing hyperparameters."""


class PPYOLO_2x_Config:
    def __init__(self):
        # datasets (COCO)
        self.train_path = "../COCO/annotations/instances_train2017.json"
        self.val_path = "../COCO/annotations/instances_val2017.json"
        self.classes_path = "data/coco_classes.txt"
        self.train_pre_path = "../COCO/train2017/"
        self.val_pre_path = "../COCO/val2017/"
        self.test_path = "../COCO/annotations/image_info_test-dev2017.json"
        self.test_pre_path = "../COCO/test2017/"
        self.num_classes = 80

        self.train_cfg = dict(
            batch_size=8,
            num_threads=5,
            max_batch=3,
            model_path="ppyolo_2x.npz",
            save_iter=1000,
            eval_iter=5000,
            max_iters=500000,
            mixup_epoch=10,
            cutmix_epoch=-1,
        )
        self.learningRate = dict(
            base_lr=0.0001,
            PiecewiseDecay=dict(gamma=0.1, milestones=[400000, 450000]),
            LinearWarmup=dict(start_factor=0.0, steps=4000),
        )
        self.optimizerBuilder = dict(
            optimizer=dict(momentum=0.9, type="Momentum"),
            regularizer=dict(factor=0.0005, type="L2"),
        )

        self.eval_cfg = dict(
            model_path="ppyolo_2x.npz",
            target_size=608,
            draw_image=False,
            draw_thresh=0.15,
            eval_batch_size=4,
        )
        self.test_cfg = dict(
            model_path="ppyolo_2x.npz",
            target_size=608,
            draw_image=True,
            draw_thresh=0.15,
        )

        # model
        self.use_ema = True
        self.ema_decay = 0.9998
        self.backbone_type = "Resnet50Vd"
        self.backbone = dict(
            norm_type="bn",
            feature_maps=[3, 4, 5],
            dcn_v2_stages=[5],
            downsample_in3x3=True,
            freeze_at=5,
            freeze_norm=False,
            norm_decay=0.0,
        )
        self.head_type = "YOLOv3Head"
        self.head = dict(
            num_classes=self.num_classes,
            norm_type="bn",
            anchor_masks=[[6, 7, 8], [3, 4, 5], [0, 1, 2]],
            anchors=[[10, 13], [16, 30], [33, 23],
                     [30, 61], [62, 45], [59, 119],
                     [116, 90], [156, 198], [373, 326]],
            coord_conv=True,
            iou_aware=True,
            iou_aware_factor=0.4,
            scale_x_y=1.05,
            spp=True,
            drop_block=True,
            keep_prob=0.9,
            downsample=[32, 16, 8],
            in_channels=[2048, 1024, 512],
        )
        self.iou_loss_type = "IouLoss"
        self.iou_loss = dict(
            loss_weight=2.5, max_height=608, max_width=608, ciou_term=False)
        self.iou_aware_loss_type = "IouAwareLoss"
        self.iou_aware_loss = dict(loss_weight=1.0, max_height=608, max_width=608)
        self.yolo_loss_type = "YOLOv3Loss"
        self.yolo_loss = dict(
            ignore_thresh=0.7,
            scale_x_y=1.05,
            label_smooth=False,
            use_fine_grained_loss=True,
        )
        self.nms_cfg = dict(
            nms_type="matrix_nms",
            score_threshold=0.01,
            post_threshold=0.01,
            nms_top_k=500,
            keep_top_k=100,
            use_gaussian=False,
            gaussian_sigma=2.0,
        )

        # preprocessing
        self.context = {"fields": ["image", "gt_bbox", "gt_class", "gt_score"]}
        self.decodeImage = dict(to_rgb=True, with_mixup=True, with_cutmix=False)
        self.mixupImage = dict(alpha=1.5, beta=1.5)
        self.colorDistort = dict()
        self.randomExpand = dict(fill_value=[123.675, 116.28, 103.53])
        self.randomCrop = dict()
        self.randomFlipImage = dict(is_normalized=False)
        self.normalizeBox = dict()
        self.padBox = dict(num_max_boxes=50)
        self.bboxXYXY2XYWH = dict()
        self.randomShape = dict(
            sizes=[320, 352, 384, 416, 448, 480, 512, 544, 576, 608],
            random_inter=True,
        )
        self.normalizeImage = dict(
            mean=[0.485, 0.456, 0.406],
            std=[0.229, 0.224, 0.225],
            is_scale=True,
            is_channel_first=False,
        )
        self.permute = dict(to_bgr=False, channel_first=True)
        self.gt2YoloTarget = dict(
            anchor_masks=self.head["anchor_masks"],
            anchors=self.head["anchors"],
            downsample_ratios=[32, 16, 8],
            num_classes=self.num_classes,
        )
        self.resizeImage = dict(target_size=608, interp=2)

        self.sample_transforms_seq = [
            "decodeImage", "mixupImage", "colorDistort", "randomExpand",
            "randomCrop", "randomFlipImage", "normalizeBox", "padBox",
            "bboxXYXY2XYWH",
        ]
        self.batch_transforms_seq = [
            "randomShape", "normalizeImage", "permute", "gt2YoloTarget",
        ]
