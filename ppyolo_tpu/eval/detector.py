"""Inference driver — the reference ``Decode`` (model/decode_np.py:21-150)
rebuilt TPU-first: preprocessing on host (cv2, interp parity with the config,
resizeImage['interp']=2 == INTER_CUBIC), then ONE jitted device program per
target size doing backbone -> head -> IoU-aware fuse -> grid-sensitive decode
-> batched Matrix-NMS, with a single [B, keep_top_k, 6] device->host copy
(the reference round-trips per image and loops NMS in Python,
head.py:461-464 / decode_np.py:142-150)."""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..ops.module import Ctx


class Detector:
    """Batched detector with compiled-per-size predict functions."""

    def __init__(self, model, params, cfg, *, target_size: Optional[int] = None,
                 compute_dtype=jnp.float32, precision: str = "fp32",
                 fold_bn: bool = True, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with one axis — predict
        programs shard the batch over it (params replicated; detection is
        embarrassingly batch-parallel so XLA partitions without collectives,
        parallel/mesh.py::make_sharded_predict).  Batch sizes must divide by
        the mesh size.  The reference is single-GPU-only (README.md:84-86)."""
        from .optimize import optimize_for_inference

        self.model = model
        self.cfg = cfg
        self._precision = precision
        self._fold_bn = fold_bn
        if fold_bn or precision in ("bf16", "int8"):
            params = optimize_for_inference(params, precision=precision,
                                            fold_bn=fold_bn)
            if precision in ("bf16", "int8"):
                # int8 mode: conv matmuls run int8 on the MXU (weights
                # pre-quantized, activations dynamically quantized per conv,
                # ops/conv.py::quantized_conv2d); everything between convs
                # rides bf16 and the decode/NMS epilogue stays fp32
                compute_dtype = jnp.bfloat16
        self.params = params
        self.target_size = int(target_size or cfg.test_cfg["target_size"])
        self.mean = np.array(cfg.normalizeImage["mean"], np.float32)
        self.std = np.array(cfg.normalizeImage["std"], np.float32)
        self.interp = int(cfg.resizeImage.get("interp", 2))
        self.is_scale = bool(cfg.normalizeImage.get("is_scale", True))
        self.to_bgr = bool(cfg.permute.get("to_bgr", False))
        if self.to_bgr:
            # the reference normalizes with RGB-ordered constants THEN flips
            # (NormalizeImage -> Permute); we flip before the uint8 ship, so
            # the constants must flip too for the math to commute
            self.mean = self.mean[::-1].copy()
            self.std = self.std[::-1].copy()
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            self._rep = NamedSharding(mesh, P())
            self._bsp = NamedSharding(mesh, P(axis))
            self._scan_bsp = NamedSharding(mesh, P(None, axis))
            self._predict_jit = jax.jit(
                self._predict_fn,
                in_shardings=(self._rep, self._bsp, self._bsp),
                out_shardings=self._bsp)
        else:
            self._predict_jit = jax.jit(self._predict_fn)

    def set_params(self, params):
        """Swap model weights (re-applying BN-fold/precision) WITHOUT
        retracing — params are jit arguments, so the compiled executable is
        reused (the periodic in-training eval would otherwise recompile)."""
        from .optimize import optimize_for_inference

        if self._fold_bn or self._precision in ("bf16", "int8"):
            params = optimize_for_inference(
                params, precision=self._precision, fold_bn=self._fold_bn)
        self.params = params

    # -- host preprocessing (decode_np.py:125-140) --------------------------
    def process_image(self, img_bgr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """BGR->RGB + uint8-domain cv2 resize (exactly the reference:
        ResizeImage runs on the raw imread uint8, transform.py:996-1003).
        Normalization happens ON DEVICE in ``_predict_fn`` — the uint8
        transport is 4x less H2D and skips the host fp32 normalize."""
        im = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
        h, w = im.shape[:2]
        ts = self.target_size
        im = cv2.resize(im, (ts, ts), interpolation=self.interp)
        if self.to_bgr:
            im = im[..., ::-1]
        return im[None], np.array([[h, w]], np.float32)

    # -- device program -----------------------------------------------------
    def _normalize(self, images):
        if images.dtype == jnp.uint8:
            # mirror NormalizeImage op-for-op so fp32 results are bitwise
            # identical to the host path (golden fixtures depend on it);
            # is_scale parity with make_train_step.prep_images
            x = images.astype(jnp.float32)
            if self.is_scale:
                x = x / 255.0
            images = (x - self.mean) / self.std
        return images.astype(self.compute_dtype)

    def _predict_fn(self, params, images, im_size):
        images = self._normalize(images)
        return self.model.predict(params, images, im_size, Ctx(train=False))

    def calibrate(self, pimages: np.ndarray) -> int:
        """Pin static int8 activation scales from a calibration set
        (preprocessed [N,S,S,3] images, uint8 or normalized fp32).

        Records every quantized conv's input abs-max in one forward and
        replaces the run-time dynamic amax with ``act_scale`` leaves — the
        static quantize is pure elementwise work XLA fuses into the
        producer, saving an extra HBM read of every conv input.  Returns
        the number of convs pinned.  Call again after ``set_params``."""
        assert self._precision == "int8", "calibrate() is for int8 mode"
        from ..ops.module import flatten_tree, unflatten_tree
        from .optimize import calibrate_act_scales

        scales = calibrate_act_scales(self.model, self.params, [pimages],
                                      preprocess=self._normalize)
        flat = flatten_tree(self.params)
        n = 0
        for mod, scale in scales.items():
            wkey = f"{mod}.conv.weight"
            if wkey in flat and flat[wkey].dtype == jnp.int8:
                flat[f"{mod}.conv.act_scale"] = jnp.asarray(np.float32(scale))
                n += 1
        self.params = unflatten_tree(flat)
        return n

    def predict_batch(self, pimages: np.ndarray, im_sizes: np.ndarray) -> np.ndarray:
        """pimages [B,S,S,3] preprocessed; im_sizes [B,2] (h,w).
        Returns [B, keep_top_k, 6] numpy (label, score, x0, y0, x1, y1)."""
        out = self._predict_jit(self.params, jnp.asarray(pimages),
                                jnp.asarray(im_sizes))
        return np.asarray(out)

    def predict_pipelined(self, pimages: np.ndarray, im_sizes: np.ndarray,
                          *, group: int) -> np.ndarray:
        """Steady-state serving mode: scan ``group`` fixed-size batches inside
        ONE device dispatch (lax.scan), so per-dispatch host latency amortizes
        over group*B images — the TPU-serving analogue of a request queue.

        pimages [G*B, S, S, 3], im_sizes [G*B, 2] with G = group.
        Returns [G*B, keep_top_k, 6].
        """
        gb = pimages.shape[0]
        assert gb % group == 0
        b = gb // group
        if not hasattr(self, "_scan_jits"):
            self._scan_jits = {}
        key = (group, b, pimages.shape[1])
        if key not in self._scan_jits:
            def many(params, images, sizes):
                def body(_, xs):
                    im, sz = xs
                    return None, self._predict_fn(params, im, sz)
                _, outs = jax.lax.scan(body, None, (images, sizes))
                return outs
            if self.mesh is not None:
                # scan axis replicated, batch axis sharded over the mesh
                self._scan_jits[key] = jax.jit(
                    many,
                    in_shardings=(self._rep, self._scan_bsp, self._scan_bsp),
                    out_shardings=self._scan_bsp)
            else:
                self._scan_jits[key] = jax.jit(many)
        images = jnp.asarray(pimages).reshape(group, b, *pimages.shape[1:])
        sizes = jnp.asarray(im_sizes).reshape(group, b, 2)
        out = self._scan_jits[key](self.params, images, sizes)
        return np.asarray(out).reshape(gb, *out.shape[2:])

    # -- reference-compatible per-image API (decode_np.py:41-96) ------------
    def detect_image(self, img_bgr: np.ndarray, draw_thresh: Optional[float] = None):
        pimage, im_size = self.process_image(img_bgr)
        pred = self.predict_batch(pimage, im_size)[0]
        keep = pred[:, 0] >= 0
        if draw_thresh is not None:
            keep &= pred[:, 1] >= draw_thresh
        boxes = pred[keep, 2:6]
        scores = pred[keep, 1]
        classes = pred[keep, 0].astype(np.int32)
        return boxes, scores, classes

    def detect_batch(self, imgs_bgr: List[np.ndarray]):
        pimages, sizes = [], []
        for im in imgs_bgr:
            p, s = self.process_image(im)
            pimages.append(p[0])
            sizes.append(s[0])
        preds = self.predict_batch(np.stack(pimages), np.stack(sizes))
        results = []
        for pred in preds:
            keep = pred[:, 0] >= 0
            results.append((pred[keep, 2:6], pred[keep, 1],
                            pred[keep, 0].astype(np.int32)))
        return results
