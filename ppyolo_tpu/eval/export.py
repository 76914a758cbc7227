"""Serving-artifact export: the whole detector as one StableHLO program.

``jax.export`` serializes the jitted predict program — backbone -> head ->
IoU-aware fuse -> grid-sensitive decode -> batched Matrix-NMS — with the
(BN-folded, bf16) weights baked in as constants.  The artifact is
self-contained: serving needs only the bytes + a jax runtime, no model
code, no checkpoint, no config (the reference has no deployment story at
all — demo.py IS its serving path).

Input contract (matches Detector.process_image's uint8 transport):
  images  uint8 [B, S, S, 3]  RGB, uint8-domain resized
  im_size fp32  [B, 2]        original (h, w) per image
Output: fp32 [B, keep_top_k, 6] rows (label, score, x0, y0, x1, y1),
-1-padded — identical to Detector.predict_batch.

Known environment limitation (bisected): on the axon-tunneled dev runtime,
replaying a deserialized program (`Exported.call`) of ppyolo_2x @608 works
at batch<=4 but faults the relay worker at batch 8 — the round-1 relay
batch-8 fault, which ordinary jits of the identical computation no longer
trigger (bench runs batch 8 fine).  Same behaviour with and without the
Pallas custom call, so it is the runtime's exported-program execution path,
not the artifact content.  Round-trip is exact on CPU
(tests/test_export.py); tiny and r18vd artifacts replay fine on the TPU.
Artifacts default to the ``onehot`` DCN formulation so they are pure
StableHLO with no backend custom calls either way.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def export_detector(detector, *, batch: int,
                    platforms: Optional[Sequence[str]] = None,
                    dcn: str = "onehot", stem: str = "xla") -> bytes:
    """Serialize ``detector``'s predict program for ``batch`` images.

    platforms: lowering targets (e.g. ["tpu", "cpu"]); defaults to the
    current backend.
    dcn: DCN formulation traced into the artifact.  Default "onehot" — the
    plain-XLA one-hot matmul — so the artifact is pure StableHLO with no
    backend custom calls (serialized Pallas/mosaic custom-calls are tied to
    the exporting libtpu and fault this runtime's worker when replayed).
    stem: stem formulation, default "xla" (the unfused conv chain) for the
    same portability reason — "pallas" traces the fused stem kernel
    (ops/stem_pallas.py) into the artifact, tying it to the exporting
    libtpu for ~1.5 ms/batch @ b8@608.
    """
    from jax import export as jexport

    from ..ops.conv import dcn_impl
    from ..ops.stem_pallas import stem_impl

    size = detector.target_size
    params = detector.params

    def serve(images, im_size):
        return detector._predict_fn(params, images, im_size)

    args = (jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8),
            jax.ShapeDtypeStruct((batch, 2), jnp.float32))
    kw = {"platforms": list(platforms)} if platforms else {}
    with dcn_impl(dcn), stem_impl(stem):
        exp = jexport.export(jax.jit(serve), **kw)(*args)
    return exp.serialize()


def load_serving(data: bytes):
    """Deserialize an exported artifact -> ``fn(images_u8, im_size) -> dets``."""
    from jax import export as jexport

    exp = jexport.deserialize(data)

    def serve(images, im_size):
        return exp.call(jnp.asarray(images), jnp.asarray(im_size))

    return serve


def save_serving(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def load_serving_file(path: str):
    with open(path, "rb") as f:
        return load_serving(f.read())
