"""ppyolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the
PP-YOLO object-detection framework (capability parity with miemie2013/Pytorch-PPYOLO).

Design notes (TPU-first, not a port):
  * All tensors are NHWC / channels-last (TPU conv native layout); the reference
    is NCHW.  Converters transpose at the checkpoint boundary.
  * Every model is a pytree-of-params + pure ``apply`` function; the whole
    forward/loss/train-step compiles to a single XLA graph under ``jax.jit``.
  * Deformable conv (DCNv2), DropBlock, Matrix-NMS and the yolo_box decode run
    fully on device with static shapes (reference runs NMS in a per-image
    Python loop, EMA on host numpy).
  * Multi-chip: data-parallel training via ``jax.sharding.Mesh`` + ``shard_map``
    with psum gradient reduction and true cross-replica sync-BN — the reference
    has no distributed support at all (reference README.md:84-86).
"""

__version__ = "0.1.0"
