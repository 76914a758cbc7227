#! /usr/bin/env python
"""Headline benchmark: ppyolo_2x (ResNet50-vd + DCN) @ 608x608 single-image
inference FPS, decode + IoU-aware fuse + Matrix-NMS INCLUDED on device —
the reference's demo.py protocol (50 images after 10-iter warmup,
README.md:23), baseline 16.6 FPS on a GTX 1660 Ti (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np

BASELINE_FPS = 16.6  # reference README.md:13 (ppyolo_2x @608, GTX 1660 Ti)


def main():
    import jax
    import jax.numpy as jnp
    from configs import PPYOLO_2x_Config
    from ppyolo_tpu.models import PPYOLO
    from ppyolo_tpu.ops.module import Ctx

    cfg = PPYOLO_2x_Config()
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))

    size = 608

    @jax.jit
    def predict(params, images, im_size):
        return model.predict(params, images, im_size, Ctx(train=False))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, size, size, 3), jnp.float32)
    im_size = jnp.asarray(np.array([[480, 640]], np.float32))

    # warmup (compile + autotune), reference demo.py:120-123
    for _ in range(10):
        out = predict(params, images, im_size)
    np.asarray(out)

    n = 50
    t0 = time.time()
    for _ in range(n):
        out = predict(params, images, im_size)
        np.asarray(out)  # force the [1,100,6] D2H copy like demo.py
    cost = time.time() - t0
    fps = n / cost

    print(json.dumps({
        "metric": "ppyolo_2x 608x608 inference FPS (demo.py protocol, "
                  "Matrix-NMS on device)",
        "value": round(fps, 2),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
