"""Data-parallel inference over the 8-virtual-device mesh == single-device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppyolo_tpu.models import PPYOLO
from ppyolo_tpu.ops.module import Ctx
from ppyolo_tpu.parallel import make_mesh, make_sharded_predict
from configs import PPYOLO_r18vd_Config

pytestmark = pytest.mark.slow


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_predict_matches_single():
    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 5
    cfg.head = dict(cfg.head, num_classes=5)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    images = jnp.asarray(r.rand(8, 128, 128, 3), jnp.float32)
    im_size = jnp.asarray(np.tile([[128.0, 128.0]], (8, 1)), jnp.float32)

    ref = np.asarray(model.predict(params, images, im_size, Ctx(train=False)))

    mesh = make_mesh(8)
    fn = make_sharded_predict(model, mesh)
    got = np.asarray(fn(params, images, im_size))
    # partitioned compilation reorders fusions; box coords may differ at the
    # 4e-4 level through exp() on random weights — labels/scores must agree
    np.testing.assert_allclose(got[..., :2], ref[..., :2], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[..., 2:], ref[..., 2:], rtol=5e-3, atol=5e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_detector_mesh_matches_single():
    """Detector(mesh=...) — the user-facing eval.py --ndev path — must match
    the single-device Detector through both predict entry points."""
    from ppyolo_tpu.eval.detector import Detector

    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 5
    cfg.head = dict(cfg.head, num_classes=5)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    r = np.random.RandomState(1)
    imgs = r.randint(0, 256, (8, 128, 128, 3)).astype(np.uint8)
    sizes = np.tile([[128.0, 128.0]], (8, 1)).astype(np.float32)

    det1 = Detector(model, params, cfg, target_size=128, fold_bn=False)
    ref = det1.predict_batch(imgs, sizes)

    detm = Detector(model, params, cfg, target_size=128, fold_bn=False,
                    mesh=make_mesh(8))
    got = detm.predict_batch(imgs, sizes)
    np.testing.assert_allclose(got[..., :2], ref[..., :2], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[..., 2:], ref[..., 2:], rtol=5e-3, atol=5e-2)

    piped = detm.predict_pipelined(np.concatenate([imgs, imgs]),
                                   np.concatenate([sizes, sizes]), group=2)
    np.testing.assert_allclose(piped[:8, :, :2], ref[..., :2],
                               rtol=1e-3, atol=1e-4)


def test_predict_pipelined_matches_batched():
    from ppyolo_tpu.eval.detector import Detector

    cfg = PPYOLO_r18vd_Config()
    cfg.num_classes = 5
    cfg.head = dict(cfg.head, num_classes=5)
    model = PPYOLO.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0))
    det = Detector(model, params, cfg, target_size=128, fold_bn=False)
    r = np.random.RandomState(0)
    imgs = r.rand(4, 128, 128, 3).astype(np.float32)
    sizes = np.tile([[128.0, 128.0]], (4, 1)).astype(np.float32)
    ref = det.predict_batch(imgs[:2], sizes[:2])
    out = det.predict_pipelined(imgs, sizes, group=2)
    np.testing.assert_allclose(out[:2], ref, rtol=1e-4, atol=1e-4)


def test_make_mesh_local():
    """local=True builds from addressable devices (== global in a single
    process) and rejects ndev beyond what this process can address (r3
    review: eval --ndev over a multi-host runtime must not jit over
    non-addressable devices)."""
    import jax
    import pytest

    mesh = make_mesh(4, local=True)
    assert mesh.devices.size == 4
    assert all(d.process_index == jax.process_index()
               for d in mesh.devices.flat)
    with pytest.raises(ValueError, match="addressable"):
        make_mesh(len(jax.local_devices()) + 1, local=True)
