"""End-to-end DGE edit-system smoke on tiny models: render -> multi-view
edit -> refit, plus checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dge_tpu.diffusion import ip2p
from dge_tpu.models.clip_text import CLIPTextConfig
from dge_tpu.models.unet import UNetConfig
from dge_tpu.models.vae import VAEConfig
from dge_tpu.systems.edit import DGESystem, EditConfig
from dge_tpu.systems.guidance import DGEGuidance, GuidanceConfig
from dge_tpu.parallel.mesh import stack_cameras
from tests.conftest import make_random_scene
from tests.test_parallel import ring_cameras


@pytest.fixture(scope="module")
def tiny_models():
    return ip2p.build_models(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        rng=jax.random.PRNGKey(0),
    )


def test_edit_system_end_to_end(tiny_models, rng, tmp_path):
    scene = make_random_scene(rng, n=64, capacity=128)
    cams = ring_cameras(4, height=32, width=32)
    d = tiny_models.unet.config.cross_attention_dim
    guidance = DGEGuidance(
        GuidanceConfig(camera_batch_size=2, diffusion_steps=2, resize_target=64), tiny_models
    )
    cfg = EditConfig(
        max_steps=6,
        camera_update_per_step=100,
        densify_from=1000,  # no densify in this tiny run
        added_noise_schedule=(300,),
        tile_px=16,
        max_per_tile=64,
        chunk=16,
        lambda_perceptual=0.0,
    )
    system = DGESystem(
        cfg,
        scene,
        cams,
        guidance=guidance,
        text_emb_pos=jnp.zeros((7, d)),
        text_emb_neg=jnp.zeros((7, d)),
        cache_dir=str(tmp_path / "cache"),
    )
    out_scene = system.run(jax.random.PRNGKey(0), steps=6, log_fn=lambda *_: None)
    assert len(system.origin_frames) == 4
    assert len(system.edit_frames) == 4
    for v, img in system.edit_frames.items():
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
    # refit moved parameters toward the edited frames
    delta = float(jnp.abs(out_scene.features_dc - scene.features_dc).max())
    assert delta > 0


def test_checkpoint_roundtrip(rng, tmp_path):
    from dge_tpu.systems import fit as F
    from dge_tpu.systems import optim as O
    from dge_tpu.utils import checkpoint as CK

    scene = make_random_scene(rng, n=16, capacity=32)
    optimizer = O.make_optimizer(O.OptimConfig.scaled(10))
    opt_state = optimizer.init(scene.params())
    fit_state = F.FitState.create(scene.capacity).replace(step=jnp.int32(7))

    path = str(tmp_path / "ckpt")
    CK.save_checkpoint(path, scene, opt_state, fit_state, extra={"step": 7})
    s2, o2, f2, meta = CK.restore_checkpoint(path, scene, opt_state, fit_state)
    assert np.allclose(np.asarray(s2.xyz), np.asarray(scene.xyz))
    assert int(f2.step) == 7
    assert meta["step"] == 7
    assert np.array_equal(np.asarray(s2.alive), np.asarray(scene.alive))
