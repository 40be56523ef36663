"""Texture tests: checkerboard/bitmap loading, shading modulation, and the
staircase2 scene's real textures (the reference leaves these unbound)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gpuspectral_tpu.bsdf import table as bt
from gpuspectral_tpu.integrator import render_image
from gpuspectral_tpu.scene.data import SceneBuilder, TEX_RES
from gpuspectral_tpu.scene.obj import make_rectangle
from gpuspectral_tpu.scene.texture import make_checkerboard
from gpuspectral_tpu.utils import RenderConfig

REF_SCENES = "/root/reference/src/GPUSpectral/assets/scenes"


def test_checkerboard_structure():
    tex = make_checkerboard((1, 0, 0), (0, 0, 1), 1, 1)
    assert tex.shape == (TEX_RES, TEX_RES, 3)
    # four quadrants alternate
    q = TEX_RES // 4
    assert not np.allclose(tex[q, q], tex[q, 3 * q])
    assert np.allclose(tex[q, q], tex[3 * q, 3 * q])


def _textured_scene(texture):
    b = SceneBuilder()
    pos, nrm, uv = make_rectangle()
    mat = b.add_bsdf(bt.diffuse((1.0, 1.0, 1.0)), texture=texture)
    floor_xf = np.array([[2, 0, 0, 0], [0, 0, 2, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float32)
    b.add_object(pos, nrm, uv, floor_xf, mat, twofaced=True)
    light = b.add_bsdf(bt.diffuse((0.0, 0.0, 0.0)))
    light_xf = np.array([[1, 0, 0, 0], [0, 0, -1, 3], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32)
    b.add_object(pos, nrm, uv, light_xf, light, emission=(10.0, 10.0, 10.0))
    b.set_camera(
        np.array([[-1, 0, 0, 0], [0, 1, 0, 1.2], [0, 0, -1, 4], [0, 0, 0, 1]], np.float32),
        np.deg2rad(60),
    )
    return b.build()


def test_texture_modulates_shading():
    cfg = RenderConfig(width=48, height=48, spp=8, max_depth=1, ray_batch=2304)
    white = np.ones((TEX_RES, TEX_RES, 3), np.float32)
    checker = make_checkerboard((1.0, 1.0, 1.0), (0.0, 0.0, 0.0), 8, 8)

    img_plain = np.asarray(render_image(_textured_scene(None), cfg))
    img_white = np.asarray(render_image(_textured_scene(white), cfg))
    img_check = np.asarray(render_image(_textured_scene(checker), cfg))

    # constant-1 texture modulation is an exact identity
    np.testing.assert_allclose(img_white, img_plain, atol=1e-6)
    # the black/white checker only removes energy, and removes a lot
    assert (img_check <= img_plain + 1e-5).all()
    floor_mask = img_plain.mean(-1) > 1e-4
    removed = (img_plain - img_check).mean(-1)[floor_mask]
    assert (removed > 1e-3).mean() > 0.1  # many pixels darkened
    assert np.isfinite(img_check).all()


@pytest.mark.skipif(not os.path.isdir(REF_SCENES), reason="reference assets absent")
def test_staircase2_textures_load():
    from gpuspectral_tpu.scene import load_mitsuba_scene

    scene, _ = load_mitsuba_scene(f"{REF_SCENES}/staircase2/scene.xml")
    assert scene.has_textures
    assert scene.textures.shape[0] >= 2  # wood, tiles, ...
    assert int(np.asarray((scene.bsdf_tex >= 0).sum())) >= 2
    # textures are linear floats in [0, ~1]
    tx = np.asarray(scene.textures)
    assert tx.min() >= 0.0 and tx.max() <= 1.0 + 1e-5
