"""Scene loading tests: Mitsuba XML, OBJ, procedural shapes, camera."""

import numpy as np
import jax.numpy as jnp

from gpuspectral_tpu.scene import load_mitsuba_scene
from gpuspectral_tpu.scene.camera import generate_rays
from gpuspectral_tpu.scene.mitsuba import _snake
from gpuspectral_tpu.scene.obj import load_obj, make_cube, make_disk, make_rectangle
from gpuspectral_tpu.bsdf.table import BSDF_DIFFUSE


def test_snake_case_normalization():
    assert _snake("toWorld") == "to_world"
    assert _snake("intIOR") == "int_ior"
    assert _snake("diffuseReflectance") == "diffuse_reflectance"
    assert _snake("maxDepth") == "max_depth"
    assert _snake("sampleCount") == "sample_count"
    assert _snake("alpha") == "alpha"


def test_procedural_shapes():
    pos, nrm, uv = make_rectangle()
    assert pos.shape == (2, 3, 3)
    # both triangles wind to +z
    for p in pos:
        g = np.cross(p[1] - p[0], p[2] - p[0])
        assert g[2] > 0
    pos, nrm, uv = make_cube()
    assert pos.shape == (12, 3, 3)
    # outward winding: normal of each face points away from origin
    for p, n in zip(pos, nrm):
        g = np.cross(p[1] - p[0], p[2] - p[0])
        assert np.dot(g, p.mean(0)) > 0
        assert np.dot(g, n[0]) > 0
    pos, nrm, uv = make_disk(16)
    assert pos.shape == (16, 3, 3)


def test_obj_loader(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vt 0 0
f 1/1/1 2/1/1 3/1/1
f 2/1/1 4/1/1 3/1/1
"""
    )
    pos, nrm, uv = load_obj(str(p), cache=False)
    assert pos.shape == (2, 3, 3)
    np.testing.assert_allclose(nrm[:, :, 2], 1.0)


def test_obj_quad_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    pos, nrm, uv = load_obj(str(p), cache=False)
    assert pos.shape == (2, 3, 3)  # fan-triangulated
    # generated geometric normals
    np.testing.assert_allclose(np.abs(nrm[:, :, 2]), 1.0)


def test_cornell_load(cornell_scene):
    s = cornell_scene
    assert s.num_tris == 36  # 5 walls*2 + 2 cubes*12 + light*2
    assert s.num_lights == 2
    assert int(np.asarray(s.bsdf_kind)[0]) == BSDF_DIFFUSE
    em = np.asarray(s.tri_emission)
    assert (em.max(0) == np.asarray([17.0, 12.0, 4.0], np.float32)).all()
    # all light triangles near the ceiling
    lp = np.asarray(s.light_pos)
    np.testing.assert_allclose(lp[..., 1], 1.98, atol=1e-5)
    # twofaced flags came from the twosided wrappers
    tf = np.asarray(s.tri_twofaced)[: s.num_tris]
    assert tf.all()


def test_camera_rays_match_reference_formula(cornell_scene):
    """Center pixel looks straight down the camera -z_world axis for the
    cornell to_world; corners diverge symmetrically."""
    cam = cornell_scene.camera
    w = h = 101
    idx = jnp.asarray([h // 2 * w + w // 2], jnp.uint32)  # exact center
    o, d = generate_rays(cam, w, h, idx)
    o, d = np.asarray(o)[0], np.asarray(d)[0]
    np.testing.assert_allclose(o, [0, 1, 6.8], atol=1e-6)
    # to_world = diag(-1,1,-1) with eye (0,1,6.8): center ray -> -z then y
    # flip (the half-pixel offset of integer fragCoords leaves ~1e-3 slack)
    np.testing.assert_allclose(d, [0, 0, -1], atol=3e-3)
    # a pixel left of center maps to world -x (screen right = +x)
    idx2 = jnp.asarray([h // 2 * w + w // 2 - 10], jnp.uint32)
    _, d2 = generate_rays(cam, w, h, idx2)
    assert float(d2[0, 0]) < 0
    # a pixel above center maps to world +y
    idx3 = jnp.asarray([(h // 2 - 10) * w + w // 2], jnp.uint32)
    _, d3 = generate_rays(cam, w, h, idx3)
    assert float(d3[0, 1]) > 0


def test_film_and_integrator_parsed():
    from tests.conftest import CORNELL_XML

    scene, b = load_mitsuba_scene(str(CORNELL_XML))
    assert (b.film_width, b.film_height) == (1024, 1024)
    assert b.film_spp == 64
    assert b.max_depth == 65
