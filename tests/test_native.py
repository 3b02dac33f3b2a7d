"""Tests for the native C++ host components vs the Python fallbacks."""
import os

import numpy as np
import pytest

from madarch_tpu import native

SUZANNE = "/root/reference/media/suzanne.obj"


def test_native_builds():
    assert native.available(), "native library failed to build"


@pytest.mark.skipif(not os.path.exists(SUZANNE), reason="asset missing")
def test_native_obj_matches_python():
    from madarch_tpu.scene.mesh import load_obj as py_load
    m_native = native.load_obj(SUZANNE)
    m_py = py_load(SUZANNE)
    np.testing.assert_allclose(m_native.vertices, m_py.vertices)
    np.testing.assert_array_equal(m_native.triangles, m_py.triangles)
    np.testing.assert_allclose(m_native.normals, m_py.normals)


def test_native_bvh_matches_python_structure():
    from madarch_tpu.scene.bvh import build_bvh as py_build, visit
    rng = np.random.RandomState(3)
    centers = rng.uniform(0, 10, (32, 3)).astype(np.float32)
    boxes = [(c - 0.5, c + 0.5) for c in centers]

    t_native = native.build_bvh(boxes)
    t_py = py_build(boxes)

    def leaves(t):
        out = []
        visit(t, lambda n: out.append(int(n.indices[0])),
              lambda n, l, r: None)
        return out

    assert sorted(leaves(t_native)) == list(range(32))
    # identical SAH sweep => identical root bounds and leaf partition sizes
    np.testing.assert_allclose(t_native.lo, t_py.lo)
    np.testing.assert_allclose(t_native.hi, t_py.hi)

    def depth(t):
        if t.is_leaf:
            return 1
        return 1 + max(depth(t.left), depth(t.right))

    assert abs(depth(t_native) - depth(t_py)) <= 2


def test_distance_transform_single_site():
    occ = np.zeros((9, 9, 9), bool)
    occ[4, 4, 4] = True
    d = native.distance_transform(occ, spacing=(1.0, 1.0, 1.0))
    assert d[4, 4, 4] == 0.0
    assert np.isclose(d[4, 4, 8], 4.0, rtol=0.1)
    assert np.isclose(d[8, 8, 8], np.sqrt(48), rtol=0.15)


def test_distance_transform_matches_bruteforce():
    rng = np.random.RandomState(0)
    occ = rng.rand(12, 10, 8) > 0.9
    occ[0, 0, 0] = True  # ensure nonempty
    d = native.distance_transform(occ, spacing=(0.5, 1.0, 2.0))
    # exact brute force
    sites = np.argwhere(occ)
    ix, iy, iz = np.meshgrid(np.arange(12), np.arange(10), np.arange(8),
                             indexing="ij")
    pts = np.stack([ix, iy, iz], -1).reshape(-1, 3).astype(np.float32)
    sp = np.asarray([0.5, 1.0, 2.0], np.float32)
    exact = np.min(np.linalg.norm(
        (pts[:, None] - sites[None].astype(np.float32)) * sp, axis=-1),
        axis=1).reshape(12, 10, 8)
    # the sweep transform is near-exact (vector propagation)
    assert np.mean(np.abs(d - exact)) < 0.05
    assert np.max(np.abs(d - exact)) < 1.0
