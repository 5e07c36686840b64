"""Math convention tests.

These pin the exact reference conventions (src/vector_math.cpp): degree-based
rotations, +Z-forward lookAt, and the reversed-Z Y-flipped perspective —
SURVEY.md flags the projection as the #1 silent-divergence risk.
"""

import numpy as np
import pytest

from bibim_tpu import math3d as m3


def to_np(x):
    return np.asarray(x)


class TestVectors:
    def test_normalize(self):
        v = np.array([3.0, 0.0, 4.0], np.float32)
        np.testing.assert_allclose(to_np(m3.normalize(v)), [0.6, 0.0, 0.8], rtol=1e-6)

    def test_cross_matches_reference_formula(self):
        # vector_math.cpp:64-71
        a = np.array([1.0, 2.0, 3.0], np.float32)
        b = np.array([-4.0, 0.5, 2.0], np.float32)
        expect = np.array(
            [a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2], a[0] * b[1] - a[1] * b[0]]
        )
        np.testing.assert_allclose(to_np(m3.cross(a, b)), expect, rtol=1e-6)

    def test_spherical_to_cartesian(self):
        # vector_math.cpp:284-292: x = r cosθ cosφ, y = r sinθ, z = r cosθ sinφ
        out = to_np(m3.spherical_to_cartesian(2.0, 0.0, 0.0))
        np.testing.assert_allclose(out, [2.0, 0.0, 0.0], atol=1e-6)
        out = to_np(m3.spherical_to_cartesian(1.0, np.pi / 2, 0.3))
        np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-6)
        out = to_np(m3.spherical_to_cartesian(1.0, 0.0, np.pi / 2))
        np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-6)


class TestMatrices:
    def test_translate_applies_to_point(self):
        M = m3.translate([1.0, 2.0, 3.0])
        p = to_np(m3.transform_points(M, np.array([[0.5, 0.5, 0.5]], np.float32)))
        np.testing.assert_allclose(p[0], [1.5, 2.5, 3.5, 1.0], rtol=1e-6)

    def test_scale(self):
        M = m3.scale([2.0, 3.0, 4.0])
        p = to_np(m3.transform_points(M, np.array([[1.0, 1.0, 1.0]], np.float32)))
        np.testing.assert_allclose(p[0], [2.0, 3.0, 4.0, 1.0], rtol=1e-6)
        np.testing.assert_allclose(to_np(m3.scale(2.0)), to_np(m3.scale([2.0] * 3)))

    def test_rotations_are_degree_based_right_handed(self):
        # rotateX(90): +Y → +Z (vector_math.cpp:189-201 column layout)
        v = np.array([[0.0, 1.0, 0.0]], np.float32)
        out = to_np(m3.transform_points(m3.rotate_x(90.0), v))[0, :3]
        np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-6)
        # rotateY(90): +Z → +X  (reference: M[0][2]=sr ⇒ x' gets -sr*z... verify)
        v = np.array([[0.0, 0.0, 1.0]], np.float32)
        out = to_np(m3.transform_points(m3.rotate_y(90.0), v))[0, :3]
        np.testing.assert_allclose(out, [-1.0, 0.0, 0.0], atol=1e-6)
        # rotateZ(90): +X → +Y
        v = np.array([[1.0, 0.0, 0.0]], np.float32)
        out = to_np(m3.transform_points(m3.rotate_z(90.0), v))[0, :3]
        np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-6)

    def test_compose_order_matches_reference_chain(self):
        # scene.cpp:180-184: translate * rotY * rotX * scale applied to a point
        # means scale first, translate last.
        M = m3.compose(m3.translate([10.0, 0.0, 0.0]), m3.scale(2.0))
        p = to_np(m3.transform_points(M, np.array([[1.0, 0.0, 0.0]], np.float32)))
        np.testing.assert_allclose(p[0, :3], [12.0, 0.0, 0.0], rtol=1e-6)

    def test_inverse(self):
        M = m3.compose(
            m3.translate([1.0, -2.0, 3.0]), m3.rotate_y(33.0), m3.scale(0.01)
        )
        ident = to_np(m3.inverse(M) @ M)
        np.testing.assert_allclose(ident, np.eye(4), atol=1e-4)


class TestLookAt:
    def test_lookat_origin_plus_z(self):
        # Camera at origin looking +Z: view == identity-ish (right=+X? reference:
        # right = up × forward = (0,1,0)×(0,0,1) = (1,0,0))
        M = to_np(m3.look_at([0, 0, 0], [0, 0, 1]))
        np.testing.assert_allclose(M, np.eye(4), atol=1e-6)

    def test_lookat_translation(self):
        eye = np.array([1.0, 2.0, 3.0], np.float32)
        M = m3.look_at(eye, eye + np.array([0, 0, 1], np.float32))
        p = to_np(m3.transform_points(M, eye[None]))
        np.testing.assert_allclose(p[0, :3], [0, 0, 0], atol=1e-6)
        # point 5 units ahead of the camera lands at view-space z=+5
        p = to_np(m3.transform_points(M, (eye + [0, 0, 5])[None]))
        np.testing.assert_allclose(p[0, :3], [0, 0, 5], atol=1e-5)


class TestPerspective:
    """Reversed-Z Vulkan projection (vector_math.cpp:247-260)."""

    @pytest.mark.parametrize("near,far", [(0.1, 1000.0), (1.0, 100.0)])
    def test_near_maps_to_one_far_to_zero(self, near, far):
        P = m3.perspective(60.0, 16 / 9, near, far)
        for z_view, expect in [(near, 1.0), (far, 0.0)]:
            clip = to_np(m3.transform_points(P, np.array([[0, 0, z_view]], np.float32)))[0]
            ndc_z = clip[2] / clip[3]
            np.testing.assert_allclose(ndc_z, expect, atol=1e-5)

    def test_w_equals_view_z(self):
        P = m3.perspective(60.0, 1.0, 0.1, 1000.0)
        clip = to_np(m3.transform_points(P, np.array([[0.3, -0.2, 7.0]], np.float32)))[0]
        np.testing.assert_allclose(clip[3], 7.0, rtol=1e-6)

    def test_y_is_flipped(self):
        # A point above the view axis (+Y in view space) must project to
        # negative NDC y (top of a y-down framebuffer).
        P = m3.perspective(90.0, 1.0, 0.1, 100.0)
        clip = to_np(m3.transform_points(P, np.array([[0.0, 1.0, 2.0]], np.float32)))[0]
        assert clip[1] / clip[3] < 0

    def test_fov_edge(self):
        # At fov 90 and aspect 1, x = ±z_view maps to ndc x = ±1.
        P = m3.perspective(90.0, 1.0, 0.1, 100.0)
        clip = to_np(m3.transform_points(P, np.array([[2.0, 0.0, 2.0]], np.float32)))[0]
        np.testing.assert_allclose(clip[0] / clip[3], 1.0, rtol=1e-5)


class TestNormalMatrix:
    def test_matches_inverse_transpose(self):
        M = m3.compose(m3.rotate_y(30.0), m3.scale([1.0, 2.0, 3.0]))
        nm = to_np(m3.normal_matrix(m3.inverse(M)))
        expect = np.linalg.inv(to_np(M)[:3, :3]).T
        np.testing.assert_allclose(nm, expect, atol=1e-5)
