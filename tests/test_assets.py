"""Asset layer tests: importers, procedural meshes, materials, mips."""

import numpy as np
import pytest

from bibim_tpu.assets import (
    build_mip_pyramid,
    create_pbr_material_set,
    generate_plane_mesh,
    generate_quad_mesh,
    generate_uv_sphere_mesh,
    load_fbx_mesh,
    load_obj,
)
from bibim_tpu.assets.materials import PBRMapType
from bibim_tpu.assets.mesh import concat_meshes
from bibim_tpu.utils.config import get_resource_root

RES = get_resource_root()
needs_assets = pytest.mark.skipif(
    not RES.common("ShaderBall.fbx").is_file(), reason="reference assets not mounted"
)


class TestMeshGen:
    def test_plane(self):
        # render.cpp:1743-1757: 4 verts, 2 tris, +Y normal, XZ span ±0.5
        m = generate_plane_mesh()
        assert m.num_vertices == 4 and m.num_triangles == 2
        np.testing.assert_allclose(m.normals, [[0, 1, 0]] * 4)
        assert m.positions[:, 1].max() == 0.0

    def test_quad(self):
        m = generate_quad_mesh()
        assert m.num_vertices == 4 and m.num_triangles == 2
        np.testing.assert_allclose(m.normals, [[0, 0, -1]] * 4)

    def test_uv_sphere_counts_and_radius(self):
        # (H+1)*(V+1) grid verts; 2*H*(V-1) tris (degenerate pole rows skipped)
        m = generate_uv_sphere_mesh(0.1, 16, 16)
        assert m.num_vertices == 17 * 17
        assert m.num_triangles == 2 * 16 * 15
        r = np.linalg.norm(m.positions, axis=1)
        np.testing.assert_allclose(r, 0.1, atol=1e-6)
        n = np.linalg.norm(m.normals, axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-6)

    def test_concat_rebases_indices(self):
        a, b = generate_plane_mesh(), generate_quad_mesh()
        c = concat_meshes([a, b])
        assert c.num_vertices == 8 and c.num_triangles == 4
        assert c.indices[2:].min() == 4

    def test_deindex(self):
        m = generate_plane_mesh().deindexed()
        assert m.num_vertices == 6 and m.num_triangles == 2


@needs_assets
class TestImporters:
    def test_gizmo_obj(self):
        # main.cpp:216-283: triangulated, per-mesh MTL diffuse baked as color
        m = load_obj(RES.common("gizmo.obj"))
        assert m.num_triangles == 594  # 180 tris + 180 quads*2 + 3 icosagons*18
        assert m.colors is not None
        uniq = np.unique(m.colors.round(2), axis=0)
        assert len(uniq) == 4  # R, G, B axes + gray (gizmo.mtl Kd values)

    def test_shaderball_fbx(self):
        # scene.cpp:57-82: triangulated, tangents generated, de-indexed
        m = load_fbx_mesh(RES.common("ShaderBall.fbx"))
        assert m.num_triangles == 9776
        assert m.num_vertices == 3 * m.num_triangles  # de-indexed
        np.testing.assert_allclose(np.linalg.norm(m.normals, axis=1), 1.0, atol=1e-3)
        np.testing.assert_allclose(np.linalg.norm(m.tangents, axis=1), 1.0, atol=1e-3)
        # tangents orthogonal to normals (Gram-Schmidt in CalcTangentSpace analog)
        dots = np.abs(np.sum(m.normals * m.tangents, axis=1))
        assert np.percentile(dots, 99) < 1e-3


class TestMips:
    def test_pyramid_shapes(self):
        img = np.random.default_rng(0).integers(0, 255, (64, 32, 4), np.uint8)
        mips = build_mip_pyramid(img)
        assert [m.shape[:2] for m in mips[:4]] == [(64, 32), (32, 16), (16, 8), (8, 4)]
        assert mips[-1].shape[0] == 1 or mips[-1].shape[1] == 1

    def test_box_filter_average(self):
        img = np.zeros((2, 2, 1), np.uint8)
        img[0, 0] = 100
        mips = build_mip_pyramid(img)
        assert mips[1][0, 0, 0] == 25


@needs_assets
class TestMaterialSet:
    def test_scan_and_fallback(self):
        ms = create_pbr_material_set()
        assert "default" not in ms.names  # split out (render.cpp:1304-1313)
        assert "bamboo_wood_semigloss" in ms.names
        i = ms.names.index("bamboo_wood_semigloss")
        # present map: 2048² own data; missing map: 16² default fallback
        assert ms.get_pbr_map_or_default(i, PBRMapType.AO)[0].shape[0] == 2048
        assert ms.get_pbr_map_or_default(i, PBRMapType.ALBEDO)[0].shape[0] == 16
        # 'empty' material: every map falls back
        j = ms.names.index("empty")
        for t in PBRMapType:
            assert ms.get_pbr_map_or_default(j, t)[0].shape[0] == 16


class TestNativeDecoder:
    """The C decode path (native/bibim_native.cpp, the stb_image +
    Win32-threaded-loader analog, resource.cpp:157-366) must agree with
    PIL byte-for-byte on every format the asset scan feeds it. Skips
    when the native library isn't built (PIL fallback covers prod)."""

    def _imgs(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(21)
        paths = []
        for name, mode, shape in [
            ("rgb.png", "RGB", (13, 17, 3)),
            ("rgba.png", "RGBA", (16, 16, 4)),
            ("gray.png", "L", (9, 31)),
        ]:
            arr = rng.integers(0, 256, shape, np.uint8)
            p = str(tmp_path / name)
            Image.fromarray(arr, mode).save(p)
            paths.append(p)
        jp = str(tmp_path / "photo.jpg")
        Image.fromarray(
            rng.integers(0, 256, (24, 40, 3), np.uint8), "RGB"
        ).save(jp, quality=95)
        paths.append(jp)
        return paths

    def test_decode_matches_pil(self, tmp_path):
        import pytest
        from PIL import Image

        native = pytest.importorskip(
            "bibim_tpu.native", reason="native decoder not built")
        for p in self._imgs(tmp_path):
            got = native.decode_image_rgba8(p)
            want = np.asarray(Image.open(p).convert("RGBA"))
            np.testing.assert_array_equal(got, want, err_msg=p)

    def test_decode_batch_matches_serial_and_handles_missing(
            self, tmp_path):
        import pytest

        native = pytest.importorskip(
            "bibim_tpu.native", reason="native decoder not built")
        paths = self._imgs(tmp_path)
        serial = [native.decode_image_rgba8(p) for p in paths]
        batch = native.decode_batch_rgba8(
            paths + [str(tmp_path / "missing.png")], max_threads=3)
        for a, b in zip(serial, batch):
            np.testing.assert_array_equal(a, b)
        assert batch[-1] is None  # missing file -> None, no crash

    def test_write_png_roundtrip(self, tmp_path):
        import pytest
        from PIL import Image

        native = pytest.importorskip(
            "bibim_tpu.native", reason="native decoder not built")
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (33, 129, 3), np.uint8)
        p = str(tmp_path / "out.png")
        if not native.write_png(p, img):
            pytest.skip("native PNG writer not built")
        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
