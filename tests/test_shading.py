"""GGX shading parity vs the NumPy oracle (brdf.frag port checks)."""

import jax.numpy as jnp
import numpy as np

from bibim_tpu.ops.shading import shade_pbr
from bibim_tpu.scene.lights import LightType, make_lights
from bibim_tpu.testing.oracle import oracle_shade_pbr


def _random_surface(rng, n=64):
    pos = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    albedo = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    metallic = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    roughness = rng.uniform(0.05, 1, (n, 1)).astype(np.float32)
    ao = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    return pos, normal, albedo, metallic, roughness, ao


LIGHTS = [
    dict(type=LightType.DIRECTIONAL, dir=(-1, -1, 0), color=(0.2347, 0.2131, 0.2079),
         intensity=10.0, inner_cutoff=0.0, outer_cutoff=0.0),
    dict(type=LightType.POINT, pos=(0, 2, 0), color=(1, 0.8, 0.8), intensity=50,
         dir=(0, 0, 1), inner_cutoff=0.0, outer_cutoff=0.0),
    dict(type=LightType.SPOT, pos=(4, 2, 0), dir=(0, -1, 0), color=(0.8, 1, 0.8),
         intensity=50, inner_cutoff=np.radians(30), outer_cutoff=np.radians(25)),
]


class TestShadePBR:
    def test_matches_oracle_all_light_types(self):
        rng = np.random.default_rng(5)
        pos, normal, albedo, metallic, roughness, ao = _random_surface(rng)
        lights = make_lights(LIGHTS)
        view_pos = np.float32([0.5, 1.0, -4.0])

        got = np.asarray(
            shade_pbr(
                jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(albedo),
                jnp.asarray(metallic), jnp.asarray(roughness), jnp.asarray(ao),
                lights, jnp.asarray(view_pos),
            )
        )
        # Oracle expects python dicts (type as int)
        olights = [dict(l, type=int(l["type"])) for l in LIGHTS]
        expect = oracle_shade_pbr(pos, normal, albedo, metallic, roughness, ao,
                                  olights, view_pos)
        np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-5)

    def test_ambient_only_when_unlit(self):
        # Surface facing away from a directional light → ambient = 0.03·albedo·ao
        albedo = np.ones((4, 3), np.float32) * 0.5
        out = np.asarray(
            shade_pbr(
                jnp.zeros((4, 3)), jnp.asarray([[0, 0, -1.0]] * 4),
                jnp.asarray(albedo), jnp.zeros((4, 1)), jnp.full((4, 1), 0.5),
                jnp.ones((4, 1)),
                make_lights([dict(type=LightType.DIRECTIONAL, dir=(0, 0, -1),
                                  color=(1, 1, 1), intensity=5.0)]),
                jnp.asarray([0.0, 0.0, -1.0]),
            )
        )
        np.testing.assert_allclose(out, 0.03 * albedo, atol=1e-6)

    def test_spot_cutoff_quirk(self):
        # The reference compares radian cutoffs against a cosine
        # (brdf.frag:40-42). With inner=30°(0.524) > outer=25°(0.436) rad and
        # cosθ=1 directly under the light: factor=clamp((1-0.436)/0.087,0,1)=1.
        lights = make_lights([dict(type=LightType.SPOT, pos=(0, 1, 0), dir=(0, -1, 0),
                                   color=(1, 1, 1), intensity=1.0,
                                   inner_cutoff=np.radians(30),
                                   outer_cutoff=np.radians(25))])
        below = np.asarray(
            shade_pbr(jnp.zeros((1, 3)), jnp.asarray([[0, 1.0, 0]]),
                      jnp.ones((1, 3)), jnp.zeros((1, 1)), jnp.full((1, 1), 0.5),
                      jnp.ones((1, 1)), lights, jnp.asarray([0.0, 2.0, 0.0]))
        )
        assert (below > 0.03).any()  # lit beyond ambient
