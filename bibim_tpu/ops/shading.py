"""Cook-Torrance GGX lighting — exact port of brdf.glsl + brdf.frag.

Every formula below is pinned to the reference shader source, including its
quirks, because pixel parity is a goal:

- D: Trowbridge-Reitz GGX with a = roughness² (brdf.glsl:5-16)
- G: Smith with Schlick-GGX, k = (r+1)²/8 (brdf.glsl:18-32)
- F: Schlick with F0 = mix(0.04, albedo, metallic) (brdf.glsl:34-36,
  brdf.frag:51-53)
- specular clamp max(4·NV·NL, 0.001) (brdf.frag:61)
- spot lights compare raw radian cutoffs against a cosine (brdf.frag:38-42 —
  a reference quirk kept verbatim)
- ambient = 0.03 · albedo · ao (brdf.frag:70)

All functions are elementwise over pixel arrays; the light loop is unrolled
at trace time over the scene's (static) light count, so XLA fuses the whole
lighting pass into one kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from bibim_tpu.scene.lights import Lights

PI = 3.1415926535897932384626433832795


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def distribution_ggx(n, h, roughness):
    """Trowbridge-Reitz GGX (brdf.glsl:5-16)."""
    a = roughness * roughness
    a2 = a * a
    ndh = jnp.maximum(_dot(n, h), 0.0)
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def geometry_schlick_ggx(nd, roughness):
    """(brdf.glsl:18-24)"""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return nd / (nd * (1.0 - k) + k)


def geometry_smith(n, v, l, roughness):
    """(brdf.glsl:26-32)"""
    ndv = jnp.maximum(_dot(n, v), 0.0)
    ndl = jnp.maximum(_dot(n, l), 0.0)
    return geometry_schlick_ggx(ndv, roughness) * geometry_schlick_ggx(ndl, roughness)


def fresnel_schlick(h, v, f0):
    """(brdf.glsl:34-36)"""
    return f0 + (1.0 - f0) * (1.0 - jnp.maximum(_dot(h, v), 0.0)) ** 5


def light_vector_and_attenuation(light_pos, light_type, light_dir,
                                 inner_cutoff, outer_cutoff, pos_world):
    """Per-light L vector and attenuation (brdf.frag:28-46).

    point: L = pos−p, att = 1/d²
    spot:  point × clamp((cosθ − outerCutOff)/(innerCutOff − outerCutOff), 0, 1)
    directional: L = −normalize(dir), att = 1
    """
    to_light = light_pos - pos_world
    d2 = jnp.maximum(_dot(to_light, to_light), 1e-20)
    l_point = to_light / jnp.sqrt(d2)
    att_point = 1.0 / d2

    dir_n = light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-20)
    theta = _dot(l_point, -dir_n)
    eps = inner_cutoff - outer_cutoff
    spot_factor = jnp.clip((theta - outer_cutoff) / jnp.where(eps == 0, 1.0, eps), 0.0, 1.0)

    is_spot = light_type == 1
    is_dir = light_type == 2
    l_vec = jnp.where(is_dir, -dir_n, l_point)
    att = jnp.where(is_dir, 1.0, att_point * jnp.where(is_spot, spot_factor, 1.0))
    return l_vec, att


def shade_pbr(
    pos_world: jnp.ndarray,  # (...,3)
    normal: jnp.ndarray,  # (...,3) need not be unit — normalized here (brdf.frag:49)
    albedo: jnp.ndarray,  # (...,3)
    metallic: jnp.ndarray,  # (...,1)
    roughness: jnp.ndarray,  # (...,1)
    ao: jnp.ndarray,  # (...,1)
    lights: Lights,
    view_pos: jnp.ndarray,  # (3,)
) -> jnp.ndarray:
    """Full lighting loop of brdf.frag:22-71 → linear HDR color (...,3)."""
    n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20)
    v = view_pos - pos_world
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    f0 = jnp.asarray(0.04, albedo.dtype) * (1.0 - metallic) + albedo * metallic

    lo = jnp.zeros_like(albedo)
    for i in range(lights.num_lights):
        l_vec, att = light_vector_and_attenuation(
            lights.pos[i],
            lights.type[i],
            lights.dir[i],
            lights.inner_cutoff[i],
            lights.outer_cutoff[i],
            pos_world,
        )
        h = l_vec + v
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)

        d = distribution_ggx(n, h, roughness)
        f = fresnel_schlick(h, v, f0)
        g = geometry_smith(n, v, l_vec, roughness)
        radiance = att * lights.color[i] * lights.intensity[i]

        ndv = jnp.maximum(_dot(v, n), 0.0)
        ndl = jnp.maximum(_dot(l_vec, n), 0.0)
        specular = (d * f * g) / jnp.maximum(4.0 * ndv * ndl, 0.001)
        kd = (1.0 - f) * (1.0 - metallic)
        lo = lo + (kd * albedo / PI + specular) * radiance * ndl

    ambient = 0.03 * albedo * ao
    return ambient + lo
