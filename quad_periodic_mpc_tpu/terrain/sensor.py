"""Point-cloud sensor processors: per-point height-variance models.

Rebuilds the elevation_mapping sensor-processor family
(elevation_mapping/src/sensor_processors/*.cpp) as batched functions:
given sensor-frame points, the sensor model's diagonal covariance
Sigma_S, the map-frame transforms, and the robot pose covariance, apply
the error-propagation law

    sigma_h = J_q Sigma_q J_q^T + J_s Sigma_S J_s^T
    J_s = P C_MB C_BS,  J_q = P C_MB ([C_BS p]x + [r_BS]x)

(StructuredLightSensorProcessor.cpp:45-105, LaserSensorProcessor.cpp:43-90)
and transform points to the map frame.  The four reference models:

- structured light (depth camera): normal deviation a + b (d - c)^2 +
  d_f d^e along the optical axis, lateral ~ l d;
- laser: lateral (beam_constant + beam_angle * range)^2, fixed normal
  min_radius^2;
- stereo: like structured light with depth-quadratic normal noise;
- perfect: zero sensor noise (ground-truth clouds).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops.rotations import skew


@dataclasses.dataclass(frozen=True)
class StructuredLightModel:
    normal_a: float = 6.8e-3
    normal_b: float = 2.8e-3
    normal_c: float = 0.4
    normal_d: float = 0.0
    normal_e: float = 1.0
    lateral_factor: float = 0.01576

    def sensor_variance(self, points: jnp.ndarray) -> jnp.ndarray:
        d = points[..., 2]
        dev_n = (
            self.normal_a
            + self.normal_b * (d - self.normal_c) ** 2
            + self.normal_d * jnp.abs(d) ** self.normal_e
        )
        dev_l = self.lateral_factor * d
        return jnp.stack([dev_l**2, dev_l**2, dev_n**2], axis=-1)


@dataclasses.dataclass(frozen=True)
class LaserModel:
    min_radius: float = 0.018
    beam_constant: float = 0.0015
    beam_angle: float = 0.0006

    def sensor_variance(self, points: jnp.ndarray) -> jnp.ndarray:
        d = jnp.linalg.norm(points, axis=-1)
        var_l = (self.beam_constant + self.beam_angle * d) ** 2
        var_n = jnp.full_like(var_l, self.min_radius**2)
        return jnp.stack([var_l, var_l, var_n], axis=-1)


@dataclasses.dataclass(frozen=True)
class PerfectModel:
    def sensor_variance(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(points.shape[:-1] + (3,), points.dtype)


@dataclasses.dataclass(frozen=True)
class StereoModel:
    """Disparity-quadratic stereo depth noise
    (StereoSensorProcessor.cpp:40-97): with disparity d_p = f/z,

        var_n = (f/d_p^2)^2 * ((p5 d_p + p2) sqrt((p3 d_p + p4 - j)^2
                + (v_c - i)^2) + p1),
        var_l = (lateral_factor * |p|)^2.

    The reference indexes the organized cloud for the pixel (i, j) of
    each point (StereoSensorProcessor.cpp:115-121); pass `pixel_ij`
    (..., n, 2) per cloud to `sensor_variance` for that.  Without
    pixels, the fallback assumes each point sits at row v_center and at
    the disparity-shifted principal column j = p3*d_p + p4, zeroing
    both offset terms.  Points outside
    [cutoff_min_depth, cutoff_max_depth] are the reference's
    PassThrough-filtered points (:100-111) — mask via `depth_mask`.
    """

    p_1: float = 0.0
    p_2: float = 0.0
    p_3: float = 0.0
    p_4: float = 0.0
    p_5: float = 0.0
    lateral_factor: float = 0.0
    depth_to_disparity_factor: float = 1.0
    v_center: float = 240.0
    cutoff_min_depth: float = 0.0
    cutoff_max_depth: float = jnp.inf

    def sensor_variance(
        self, points: jnp.ndarray, pixel_ij: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        f = self.depth_to_disparity_factor
        z = points[..., 2]
        disparity = f / z
        if pixel_ij is not None:
            di = self.v_center - pixel_ij[..., 0]
            dj = self.p_3 * disparity + self.p_4 - pixel_ij[..., 1]
        else:
            di = jnp.zeros_like(z)
            dj = jnp.zeros_like(z)  # j = p3*d_p + p4 (principal column)
        var_n = (f / disparity**2) ** 2 * (
            (self.p_5 * disparity + self.p_2) * jnp.sqrt(dj**2 + di**2)
            + self.p_1
        )
        var_l = (self.lateral_factor * jnp.linalg.norm(points, axis=-1)) ** 2
        return jnp.stack([var_l, var_l, var_n], axis=-1)

    def depth_mask(self, points: jnp.ndarray) -> jnp.ndarray:
        z = points[..., 2]
        return (z >= self.cutoff_min_depth) & (z <= self.cutoff_max_depth)


def process_points(
    points_sensor: jnp.ndarray,       # (..., n, 3)
    model,
    R_map_base: jnp.ndarray,          # (..., 3, 3) base->map rotation
    R_base_sensor: jnp.ndarray,       # (3, 3) sensor->base rotation
    t_base_sensor: jnp.ndarray,       # (3,) sensor origin in base frame
    t_map_base: jnp.ndarray,          # (..., 3) base origin in map frame
    rotation_covariance: jnp.ndarray | None = None,   # (..., 3, 3)
    pixel_ij: jnp.ndarray | None = None,              # (..., n, 2)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (points_map (..., n, 3), height_variances (..., n)).

    `pixel_ij` is per-cloud data forwarded to models that use the
    organized-cloud pixel (StereoModel); others ignore it.
    """
    dtype = points_sensor.dtype
    p_base = jnp.einsum(
        "ij,...nj->...ni", R_base_sensor, points_sensor
    ) + t_base_sensor
    p_map = jnp.einsum(
        "...ij,...nj->...ni", R_map_base, p_base
    ) + t_map_base[..., None, :]

    # J_s = P C_MB C_BS (row vector); P = e_z
    C = R_map_base @ R_base_sensor
    J_s = C[..., 2, :]                                     # (..., 3)
    if pixel_ij is not None:
        sv = model.sensor_variance(points_sensor, pixel_ij=pixel_ij)
    else:
        sv = model.sensor_variance(points_sensor)          # (..., n, 3)
    var_sensor = jnp.einsum("...j,...nj,...j->...n", J_s, sv, J_s)

    if rotation_covariance is not None:
        # J_q = P C_MB ([C_BS p]x + [r_BS]x)
        Cp = jnp.einsum("ij,...nj->...ni", R_base_sensor, points_sensor)
        Jq = jnp.einsum(
            "...i,...nij->...nj",
            R_map_base[..., 2, :],
            skew(Cp) + skew(t_base_sensor),
        )
        var_rot = jnp.einsum(
            "...ni,...ij,...nj->...n", Jq, rotation_covariance, Jq
        )
    else:
        var_rot = jnp.zeros(var_sensor.shape, dtype)
    return p_map, var_sensor + var_rot
