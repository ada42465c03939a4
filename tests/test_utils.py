"""Math-core anchors ported from the reference's inline unit tests
(src/utils.rs:699-913, SURVEY.md §4): vector ops, color quantization/gamma,
degree<->radian round trips, interval semantics, plus RNG determinism checks
that the reference cannot have (its RNG is thread-local and unseeded)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from crucible_tpu.utils import color, interval, rng, vec
from crucible_tpu.utils.angles import Degrees, Radians


class TestVec:
    def test_dot(self):
        a = jnp.array([1.0, 2.0, 3.0])
        b = jnp.array([4.0, -5.0, 6.0])
        assert float(vec.dot(a, b)) == pytest.approx(1 * 4 - 2 * 5 + 3 * 6)

    def test_cross(self):
        a = jnp.array([1.0, 0.0, 0.0])
        b = jnp.array([0.0, 1.0, 0.0])
        np.testing.assert_allclose(vec.cross(a, b), [0.0, 0.0, 1.0])

    def test_length_and_unit(self):
        a = jnp.array([3.0, 4.0, 0.0])
        assert float(vec.length(a)) == pytest.approx(5.0)
        np.testing.assert_allclose(vec.unit(a), [0.6, 0.8, 0.0], rtol=1e-6)

    def test_batched_broadcast(self):
        a = jnp.ones((10, 3))
        b = jnp.ones((10, 3)) * 2
        assert vec.dot(a, b).shape == (10,)
        np.testing.assert_allclose(vec.dot(a, b), 6.0)

    def test_reflect(self):
        v = jnp.array([1.0, -1.0, 0.0])
        n = jnp.array([0.0, 1.0, 0.0])
        np.testing.assert_allclose(vec.reflect(v, n), [1.0, 1.0, 0.0])

    def test_refract_straight_through(self):
        uv = jnp.array([0.0, -1.0, 0.0])
        n = jnp.array([0.0, 1.0, 0.0])
        out = vec.refract(uv, n, 1.0)
        np.testing.assert_allclose(out, [0.0, -1.0, 0.0], atol=1e-6)

    def test_refract_snell(self):
        # 45-degree incidence into eta=1.5 medium: sin(theta_t) = sin(45)/1.5.
        uv = vec.unit(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        out = vec.refract(uv, n, 1.0 / 1.5)
        sin_out = float(out[0]) / float(vec.length(out))
        assert sin_out == pytest.approx(math.sin(math.radians(45)) / 1.5, abs=1e-6)

    def test_near_zero(self):
        assert bool(vec.near_zero(jnp.array([1e-9, 0.0, -1e-9])))
        assert not bool(vec.near_zero(jnp.array([1e-3, 0.0, 0.0])))


class TestAngles:
    def test_round_trip(self):
        # Tolerance-based round trips (src/utils.rs:808-831).
        for d in [0.0, 45.0, 90.0, 123.456, 360.0]:
            assert Degrees(d).to_radians().to_degrees().value == pytest.approx(d)

    def test_known_values(self):
        assert Degrees(180.0).to_radians().value == pytest.approx(math.pi)
        assert Radians(math.pi / 2).to_degrees().value == pytest.approx(90.0)


class TestInterval:
    def test_contains_surrounds(self):
        # src/utils.rs:834-856 semantics: contains is closed, surrounds open.
        assert bool(interval.contains(0.0, 1.0, 0.0))
        assert bool(interval.contains(0.0, 1.0, 1.0))
        assert not bool(interval.surrounds(0.0, 1.0, 0.0))
        assert not bool(interval.surrounds(0.0, 1.0, 1.0))
        assert bool(interval.surrounds(0.0, 1.0, 0.5))

    def test_empty_universe(self):
        # EMPTY contains nothing, UNIVERSE everything (randomized probes,
        # src/utils.rs:858-884).
        xs = np.random.default_rng(0).uniform(-1e6, 1e6, 64)
        assert not np.any(interval.contains(interval.EMPTY[0], interval.EMPTY[1], xs))
        assert np.all(interval.contains(interval.UNIVERSE[0], interval.UNIVERSE[1], xs))

    def test_clamp(self):
        np.testing.assert_allclose(
            interval.clamp(0.0, 1.0, jnp.array([-1.0, 0.5, 2.0])), [0.0, 0.5, 1.0]
        )

    def test_proportion(self):
        assert float(interval.proportion(2.0, 4.0, 3.0)) == pytest.approx(0.5)
        # Degenerate interval -> step (NERP keyframe semantics).
        assert float(interval.proportion(2.0, 2.0, 1.9)) == 0.0
        assert float(interval.proportion(2.0, 2.0, 2.1)) == 1.0


class TestColor:
    def test_gamma_is_sqrt(self):
        # linear_to_gamma = sqrt (src/utils.rs:407-410).
        np.testing.assert_allclose(color.linear_to_gamma(jnp.array([0.25])), [0.5])

    def test_byte_quantization(self):
        # (255 * c) truncation after gamma; c=1 -> 255 (src/utils.rs:432-434).
        c = jnp.array([0.0, 1.0, 0.25])
        b = color.to_bytes(c)
        assert b[0] == 0
        assert b[1] == 255
        assert b[2] == int(255.0 * 0.5)  # gamma(0.25)=0.5 -> 127

    def test_clamps_out_of_range(self):
        b = color.to_bytes(jnp.array([-0.5, 7.0]))
        assert b[0] == 0 and b[1] == 255


class TestRng:
    def test_deterministic(self):
        a = rng.uniform4(jnp.arange(100), 3, 5, 42)
        b = rng.uniform4(jnp.arange(100), 3, 5, 42)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_streams_differ(self):
        a = rng.uniform1(jnp.arange(100), 3, 5, 42)
        b = rng.uniform1(jnp.arange(100), 3, 6, 42)
        assert not np.allclose(a, b)

    def test_range_and_distribution(self):
        u = np.asarray(rng.uniform1(jnp.arange(20000), 0, 0, 0))
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.01

    def test_sharding_invariance(self):
        """The value for a (pixel, sample) pair must not depend on batch
        layout — the property that makes multi-chip renders deterministic."""
        full = np.asarray(rng.uniform1(jnp.arange(64), 1, 2, 9))
        lo = np.asarray(rng.uniform1(jnp.arange(0, 32), 1, 2, 9))
        hi = np.asarray(rng.uniform1(jnp.arange(32, 64), 1, 2, 9))
        np.testing.assert_array_equal(full, np.concatenate([lo, hi]))


class TestColorComplement:
    def test_complement(self):
        # Color complement (Neg) anchor (src/utils.rs:445-483).
        np.testing.assert_allclose(
            color.complement(jnp.array([0.0, 0.25, 1.0])), [1.0, 0.75, 0.0]
        )
