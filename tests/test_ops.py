"""Sampler, intersection, and BVH unit tests (geometry anchors from
src/objects/sphere.rs, triangle.rs, bvh.rs behaviors)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crucible_tpu.ops import bvh as bvh_mod
from crucible_tpu.ops import intersect, sampling
from crucible_tpu.ops.traverse import bvh_hit_triangles


class TestSampling:
    def test_unit_vector_is_unit_and_uniform(self, rng):
        u1 = jnp.asarray(rng.random(5000), jnp.float32)
        u2 = jnp.asarray(rng.random(5000), jnp.float32)
        v = np.asarray(sampling.unit_vector(u1, u2))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        # Uniform on the sphere: each component has mean 0, E[z^2] = 1/3.
        assert np.abs(v.mean(axis=0)).max() < 0.03
        assert np.allclose((v**2).mean(axis=0), 1.0 / 3.0, atol=0.02)

    def test_unit_disk(self, rng):
        u1 = jnp.asarray(rng.random(5000), jnp.float32)
        u2 = jnp.asarray(rng.random(5000), jnp.float32)
        p = np.asarray(sampling.in_unit_disk(u1, u2))
        r = np.linalg.norm(p, axis=-1)
        assert r.max() <= 1.0
        # Uniform density: mean radius = 2/3.
        assert r.mean() == pytest.approx(2.0 / 3.0, abs=0.02)

    def test_square_offset_range(self, rng):
        u1 = jnp.asarray(rng.random(1000), jnp.float32)
        u2 = jnp.asarray(rng.random(1000), jnp.float32)
        o = np.asarray(sampling.square_offset(u1, u2))
        assert o.min() >= -0.5 and o.max() < 0.5

    def test_hemisphere(self, rng):
        n = jnp.array([0.0, 1.0, 0.0])
        u1 = jnp.asarray(rng.random(100), jnp.float32)
        u2 = jnp.asarray(rng.random(100), jnp.float32)
        v = np.asarray(sampling.on_hemisphere(u1, u2, n))
        assert (v[:, 1] >= 0).all()


class TestSphereHit:
    def _single(self, o, d, center, radius, t_min=1e-3, t_max=np.inf):
        t, idx, hit = intersect.hit_spheres(
            jnp.asarray([o], jnp.float32),
            jnp.asarray([d], jnp.float32),
            jnp.asarray([center], jnp.float32),
            jnp.asarray([radius], jnp.float32),
            jnp.asarray([True]),
            t_min,
            t_max,
        )
        return float(t[0]), bool(hit[0])

    def test_head_on(self):
        t, hit = self._single([0, 0, 0], [0, 0, -1], [0, 0, -5], 1.0)
        assert hit and t == pytest.approx(4.0, rel=1e-5)

    def test_miss(self):
        _, hit = self._single([0, 0, 0], [0, 1, 0], [0, 0, -5], 1.0)
        assert not hit

    def test_inside_sphere_takes_far_root(self):
        # Origin inside: near root is negative, far root accepted
        # (src/objects/sphere.rs:88-95 root fallback).
        t, hit = self._single([0, 0, 0], [0, 0, -1], [0, 0, 0], 2.0)
        assert hit and t == pytest.approx(2.0, rel=1e-5)

    def test_t_min_excludes_acne(self):
        # A hit exactly at t=0 must be rejected (shadow acne epsilon).
        t, hit = self._single([0, 0, 1.0], [0, 0, -1], [0, 0, 1.0], 1e-9)
        assert not hit

    def test_unnormalized_direction(self):
        t, hit = self._single([0, 0, 0], [0, 0, -10], [0, 0, -5], 1.0)
        assert hit and t == pytest.approx(0.4, rel=1e-5)

    def test_closest_of_many(self, rng):
        centers = jnp.asarray([[0, 0, -3], [0, 0, -6], [0, 0, -9]], jnp.float32)
        radii = jnp.ones((3,), jnp.float32) * 0.5
        t, idx, hit = intersect.hit_spheres(
            jnp.zeros((1, 3)),
            jnp.asarray([[0, 0, -1.0]]),
            centers,
            radii,
            jnp.ones((3,), bool),
            1e-3,
            np.inf,
        )
        assert bool(hit[0]) and int(idx[0]) == 0
        assert float(t[0]) == pytest.approx(2.5, rel=1e-5)

    def test_inactive_masked(self):
        centers = jnp.asarray([[0, 0, -3]], jnp.float32)
        t, idx, hit = intersect.hit_spheres(
            jnp.zeros((1, 3)),
            jnp.asarray([[0, 0, -1.0]]),
            centers,
            jnp.ones((1,)),
            jnp.zeros((1,), bool),
            1e-3,
            np.inf,
        )
        assert not bool(hit[0])

    def test_sphere_uv(self):
        # Anchors from get_sphere_uv (sphere.rs:41-46): +x -> (0.5, 0.5),
        # +y -> (*, 1), -y -> (*, 0).
        u, v = intersect.sphere_uv(jnp.asarray([[1.0, 0, 0]]))
        assert float(u[0]) == pytest.approx(0.5)
        assert float(v[0]) == pytest.approx(0.5)
        u, v = intersect.sphere_uv(jnp.asarray([[0.0, 1.0, 0]]))
        assert float(v[0]) == pytest.approx(1.0)
        u, v = intersect.sphere_uv(jnp.asarray([[0.0, -1.0, 0]]))
        assert float(v[0]) == pytest.approx(0.0)


class TestTriangleHit:
    def test_hit_and_miss(self):
        v0 = jnp.asarray([[0, 0, -2]], jnp.float32)
        v1 = jnp.asarray([[1, 0, -2]], jnp.float32)
        v2 = jnp.asarray([[0, 1, -2]], jnp.float32)
        o = jnp.asarray([[0.2, 0.2, 0], [0.9, 0.9, 0]], jnp.float32)
        d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
        t, idx, hit = intersect.hit_triangles(
            o, d, v0, v1, v2, jnp.ones((1,), bool), 1e-3, np.inf
        )
        assert bool(hit[0]) and float(t[0]) == pytest.approx(2.0, rel=1e-5)
        assert not bool(hit[1])  # outside the triangle

    def test_parallel_ray_misses(self):
        v0 = jnp.asarray([[0, 0, -2]], jnp.float32)
        v1 = jnp.asarray([[1, 0, -2]], jnp.float32)
        v2 = jnp.asarray([[0, 1, -2]], jnp.float32)
        o = jnp.asarray([[0, 0, 0]], jnp.float32)
        d = jnp.asarray([[1, 0, 0]], jnp.float32)
        _, _, hit = intersect.hit_triangles(
            o, d, v0, v1, v2, jnp.ones((1,), bool), 1e-3, np.inf
        )
        assert not bool(hit[0])


def _random_tris(rng, m, spread=10.0):
    base = rng.uniform(-spread, spread, (m, 1, 3)).astype(np.float32)
    offs = rng.uniform(-0.5, 0.5, (m, 3, 3)).astype(np.float32)
    tri = base + offs
    return tri[:, 0], tri[:, 1], tri[:, 2]


class TestBVH:
    def test_build_structure(self, rng):
        v0, v1, v2 = _random_tris(rng, 37)
        bb_min = np.minimum(np.minimum(v0, v1), v2)
        bb_max = np.maximum(np.maximum(v0, v1), v2)
        b = bvh_mod.build_bvh(bb_min, bb_max, leaf_size=4)
        assert sorted(b.perm.tolist()) == list(range(37))
        leaf_counts = b.node_count[b.node_count > 0]
        assert leaf_counts.sum() == 37
        assert leaf_counts.max() <= 4
        # Root box encloses all primitive boxes.
        np.testing.assert_array_compare(np.less_equal, b.node_min[0], bb_min.min(0) + 1e-6)
        # Miss links are monotone and in range.
        assert (b.node_miss > np.arange(b.num_nodes)).all()
        assert (b.node_miss <= b.num_nodes).all()

    def test_traversal_matches_bruteforce(self, rng):
        m = 200
        v0, v1, v2 = _random_tris(rng, m)
        bb_min = np.minimum(np.minimum(v0, v1), v2)
        bb_max = np.maximum(np.maximum(v0, v1), v2)
        b = bvh_mod.build_bvh(bb_min, bb_max, leaf_size=4)
        p = b.perm
        jv0, jv1, jv2 = (jnp.asarray(a[p]) for a in (v0, v1, v2))

        r = 128
        o = jnp.asarray(rng.uniform(-15, 15, (r, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(r, 3)), jnp.float32)

        t_b, i_b, hit_b = bvh_hit_triangles(
            o, d, jv0, jv1, jv2,
            jnp.asarray(b.node_min), jnp.asarray(b.node_max),
            jnp.asarray(b.node_first), jnp.asarray(b.node_count),
            jnp.asarray(b.node_miss), 1e-3, intersect.BIG, 4,
        )
        t_ref, i_ref, hit_ref = intersect.hit_triangles(
            o, d, jv0, jv1, jv2, jnp.ones((m,), bool), 1e-3, np.inf
        )
        np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_ref))
        np.testing.assert_allclose(
            np.asarray(t_b)[np.asarray(hit_b)],
            np.asarray(t_ref)[np.asarray(hit_ref)],
            rtol=1e-4,
        )

    def test_refit_encloses(self, rng):
        v0, v1, v2 = _random_tris(rng, 50)
        bb_min = np.minimum(np.minimum(v0, v1), v2)
        bb_max = np.maximum(np.maximum(v0, v1), v2)
        b = bvh_mod.build_bvh(bb_min, bb_max)
        shift = np.float32([5.0, 0.0, 0.0])
        nm, nx = bvh_mod.refit_bounds(b, bb_min + shift, bb_max + shift)
        np.testing.assert_allclose(nm[0], bb_min.min(0) + shift, rtol=1e-6)
        np.testing.assert_allclose(nx[0], bb_max.max(0) + shift, rtol=1e-6)


class TestAabb:
    def test_slab(self):
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0, 0, -1.0]])
        bmin = jnp.asarray([[-1, -1, -5], [2, 2, -5]], jnp.float32)
        bmax = jnp.asarray([[1, 1, -3], [3, 3, -3]], jnp.float32)
        hit = intersect.hit_aabbs(o, d, bmin, bmax, 1e-3, np.inf)
        assert bool(hit[0, 0]) and not bool(hit[0, 1])

    def test_ray_origin_inside(self):
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[1.0, 0, 0]])
        hit = intersect.hit_aabbs(
            o, d, jnp.asarray([[-1, -1, -1]], jnp.float32),
            jnp.asarray([[1, 1, 1]], jnp.float32), 1e-3, np.inf
        )
        assert bool(hit[0, 0])


class TestNativeBVH:
    def test_native_matches_numpy(self, rng):
        """The C++ builder must emit the exact same flat BVH as the NumPy
        builder (same topology, perm, skip links)."""
        from crucible_tpu.ops.bvh import build_bvh

        v0, v1, v2 = _random_tris(rng, 513)
        bb_min = np.minimum(np.minimum(v0, v1), v2)
        bb_max = np.maximum(np.maximum(v0, v1), v2)
        a = build_bvh(bb_min, bb_max, use_native=False)
        b = build_bvh(bb_min, bb_max, use_native=True)
        np.testing.assert_array_equal(a.perm, b.perm)
        np.testing.assert_array_equal(a.node_miss, b.node_miss)
        np.testing.assert_array_equal(a.node_first, b.node_first)
        np.testing.assert_array_equal(a.node_count, b.node_count)
        np.testing.assert_array_equal(a.node_parent, b.node_parent)
        np.testing.assert_allclose(a.node_min, b.node_min)
        np.testing.assert_allclose(a.node_max, b.node_max)

    def test_native_sah_valid_and_equivalent(self, rng):
        """The C++ SAH builder (ADVICE r2: the default build path should not
        silently bypass the native builder) may break float ties differently
        from the NumPy SAH, so equivalence is structural + closest-hit: the
        BVH must satisfy all flat-layout invariants and produce the same
        nearest triangle t as the NumPy build for random rays."""
        from crucible_tpu.ops.bvh import build_bvh
        from crucible_tpu.ops.traverse import bvh_hit_triangles

        v0, v1, v2 = _random_tris(rng, 500)
        bb_min = np.minimum(np.minimum(v0, v1), v2)
        bb_max = np.maximum(np.maximum(v0, v1), v2)
        out = [
            build_bvh(bb_min, bb_max, leaf_size=8, use_native=un, method="sah")
            for un in (False, True)
        ]
        for b in out:
            k = b.num_nodes
            # perm is a permutation; leaves partition it in order.
            np.testing.assert_array_equal(np.sort(b.perm), np.arange(500))
            leaf = b.node_count > 0
            assert b.node_count[leaf].sum() == 500
            starts = b.node_first[leaf]
            assert (np.diff(starts) > 0).all()
            # skip links: leaves -> i+1; all targets in (i, k].
            li = np.nonzero(leaf)[0]
            np.testing.assert_array_equal(b.node_miss[li], li + 1)
            assert (b.node_miss > np.arange(k)).all() and (b.node_miss <= k).all()
            # node boxes contain their leaf prims
            for i in li[:32]:
                prims = b.perm[b.node_first[i] : b.node_first[i] + b.node_count[i]]
                assert (bb_min[prims] >= b.node_min[i] - 1e-6).all()
                assert (bb_max[prims] <= b.node_max[i] + 1e-6).all()

        o = jnp.asarray(rng.normal(size=(256, 3)) * 2, jnp.float32)
        d = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        res = []
        for b in out:
            t, i, hit = bvh_hit_triangles(
                o, d,
                jnp.asarray(v0[b.perm]), jnp.asarray(v1[b.perm]),
                jnp.asarray(v2[b.perm]),
                jnp.asarray(b.node_min), jnp.asarray(b.node_max),
                jnp.asarray(b.node_first), jnp.asarray(b.node_count),
                jnp.asarray(b.node_miss),
                1e-3, np.float32(3e38), 8,
            )
            res.append((np.asarray(t), np.asarray(hit)))
        np.testing.assert_array_equal(res[0][1], res[1][1])
        np.testing.assert_allclose(
            res[0][0][res[0][1]], res[1][0][res[1][1]], rtol=1e-5, atol=1e-6
        )

    def test_reorder_front_to_back(self, rng):
        """Camera-ordered re-emission: same closest hits, children ordered
        near-first along the view axis, all flat-layout invariants hold."""
        from crucible_tpu.ops.bvh import build_bvh, reorder_front_to_back
        from crucible_tpu.ops.traverse import bvh_hit_triangles

        v0, v1, v2 = _random_tris(rng, 300)
        bb_min = np.minimum(np.minimum(v0, v1), v2)
        bb_max = np.maximum(np.maximum(v0, v1), v2)
        base = build_bvh(bb_min, bb_max, leaf_size=8, method="sah")
        view = np.array([0.3, -0.2, 1.0])
        b = reorder_front_to_back(base, view)
        k = b.num_nodes
        assert k == base.num_nodes
        np.testing.assert_array_equal(np.sort(b.perm), np.arange(300))
        # children near-first: for every inner node, left child's center
        # projection <= right child's
        for i in range(k):
            if b.node_count[i] > 0:
                continue
            left = i + 1
            right = int(b.node_miss[left])
            pl_ = 0.5 * (b.node_min[left] + b.node_max[left]) @ view
            pr_ = 0.5 * (b.node_min[right] + b.node_max[right]) @ view
            assert pl_ <= pr_ + 1e-5
        o = jnp.asarray(rng.normal(size=(128, 3)) * 2, jnp.float32)
        d = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
        res = []
        for bb in (base, b):
            t, _, hit = bvh_hit_triangles(
                o, d,
                jnp.asarray(v0[bb.perm]), jnp.asarray(v1[bb.perm]),
                jnp.asarray(v2[bb.perm]),
                jnp.asarray(bb.node_min), jnp.asarray(bb.node_max),
                jnp.asarray(bb.node_first), jnp.asarray(bb.node_count),
                jnp.asarray(bb.node_miss),
                1e-3, np.float32(3e38), 8,
            )
            res.append((np.asarray(t), np.asarray(hit)))
        np.testing.assert_array_equal(res[0][1], res[1][1])
        np.testing.assert_allclose(
            res[0][0][res[0][1]], res[1][0][res[1][1]], rtol=1e-5, atol=1e-6
        )
