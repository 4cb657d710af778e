"""Symmetry, FZ sampling, and CrystalMap tests."""

import numpy as np
import pytest

from kikuchipy_tpu.crystallography.symmetry import (
    get_point_group,
    point_group_from_space_group,
    proper_rotations,
)
from kikuchipy_tpu.crystallography.sampling import (
    in_fundamental_zone,
    reduce_to_fundamental_zone,
    sample_fundamental_zone,
    super_fibonacci,
)
from kikuchipy_tpu.crystallography.crystal_map import CrystalMap, Phase, PhaseList


class TestSymmetry:
    @pytest.mark.parametrize(
        "name, order",
        [
            ("C1", 1), ("C2", 2), ("C3", 3), ("C4", 4), ("C6", 6),
            ("D2", 4), ("D3", 6), ("D4", 8), ("D6", 12), ("T", 12), ("O", 24),
        ],
    )
    def test_group_orders(self, name, order):
        g = proper_rotations(name)
        assert g.shape == (order, 4)
        np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=1e-12)

    def test_group_closure(self):
        # O must be closed: product of any two elements is an element.
        g = proper_rotations("O")
        keys = {tuple(np.round(q if q[np.abs(q) > 1e-8][0] > 0 else -q, 6)) for q in g}

        def mult(q1, q2):
            a1, b1, c1, d1 = q1
            a2, b2, c2, d2 = q2
            return np.array([
                a1*a2 - b1*b2 - c1*c2 - d1*d2,
                a1*b2 + b1*a2 + c1*d2 - d1*c2,
                a1*c2 - b1*d2 + c1*a2 + d1*b2,
                a1*d2 + b1*c2 - c1*b2 + d1*a2,
            ])

        for q1 in g[:6]:
            for q2 in g:
                p = mult(q1, q2)
                p = p if p[np.abs(p) > 1e-8][0] > 0 else -p
                assert tuple(np.round(p, 6)) in keys

    def test_point_group_mapping(self):
        assert get_point_group("m-3m").proper_name == "O"
        assert get_point_group("4/mmm").proper_name == "D4"
        assert get_point_group("-3m").proper_name == "D3"
        assert get_point_group("1").order == 1

    def test_space_group_mapping(self):
        assert point_group_from_space_group(225).name == "m-3m"  # Fm-3m (Ni)
        assert point_group_from_space_group(227).name == "m-3m"  # Fd-3m (Si)
        assert point_group_from_space_group(1).name == "1"
        with pytest.raises(ValueError):
            point_group_from_space_group(300)

    def test_unknown_group(self):
        with pytest.raises(ValueError):
            get_point_group("zzz")


class TestSampling:
    def test_super_fibonacci_unit(self):
        q = super_fibonacci(1000)
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-12)
        assert np.all(q[:, 0] >= 0)

    def test_super_fibonacci_uniform(self):
        # Haar density of the rotation angle is p(t) = (1 - cos t) / pi,
        # so the fraction with angle < 90 deg is (pi/2 - 1)/pi ~ 0.1817.
        q = super_fibonacci(200_000)
        angles = 2 * np.arccos(np.clip(np.abs(q[:, 0]), 0, 1))
        frac = (angles < np.pi / 2).mean()
        expected = (np.pi / 2 - 1) / np.pi
        assert abs(frac - expected) < 0.01

    def test_fz_fraction_matches_group_order(self):
        q = super_fibonacci(100_000)
        for name, order in [("O", 24), ("D4", 8), ("C2", 2)]:
            frac = in_fundamental_zone(q, name).mean()
            assert abs(frac * order - 1) < 0.05, (name, frac)

    def test_reduce_to_fz(self):
        q = super_fibonacci(5000)
        red = reduce_to_fundamental_zone(q, "O")
        assert in_fundamental_zone(red, "O").all()
        # Reduction preserves misorientation to identity modulo symmetry:
        # the reduced rotation angle is the disorientation angle, <= 62.8
        # deg for O (cubic FZ max angle).
        ang = 2 * np.degrees(np.arccos(np.clip(np.abs(red[:, 0]), 0, 1)))
        assert ang.max() <= 62.9

    def test_sample_fundamental_zone_density(self):
        q = sample_fundamental_zone(6.0, "m-3m")
        # Cubochoric calibration: ~103k total / 24 ~ 4.3k
        assert 3000 < q.shape[0] < 6000
        assert in_fundamental_zone(q, "O").all()

    def test_identity_in_fz(self):
        q = np.array([[1.0, 0, 0, 0]])
        assert in_fundamental_zone(q, "O").all()


class TestCrystalMap:
    def test_basic(self):
        rot = super_fibonacci(9)
        xmap = CrystalMap(
            rotations=rot,
            shape=(3, 3),
            prop={"scores": np.arange(9.0)},
            phases=PhaseList(Phase("ni", space_group=225)),
        )
        assert xmap.size == 9
        assert xmap.rotations_per_point == 1
        assert xmap.get_map("scores").shape == (3, 3)
        assert xmap.phases.names == ["ni"]
        assert xmap.phases[0].get_point_group().proper_name == "O"
        np.testing.assert_array_equal(xmap.x[:4], [0, 1, 2, 0])

    def test_multi_match(self):
        rot = super_fibonacci(20).reshape(5, 4, 4)
        xmap = CrystalMap(rotations=rot)
        assert xmap.rotations_per_point == 4
        assert xmap.best_rotations.shape == (5, 4)

    def test_phase_list(self):
        pl = PhaseList([Phase("a"), Phase("b")])
        assert pl.ids == [0, 1]
        assert len(pl) == 2
        pl.add(2, Phase("c"))
        assert pl.names == ["a", "b", "c"]


class TestIPFColor:
    def test_cubic_anchor_colors(self):
        from kikuchipy_tpu.crystallography.ipf import ipf_color

        identity = np.array([[1.0, 0, 0, 0]])
        # Crystal 001 along sample Z -> red corner.
        np.testing.assert_allclose(
            ipf_color(identity, "m-3m"), [[1, 0, 0]], atol=1e-8
        )
        # Rotate crystal so 111 lies along Z -> blue corner; 45 deg
        # about Y brings 101 to Z -> green corner.
        from kikuchipy_tpu.geometry import quaternion as Q
        import jax.numpy as jnp

        a = np.deg2rad(45)
        q_101 = np.array([[np.cos(a / 2), 0, np.sin(a / 2), 0]])
        c = ipf_color(q_101, "m-3m")
        # crystal direction of sample Z is q * z
        np.testing.assert_allclose(c, [[0, 1, 0]], atol=1e-6)

    def test_symmetry_invariance(self):
        from kikuchipy_tpu.crystallography.ipf import ipf_color
        from kikuchipy_tpu.crystallography.symmetry import get_point_group
        from kikuchipy_tpu.crystallography.sampling import super_fibonacci
        from kikuchipy_tpu.geometry import quaternion as Q
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        q = super_fibonacci(16)
        pg = get_point_group("m-3m")
        s = pg.rotations[rng.integers(0, pg.order, 16)]
        sq = np.asarray(Q.multiply(jnp.asarray(s), jnp.asarray(q)))
        np.testing.assert_allclose(
            ipf_color(q, pg), ipf_color(sq, pg), atol=1e-8
        )

    def test_hexagonal_and_low_symmetry(self):
        from kikuchipy_tpu.crystallography.ipf import ipf_color

        identity = np.array([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(
            ipf_color(identity, "6/mmm"), [[1, 0, 0]], atol=1e-8
        )
        c = ipf_color(identity, "-1")
        assert c.shape == (1, 3) and (c >= 0).all() and (c <= 1).all()

    def test_color_key_object(self):
        from kikuchipy_tpu.crystallography.ipf import IPFColorKeyTSL
        from kikuchipy_tpu.crystallography.crystal_map import CrystalMap
        from kikuchipy_tpu.crystallography.sampling import super_fibonacci

        key = IPFColorKeyTSL("m-3m")
        xmap = CrystalMap(rotations=super_fibonacci(9), shape=(3, 3))
        rgb = key.orientation2color(xmap)
        assert rgb.shape == (9, 3)
        assert (rgb >= 0).all() and (rgb <= 1).all()
        assert "m-3m" in repr(key)


class TestCrystalMapPlot:
    def test_plot_modes(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from kikuchipy_tpu.crystallography.crystal_map import (
            CrystalMap,
            Phase,
            PhaseList,
        )
        from kikuchipy_tpu.crystallography.sampling import super_fibonacci

        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            shape=(3, 3),
            prop={"scores": np.linspace(0, 1, 9)},
            phases=PhaseList(Phase("ni", space_group=225)),
        )
        fig = xmap.plot(return_figure=True)  # IPF map
        img = fig.axes[0].images[0].get_array()
        assert img.shape == (3, 3, 3)
        plt.close(fig)
        fig = xmap.plot("scores", colorbar=True, return_figure=True)
        plt.close(fig)
        fig = xmap.plot(overlay="scores", return_figure=True)
        plt.close(fig)
        # Non-indexed points render gray, not an error.
        xmap.phase_id[0] = -1
        fig = xmap.plot(return_figure=True)
        plt.close(fig)


class TestCrystalMapOrixIdioms:
    def _xmap(self):
        from kikuchipy_tpu.crystallography.crystal_map import (
            CrystalMap, Phase, PhaseList,
        )
        from kikuchipy_tpu.crystallography.sampling import super_fibonacci

        phases = PhaseList(Phase("ni", space_group=225))
        phases.add(1, Phase("ti", space_group=194))
        xmap = CrystalMap(
            rotations=super_fibonacci(9),
            phase_id=np.array([0, 0, 1, 1, 1, -1, 0, 1, 0]),
            shape=(3, 3),
            prop={"scores": np.arange(9, dtype=float)},
            phases=phases,
        )
        return xmap

    def test_get_map_data_alias(self):
        xmap = self._xmap()
        np.testing.assert_array_equal(
            xmap.get_map_data("scores"), xmap.get_map("scores")
        )

    def test_indexed_selection(self):
        xmap = self._xmap()
        assert xmap["indexed"].size == 8
        assert xmap["not_indexed"].size == 1
        np.testing.assert_array_equal(xmap["not_indexed"].prop["scores"], [5])

    def test_phase_name_selection(self):
        xmap = self._xmap()
        ni = xmap["ni"]
        assert ni.size == 4
        np.testing.assert_array_equal(ni.prop["scores"], [0, 1, 6, 8])
        # Property names still win when they collide.
        np.testing.assert_array_equal(xmap["scores"], np.arange(9.0))


class TestCubochoricSampling:
    def test_anchors(self):
        from kikuchipy_tpu.crystallography import sampling as S

        np.testing.assert_allclose(
            S.cu2ho([[0, 0, S._AP / 2]]), [[0, 0, S._R1]], atol=1e-12
        )
        q = S.ho2qu([[0, 0, S._R1]])
        np.testing.assert_allclose(q, [[0, 0, 0, 1]], atol=1e-10)
        np.testing.assert_allclose(
            S.ho2qu([[0, 0, 0]]), [[1, 0, 0, 0]], atol=1e-15
        )

    def test_equal_volume(self):
        # Uniform cube points must give the SO(3) angle density
        # (1 - cos w) / pi.
        from kikuchipy_tpu.crystallography import sampling as S

        rng = np.random.default_rng(0)
        cu = rng.uniform(-S._AP / 2, S._AP / 2, (200000, 3))
        q = S.ho2qu(S.cu2ho(cu))
        ang = 2 * np.arccos(np.clip(np.abs(q[:, 0]), 0, 1))
        hist, edges = np.histogram(
            ang, bins=20, range=(0, np.pi), density=True
        )
        centers = 0.5 * (edges[1:] + edges[:-1])
        expected = (1 - np.cos(centers)) / np.pi
        assert np.abs(hist - expected).max() / expected.max() < 0.03

    def test_grid_count_and_fz(self):
        from kikuchipy_tpu.crystallography.sampling import (
            cubochoric_sampling,
            get_sample_fundamental,
            in_fundamental_zone,
        )

        q = cubochoric_sampling(semi_edge_steps=5)
        assert q.shape == (11 ** 3, 4)
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-12)
        r = get_sample_fundamental(6.0, "m-3m")
        assert in_fundamental_zone(r, "m-3m").all()
        # The reference benchmark's "about 3600" orientations at 6 deg.
        assert 3400 <= r.shape[0] <= 3800

    def test_super_fibonacci_method(self):
        from kikuchipy_tpu.crystallography.sampling import (
            get_sample_fundamental,
        )

        r = get_sample_fundamental(8.0, "m-3m", method="super_fibonacci")
        assert r.shape[1] == 4
