"""Spherical-harmonic master-pattern projector tests.

Pins the conventions promised in kikuchipy_tpu/projection/spherical.py:
basis orthonormality, the rotation-representation property against the
gather projector's sampling (``synth(D(q) c, d) = master(rotate_vector
(q, d))``), the zyz factorization against the Ivanic-Ruedenberg
recursion (including near gimbal lock, values AND tangents), analysis
round-trips, and the measured accuracy levels on the real nickel
master (NCC ~0.89 @ L=88, ~0.98 @ L=180; the refinement-level accuracy
contract is the <0.8 degree criterion in test_refinement.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kikuchipy_tpu.geometry.quaternion import from_axis_angle, multiply, rotate_vector
from kikuchipy_tpu.projection.spherical import (
    SphericalProjector,
    _flip_blocks,
    _lm_of_columns,
    rotate_coefficients,
    rotate_coefficients_zyz,
    rotation_blocks_numpy,
    sh_analysis_lambert,
    sh_basis,
    wigner_tables,
)


def _random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def _random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def _synth(coeffs, dirs, L):
    return sh_basis(dirs, L) @ np.asarray(coeffs, dtype=np.float64).T


class TestBasis:
    def test_orthonormality(self):
        """Quadrature of Y_a * Y_b over the sphere is delta_ab."""
        L = 10
        n_theta = 2 * (L + 1)
        z, w = np.polynomial.legendre.leggauss(n_theta)
        n_phi = 2 * n_theta
        phi = 2 * np.pi * np.arange(n_phi) / n_phi
        s = np.sqrt(1 - z**2)
        dirs = np.stack(
            [
                (s[:, None] * np.cos(phi)[None]).ravel(),
                (s[:, None] * np.sin(phi)[None]).ravel(),
                np.broadcast_to(z[:, None], (n_theta, n_phi)).ravel(),
            ],
            axis=-1,
        )
        weights = np.broadcast_to(
            w[:, None] * (2 * np.pi / n_phi), (n_theta, n_phi)
        ).ravel()
        B = sh_basis(dirs, L)
        gram = (B * weights[:, None]).T @ B
        np.testing.assert_allclose(gram, np.eye((L + 1) ** 2), atol=1e-10)

    def test_low_order_values(self):
        """Closed forms: Y_00, Y_10 ~ z, Y_11 ~ x, Y_1-1 ~ y."""
        d = _random_dirs(100)
        B = sh_basis(d, 1)
        c0 = np.sqrt(1 / (4 * np.pi))
        c1 = np.sqrt(3 / (4 * np.pi))
        np.testing.assert_allclose(B[:, 0], c0, atol=1e-12)
        np.testing.assert_allclose(B[:, 2], c1 * d[:, 2], atol=1e-12)  # m=0
        np.testing.assert_allclose(B[:, 3], c1 * d[:, 0], atol=1e-12)  # m=+1
        np.testing.assert_allclose(B[:, 1], c1 * d[:, 1], atol=1e-12)  # m=-1


class TestRotationRecursion:
    def test_blocks_are_orthogonal_representation(self):
        L = 12
        rng = np.random.default_rng(3)
        qa, qb = _random_quats(2, seed=4)
        from kikuchipy_tpu.geometry.quaternion import to_matrix

        Ra = np.asarray(to_matrix(jnp.asarray(qa)))
        Rb = np.asarray(to_matrix(jnp.asarray(qb)))
        Ba = rotation_blocks_numpy(Ra, L)
        Bb = rotation_blocks_numpy(Rb, L)
        Bab = rotation_blocks_numpy(Ra @ Rb, L)
        for l in range(L + 1):
            # Orthogonality
            np.testing.assert_allclose(
                Ba[l] @ Ba[l].T, np.eye(2 * l + 1), atol=1e-10
            )
            # Homomorphism D(AB) = D(A) D(B)
            np.testing.assert_allclose(Bab[l], Ba[l] @ Bb[l], atol=1e-9)

    def test_rotation_matches_sampling_convention(self):
        """synth(rotate_coefficients(q, c), d) == synth(c, R(q)^T d) ==
        synth(c, rotate_vector(conjugate(q), d)); the gather projector's
        sampling (at rotate_vector(q, d)) therefore needs conjugate(q),
        which SphericalProjector.project applies internally."""
        L = 8
        rng = np.random.default_rng(5)
        c = rng.normal(size=((L + 1) ** 2,))
        q = _random_quats(5, seed=6)
        d = _random_dirs(64, seed=7)
        out = np.asarray(
            rotate_coefficients(
                jnp.asarray(q, jnp.float64)
                if jax.config.jax_enable_x64
                else jnp.asarray(q, jnp.float32),
                jnp.asarray(c, jnp.float64)
                if jax.config.jax_enable_x64
                else jnp.asarray(c, jnp.float32),
                L,
            )
        )
        from kikuchipy_tpu.geometry.quaternion import conjugate

        rotated_dirs = np.asarray(
            rotate_vector(
                conjugate(jnp.asarray(q))[:, None, :], jnp.asarray(d)[None]
            )
        )
        for i in range(len(q)):
            lhs = _synth(out[i], d, L)
            rhs = _synth(c, rotated_dirs[i], L)
            np.testing.assert_allclose(lhs, rhs, atol=5e-5)


@pytest.mark.slow
class TestZyz:
    @pytest.mark.parametrize("L", [6, 21])
    def test_matches_recursion_random(self, L):
        rng = np.random.default_rng(8)
        c = rng.normal(size=((L + 1) ** 2,)).astype(np.float32)
        q = _random_quats(32, seed=9).astype(np.float32)
        ref = np.asarray(
            rotate_coefficients(jnp.asarray(q), jnp.asarray(c), L)
        )
        out = np.asarray(
            rotate_coefficients_zyz(jnp.asarray(q), jnp.asarray(c), L)
        )
        np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(c).max())

    def test_matches_recursion_near_gimbal(self):
        """Pure z-rotations (beta = 0), beta = pi, and tiny-beta cases."""
        L = 10
        rng = np.random.default_rng(10)
        c = rng.normal(size=((L + 1) ** 2,)).astype(np.float32)
        qs = []
        for ang in (0.0, 0.3, 2.1):
            qs.append(np.asarray(from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), ang)))
        # beta = pi: 180-deg flip about x then z-rotations
        flip = np.asarray(from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), np.pi))
        qs.append(np.asarray(multiply(jnp.asarray(qs[1]), jnp.asarray(flip))))
        # tiny beta
        qs.append(
            np.asarray(
                from_axis_angle(jnp.asarray([1e-4, 1e-4, 1.0]), 0.7)
            )
        )
        q = np.stack(qs).astype(np.float32)
        ref = np.asarray(rotate_coefficients(jnp.asarray(q), jnp.asarray(c), L))
        out = np.asarray(rotate_coefficients_zyz(jnp.asarray(q), jnp.asarray(c), L))
        np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(c).max())

    def test_jvp_finite_and_correct_at_gimbal(self):
        """Tangents through the delta-rotation chain stay finite and
        match finite differences even when the total rotation sits at
        beta = 0 (the refinement-start condition)."""
        L = 6
        rng = np.random.default_rng(11)
        c = rng.normal(size=((L + 1) ** 2,)).astype(np.float32)
        # q0 exactly at gimbal (identity and pure-z)
        q0 = np.stack(
            [
                [1.0, 0.0, 0.0, 0.0],
                np.asarray(from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 0.9)),
            ]
        ).astype(np.float32)

        def f(delta):
            half = delta / 2.0
            w = jnp.ones(delta.shape[:-1] + (1,), delta.dtype)
            dq = jnp.concatenate([w, half], axis=-1)
            dq = dq / jnp.linalg.norm(dq, axis=-1, keepdims=True)
            q = multiply(jnp.asarray(q0), dq)
            return rotate_coefficients_zyz(q, jnp.asarray(c), L)

        d0 = jnp.zeros((2, 3), jnp.float32)
        for j in range(3):
            tan = jnp.zeros((2, 3), jnp.float32).at[:, j].set(1.0)
            _, jv = jax.jvp(f, (d0,), (tan,))
            jv = np.asarray(jv)
            assert np.isfinite(jv).all()
            eps = 1e-3
            fd = (np.asarray(f(d0 + eps * tan)) - np.asarray(f(d0 - eps * tan))) / (
                2 * eps
            )
            np.testing.assert_allclose(jv, fd, atol=5e-2 * np.abs(c).max())

    def test_flip_blocks(self):
        L = 3
        ls, ms = _lm_of_columns(L)
        c = (ls * 100 + ms).astype(np.float32)
        flipped = np.asarray(_flip_blocks(jnp.asarray(c), L))
        np.testing.assert_array_equal(flipped, ls * 100 - ms)

    def test_tables_orthogonal(self):
        t = wigner_tables(12)
        for g in t.t_groups:
            g = np.asarray(g, dtype=np.float64)
            np.testing.assert_allclose(g @ g.T, np.eye(len(g)), atol=1e-5)


class TestAnalysis:
    def test_round_trip_bandlimited(self):
        """Analysis of an exactly band-limited function recovers its
        coefficients to quadrature precision."""
        L = 8
        rng = np.random.default_rng(12)
        c_true = rng.normal(size=((L + 1) ** 2,))

        # Render the function onto a synthetic "master": evaluate on a
        # fine Lambert grid by synthesizing at the grid's directions.
        # (The analysis samples this master bilinearly, so the grid must
        # be fine enough that interpolation error, ~h^2 L^2 f, is small.)
        from kikuchipy_tpu.geometry.lambert import lambert_to_vector

        npx = 401
        xy = np.linspace(-1.0, 1.0, npx)  # edge-normalized grid coords
        gx, gy = np.meshgrid(xy, xy)
        grid = np.stack([gx.ravel(), gy.ravel()], axis=-1)
        v_up = np.array(lambert_to_vector(jnp.asarray(grid)))
        v_up /= np.linalg.norm(v_up, axis=1, keepdims=True)
        v_lo = v_up * np.array([1.0, 1.0, -1.0])
        f_up = _synth(c_true, v_up, L).reshape(npx, npx)
        f_lo = _synth(c_true, v_lo, L).reshape(npx, npx)
        master = np.stack([f_up, f_lo]).astype(np.float32)

        c = sh_analysis_lambert(master, L)
        # Bilinear interpolation of the 201px master bounds accuracy;
        # the test checks faithful recovery, not machine precision.
        err = np.abs(c - c_true).max() / np.abs(c_true).max()
        assert err < 2e-3, err

    def test_constant_function(self):
        master = np.ones((2, 51, 51), dtype=np.float32)
        c = sh_analysis_lambert(master, 4)
        np.testing.assert_allclose(c[0], np.sqrt(4 * np.pi), atol=1e-6)
        np.testing.assert_allclose(c[1:], 0.0, atol=1e-6)


@pytest.mark.slow
class TestNickelMaster:
    def test_ncc_vs_bilinear_projector(self):
        """L = 88 harmonic synthesis vs the bilinear gather projector on
        the real nickel master at real detector geometry. The master's
        sharp band edges carry real power above any practical band
        limit (measured: 0.89 @ L=88, 0.95 @ 132, 0.98 @ 180), so this
        pins the measured L=88 level and convergence with L; refinement
        accuracy through this projector is pinned separately
        (<0.8 deg, tests/test_refinement.py)."""
        import kikuchipy_tpu as kp
        from kikuchipy_tpu.projection.master_pattern import (
            direction_cosines_from_detector,
            project_patterns,
        )

        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        master = mp._hemispheres_at_energy(20).astype(np.float32)
        proj = SphericalProjector.from_master(master, L=88)

        s = kp.data.nickel_ebsd_small()
        import dataclasses

        det = dataclasses.replace(
            s.detector, pc=s.detector.pc_average.reshape(1, 3)
        )
        dc = direction_cosines_from_detector(det)
        q = jnp.asarray(
            np.asarray(s.xmap.best_rotations), dtype=jnp.float32
        )
        ref = np.asarray(
            project_patterns(
                q, dc, jnp.asarray(master), 401, 401, 200.0
            )
        )
        basis = proj.synthesis_basis(np.asarray(dc))
        out = np.asarray(proj.project(q, basis))

        def ncc(a, b):
            a = a - a.mean(axis=1, keepdims=True)
            b = b - b.mean(axis=1, keepdims=True)
            return (a * b).sum(1) / np.sqrt(
                (a**2).sum(1) * (b**2).sum(1)
            )

        scores = ncc(out, ref)
        assert scores.min() > 0.87, scores

        # Convergence with L: strictly increasing fidelity.
        proj44 = SphericalProjector.from_master(master, L=44)
        out44 = np.asarray(
            proj44.project(q, proj44.synthesis_basis(np.asarray(dc)))
        )
        assert ncc(out44, ref).mean() < scores.mean()

    def test_equivariance_on_master(self):
        """Rotating coefficients then synthesizing equals synthesizing
        at rotated directions, on the real master's expansion."""
        import kikuchipy_tpu as kp

        mp = kp.data.nickel_ebsd_master_pattern_small(
            projection="lambert", hemisphere="both"
        )
        master = mp._hemispheres_at_energy(20).astype(np.float32)
        proj = SphericalProjector.from_master(master, L=48)
        d = _random_dirs(128, seed=13)
        q = jnp.asarray(_random_quats(4, seed=14), dtype=jnp.float32)
        basis = proj.synthesis_basis(d)
        out = np.asarray(proj.project(q, basis))
        rd = np.asarray(rotate_vector(q[:, None, :], jnp.asarray(d)[None]))
        for i in range(4):
            direct = _synth(np.asarray(proj.coeffs), rd[i], 48)
            np.testing.assert_allclose(
                out[i], direct, atol=2e-3 * np.abs(direct).max()
            )
