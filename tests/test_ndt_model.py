"""Golden parity tests for the NDT model.

Scenarios and expected values are taken from the reference's unit suite
(test/ndt_model_tests.cpp) so the two implementations share a numerical
oracle: cell mean/covariance/information after specific point sequences,
Gaussian scores at the mean / 1 sigma / 2 sigma, the n>=5 scoring gate, and
the end-to-end grid likelihood fixture (expected 0.7659).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ndt_2d_tpu.ndt import grid as ndt_grid


def build_single_cell(points, width=1, height=1, origin=(0.0, 0.0),
                      cell_size=100.0):
    """Build a grid so large that all points land in one cell."""
    pts = jnp.asarray(points, jnp.float32)
    mask = jnp.ones(pts.shape[0], bool)
    return ndt_grid.build_ndt(pts, mask, jnp.asarray(origin, jnp.float32),
                              cell_size, width, height)


def cell_score(grid, p, width=1, height=1):
    s = ndt_grid.score_points(grid, jnp.asarray([p], jnp.float32),
                              jnp.ones(1, bool), width, height)
    return float(s[0])


class TestNdtCell:
    """Mirrors ndt_model_tests.cpp TEST(NdtModelTests, test_ndt_cell)."""

    def test_four_points_then_six(self):
        pts4 = [(3.5, 3.5), (3.5, 3.5), (3.4, 3.45), (3.6, 3.55)]
        g = build_single_cell(pts4)
        # Mean correct after 4 points (ndt_model_tests.cpp:52-54)
        np.testing.assert_allclose(np.asarray(g.mean[0]), [3.5, 3.5], atol=1e-6)
        # Score is 0 with fewer than 5 points (ndt_model_tests.cpp:56-59)
        assert cell_score(g, (3.5, 3.5)) == pytest.approx(0.0, abs=1e-3)

        pts6 = pts4 + [(3.6, 3.45), (3.4, 3.55)]
        g = build_single_cell(pts6)
        # Covariance values (ndt_model_tests.cpp:72-74)
        c00, c01, c11 = np.asarray(g.covariance[0])
        assert c00 == pytest.approx(0.008, abs=1e-3)
        assert c01 == pytest.approx(0.0, abs=1e-3)
        assert c11 == pytest.approx(0.002, abs=1e-3)
        # Score at mean, 1 and 2 std-devs (ndt_model_tests.cpp:76-99)
        assert cell_score(g, (3.5, 3.5)) == pytest.approx(1.0, abs=1e-3)
        assert cell_score(g, (3.5 + math.sqrt(0.008), 3.5)) == \
            pytest.approx(0.6065, abs=1e-3)
        assert cell_score(g, (3.5 + 2 * math.sqrt(0.008), 3.5)) == \
            pytest.approx(0.1353, abs=1e-3)
        assert cell_score(g, (3.5, 3.5 + math.sqrt(0.002))) == \
            pytest.approx(0.6065, abs=1e-3)
        assert cell_score(g, (3.5, 3.5 + 2 * math.sqrt(0.002))) == \
            pytest.approx(0.1353, abs=1e-3)
        # Far away (same cell, huge grid) => ~0 (ndt_model_tests.cpp:101-104)
        assert cell_score(g, (0.0, 0.0)) == pytest.approx(0.0, abs=1e-3)


class TestEigenvalueFloor:
    """Mirrors test_ndt_cell_no_{x,y}_variation: the degenerate-axis floor."""

    def test_no_x_variation(self):
        pts = [(3.5, 3.5), (3.5, 3.45), (3.5, 3.45), (3.5, 3.55), (3.5, 3.55)]
        g = build_single_cell(pts)
        np.testing.assert_allclose(np.asarray(g.mean[0]), [3.5, 3.5], atol=1e-5)
        c00, c01, c11 = np.asarray(g.covariance[0])
        assert c00 == pytest.approx(0.0, abs=1e-5)
        assert c01 == pytest.approx(0.0, abs=1e-5)
        assert c11 == pytest.approx(0.0025, abs=1e-5)
        # information(0,0) = cov11 / ((0.001*large)*large) = 400000
        # (ndt_model_tests.cpp:143-146)
        i00, i01, i11 = np.asarray(g.information[0])
        assert i00 == pytest.approx(400000.0, rel=1e-3)
        assert i01 == pytest.approx(0.0, abs=1e-3)
        assert i11 == pytest.approx(0.0, abs=1e-3)

    def test_no_y_variation(self):
        pts = [(3.5, 3.5), (3.45, 3.5), (3.45, 3.5), (3.55, 3.5), (3.55, 3.5)]
        g = build_single_cell(pts)
        c00, c01, c11 = np.asarray(g.covariance[0])
        assert c00 == pytest.approx(0.0025, abs=1e-5)
        assert c11 == pytest.approx(0.0, abs=1e-5)
        i00, i01, i11 = np.asarray(g.information[0])
        assert i00 == pytest.approx(0.0, abs=1e-3)
        assert i11 == pytest.approx(400000.0, rel=1e-3)


class TestNdtGrid:
    """Mirrors TEST(NdtModelTests, test_ndt): grid binning + likelihood."""

    def test_grid_likelihood_fixture(self):
        # 1m cells over 10x10m from (-5,-5): reference sizes the grid as
        # size/cell+1 = 11x11 cells (src/ndt_model.cpp:118-126).
        width = height = 11
        pts = jnp.asarray([(3.5, 3.5), (3.45, 3.4), (3.55, 3.6),
                           (3.45, 3.6), (3.45, 3.6)], jnp.float32)
        g = ndt_grid.build_ndt(pts, jnp.ones(5, bool),
                               jnp.asarray([-5.0, -5.0], jnp.float32), 1.0,
                               width, height)
        score = ndt_grid.likelihood(
            g, jnp.asarray([[3.5, 3.5]], jnp.float32), jnp.ones(1, bool),
            width, height)
        # ndt_model_tests.cpp:229
        assert float(score) == pytest.approx(0.7659, abs=1e-3)

    def test_out_of_bounds_scores_zero(self):
        width = height = 11
        pts = jnp.asarray([(3.5, 3.5)] * 5, jnp.float32)
        g = ndt_grid.build_ndt(pts, jnp.ones(5, bool),
                               jnp.asarray([-5.0, -5.0], jnp.float32), 1.0,
                               width, height)
        s = ndt_grid.score_points(
            g, jnp.asarray([[-100.0, 0.0], [100.0, 0.0]], jnp.float32),
            jnp.ones(2, bool), width, height)
        np.testing.assert_array_equal(np.asarray(s), [0.0, 0.0])

    def test_row_major_binning(self):
        # index = iy * W + ix (src/ndt_model.cpp:203-218)
        flat, valid = ndt_grid.cell_index(
            jnp.zeros(2, jnp.float32), jnp.asarray(1.0, jnp.float32), 4, 3,
            jnp.asarray([[2.5, 1.5]], jnp.float32))
        assert int(flat[0]) == 1 * 4 + 2
        assert bool(valid[0])

    def test_masked_points_ignored(self):
        pts = jnp.asarray([(3.5, 3.5)] * 5 + [(99.0, 99.0)], jnp.float32)
        mask = jnp.asarray([True] * 5 + [False])
        g = ndt_grid.build_ndt(pts, mask, jnp.asarray([0.0, 0.0], jnp.float32),
                               100.0, 1, 1)
        assert int(g.count[0]) == 5
