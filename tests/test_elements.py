"""Closed-form element matrices vs. hand-derived values."""

import numpy as np

from networks_fenicsx_tpu.ops import elements


def test_p1_mass():
    M = elements.mass_matrix(1)
    np.testing.assert_allclose(M, [[1 / 3, 1 / 6], [1 / 6, 1 / 3]], atol=1e-14)


def test_p2_mass():
    M = elements.mass_matrix(2)
    # Equispaced quadratic Lagrange mass on [0,1]
    exact = np.array([[4, 2, -1], [2, 16, 2], [-1, 2, 4]]) / 30.0
    np.testing.assert_allclose(M, exact, atol=1e-14)


def test_div_dg0_p1():
    D = elements.div_matrix(0, 1)
    np.testing.assert_allclose(D, [[-1.0, 1.0]], atol=1e-14)


def test_div_dg0_pk_endpoint_property():
    # ∫ φ' over the cell telescopes to endpoint difference for any degree
    for k in (1, 2, 3, 4):
        D = elements.div_matrix(0, k)
        expect = np.zeros(k + 1)
        expect[0], expect[-1] = -1.0, 1.0
        np.testing.assert_allclose(D[0], expect, atol=1e-13)


def test_partition_of_unity():
    for k in (1, 2, 3, 5):
        x = np.linspace(0, 1, 7)
        phi = elements.tabulate(k, x)
        np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-12)
        # nodal property
        nodes = elements.equispaced_nodes(k)
        vals = elements.tabulate(k, nodes)
        np.testing.assert_allclose(vals, np.eye(k + 1), atol=1e-10)


def test_endpoint_matrix():
    for k in (1, 2, 3):
        P = elements.endpoint_matrix(k)
        np.testing.assert_allclose(P[0], np.eye(k + 1)[0], atol=1e-12)
        np.testing.assert_allclose(P[1], np.eye(k + 1)[k], atol=1e-12)


def test_load_vector_p1():
    np.testing.assert_allclose(elements.load_vector(1), [0.5, 0.5], atol=1e-14)
