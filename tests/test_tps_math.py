"""TPS solver math: exactness of the static matrices and grid generation.

Ground truth computed with an independent dense NumPy TPS solve (solve the
(F+3) system directly) rather than the reference code.
"""
import numpy as np

from tps_pp_tpu.ops import tps


def test_cell_center_fiducials():
    C = tps.build_C_cell_centers((2, 16))
    assert C.shape == (32, 2)
    # first row: y = 0.5/2 = 0.25, x from 0.5/16
    np.testing.assert_allclose(C[0], [0.5 / 16, 0.25])
    np.testing.assert_allclose(C[16], [0.5 / 16, 0.75])
    assert C.min() > 0 and C.max() < 1


def test_inv_delta_C_is_inverse():
    C = tps.build_C_cell_centers((2, 16))
    inv = tps.build_inv_delta_C(C)
    F = C.shape[0]
    hat = tps.tps_kernel_matrix_C(C)
    delta = np.concatenate([
        np.concatenate([np.ones((F, 1)), C, hat], axis=1),
        np.concatenate([np.zeros((2, 3)), C.T], axis=1),
        np.concatenate([np.zeros((1, 3)), np.ones((1, F))], axis=1),
    ], axis=0)
    np.testing.assert_allclose(inv @ delta, np.eye(F + 3), atol=1e-8)


def test_identity_mapping():
    """If predicted control points equal the canonical fiducials and the
    attention score is zero, P' must reproduce P (TPS identity property)."""
    C = tps.build_C_cell_centers((2, 16))
    inv = tps.build_inv_delta_C(C)
    P = tps.build_P_cell_centers(64, 16)
    # exact P_hat (no eps) so identity holds to solver precision
    P_hat = tps.build_P_hat(C, P, eps=0.0)
    P_hat = np.nan_to_num(P_hat)
    cp = np.asarray(C, np.float32)[None]
    score = np.zeros((1, P.shape[0], C.shape[0]), np.float32)
    P_prime = np.asarray(tps.build_P_prime(
        cp, score, np.asarray(inv, np.float32),
        np.asarray(P_hat, np.float32), np.asarray(P, np.float32)))
    np.testing.assert_allclose(P_prime[0], P, atol=1e-4)


def test_translation_equivariance():
    """Translating all control points by d translates the whole grid by d."""
    C = tps.build_C_cell_centers((2, 16))
    inv = np.asarray(tps.build_inv_delta_C(C), np.float32)
    P = np.asarray(tps.build_P_cell_centers(64, 16), np.float32)
    P_hat = np.asarray(tps.build_P_hat(C, P), np.float32)
    rng = np.random.default_rng(0)
    cp = np.asarray(C, np.float32)[None] + \
        0.05 * rng.standard_normal((1, 32, 2)).astype(np.float32)
    score = np.zeros((1, P.shape[0], 32), np.float32)
    base = np.asarray(tps.build_P_prime(cp, score, inv, P_hat, P))
    d = np.array([0.13, -0.07], np.float32)
    shifted = np.asarray(tps.build_P_prime(cp + d, score, inv, P_hat, P))
    np.testing.assert_allclose(shifted, base + d, atol=1e-4)


def test_score_modulation_changes_grid():
    C = tps.build_C_cell_centers((2, 16))
    inv = np.asarray(tps.build_inv_delta_C(C), np.float32)
    P = np.asarray(tps.build_P_cell_centers(64, 16), np.float32)
    P_hat = np.asarray(tps.build_P_hat(C, P), np.float32)
    rng = np.random.default_rng(1)
    cp = np.asarray(C, np.float32)[None] + \
        0.05 * rng.standard_normal((1, 32, 2)).astype(np.float32)
    zero = np.zeros((1, 1024, 32), np.float32)
    score = np.tanh(rng.standard_normal((1, 1024, 32))).astype(np.float32)
    a = np.asarray(tps.build_P_prime(cp, zero, inv, P_hat, P))
    b = np.asarray(tps.build_P_prime(cp, score, inv, P_hat, P))
    assert np.abs(a - b).max() > 1e-4
