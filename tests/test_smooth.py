"""RTS smoother: exactness on a linear-Gaussian system + tracker integration."""
import numpy as np

from glimpse_tpu.track.smooth import process_noise, rts_smooth, transition_matrix


def _simulate_and_filter(T=12, dt=1.0, a_sigma=(0.3, 0.2, 0.1), obs_sigma=0.5, seed=0):
    """Simulate constant-velocity motion with position observations and run
    an exact Kalman filter. Returns (filter means, covs, observations, model)."""
    rng = np.random.default_rng(seed)
    F = transition_matrix(dt)
    Q = process_noise(dt, a_sigma) + 1e-12 * np.eye(6)
    H = np.zeros((3, 6))
    H[:, 0:3] = np.eye(3)
    R = obs_sigma ** 2 * np.eye(3)
    # Simulate
    x = np.concatenate([rng.normal(0, 5, 3), rng.normal(0, 1, 3)])
    xs, ys = [], []
    for t in range(T):
        if t:
            x = F @ x + np.linalg.cholesky(Q) @ rng.normal(size=6)
        xs.append(x)
        ys.append(H @ x + obs_sigma * rng.normal(size=3))
    # Kalman filter with a broad Gaussian prior
    m = np.zeros(6)
    P = np.diag([100.0] * 3 + [25.0] * 3)
    means, covs = [], []
    for t in range(T):
        if t:
            m = F @ m
            P = F @ P @ F.T + Q
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        m = m + K @ (ys[t] - H @ m)
        P = (np.eye(6) - K @ H) @ P
        means.append(m.copy())
        covs.append(P.copy())
    return np.asarray(means), np.asarray(covs), np.asarray(ys), (F, Q, H, R), np.asarray(xs)


def test_rts_matches_batch_map_on_linear_gaussian():
    """The RTS mean equals the joint-MAP solution of the full LG system."""
    T = 12
    means, covs, ys, (F, Q, H, R), _ = _simulate_and_filter(T=T)
    sm, sc = rts_smooth(means[:, None], covs[:, None], np.ones(T - 1), (0.3, 0.2, 0.1))
    sm = sm[:, 0]

    # Independent check: batch MAP over all states by weighted least squares.
    D = 6
    n = T * D
    A_rows, b_rows = [], []
    # Prior on x0
    P0 = np.diag([100.0] * 3 + [25.0] * 3)
    W0 = np.linalg.cholesky(np.linalg.inv(P0))
    blk = np.zeros((D, n))
    blk[:, 0:D] = np.eye(D)
    A_rows.append(W0.T @ blk)
    b_rows.append(W0.T @ np.zeros(D))
    Wq = np.linalg.cholesky(np.linalg.inv(Q + 1e-12 * np.eye(6)))
    Wr = np.linalg.cholesky(np.linalg.inv(R))
    for t in range(T - 1):
        blk = np.zeros((D, n))
        blk[:, (t + 1) * D:(t + 2) * D] = np.eye(D)
        blk[:, t * D:(t + 1) * D] = -F
        A_rows.append(Wq.T @ blk)
        b_rows.append(np.zeros(D))
    for t in range(T):
        blk = np.zeros((3, n))
        blk[:, t * D:(t + 1) * D] = H
        A_rows.append(Wr.T @ blk)
        b_rows.append(Wr.T @ ys[t])
    A = np.vstack(A_rows)
    b = np.concatenate(b_rows)
    x_map = np.linalg.lstsq(A, b, rcond=None)[0].reshape(T, D)
    np.testing.assert_allclose(sm, x_map, atol=1e-6)


def test_rts_reduces_tracking_error():
    """Smoothing real Kalman-filter trajectories beats filtering alone."""
    a_sigma = (0.3, 0.2, 0.1)
    filt_err = 0.0
    smooth_err = 0.0
    for seed in range(12):
        T = 25
        means, covs, _, (F, Q, H, R), truth = _simulate_and_filter(
            T=T, a_sigma=a_sigma, seed=200 + seed
        )
        sm, _ = rts_smooth(means[:, None], covs[:, None], np.ones(T - 1), a_sigma)
        filt_err += np.mean((means[:, 0:3] - truth[:, 0:3]) ** 2)
        smooth_err += np.mean((sm[:, 0, 0:3] - truth[:, 0:3]) ** 2)
    assert smooth_err < 0.8 * filt_err
