import jax
import jax.numpy as jnp
import numpy as np

from sentiric_stt_whisper_service_tpu.models import config_for, init_params
from sentiric_stt_whisper_service_tpu.models.timestamps import (
    alignment_scores,
    compute_token_times,
    dtw_path,
    median_filter,
    token_boundaries,
)


class TestDTW:
    def test_identity_diagonal(self):
        # Strong diagonal alignment → path follows it.
        n = 10
        cost = np.ones((n, n)) - 0.9 * np.eye(n)
        ti, fi = dtw_path(cost)
        on_diag = sum(1 for a, b in zip(ti, fi) if a == b)
        assert on_diag >= n - 1

    def test_monotone(self):
        rng = np.random.default_rng(0)
        cost = rng.random((12, 40))
        ti, fi = dtw_path(cost)
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
        assert ti[0] == 0 and fi[0] == 0
        assert ti[-1] == 11 and fi[-1] == 39

    def test_matches_bruteforce(self):
        """Vectorized min-plus scan == classic O(TF) double loop."""
        rng = np.random.default_rng(1)
        cost = rng.random((8, 15))
        T, F = cost.shape
        D = np.full((T + 1, F + 1), np.inf)
        D[0, 0] = 0
        for i in range(1, T + 1):
            for j in range(1, F + 1):
                D[i, j] = cost[i - 1, j - 1] + min(
                    D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
                )
        ti, fi = dtw_path(cost)
        path_cost = cost[ti, fi].sum()
        np.testing.assert_allclose(path_cost, D[T, F], rtol=1e-10)

    def test_stretched_alignment(self):
        # 3 tokens over 30 frames, each "active" in its own third.
        score = np.zeros((3, 30))
        score[0, :10] = 1.0
        score[1, 10:20] = 1.0
        score[2, 20:] = 1.0
        bounds = token_boundaries(score, 30)
        assert bounds.shape == (3, 2)
        assert 0.0 <= bounds[0, 0] < 0.1
        assert abs(bounds[1, 0] - 0.2) < 0.06
        assert abs(bounds[2, 0] - 0.4) < 0.06
        assert bounds[2, 1] == 0.6  # 30 frames * 20 ms


def test_median_filter():
    x = np.array([[1.0, 9.0, 1.0, 1.0, 1.0, 9.0, 1.0]])
    y = median_filter(x, 3)
    assert y.shape == x.shape
    assert y[0, 1] == 1.0  # spike removed


def test_compute_token_times_model():
    cfg = config_for("test", dtype=jnp.float32)
    params = init_params(cfg, jax.random.key(0))
    from sentiric_stt_whisper_service_tpu.models import encode_xa_kv
    from sentiric_stt_whisper_service_tpu.ops import log_mel_spectrogram, N_SAMPLES

    audio = np.random.default_rng(0).standard_normal((1, N_SAMPLES)).astype(np.float32) * 0.05
    xa_kv = encode_xa_kv(cfg, params, log_mel_spectrogram(audio))
    tokens = np.array([50258, 50259, 50359, 100, 200, 300, 400], np.int64)
    times = compute_token_times(cfg, params, xa_kv, tokens, 3, 1500)
    assert times.shape == (4, 2)
    assert (times[:, 1] >= times[:, 0]).all()
    assert (np.diff(times[:, 0]) >= 0).all()  # monotone starts
    assert times[-1, 1] <= 30.0 + 1e-6
