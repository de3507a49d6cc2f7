import numpy as np
import jax

from rag_snvbert_tpu.data import masking


def test_curriculum_rates():
    assert masking.mask_rate(0) == 0.30
    assert masking.mask_rate(5) == 0.80
    assert masking.mask_rate(99) == 0.80  # clamped at max level


def test_af_guided_probs():
    af = np.array([0.01, 0.10, 0.04999, 0.5])
    p = masking.af_guided_probs(af, level=0)
    assert np.allclose(p, [0.7, 0.3, 0.7, 0.3])


def test_mask_determinism_per_seed_window():
    af = np.full(500, 0.2)
    m1 = masking.af_guided_mask(af, level=2, seed=3, window_idx=7)
    m2 = masking.af_guided_mask(af, level=2, seed=3, window_idx=7)
    m3 = masking.af_guided_mask(af, level=2, seed=3, window_idx=8)
    m4 = masking.af_guided_mask(af, level=2, seed=4, window_idx=7)
    assert (m1 == m2).all()
    assert (m1 != m3).any()
    assert (m1 != m4).any()


def test_mask_rate_statistics():
    af = np.full(20000, 0.5)  # all common
    m = masking.af_guided_mask(af, level=2, seed=0, window_idx=0)
    assert abs(m.mean() - 0.50) < 0.02
    af_rare = np.full(20000, 0.01)
    m = masking.af_guided_mask(af_rare, level=0, seed=0, window_idx=0)
    assert abs(m.mean() - 0.70) < 0.02


def test_span_mask():
    m = masking.span_mask(100, 0.3, seed=1, window_idx=0)
    assert m.sum() == 30
    on = np.flatnonzero(m)
    assert (np.diff(on) == 1).all()  # contiguous


def test_jax_mask_inside_jit():
    af = np.full(1024, 0.2, np.float32)

    @jax.jit
    def f(key, af):
        return masking.af_guided_mask_jax(key, af, 0.5, 3)

    m1 = f(jax.random.key(0), af)
    m2 = f(jax.random.key(0), af)
    assert (np.asarray(m1) == np.asarray(m2)).all()
    assert 0.3 < np.asarray(m1).mean() < 0.7
