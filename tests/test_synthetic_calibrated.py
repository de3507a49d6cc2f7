"""Statistical contract of the calibrated synthetic generator (round-4
VERDICT item 2): the two properties that make 1000G-style panels hard must
actually hold — a rare-heavy site-frequency spectrum and LD that decays
with genetic distance — plus the structural invariants every bundle needs
(shared positions, panel/freq coherence, determinism, population signal
for retrieval)."""

import numpy as np
import pytest

from rag_snvbert_tpu.io.synthetic import make_bundle, make_calibrated_bundle


@pytest.fixture(scope="module")
def bundle():
    return make_calibrated_bundle(n_train_samples=40, n_ref_samples=100,
                                  n_sites=2400, n_windows=3, seed=11)


def _haps(vcf):
    return vcf.gt.reshape(vcf.gt.shape[0], -1)  # [S, 2n]


def test_sfs_is_rare_heavy(bundle):
    """Neutral spectrum: most polymorphic sites are low-frequency.  The
    old generator's beta(0.3,0.9) clipped at 2% produced almost no
    MAF<0.05 sites; the calibrated one must have a large rare bin so
    rare-variant F1 (the reference's headline metric) is measurable."""
    af = _haps(bundle.ref).mean(1)
    maf = np.minimum(af, 1 - af)
    poly = maf > 0
    assert poly.mean() > 0.9                       # few monomorphic sites
    rare = (maf[poly] < 0.05).mean()
    assert 0.25 < rare < 0.75, f"rare-bin fraction {rare:.3f}"
    assert (maf[poly] < 0.01).mean() > 0.05        # singletons exist too


def test_ld_decays_with_distance(bundle):
    """Mean r^2 between COMMON sites WITHIN one population (cross-pop
    admixture LD is real but distance-free; within-pop LD is the distance
    signal): high at the block scale, near zero at 150kb — flat flip
    noise (the old ceiling) has r^2 ~ 0 everywhere, so this also guards
    against silently losing the LD."""
    pop0 = np.asarray(bundle.ref_panel.pop_list) == "POP0"
    haps = bundle.ref.gt[:, pop0, :].reshape(len(bundle.ref.pos), -1
                                             ).astype(np.float64)
    af = haps.mean(1)
    keep = (np.minimum(af, 1 - af) > 0.1)
    x, pos = haps[keep], bundle.ref.pos[keep]
    xc = (x - x.mean(1, keepdims=True)) / x.std(1)[:, None]

    def mean_r2(lag_bp):
        vals = []
        for i in range(0, len(pos) - 1, 3):
            j = int(np.searchsorted(pos, pos[i] + lag_bp))
            if j < len(pos):
                vals.append(float(xc[i] @ xc[j] / x.shape[1]) ** 2)
        return float(np.mean(vals))

    near, mid, far = mean_r2(500), mean_r2(30_000), mean_r2(150_000)
    assert near > 3 * far, f"no LD decay: {near:.3f} vs {far:.3f}"
    assert near > 0.05, f"short-range LD too weak: {near:.3f}"
    assert far < 0.05, f"long-range LD should be ~0: {far:.3f}"


def test_rare_variants_are_shared_not_private(bundle):
    """A rare allele must usually have >1 carrier haplotype (inherited
    through copying, hence imputable via LD) — under the old flat-noise
    generator rare alleles were i.i.d. flips, unrecoverable in principle."""
    haps = _haps(bundle.ref)
    counts = haps.sum(1)
    n = haps.shape[1]
    rare = (counts > 0) & (counts / n < 0.05)
    shared = (counts[rare] >= 3).mean()
    assert shared > 0.5, f"only {shared:.2f} of rare sites have >=3 carriers"


def test_population_signal_for_retrieval(bundle):
    """Nearest reference haplotype (by Hamming) should come from the same
    population well above chance — retrieval must stay meaningful."""
    tr, rf = _haps(bundle.train).T, _haps(bundle.ref).T    # [2n, S]
    tr_pop = np.repeat(bundle.panel.pop_list, 2)
    rf_pop = np.repeat(bundle.ref_panel.pop_list, 2)
    d = (tr[:, None, :] != rf[None, :, :]).sum(-1)
    hit = (rf_pop[np.argmin(d, 1)] == tr_pop).mean()
    assert hit > 0.8, f"NN same-pop rate {hit:.2f}"


def test_bundle_structure_and_determinism():
    b1 = make_calibrated_bundle(n_train_samples=8, n_ref_samples=12,
                                n_sites=200, n_windows=2, seed=3)
    b2 = make_calibrated_bundle(n_train_samples=8, n_ref_samples=12,
                                n_sites=200, n_windows=2, seed=3)
    np.testing.assert_array_equal(b1.train.gt, b2.train.gt)
    np.testing.assert_array_equal(b1.ref.gt, b2.ref.gt)
    np.testing.assert_array_equal(b1.train.pos, b1.ref.pos)
    assert b1.freq.freq.shape[2] == len(b1.ref.pos)
    assert b1.window.window_info[-1][1] == 200
    assert len(b1.vocab.pops) >= 2
    # same public surface as make_bundle (drop-in for the pipeline)
    b0 = make_bundle(n_train_samples=8, n_ref_samples=12, n_sites=200,
                     n_windows=2, seed=3)
    assert type(b0) is type(b1)
