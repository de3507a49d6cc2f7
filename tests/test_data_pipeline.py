import numpy as np

from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.io.vocab import ALLELE_OFFSET, MASK, SOS


def make_ds(seq_len=128, **kw):
    b = make_bundle(**kw)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=seq_len)
    return b, ds


def test_window_intersection_full_overlap():
    b, ds = make_ds(n_sites=300, n_windows=3)
    assert ds.n_windows == 3
    for meta in ds.windows:
        assert meta.n_sites == meta.site_slice.stop - meta.site_slice.start


def test_batch_shapes_and_labels():
    b, ds = make_ds()
    meta = ds.windows[0]
    batch = ds.make_batch(meta, np.arange(8), level=2, seed=1)
    L = 128
    for k in ["hap_1", "hap_2", "hap_1_label", "hap_2_label", "gt_label",
              "mask", "pos", "af", "af_p", "ref", "het", "hom"]:
        assert batch[k].shape == (8, L), k
    # token layout
    assert (batch["hap_1"][:, 0] == SOS).all()
    # gt label consistency: gt = (h1<<1)+h2 site-wise
    gl = batch["gt_label"]
    assert (gl == (batch["hap_1_label"] << 1) + batch["hap_2_label"]).all()
    # masked positions are the MASK token; unmasked body matches label+offset
    m = batch["mask"][0].astype(bool)
    n = meta.n_sites
    body = slice(1, 1 + n)
    assert (batch["hap_1"][:, body][:, m[body]] == MASK).all()
    um = ~m[body]
    assert (batch["hap_1"][:, body][:, um]
            == batch["hap_1_label"][:, body][:, um] + ALLELE_OFFSET).all()


def test_batch_padding_rows_no_loss():
    b, ds = make_ds()
    meta = ds.windows[0]
    batch = ds.make_batch(meta, np.arange(5), level=0, seed=0, pad_to=8)
    assert batch["hap_1"].shape[0] == 8
    assert (batch["mask"][5:] == 0).all()
    assert (batch["mask"][:5].sum(1) > 0).all()


def test_mask_deterministic_per_epoch_and_window():
    b, ds = make_ds()
    m0 = ds.window_mask(ds.windows[0], level=1, seed=3)
    m0b = ds.window_mask(ds.windows[0], level=1, seed=3)
    m1 = ds.window_mask(ds.windows[1], level=1, seed=3)
    assert (m0 == m0b).all() and (m0 != m1).any()
    assert m0[0] == 0  # SOS slot never masked


def test_ref_tokens_complete_and_padded():
    b, ds = make_ds()
    meta = ds.windows[0]
    toks, af, valid = ds.window_ref_tokens(meta, pad_haps_to=128)
    assert toks.shape == (128, 128)
    n_haps = 2 * b.ref.n_samples
    assert valid.sum() == n_haps
    assert (toks[:n_haps, 0] == SOS).all()
    assert (toks[n_haps:] == 0).all()
    # no MASK tokens in complete refs
    assert (toks != MASK).all()


def test_epoch_batches_window_major():
    b, ds = make_ds(n_train_samples=10)
    seen = []
    for meta, batch in ds.epoch_batches(batch_size=4, epoch=0, level=0):
        seen.append(meta.window_idx)
        assert batch["hap_1"].shape == (4, 128)
    # window-major: each window's batches are contiguous
    changes = sum(1 for i in range(1, len(seen)) if seen[i] != seen[i - 1])
    assert changes == ds.n_windows - 1
    # epoch reshuffles windows
    order1 = [m.window_idx for m, _ in ds.epoch_batches(4, epoch=1, level=0)]
    order2 = [m.window_idx for m, _ in ds.epoch_batches(4, epoch=2, level=0)]
    assert order1 != order2 or ds.n_windows == 1


def test_partial_position_overlap_filters_sites():
    b = make_bundle(n_sites=200, n_windows=2)
    # Drop every third reference site: the intersection must shrink.
    keep = np.ones(200, bool)
    keep[::3] = False
    ref = b.ref
    import dataclasses
    ref2 = dataclasses.replace(ref, gt=ref.gt[keep], pos=ref.pos[keep],
                               chrom=ref.chrom[keep], ref=ref.ref[keep],
                               alt=ref.alt[keep], ids=ref.ids[keep])
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=ref2, seq_len=128)
    for meta in ds.windows:
        full = meta.site_slice.stop - meta.site_slice.start
        assert meta.n_sites < full
        assert (ref2.pos[meta.ref_rows] == meta.positions).all()


def test_multihost_batch_slices_reassemble():
    """Host-sharded epoch_batches: per-host slices concatenate to the
    single-host global batch at every step (incl. padded trailing),
    with global-padding rows loss-masked."""
    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_bundle

    b = make_bundle(n_train_samples=10, n_ref_samples=8, n_sites=96,
                    n_windows=2, seed=4)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=80)
    bs = 6  # n_samples likely not divisible -> trailing pad exercised
    full = list(ds.epoch_batches(bs, epoch=1, level=0))
    h0 = list(ds.epoch_batches(bs, epoch=1, level=0, host_id=0, n_hosts=2))
    h1 = list(ds.epoch_batches(bs, epoch=1, level=0, host_id=1, n_hosts=2))
    assert len(full) == len(h0) == len(h1)
    for (m, fb), (_, b0), (_, b1) in zip(full, h0, h1):
        for k in fb:
            merged = np.concatenate([b0[k], b1[k]], axis=0)
            if k == "mask":
                # global-padding rows are mask-zeroed in both layouts
                np.testing.assert_array_equal(merged, fb[k])
            else:
                np.testing.assert_array_equal(merged[: bs], fb[k][: bs])


def test_multihost_global_batch_on_mesh():
    """parallel.multihost.global_batch lifts local shards onto the mesh
    (single-process degenerate case: local shard = full batch)."""
    import jax

    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.parallel.mesh import make_mesh
    from rag_snvbert_tpu.parallel.multihost import global_batch

    devs = jax.devices("cpu")
    if len(devs) < 4:
        import pytest
        pytest.skip("need 4 cpu devices")
    mesh = make_mesh(n_data=4, n_index=1, devices=devs[:4])
    b = make_bundle(n_train_samples=8, n_ref_samples=8, n_sites=96,
                    n_windows=2, seed=4)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=80)
    meta, batch = next(ds.epoch_batches(8, epoch=0, level=0))
    gb = global_batch(mesh, batch)
    assert gb["hap_1"].shape == batch["hap_1"].shape
    np.testing.assert_array_equal(np.asarray(gb["hap_1"]), batch["hap_1"])


def test_packed_batch_roundtrip():
    """The compact wire format (packed=True) expanded on device must equal
    the plain batch bit-for-bit — including padded rows and the zeroed
    pad-row mask."""
    from rag_snvbert_tpu.train.step import expand_packed

    b, ds = make_ds(n_sites=300, n_windows=3)
    meta = ds.windows[1]
    ids = np.arange(5)
    plain = ds.make_batch(meta, ids, level=2, seed=7, pad_to=8)
    packed = ds.make_batch(meta, ids, level=2, seed=7, pad_to=8, packed=True)

    # wire-size sanity: packed must be much smaller
    size = lambda bt: sum(v.nbytes for v in bt.values())
    assert size(packed) < size(plain) / 3

    expanded = expand_packed({k: np.asarray(v) for k, v in packed.items()})
    assert set(expanded) == set(plain)
    for k in plain:
        got = np.asarray(expanded[k])
        assert got.dtype == plain[k].dtype, k
        np.testing.assert_array_equal(got, plain[k], err_msg=k)
    # non-packed batches pass through expand_packed untouched
    again = expand_packed(plain)
    assert again is plain
