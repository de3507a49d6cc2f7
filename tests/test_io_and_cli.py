"""Host IO round-trips and CLI subcommand end-to-end runs on synthetic data."""

import json
import os

import numpy as np
import pytest

from rag_snvbert_tpu.io.freq import AF, FreqTable, build_freq_matrix
from rag_snvbert_tpu.io.panel import PanelData
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.io.vcf import (load_vcf_or_hdf5, read_vcf, vcf_to_hdf5,
                                    write_simple_vcf)
from rag_snvbert_tpu.io.windows import Window


@pytest.fixture(scope="module")
def bundle():
    return make_bundle(n_train_samples=6, n_ref_samples=10, n_sites=80,
                       n_windows=2)


def test_vcf_roundtrip(tmp_path, bundle):
    p = str(tmp_path / "train.vcf")
    write_simple_vcf(p, bundle.train)
    back = read_vcf(p)
    np.testing.assert_array_equal(back.gt, bundle.train.gt)
    np.testing.assert_array_equal(back.pos, bundle.train.pos)
    assert back.samples == bundle.train.samples


def test_vcf_gz_and_h5_cache(tmp_path, bundle):
    p = str(tmp_path / "train.vcf.gz")
    write_simple_vcf(p, bundle.train)
    h5 = vcf_to_hdf5(p)
    assert h5.endswith(".h5")
    back = load_vcf_or_hdf5(p)  # should hit the h5 cache
    np.testing.assert_array_equal(back.gt, bundle.train.gt)


def test_panel_file_and_split(tmp_path, bundle):
    p = str(tmp_path / "x.panel")
    with open(p, "w") as f:
        f.write("sample\tpop\tsuper_pop\n")
        for s, pop in zip(bundle.panel.samples, bundle.panel.pop_list):
            f.write(f"{s}\t{pop}\tX\n")
    panel = PanelData.from_file(p)
    assert panel.samples == bundle.panel.samples
    assert panel.pop_to_class == bundle.panel.pop_to_class
    tr, te = panel.split_stratified(0.34, seed=1)
    assert len(tr) + len(te) == panel.n_samples
    assert set(tr).isdisjoint(te)


def test_freq_matrix_values(bundle):
    gt = bundle.ref.gt
    # hand-check one site's global AF
    af0 = gt[0].sum() / (2 * gt.shape[1])
    got = bundle.freq.lookup(AF, bundle.freq.global_idx,
                             bundle.ref.pos[:1])[0]
    assert abs(af0 - got) < 1e-6
    # layers sum to 1 per (pop, site)
    f = bundle.freq.freq
    np.testing.assert_allclose(f[0] + f[1] + f[2], 1.0, atol=1e-5)


def test_window_csv_roundtrip(tmp_path, bundle):
    p = str(tmp_path / "w.csv")
    bundle.window.save_csv(p)
    back = Window.from_file(p)
    np.testing.assert_array_equal(back.window_info,
                                  bundle.window.window_info)


def test_cli_prepare_build_query(tmp_path, bundle, capsys):
    from rag_snvbert_tpu.cli.main import main

    ref_vcf = str(tmp_path / "ref.vcf")
    tgt_vcf = str(tmp_path / "tgt.vcf")
    panel_p = str(tmp_path / "ref.panel")
    write_simple_vcf(ref_vcf, bundle.ref)
    write_simple_vcf(tgt_vcf, bundle.train)
    with open(panel_p, "w") as f:
        f.write("sample\tpop\n")
        for s, pop in zip(bundle.ref_panel.samples, bundle.ref_panel.pop_list):
            f.write(f"{s}\t{pop}\n")

    out = str(tmp_path / "prep")
    main(["prepare-data", "--vcf", ref_vcf, "--panel", panel_p,
          "--out", out, "--window-len", "40",
          "--split-test-fraction", "0.2"])
    assert os.path.exists(os.path.join(out, "freq.npz"))
    assert os.path.exists(os.path.join(out, "windows.csv"))
    assert os.path.exists(os.path.join(out, "POP.json"))

    db = str(tmp_path / "db")
    main(["build-index", "--vcf", ref_vcf, "--out", db,
          "--window-len", "40", "--panel", panel_p])
    assert os.path.exists(os.path.join(db, "window_0.idx.npz"))
    assert os.path.exists(os.path.join(db, "window_0_pop.npy"))
    capsys.readouterr()

    main(["query", "--vcf", tgt_vcf, "--db", db, "--k", "3", "--verbose"])
    out_lines = capsys.readouterr().out.strip().splitlines()
    stats = json.loads(out_lines[-1])
    assert stats["n_queries"] == bundle.train.n_samples * 2  # 2 windows
    assert stats["qps"] > 0
    # verbose spot-check: best-hit line carries the neighbor's population
    # label and both allele snippets (reference test_faiss.py:146-164)
    assert any("pop POP" in l for l in out_lines)
    assert any(l.startswith("  target snippet =>") for l in out_lines)
    assert any(l.startswith("  neighb snippet =>") for l in out_lines)

    for mode, extra in [("partial", []), ("intersect", []),
                        ("intersect", ["--hamming"])]:
        main(["query", "--vcf", tgt_vcf, "--db", db, "--k", "3",
              "--mode", mode] + extra)
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["qps"] > 0


def test_cli_query_index_shards_parity(tmp_path, bundle, capsys):
    """`query --index-shards 8` on the virtual 8-CPU mesh reproduces the
    single-device ids and distances EXACTLY, in both flat and intersect
    modes (round-4 VERDICT item 4: the offline multi-chip surface of
    ShardedFlatL2Index, replicating the reference's test_faiss.py:55-172
    offline engine at chromosome scale)."""
    import numpy as np

    from rag_snvbert_tpu.cli.main import main

    ref_vcf = str(tmp_path / "ref.vcf")
    tgt_vcf = str(tmp_path / "tgt.vcf")
    write_simple_vcf(ref_vcf, bundle.ref)
    write_simple_vcf(tgt_vcf, bundle.train)
    db = str(tmp_path / "db")
    main(["build-index", "--vcf", ref_vcf, "--out", db,
          "--window-len", "40"])
    capsys.readouterr()

    for mode in ("flat", "intersect"):
        res1 = str(tmp_path / f"res1_{mode}")
        res8 = str(tmp_path / f"res8_{mode}")
        main(["query", "--vcf", tgt_vcf, "--db", db, "--k", "5",
              "--mode", mode, "--save-results", res1])
        main(["query", "--vcf", tgt_vcf, "--db", db, "--k", "5",
              "--mode", mode, "--save-results", res8,
              "--index-shards", "8"])
        capsys.readouterr()
        for w in range(2):
            i1 = np.load(os.path.join(res1, f"window_{w}_ids.npy"))
            i8 = np.load(os.path.join(res8, f"window_{w}_ids.npy"))
            v1 = np.load(os.path.join(res1, f"window_{w}_vals.npy"))
            v8 = np.load(os.path.join(res8, f"window_{w}_vals.npy"))
            np.testing.assert_array_equal(i1, i8)
            np.testing.assert_allclose(v1, v8, atol=1e-3)


def test_cli_train_then_infer(tmp_path, bundle, capsys):
    """End-to-end through the CLI: prepare-data -> train (1 epoch, sample
    split, tiny model) -> infer -> emitted VCF exists."""
    from rag_snvbert_tpu.cli.main import main

    ref_vcf = str(tmp_path / "ref.vcf")
    tr_vcf = str(tmp_path / "train.vcf")
    panel_p = str(tmp_path / "train.panel")
    write_simple_vcf(ref_vcf, bundle.ref)
    write_simple_vcf(tr_vcf, bundle.train)
    with open(panel_p, "w") as f:
        f.write("sample\tpop\n")
        for s, pop in zip(bundle.panel.samples, bundle.panel.pop_list):
            f.write(f"{s}\t{pop}\n")

    prep = str(tmp_path / "prep")
    main(["prepare-data", "--vcf", tr_vcf, "--panel", panel_p,
          "--out", prep, "--window-len", "40",
          "--split-test-fraction", "0.25"])
    run_dir = str(tmp_path / "run")
    main(["train", "--train_dataset", tr_vcf, "--train_panel", panel_p,
          "--refpanel_path", ref_vcf,
          "--freq_path", os.path.join(prep, "freq"),
          "--window_path", os.path.join(prep, "windows.csv"),
          "--output_path", run_dir, "--epochs", "1",
          "--train_batch_size", "4", "--val_batch_size", "4",
          "--warmup_steps", "5", "--grad_accum_steps", "1",
          "--dims", "32", "--layers", "1", "--attn-heads", "4",
          "--seq-len", "64",
          "--train-samples", os.path.join(prep, "train_samples.npy"),
          "--val-samples", os.path.join(prep, "test_samples.npy")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best" in out
    assert os.path.isdir(os.path.join(run_dir, "ckpt_ep0"))

    out_vcf = str(tmp_path / "imputed.vcf")
    main(["infer", "--target", tr_vcf, "--refpanel_path", ref_vcf,
          "--freq_path", os.path.join(prep, "freq"),
          "--model_path", os.path.join(run_dir, "ckpt_ep0"),
          "--output_vcf", out_vcf, "--panel", panel_p,
          "--dims", "32", "--layers", "1", "--attn-heads", "4",
          "--seq-len", "64", "--infer_window_len", "40",
          "--batch_size", "4"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["sites"] == bundle.ref.n_variants
    assert os.path.exists(out_vcf)


def test_cli_build_query_packed(tmp_path, bundle, capsys):
    """build-index --dtype packed: 8 genotypes/byte storage, query results
    identical to the f32 DB (binary data -> exact either way)."""
    from rag_snvbert_tpu.cli.main import main

    ref_vcf = str(tmp_path / "ref.vcf")
    tgt_vcf = str(tmp_path / "tgt.vcf")
    write_simple_vcf(ref_vcf, bundle.ref)
    write_simple_vcf(tgt_vcf, bundle.train)

    outs, hits = {}, {}
    for dt in ("f32", "packed"):
        db = str(tmp_path / f"db_{dt}")
        main(["build-index", "--vcf", ref_vcf, "--out", db,
              "--window-len", "40", "--dtype", dt])
        capsys.readouterr()
        main(["query", "--vcf", tgt_vcf, "--db", db, "--k", "3",
              "--verbose"])
        lines = capsys.readouterr().out.strip().splitlines()
        outs[dt] = json.loads(lines[-1])
        hits[dt] = [l.split("best id")[1] for l in lines if "best id" in l]
    assert outs["packed"]["n_queries"] == outs["f32"]["n_queries"]
    # per-window best hit (id + distance) identical across storages
    assert hits["packed"] == hits["f32"] and hits["f32"]
    # the packed shards are materially smaller on disk
    sz = lambda d: os.path.getsize(os.path.join(d, "window_0.idx.npz"))
    assert sz(str(tmp_path / "db_packed")) < sz(str(tmp_path / "db_f32"))
