"""Reference (torch) checkpoint conversion — structure + numeric parity.

Two tiers:
  * structural tests run everywhere: a synthesized state_dict (the
    key/shape contract in interop.expected_reference_keys, derived from
    src/model/* of the reference) converts into exactly the tree our
    model init produces, and the converted model runs end to end.
  * numeric parity runs only where torch AND the reference source tree
    are available (this CI image): random-weight reference
    BERTFoundationModel in eval mode vs the converted flax model on the
    same inputs — the strongest possible check that a user's trained
    checkpoint behaves identically after conversion.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_snvbert_tpu.interop import (convert_state_dict,
                                     expected_reference_keys,
                                     export_state_dict)
from rag_snvbert_tpu.models import (BERTFoundationModel,
                                    BERTWithEmbeddingRAG)
from rag_snvbert_tpu.models.heads import init_batch

REF = "/root/reference"
DIMS, LAYERS, HEADS, VOCAB, L, B = 64, 2, 2, 40, 16, 3


def fake_state_dict(seed=0, layers=LAYERS, dims=DIMS, vocab=VOCAB, **kw):
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in expected_reference_keys(layers, dims, vocab, **kw).items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(0)
        elif k.endswith("running_var"):
            sd[k] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[k] = rng.normal(0, 0.5, shape).astype(np.float32)
    return sd


def build_model(compat=True):
    bert = BERTWithEmbeddingRAG(vocab_size=VOCAB, dims=DIMS,
                                n_layers=LAYERS, attn_heads=HEADS,
                                pos_norm="frozen_batch")
    return BERTFoundationModel(bert=bert, compat_double_softmax=compat)


def sample_inputs(seed=1):
    rng = np.random.default_rng(seed)
    return {
        "hap_1": rng.integers(1, VOCAB, (B, L)).astype(np.int32),
        "hap_2": rng.integers(1, VOCAB, (B, L)).astype(np.int32),
        "pos": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "af": rng.uniform(0.01, 0.99, (B, L)).astype(np.float32),
        "af_p": rng.uniform(0.01, 0.99, (B, L)).astype(np.float32),
        "ref": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "het": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "hom": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "rag_emb_h1": rng.normal(0, 1, (B, 1, L, DIMS)).astype(np.float32),
        "rag_emb_h2": rng.normal(0, 1, (B, 1, L, DIMS)).astype(np.float32),
    }


def tree_paths(tree):
    return {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_converted_tree_matches_init_exactly():
    params, meta = convert_state_dict(fake_state_dict())
    assert meta["dims"] == DIMS and meta["n_layers"] == LAYERS
    assert meta["vocab_size"] == VOCAB and meta["rag_mode"] == "embedding"
    model = build_model()
    ref = model.init(jax.random.key(0), init_batch(2, L, DIMS),
                     deterministic=True)["params"]
    assert tree_paths(ref) == tree_paths(params)


def test_converted_model_runs():
    params, _ = convert_state_dict(fake_state_dict())
    model = build_model()
    x = {k: jnp.asarray(v) for k, v in sample_inputs().items()}
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x,
                      deterministic=True)
    p1 = np.asarray(out[0])
    assert p1.shape == (B, L, 2) and np.isfinite(p1).all()
    np.testing.assert_allclose(p1.sum(-1), 1.0, atol=1e-5)  # compat softmax


def test_unknown_keys_fail_loudly():
    sd = fake_state_dict()
    sd["bert.rag_fusion.mystery.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="unconverted"):
        convert_state_dict(sd)


def test_rag_mode_mismatch_rejected():
    with pytest.raises(ValueError, match="rag_mode"):
        convert_state_dict(fake_state_dict(), rag_mode="none")


def test_headless_bare_bert_converts():
    sd = fake_state_dict(with_heads=False, with_rag=False)
    params, meta = convert_state_dict(sd)
    assert meta["rag_mode"] == "none" and not meta["with_heads"]
    assert "encoder" in params and "hap_classifier" not in params


# ---------------------------------------------------------------------------
# numeric parity vs the actual reference implementation (gated)
# ---------------------------------------------------------------------------

def _load_reference_modules():
    """Import the reference model package with its heavyweight genomics
    deps stubbed out (the model modules themselves need only torch)."""
    import sys
    import types

    import torch  # noqa: F401 — must import before the stubs

    class _Stub(types.ModuleType):
        __path__ = []

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {})

    sys.path.insert(0, REF)
    for mod in ["allel", "faiss", "vcfpy", "pysam", "matplotlib",
                "matplotlib.pyplot", "seaborn", "sklearn",
                "sklearn.model_selection", "sklearn.metrics", "tqdm",
                "h5py", "scipy", "scipy.stats", "pandas"]:
        sys.modules.setdefault(mod, _Stub(mod))
    from src.model.bert import BERTWithEmbeddingRAG as TorchRAGBERT
    from src.model.foundation_model import \
        BERTFoundationModel as TorchFoundation
    return TorchRAGBERT, TorchFoundation


requires_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "model")),
    reason="reference source tree not available")


@requires_reference
@pytest.mark.slow
def test_numeric_parity_with_reference_model():
    torch = pytest.importorskip("torch")
    TorchRAGBERT, TorchFoundation = _load_reference_modules()

    torch.manual_seed(0)
    tm = TorchFoundation(TorchRAGBERT(vocab_size=VOCAB, dims=DIMS,
                                      n_layers=LAYERS, attn_heads=HEADS))
    # randomize the BN running stats so the frozen-stat mapping is load-
    # bearing (fresh init has mean 0 / var 1, which any bug could fake)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    tm.eval()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, meta = convert_state_dict(sd)
    assert meta["with_heads"]

    x_np = sample_inputs()
    xt = {k: torch.from_numpy(v.astype(np.int64 if v.dtype == np.int32
                                       else np.float32))
          for k, v in x_np.items()}
    with torch.no_grad():
        t_hap1, t_hap2, t_gt = tm(xt)[:3]

    model = build_model(compat=True)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      {k: jnp.asarray(v) for k, v in x_np.items()},
                      deterministic=True)
    j_hap1, j_hap2, j_gt = (np.asarray(o) for o in out[:3])

    # Probabilities end to end; the gelu flavor differs (torch erf vs
    # flax tanh approximation), which bounds achievable agreement —
    # measured max |delta| is 1.4e-4 at this size, and a mapping bug
    # (e.g. a transposed kernel) is orders of magnitude worse.
    np.testing.assert_allclose(j_hap1, t_hap1.numpy(), atol=5e-4)
    np.testing.assert_allclose(j_hap2, t_hap2.numpy(), atol=5e-4)
    np.testing.assert_allclose(j_gt, t_gt.numpy(), atol=5e-4)


@requires_reference
@pytest.mark.slow
def test_cli_convert_then_infer(tmp_path, capsys):
    """The full user path: torch.save'd reference checkpoint ->
    `convert-ckpt` -> `infer --model_path <converted>` emits a VCF with
    the architecture auto-configured from convert_meta.json."""
    import json

    torch = pytest.importorskip("torch")
    TorchRAGBERT, TorchFoundation = _load_reference_modules()
    from rag_snvbert_tpu.cli.main import main
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.io.vcf import write_simple_vcf
    from rag_snvbert_tpu.io.vocab import Vocab

    b = make_bundle(n_train_samples=6, n_ref_samples=10, n_sites=80,
                    n_windows=2)
    vocab = Vocab.from_panel_pops(b.panel.pop_list)
    torch.manual_seed(2)
    tm = TorchFoundation(TorchRAGBERT(vocab_size=vocab.size, dims=32,
                                      n_layers=1, attn_heads=4))
    t_path = str(tmp_path / "rag_bert.model.ep0")
    torch.save(tm.cpu(), t_path)

    conv = str(tmp_path / "converted")
    main(["convert-ckpt", "--torch_ckpt", t_path, "--out", conv,
          "--ref-src", REF])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["attn_heads"] == 4 and rep["rag_mode"] == "embedding"
    assert os.path.exists(os.path.join(conv, "convert_meta.json"))

    ref_vcf = str(tmp_path / "ref.vcf")
    tgt_vcf = str(tmp_path / "target.vcf")
    panel_p = str(tmp_path / "x.panel")
    write_simple_vcf(ref_vcf, b.ref)
    write_simple_vcf(tgt_vcf, b.train)
    with open(panel_p, "w") as f:
        f.write("sample\tpop\n")
        for s, pop in zip(b.panel.samples, b.panel.pop_list):
            f.write(f"{s}\t{pop}\n")
    freq_p = str(tmp_path / "freq")
    b.freq.save(freq_p)

    out_vcf = str(tmp_path / "imputed.vcf")
    main(["infer", "--target", tgt_vcf, "--refpanel_path", ref_vcf,
          "--freq_path", freq_p, "--model_path", conv,
          "--output_vcf", out_vcf, "--panel", panel_p,
          "--seq-len", "64", "--infer_window_len", "40",
          "--batch_size", "4"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["sites"] == b.ref.n_variants
    assert os.path.exists(out_vcf)


@requires_reference
@pytest.mark.slow
def test_whole_module_pickle_roundtrip(tmp_path):
    """The reference trainer's actual artifact: torch.save(module)."""
    torch = pytest.importorskip("torch")
    TorchRAGBERT, TorchFoundation = _load_reference_modules()
    from rag_snvbert_tpu.interop import load_torch_checkpoint

    torch.manual_seed(1)
    tm = TorchFoundation(TorchRAGBERT(vocab_size=VOCAB, dims=DIMS,
                                      n_layers=LAYERS, attn_heads=HEADS))
    path = str(tmp_path / "rag_bert.model.ep0")
    torch.save(tm.cpu(), path)

    sd, heads = load_torch_checkpoint(path, ref_src=REF)
    assert heads == HEADS  # read off the module, not the shapes
    params, meta = convert_state_dict(sd)
    assert meta["dims"] == DIMS and meta["n_layers"] == LAYERS
    model = build_model()
    ref = model.init(jax.random.key(0), init_batch(2, L, DIMS),
                     deterministic=True)["params"]
    assert tree_paths(ref) == tree_paths(params)


# ---------------------------------------------------------------------------
# reverse direction: export back to a reference state_dict
# ---------------------------------------------------------------------------

def test_export_roundtrip_exact():
    """convert -> export reproduces every source tensor bit-exactly
    (transposes are lossless); pe is regenerated, counters reset."""
    params, _ = convert_state_dict(fake_state_dict(seed=3))
    out = export_state_dict(params)
    orig = fake_state_dict(seed=3)
    assert set(out) == set(orig)
    for k, v in orig.items():
        if k.endswith("num_batches_tracked") or k.endswith("position.pe"):
            continue
        np.testing.assert_array_equal(out[k], v, err_msg=k)


def test_export_groupnorm_needs_optin():
    """Natively trained models (GroupNorm position stats) refuse a
    silent lossy export; the approx flag emits identity-stats BN with
    the full reference key set."""
    model = build_native_model()
    params = model.init(jax.random.key(0), init_batch(2, L, DIMS),
                        deterministic=True)["params"]
    with pytest.raises(ValueError, match="frozen_batch"):
        export_state_dict(params)
    sd = export_state_dict(params, approx_pos_norm=True)
    assert set(sd) == set(expected_reference_keys(LAYERS, DIMS, VOCAB))
    np.testing.assert_array_equal(
        sd["bert.emb_fusion.pos_feat.norm1.running_var"], np.ones(4))


def build_native_model():
    bert = BERTWithEmbeddingRAG(vocab_size=VOCAB, dims=DIMS,
                                n_layers=LAYERS, attn_heads=HEADS)
    return BERTFoundationModel(bert=bert)


def test_export_rejects_scan_layers_tree():
    from rag_snvbert_tpu.models import BERTWithEmbeddingRAG as M
    model = BERTFoundationModel(bert=M(vocab_size=VOCAB, dims=DIMS,
                                       n_layers=LAYERS, attn_heads=HEADS,
                                       scan_layers=True))
    params = model.init(jax.random.key(0), init_batch(2, L, DIMS),
                        deterministic=True)["params"]
    with pytest.raises((ValueError, KeyError)):
        export_state_dict(params, approx_pos_norm=True)


@requires_reference
@pytest.mark.slow
def test_export_loads_into_reference_model():
    """Full round trip: reference model A -> convert -> export -> strict
    load_state_dict into reference model B; every tensor (including the
    regenerated sinusoidal pe buffer) and every output matches."""
    torch = pytest.importorskip("torch")
    TorchRAGBERT, TorchFoundation = _load_reference_modules()

    torch.manual_seed(5)
    tm = TorchFoundation(TorchRAGBERT(vocab_size=VOCAB, dims=DIMS,
                                      n_layers=LAYERS, attn_heads=HEADS))
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    tm.eval()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, _ = convert_state_dict(sd)
    out_sd = export_state_dict(params)

    tm2 = TorchFoundation(TorchRAGBERT(vocab_size=VOCAB, dims=DIMS,
                                       n_layers=LAYERS, attn_heads=HEADS))
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in out_sd.items()}, strict=True)
    tm2.eval()
    for k, v in tm.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(out_sd[k], v.numpy(), atol=1e-6,
                                   err_msg=k)

    x_np = sample_inputs(seed=9)
    xt = {k: torch.from_numpy(v.astype(np.int64 if v.dtype == np.int32
                                       else np.float32))
          for k, v in x_np.items()}
    with torch.no_grad():
        a, b = tm(xt)[:3], tm2(xt)[:3]
    for ta, tb in zip(a, b):
        np.testing.assert_allclose(tb.numpy(), ta.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# fine-tune a converted checkpoint on TPU (train --init-from)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_cli_finetune_from_converted(tmp_path, capsys):
    """train --init-from <converted>: architecture auto-configured from
    convert_meta.json, weights warm-started, optimizer fresh — the
    'bring your trained reference model, keep training on TPU' path.
    Synthesized state_dict, so it runs without torch module pickles."""
    import json

    from rag_snvbert_tpu.cli.main import main
    from rag_snvbert_tpu.interop import save_converted
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.io.vcf import write_simple_vcf
    from rag_snvbert_tpu.io.vocab import Vocab

    b = make_bundle(n_train_samples=8, n_ref_samples=10, n_sites=80,
                    n_windows=2)
    vocab = Vocab.from_panel_pops(b.panel.pop_list)
    sd = fake_state_dict(seed=11, layers=1, dims=32, vocab=vocab.size)
    params, meta = convert_state_dict(sd)
    meta["attn_heads"] = 4
    conv = str(tmp_path / "converted")
    save_converted(params, meta, conv)

    ref_vcf = str(tmp_path / "ref.vcf")
    tr_vcf = str(tmp_path / "train.vcf")
    panel_p = str(tmp_path / "train.panel")
    write_simple_vcf(ref_vcf, b.ref)
    write_simple_vcf(tr_vcf, b.train)
    with open(panel_p, "w") as f:
        f.write("sample\tpop\n")
        for s, pop in zip(b.panel.samples, b.panel.pop_list):
            f.write(f"{s}\t{pop}\n")
    prep = str(tmp_path / "prep")
    main(["prepare-data", "--vcf", tr_vcf, "--panel", panel_p,
          "--out", prep, "--window-len", "40",
          "--split-test-fraction", "0.25"])
    capsys.readouterr()

    run_dir = str(tmp_path / "run")
    main(["train", "--train_dataset", tr_vcf, "--train_panel", panel_p,
          "--refpanel_path", ref_vcf,
          "--freq_path", os.path.join(prep, "freq"),
          "--window_path", os.path.join(prep, "windows.csv"),
          "--output_path", run_dir, "--epochs", "1",
          "--train_batch_size", "4", "--val_batch_size", "4",
          "--warmup_steps", "5", "--grad_accum_steps", "1",
          "--seq-len", "64", "--init-from", conv,
          "--train-samples", os.path.join(prep, "train_samples.npy"),
          "--val-samples", os.path.join(prep, "test_samples.npy")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best" in out
    assert os.path.isdir(os.path.join(run_dir, "ckpt_ep0"))

    # the fine-tuned epoch-0 checkpoint exports back to a reference
    # state_dict (frozen BN stats survived the round trip)
    from rag_snvbert_tpu.interop import (export_state_dict,
                                         load_params_checkpoint)
    ft = load_params_checkpoint(os.path.join(run_dir, "ckpt_ep0"))
    sd2 = export_state_dict(ft)
    assert set(sd2) == set(sd)


@pytest.mark.slow
def test_cli_finetune_from_converted_token_mode(tmp_path, capsys):
    """Regression: train --init-from a V17 token-mode checkpoint must run
    the trainer in token-retrieval mode (the TrainerConfig.rag_mode comes
    from convert_meta.json, not the preset — a mismatch trace-fails on
    missing rag_seg_* batch keys)."""
    import json

    from rag_snvbert_tpu.cli.main import main
    from rag_snvbert_tpu.interop import save_converted
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.io.vcf import write_simple_vcf
    from rag_snvbert_tpu.io.vocab import Vocab

    b = make_bundle(n_train_samples=8, n_ref_samples=10, n_sites=80,
                    n_windows=2)
    vocab = Vocab.from_panel_pops(b.panel.pop_list)
    sd = fake_state_dict(seed=13, layers=1, dims=32, vocab=vocab.size)
    params, meta = convert_state_dict(sd, rag_mode="token")
    meta["attn_heads"] = 4
    conv = str(tmp_path / "converted")
    save_converted(params, meta, conv)

    ref_vcf = str(tmp_path / "ref.vcf")
    tr_vcf = str(tmp_path / "train.vcf")
    panel_p = str(tmp_path / "train.panel")
    write_simple_vcf(ref_vcf, b.ref)
    write_simple_vcf(tr_vcf, b.train)
    with open(panel_p, "w") as f:
        f.write("sample\tpop\n")
        for s, pop in zip(b.panel.samples, b.panel.pop_list):
            f.write(f"{s}\t{pop}\n")
    prep = str(tmp_path / "prep")
    main(["prepare-data", "--vcf", tr_vcf, "--panel", panel_p,
          "--out", prep, "--window-len", "40"])
    capsys.readouterr()

    run_dir = str(tmp_path / "run")
    main(["train", "--train_dataset", tr_vcf, "--train_panel", panel_p,
          "--refpanel_path", ref_vcf,
          "--freq_path", os.path.join(prep, "freq"),
          "--window_path", os.path.join(prep, "windows.csv"),
          "--output_path", run_dir, "--epochs", "1",
          "--train_batch_size", "4", "--val_batch_size", "4",
          "--warmup_steps", "5", "--grad_accum_steps", "1",
          "--seq-len", "64", "--init-from", conv])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best" in out
