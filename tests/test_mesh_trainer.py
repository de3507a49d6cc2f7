"""Data-parallel Trainer on the 8-device virtual CPU mesh: same math as
single-device training (gradient psum correctness)."""

import numpy as np
import jax
import pytest

from rag_snvbert_tpu.data.pipeline import WindowDataset
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.models import BERTFoundationModel, BERTWithEmbeddingRAG
from rag_snvbert_tpu.parallel.mesh import make_mesh
from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

# Heavy tier: full training loops / multi-device compiles — minutes on
# one core.  The fast inner loop is `pytest -m "not slow"`.
pytestmark = pytest.mark.slow



def build(mesh, out_dir, epochs=1):
    b = make_bundle(n_train_samples=8, n_ref_samples=12, n_sites=96,
                    n_windows=2, seed=11)
    ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                       b.vocab, ref_vcf=b.ref, seq_len=80)
    bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                n_layers=1, attn_heads=4)
    model = BERTFoundationModel(bert=bert)

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    cfg = TrainerConfig(epochs=epochs, batch_size=8, val_batch_size=8,
                        warmup_steps=10, ref_pad_haps=32,
                        output_dir=str(out_dir), log_freq=1000)
    return Trainer(model, embed_fn, ds, cfg, mesh=mesh), model


def test_mesh_trainer_matches_single_device(tmp_path):
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 cpu devices")
    mesh = make_mesh(n_data=8, n_index=1, devices=devs[:8])

    t_mesh, _ = build(mesh, tmp_path / "mesh")
    t_single, _ = build(None, tmp_path / "single")

    r_mesh = t_mesh.fit()
    r_single = t_single.fit()

    lm = r_mesh["history"][0]["train_loss"]
    ls = r_single["history"][0]["train_loss"]
    # identical data order/seeds -> identical loss up to reduction order
    assert abs(lm - ls) / max(abs(ls), 1.0) < 1e-3

    pm = jax.tree.leaves(t_mesh.state.params)[0]
    ps = jax.tree.leaves(t_single.state.params)[0]
    np.testing.assert_allclose(np.asarray(pm), np.asarray(ps),
                               rtol=2e-3, atol=2e-4)


def test_dp_index_sharded_trainer_matches_single_device(tmp_path):
    """Combined DP x index-sharded training (VERDICT round-1 item 3): the
    retrieval context sharded over 4 index shards + batch over 2 data
    shards must reproduce single-device (replicated-context) training."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 cpu devices")
    mesh = make_mesh(n_data=2, n_index=4, devices=devs[:8])

    t_sh, _ = build(mesh, tmp_path / "sh")
    assert t_sh.shard_ctx, "index axis > 1 must auto-enable shard_ctx"
    t_single, _ = build(None, tmp_path / "single")

    r_sh = t_sh.fit()
    r_single = t_single.fit()

    lm = r_sh["history"][0]["train_loss"]
    ls = r_single["history"][0]["train_loss"]
    assert abs(lm - ls) / max(abs(ls), 1.0) < 1e-3

    pm = jax.tree.leaves(t_sh.state.params)[0]
    ps = jax.tree.leaves(t_single.state.params)[0]
    np.testing.assert_allclose(np.asarray(pm), np.asarray(ps),
                               rtol=2e-3, atol=2e-4)


def test_mesh_steps_per_dispatch_matches_single_device(tmp_path):
    """steps_per_dispatch composes with a data-parallel mesh (round-2
    ADVICE): stacked [K, B, ...] chunks shard axis 1 (batch) over data
    and replicate the scan axis; K=3 over 2 batches/window exercises a
    short trailing chunk whose K does not divide the data axis."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 cpu devices")

    def build_k(mesh, out_dir, k):
        b = make_bundle(n_train_samples=8, n_ref_samples=12, n_sites=96,
                        n_windows=2, seed=11)
        ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                           b.vocab, ref_vcf=b.ref, seq_len=80)
        bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                    n_layers=1, attn_heads=4)
        model = BERTFoundationModel(bert=bert)

        def embed_fn(p, toks, af, deterministic, rngs=None):
            return model.apply({"params": p}, toks, af, deterministic,
                               method=model.embed, rngs=rngs)

        cfg = TrainerConfig(epochs=1, batch_size=4, warmup_steps=10,
                            ref_pad_haps=32, steps_per_dispatch=k,
                            output_dir=str(out_dir), log_freq=1000)
        return Trainer(model, embed_fn, ds, cfg, mesh=mesh)

    mesh = make_mesh(n_data=2, n_index=1, devices=devs[:2])
    t_mesh = build_k(mesh, tmp_path / "mesh_k3", 3)
    t_single = build_k(None, tmp_path / "single_k1", 1)

    r_mesh = t_mesh.fit()
    r_single = t_single.fit()
    lm = r_mesh["history"][0]["train_loss"]
    ls = r_single["history"][0]["train_loss"]
    assert abs(lm - ls) / max(abs(ls), 1.0) < 1e-3
    pm = jax.tree.leaves(t_mesh.state.params)[0]
    ps = jax.tree.leaves(t_single.state.params)[0]
    np.testing.assert_allclose(np.asarray(pm), np.asarray(ps),
                               rtol=2e-3, atol=2e-4)


def test_sharded_ctx_prefetch_overlap_matches(tmp_path):
    """ROADMAP item 5 (within-training index-refresh overlap at scale):
    prefetch_ctx composes with the index-sharded context — the NEXT
    window's shard-local re-encode is dispatched while the current
    window trains, and the result must match no-prefetch sharded
    training exactly (1 batch/window here, so no staleness term)."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 cpu devices")

    def build_pf(mesh, out_dir, prefetch):
        b = make_bundle(n_train_samples=8, n_ref_samples=12, n_sites=96,
                        n_windows=2, seed=11)
        ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                           b.vocab, ref_vcf=b.ref, seq_len=80)
        bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                    n_layers=1, attn_heads=4)
        model = BERTFoundationModel(bert=bert)

        def embed_fn(p, toks, af, deterministic, rngs=None):
            return model.apply({"params": p}, toks, af, deterministic,
                               method=model.embed, rngs=rngs)

        cfg = TrainerConfig(epochs=1, batch_size=8, warmup_steps=10,
                            ref_pad_haps=32, prefetch_ctx=prefetch,
                            output_dir=str(out_dir), log_freq=1000)
        return Trainer(model, embed_fn, ds, cfg, mesh=mesh)

    mesh = make_mesh(n_data=2, n_index=4, devices=devs[:8])
    t_pf = build_pf(mesh, tmp_path / "pf", True)
    assert t_pf.shard_ctx
    mesh2 = make_mesh(n_data=2, n_index=4, devices=devs[:8])
    t_np = build_pf(mesh2, tmp_path / "np", False)

    r_pf = t_pf.fit()
    r_np = t_np.fit()
    assert abs(r_pf["history"][0]["train_loss"]
               - r_np["history"][0]["train_loss"]) < 1e-3
    pm = jax.tree.leaves(t_pf.state.params)[0]
    ps = jax.tree.leaves(t_np.state.params)[0]
    np.testing.assert_allclose(np.asarray(pm), np.asarray(ps),
                               rtol=1e-5, atol=1e-6)
