"""Tensor parallelism (parallel/tp.py): Megatron placement rules and
math-parity of TP-sharded training with single-device training on the
virtual CPU mesh.  The reference has no TP analogue (SURVEY.md section
2.2); this is the beyond-reference scaling axis for models larger than
one chip."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from rag_snvbert_tpu.models import (BERTFoundationModel,
                                    BERTWithEmbeddingRAG, init_batch)
from rag_snvbert_tpu.parallel.mesh import make_mesh
from rag_snvbert_tpu.parallel.tp import spec_for_path, tp_shardings

DIMS, LAYERS, HEADS, VOCAB, L = 32, 2, 4, 9, 48


def _params():
    bert = BERTWithEmbeddingRAG(vocab_size=VOCAB, dims=DIMS,
                                n_layers=LAYERS, attn_heads=HEADS)
    model = BERTFoundationModel(bert=bert)
    return model, model.init(jax.random.key(0),
                             init_batch(1, L, DIMS))["params"]


def test_megatron_specs_on_param_tree():
    _, params = _params()
    specs = jax.tree_util.tree_map_with_path(spec_for_path, params)
    b0 = specs["bert"]["encoder"]["block_0"]
    assert b0["attention"]["query"]["kernel"] == P(None, "model")
    assert b0["attention"]["query"]["bias"] == P("model")
    assert b0["attention"]["output"]["kernel"] == P("model", None)
    assert b0["attention"]["output"]["bias"] == P()
    assert b0["feed_forward"]["w_1"]["kernel"] == P(None, "model")
    assert b0["feed_forward"]["w_1"]["bias"] == P("model")
    assert b0["feed_forward"]["w_2"]["kernel"] == P("model", None)
    assert b0["feed_forward"]["w_2"]["bias"] == P()
    # FFN-internal LayerNorm normalizes the sharded H dim
    assert b0["feed_forward"]["LayerNorm_0"]["scale"] == P("model")
    # block LNs over D and everything outside the encoder stay replicated
    assert b0["LayerNorm_0"]["scale"] == P()
    assert specs["bert"]["embedding"]["Embed_0"]["embedding"] == P()
    assert specs["hap_classifier"]["Dense_0"]["kernel"] == P()
    assert specs["bert"]["rag_fusion"]["Dense_0"]["kernel"] == P()


def test_adam_moments_mirror_param_specs():
    """Path-suffix rules shard the optimizer state exactly like the
    params it mirrors — one rule set for the whole TrainState."""
    import optax

    from rag_snvbert_tpu.train.step import TrainState

    model, params = _params()
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=optax.adam(1e-3))
    specs = jax.tree_util.tree_map_with_path(spec_for_path, state)
    mu = specs.opt_state[0].mu
    assert (mu["bert"]["encoder"]["block_0"]["attention"]["query"]["kernel"]
            == P(None, "model"))
    assert specs.step == P()


def test_indivisible_dims_fail_loudly():
    devs = jax.devices("cpu")
    if len(devs) < 3:
        pytest.skip("need 3 cpu devices")
    _, params = _params()
    mesh = make_mesh(n_data=1, n_index=1, n_model=3, devices=devs[:3])
    with pytest.raises(ValueError, match="divide"):
        tp_shardings(params, mesh)  # 32 % 3 != 0


def test_tp_forward_matches_replicated():
    """Forward pass with TP-placed params == replicated params (GSPMD
    inserts the collectives; the math is identical)."""
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 cpu devices")
    from rag_snvbert_tpu.parallel.tp import shard_tree

    model, params = _params()
    rng = np.random.default_rng(3)
    x = init_batch(2, L, DIMS)
    x = {k: (jax.numpy.asarray(rng.integers(1, VOCAB, v.shape),
                               v.dtype) if v.dtype == np.int32 or
             str(v.dtype).startswith("int") else
             jax.numpy.asarray(rng.random(v.shape), v.dtype))
         for k, v in x.items()}

    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b,
                                           deterministic=True))
    base = fwd(params, x)

    mesh = make_mesh(n_data=1, n_index=1, n_model=4, devices=devs[:4])
    params_tp = shard_tree(params, mesh)
    with jax.set_mesh(mesh):
        out_tp = fwd(params_tp, x)
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(out_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_tp_idx_dp_three_axis_trainer(tmp_path):
    """All three mesh axes at once: dp2 x idx2 x tp2 training (TP params
    + sharded retrieval context + batch sharding) matches single-device
    training — the full large-model + chromosome-panel + throughput
    composition in one jitted program."""
    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 cpu devices")

    def build(mesh, out_dir):
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

        cfg = TrainerConfig(epochs=1, batch_size=8, val_batch_size=8,
                            warmup_steps=10, ref_pad_haps=32,
                            output_dir=str(out_dir), log_freq=1000)
        return Trainer(model, embed_fn, ds, cfg, mesh=mesh)

    mesh = make_mesh(n_data=2, n_index=2, n_model=2, devices=devs[:8])
    t3 = build(mesh, tmp_path / "three")
    assert t3.shard_ctx, "index axis > 1 must auto-enable shard_ctx"
    t_single = build(None, tmp_path / "single")

    r3 = t3.fit()
    r_single = t_single.fit()
    lt = r3["history"][0]["train_loss"]
    ls = r_single["history"][0]["train_loss"]
    assert abs(lt - ls) / max(abs(ls), 1.0) < 1e-3


@pytest.mark.slow
def test_tp_restore_resumes_sharded(tmp_path):
    """A replicated (single-device) checkpoint restores into a TP
    trainer: params land model-axis sharded, the resumed epoch trains,
    and the continuation matches a single-device resume."""
    from jax.sharding import NamedSharding
    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 cpu devices")

    def build(mesh, out_dir, epochs):
        b = make_bundle(n_train_samples=8, n_ref_samples=10, n_sites=64,
                        n_windows=1, seed=7)
        ds = WindowDataset(b.train, b.panel, b.freq, b.window.window_info,
                           b.vocab, ref_vcf=b.ref, seq_len=72)
        bert = BERTWithEmbeddingRAG(vocab_size=b.vocab.size, dims=32,
                                    n_layers=1, attn_heads=4)
        model = BERTFoundationModel(bert=bert)

        def embed_fn(p, toks, af, deterministic, rngs=None):
            return model.apply({"params": p}, toks, af, deterministic,
                               method=model.embed, rngs=rngs)

        cfg = TrainerConfig(epochs=epochs, batch_size=8, val_batch_size=8,
                            warmup_steps=10, output_dir=str(out_dir),
                            log_freq=1000, async_checkpoints=False)
        return Trainer(model, embed_fn, ds, cfg, mesh=mesh)

    t0 = build(None, tmp_path / "a", epochs=1)
    t0.fit()
    ckpt = str(tmp_path / "a" / "ckpt_ep0")

    mesh = make_mesh(n_data=1, n_index=1, n_model=4, devices=devs[:4])
    t_tp = build(mesh, tmp_path / "tp", epochs=2)
    t_tp.restore_checkpoint(ckpt)
    assert t_tp.start_epoch == 1
    qk = t_tp.state.params["bert"]["encoder"]["block_0"]["attention"][
        "query"]["kernel"]
    assert isinstance(qk.sharding, NamedSharding)
    assert qk.sharding.spec == P(None, "model")

    t_single = build(None, tmp_path / "s", epochs=2)
    t_single.restore_checkpoint(ckpt)
    r_tp = t_tp.fit()
    r_single = t_single.fit()
    lt = r_tp["history"][-1]["train_loss"]
    ls = r_single["history"][-1]["train_loss"]
    assert abs(lt - ls) / max(abs(ls), 1.0) < 1e-3


@pytest.mark.slow
def test_tp_dp_trainer_matches_single_device(tmp_path):
    """Full Trainer on a dp2 x tp4 mesh == single-device training."""
    from rag_snvbert_tpu.data.pipeline import WindowDataset
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.train.trainer import Trainer, TrainerConfig

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 cpu devices")

    def build(mesh, out_dir):
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

        cfg = TrainerConfig(epochs=1, batch_size=8, val_batch_size=8,
                            warmup_steps=10, ref_pad_haps=32,
                            output_dir=str(out_dir), log_freq=1000)
        return Trainer(model, embed_fn, ds, cfg, mesh=mesh)

    mesh = make_mesh(n_data=2, n_index=1, n_model=4, devices=devs[:8])
    t_tp = build(mesh, tmp_path / "tp")
    t_single = build(None, tmp_path / "single")

    r_tp = t_tp.fit()
    r_single = t_single.fit()

    lt = r_tp["history"][0]["train_loss"]
    ls = r_single["history"][0]["train_loss"]
    assert abs(lt - ls) / max(abs(ls), 1.0) < 1e-3

    # compare a TP-sharded param (attention kernel), not just leaves[0]
    pt = t_tp.state.params["bert"]["encoder"]["block_0"]["attention"][
        "query"]["kernel"]
    ps = t_single.state.params["bert"]["encoder"]["block_0"]["attention"][
        "query"]["kernel"]
    np.testing.assert_allclose(np.asarray(pt), np.asarray(ps),
                               rtol=2e-3, atol=2e-4)
