import jax
import jax.numpy as jnp
import pytest

from rag_snvbert_tpu.config import PRESETS, get_preset
from rag_snvbert_tpu.models import (BERT, BERTWithEmbeddingRAG, BERTWithRAG,
                                    init_batch)


def test_preset_lineage():
    assert get_preset("v18_embedding_rag").model.dims == 384
    assert get_preset("v17_token_rag").model.rag_mode == "token"
    assert get_preset("v10_baseline").model.rag_mode == "none"
    with pytest.raises(KeyError):
        get_preset("v99")


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_presets_build_models(name):
    cfg = get_preset(name)
    model = cfg.build_model(vocab_size=9)
    m = cfg.model
    expected = {"embedding": BERTWithEmbeddingRAG, "token": BERTWithRAG,
                "none": BERT}[m.rag_mode]
    assert isinstance(model.bert, expected)
    assert model.bert.dims == m.dims
    if m.bf16:
        assert model.bert.dtype == jnp.bfloat16


def test_tpu_default_forward():
    cfg = get_preset("tpu_default")
    model = cfg.build_model(vocab_size=9)
    x = init_batch(2, 64, cfg.model.dims)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out[0].shape == (2, 64, 2)
    # bf16 encoder emits bf16 features; heads cast up for logits
    assert out[5].dtype == jnp.bfloat16  # h1_after from the encoder


def test_tpu_scan_forward_matches_default_shapes():
    """tpu_scan (scan over layers + block remat) is tpu_default's
    memory/compile variant: same geometry, same output contract."""
    cfg = get_preset("tpu_scan")
    assert cfg.model.scan_layers and cfg.model.remat is True
    model = cfg.build_model(vocab_size=9)
    x = init_batch(2, 64, cfg.model.dims)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out[0].shape == (2, 64, 2)
    # scanned layout stacks per-layer params along a leading [n_layers]
    blocks = params["params"]["bert"]["encoder"]["blocks"]
    leaf = jax.tree.leaves(blocks)[0]
    assert leaf.shape[0] == cfg.model.n_layers


def test_cli_preset_fidelity():
    """`train --preset v17_token_rag` must adopt the v17 recipe's run
    hyperparams (VERDICT round-1 weak item 4), with explicit flags
    overriding individually."""
    from rag_snvbert_tpu.cli.main import _resolve_trainer_config, build_parser

    req = ["train", "--train_dataset", "x", "--train_panel", "p",
           "--refpanel_path", "r", "--freq_path", "f", "--window_path", "w",
           "--output_path", "o"]
    parser = build_parser()

    args = parser.parse_args(req + ["--preset", "v17_token_rag"])
    base = get_preset(args.preset)
    cfg = _resolve_trainer_config(args, base)
    assert cfg.rag_mode == "token"
    assert cfg.batch_size == 16          # run_v17 recipe, not argparse v18
    assert cfg.max_lr == 5e-5
    assert cfg.grad_accum_steps == 1

    args = parser.parse_args(req + ["--preset", "v17_token_rag",
                                    "--lr", "1e-4"])
    cfg = _resolve_trainer_config(args, get_preset(args.preset))
    assert cfg.max_lr == 1e-4            # explicit flag wins
    assert cfg.batch_size == 16          # the rest still preset

    args = parser.parse_args(req)        # no preset -> v18 defaults
    cfg = _resolve_trainer_config(args, get_preset("v18_embedding_rag"))
    assert cfg.batch_size == 24 and cfg.max_lr == 7.5e-5
    assert cfg.grad_accum_steps == 2
