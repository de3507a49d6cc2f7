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
