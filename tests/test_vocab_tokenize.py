import numpy as np

from rag_snvbert_tpu.io.vocab import (ALLELE_OFFSET, EOS, MASK, MAX_SEQ_LEN,
                                      PAD, POP_OFFSET, SOS, Vocab)
from rag_snvbert_tpu.data.tokenize import (genotype_label, position_normalize,
                                           sequence_padding, tokenize)


def test_vocab_static_table():
    v = Vocab.from_panel_pops(["EUR", "EAS", "EUR", "AFR"])
    assert v.size == POP_OFFSET + 3
    assert v.allele_token(0) == 5 and v.allele_token(1) == 6
    assert v.pop_token("EUR") == POP_OFFSET  # first-seen order
    assert v.pop_token("AFR") == POP_OFFSET + 2
    assert (PAD, SOS, EOS, MASK) == (0, 2, 3, 4)


def test_to_seq_layout():
    v = Vocab()
    alleles = np.array([0, 1, 1, 0])
    seq = v.to_seq(alleles)
    assert seq.shape == (MAX_SEQ_LEN,)
    assert seq[0] == SOS
    assert list(seq[1:5]) == [5, 6, 6, 5]
    assert seq[5] == EOS
    assert (seq[6:] == PAD).all()


def test_tokenize_batch_and_mask():
    alleles = np.array([[0, 1, 0], [1, 1, 1]])
    raw_mask = np.array([1, 0, 1])
    mask = sequence_padding(raw_mask)  # padded coords: slot 0 = SOS
    toks = tokenize(alleles, mask)
    assert toks.shape == (2, MAX_SEQ_LEN)
    assert (toks[:, 0] == SOS).all()          # SOS never masked
    assert (toks[:, 1] == MASK).all()         # site 0 masked
    assert toks[0, 2] == ALLELE_OFFSET + 1    # site 1 unmasked
    assert (toks[:, 3] == MASK).all()         # site 2 masked
    assert (toks[:, 4] == EOS).all()


def test_sequence_padding_sos_slot():
    x = np.arange(1, 6, dtype=np.float32)
    p = sequence_padding(x)
    assert p.shape == (MAX_SEQ_LEN,)
    assert p[0] == 0.0 and (p[1:6] == x).all() and (p[6:] == 0).all()


def test_position_normalize():
    p = position_normalize(np.array([100, 150, 200]))
    assert np.allclose(p, [0.0, 0.5, 1.0])
    assert (position_normalize(np.array([7, 7])) == 0).all()


def test_genotype_label():
    h1 = np.array([0, 0, 1, 1])
    h2 = np.array([0, 1, 0, 1])
    assert list(genotype_label(h1, h2)) == [0, 1, 2, 3]
