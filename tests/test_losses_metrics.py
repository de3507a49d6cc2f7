import numpy as np
import jax
import jax.numpy as jnp

from rag_snvbert_tpu.train import losses, metrics
from rag_snvbert_tpu.train.schedule import warmup_inverse_sqrt


def torch_style_focal(probs_or_logits, targets, gamma):
    """Reference semantics: softmax input, one-hot, sum reduction
    (optim_schedule.py:49-96) in plain numpy."""
    x = np.asarray(probs_or_logits, np.float64)
    e = np.exp(x - x.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    t = np.asarray(targets)
    p_t = np.take_along_axis(p, t[..., None], -1)[..., 0]
    return (-((1 - p_t) ** gamma) * np.log(p_t + 1e-10)).sum()


def test_focal_loss_matches_reference_semantics(rng):
    logits = rng.standard_normal((2, 7, 3)).astype(np.float32)
    targets = rng.integers(0, 3, (2, 7))
    mask = np.ones((2, 7), np.int32)
    ours = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   jnp.asarray(mask), gamma=2.0))
    ref = torch_style_focal(logits, targets, 2.0)
    assert abs(ours - ref) < 1e-3


def test_focal_loss_mask_equivalence(rng):
    """Multiply-by-mask sum == fancy-index sum (the reference's
    output[masks] pattern)."""
    logits = rng.standard_normal((3, 10, 2)).astype(np.float32)
    targets = rng.integers(0, 2, (3, 10))
    mask = rng.integers(0, 2, (3, 10))
    ours = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   jnp.asarray(mask)))
    sel = mask.astype(bool)
    ref = torch_style_focal(logits[sel], targets[sel], 2.0)
    assert abs(ours - ref) < 1e-3


def test_total_loss_weights(rng):
    outs = [jnp.asarray(rng.standard_normal((1, 4, c)).astype(np.float32))
            for c in (2, 2, 4)]
    outs += [jnp.zeros((1, 4, 8))] * 4
    labels = {"hap_1": jnp.zeros((1, 4), jnp.int32),
              "hap_2": jnp.zeros((1, 4), jnp.int32),
              "gt": jnp.zeros((1, 4), jnp.int32)}
    mask = jnp.ones((1, 4), jnp.int32)
    total, aux = losses.total_loss(outs, labels, mask)
    h1 = losses.focal_loss(outs[0], labels["hap_1"], mask)
    h2 = losses.focal_loss(outs[1], labels["hap_2"], mask)
    g = losses.focal_loss(outs[2], labels["gt"], mask)
    assert abs(float(total) - float(3 * (h1 + h2) + 4 * g)) < 1e-4


def test_recon_gating():
    outs = [jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 4)),
            jnp.zeros((1, 4, 8)), jnp.zeros((1, 4, 8)),
            jnp.zeros((1, 4, 8)), jnp.zeros((1, 4, 8))]
    labels = {k: jnp.zeros((1, 4), jnp.int32) for k in ("hap_1", "hap_2", "gt")}
    mask = jnp.ones((1, 4), jnp.int32)
    # identical origins/afters -> recon = 0 < MIN_RECON_LOSS -> plain weights
    t_gated, aux = losses.total_loss(outs, labels, mask, use_recon=True)
    t_plain, _ = losses.total_loss(outs, labels, mask, use_recon=False)
    assert abs(float(t_gated) - float(t_plain)) < 1e-5
    assert float(aux["recon_loss"]) == 0.0


def test_class_counts_and_f1(rng):
    logits = np.zeros((1, 6, 2), np.float32)
    logits[0, :, 1] = [9, 9, -9, -9, 9, -9]   # pred: 1 1 0 0 1 0
    labels = np.array([[1, 0, 0, 1, 1, 0]])
    mask = np.ones((1, 6), np.int32)
    c = metrics.class_counts(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(mask), 2)
    assert c["tp"].tolist() == [2, 2]
    assert c["fp"].tolist() == [1, 1]
    assert c["fn"].tolist() == [1, 1]
    f1 = metrics.f1_from_counts(jax.device_get(c))
    assert abs(f1 - 2 / 3) < 1e-6  # both classes P=R=2/3


def test_rare_common_split(rng):
    outs = [jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 4))]
    labels = {k: jnp.zeros((1, 4), jnp.int32) for k in ("hap_1", "hap_2", "gt")}
    mask = jnp.ones((1, 4), jnp.int32)
    af = jnp.asarray([[0.01, 0.5, 0.96, 0.2]])  # maf: .01 .5 .04 .2
    c = metrics.batch_counters(outs, labels, mask, af)
    rare_total = int(sum(c["rare"][k].sum() for k in ("tp", "fp", "fn")))
    common_total = int(sum(c["common"][k].sum() for k in ("tp", "fp", "fn")))
    # 2 rare sites x 2 haps, 2 common sites x 2 haps; each site contributes
    # one tp/fp/fn unit per hap
    assert rare_total == 4 and common_total == 4


def test_warmup_inverse_sqrt_schedule():
    s = warmup_inverse_sqrt(1e-5, 5e-5, 100)
    assert abs(float(s(0)) - 1e-5) < 1e-9
    assert abs(float(s(100)) - (5e-5 - 1e-5) / 100 * 100 - 1e-5) < 1e-9
    # decay: lr(400) = max * sqrt(100/400)
    assert abs(float(s(400)) - 5e-5 * 0.5) < 1e-9
    # monotone decrease after warmup
    assert float(s(101)) > float(s(1000))
