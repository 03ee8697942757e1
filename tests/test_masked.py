import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_gslm_tpu.core.masked import (
    Masked, resize_length, repeat_batch, make_padding_mask,
)
from vae_gslm_tpu.core import losses


def make(b=2, t=5, c=3, lengths=(5, 3), seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    return Masked.from_lengths(v, jnp.asarray(lengths))


def test_mask_and_apply():
    x = make()
    m = np.asarray(x.mask())
    assert m.tolist() == [[True] * 5, [True, True, True, False, False]]
    y = x.apply_mask()
    assert np.all(np.asarray(y.value)[1, 3:] == 0)
    assert np.all(np.asarray(y.value)[0] == np.asarray(x.value)[0])


def test_apply_mask_fill():
    x = make()
    y = x.apply_mask(-100.0)
    assert np.all(np.asarray(y.value)[1, 3:] == -100.0)


def test_transpose_roundtrip():
    x = make()
    y = x.transpose()
    assert y.time_axis == 2
    assert y.value.shape == (2, 3, 5)
    z = y.transpose()
    assert np.allclose(np.asarray(z.value), np.asarray(x.value))
    # BCT masking zeroes padded time steps across channels
    yz = y.apply_mask()
    assert np.all(np.asarray(yz.value)[1, :, 3:] == 0)


def test_shift_right_matches_push_pop():
    x = make()
    init = jnp.ones((2, 1, 3))
    shifted = x.shift_right(init)
    assert shifted.value.shape == x.value.shape
    np.testing.assert_allclose(np.asarray(shifted.value)[:, 0], 1.0)
    np.testing.assert_allclose(
        np.asarray(shifted.value)[:, 1:], np.asarray(x.value)[:, :-1]
    )
    # push then pop equivalence (reference idiom)
    pp = x.push(init).pop(1)
    np.testing.assert_allclose(np.asarray(pp.value),
                               np.asarray(shifted.value))
    assert np.asarray(pp.lengths).tolist() == [5, 3]


def test_pop_left():
    x = make()
    y = x.pop_left(2)
    assert y.value.shape == (2, 3, 3)
    assert np.asarray(y.lengths).tolist() == [3, 1]


def test_mean_matches_reference_semantics():
    x = make()
    # mean = sum(masked values)/C / sum(lengths)
    v = np.asarray(x.apply_mask().value)
    expect = v.sum() / 3 / 8
    np.testing.assert_allclose(float(x.mean()), expect, rtol=1e-6)


def test_cat_split():
    x = make()
    y = x.cat(jnp.ones((2, 5, 2)))
    assert y.value.shape == (2, 5, 5)
    a, b = y.split(3)
    np.testing.assert_allclose(np.asarray(a.value), np.asarray(x.value))
    np.testing.assert_allclose(np.asarray(b.value), 1.0)


def test_resize_length():
    lengths = jnp.asarray([5, 3])
    out = np.asarray(resize_length(lengths, 0.5))
    assert out.tolist() == [3, 2]
    out = np.asarray(resize_length(lengths, 2.0))
    assert out.tolist() == [10, 6]


def test_repeat_batch():
    x = make()
    y = repeat_batch(x, 3)
    assert y.value.shape == (6, 5, 3)
    assert np.asarray(y.lengths).tolist() == [5, 3] * 3


def test_batch_time_shuffle_preserves_multiset():
    x = make(lengths=(4, 2)).apply_mask()
    y = x.batch_time_shuffle(jax.random.PRNGKey(0))
    xv = np.asarray(x.value)
    yv = np.asarray(y.value)
    m = np.asarray(x.mask())
    # same multiset of valid frames
    xs = sorted(map(tuple, xv[m].tolist()))
    ys = sorted(map(tuple, yv[m].tolist()))
    assert xs == ys
    # padded slots zero
    assert np.all(yv[~m] == 0)


def test_masked_pytree():
    x = make()
    leaves = jax.tree_util.tree_leaves(x)
    assert len(leaves) == 2
    y = jax.jit(lambda m: m.apply_mask())(x)
    assert isinstance(y, Masked)


def test_masked_losses_reductions():
    x = make(seed=1)
    y = make(seed=2)
    out = losses.masked_l1_loss(x, y)
    a = np.abs(np.asarray(x.apply_mask().value)
               - np.asarray(y.apply_mask().value))
    per_b = a.mean(-1).sum(-1)
    np.testing.assert_allclose(float(out), per_b.sum(), rtol=1e-6)
    out_tb = losses.masked_l1_loss(x, y, time_reduction=True,
                                   batch_reduction=True)
    np.testing.assert_allclose(float(out_tb), per_b.sum() / 8, rtol=1e-6)
    out_t = losses.masked_l1_loss(x, y, time_reduction=True)
    np.testing.assert_allclose(float(out_t),
                               (per_b / np.array([5, 3])).mean(), rtol=1e-6)


def test_masked_ce_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 4, 7).astype(np.float32)
    labels = rng.randint(0, 7, size=(2, 4))
    lengths = np.array([4, 2])
    x = Masked.from_lengths(jnp.asarray(logits), jnp.asarray(lengths))
    y = Masked.from_lengths(jnp.asarray(labels), jnp.asarray(lengths))
    ours = float(losses.masked_ce_loss(x, y))
    lab = labels.copy()
    lab[1, 2:] = -100
    theirs = F.cross_entropy(
        torch.tensor(logits).reshape(-1, 7), torch.tensor(lab).reshape(-1),
        reduction="sum", ignore_index=-100,
    ).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_eos_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 6).astype(np.float32)
    lengths = np.array([6, 3])
    x = Masked.from_lengths(jnp.asarray(logits), jnp.asarray(lengths))
    ours = float(losses.eos_loss(x))
    lab = np.zeros((2, 6), np.float32)
    lab[0, 5] = 1
    lab[1, 2] = 1
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(lab),
        pos_weight=torch.tensor(25.0), reduction="none")
    mask = np.arange(6)[None] < lengths[:, None]
    ref = ref.numpy()[mask].sum()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_gaussian_log_prob():
    x = np.float32(0.7)
    mean = np.float32(0.2)
    logstd = np.float32(-0.3)
    got = float(losses.gaussian_log_prob(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(logstd)))
    import math
    std = math.exp(-0.3)
    expect = (-0.5 * math.log(2 * math.pi) - math.log(std)
              - 0.5 * ((0.7 - 0.2) / std) ** 2)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_make_padding_mask():
    q = make(t=3, lengths=(3, 2)).mask()
    kv = make(t=5, lengths=(5, 3)).mask()
    m = np.asarray(make_padding_mask(q, kv))
    assert m.shape == (2, 3, 5)
    assert m[1, 0].tolist() == [True, True, True, False, False]
