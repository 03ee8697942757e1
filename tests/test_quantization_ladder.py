"""Quality budgets for the inference quantization ladder.

VERDICT r2 item 4: every quantized serving path (int8 KV cache,
weight-only int8, and their combination — the shipped hybrid-decode
operating point) changes numerics; these tests pin the metric deltas
to budgets so the defaults are justified by measurement, not
assumption.  The flagship-dims deltas measured on the real chip live
in PERFORMANCE.md; this is the CI guard at tiny dims.

Metrics used (the eval harness' own quantities):
  * LVTR.likelihood (the LikelihoodEstimator scoring path,
    ``/root/reference/inference/speech/likelihood.py`` parity) of
    fixed data under quantized vs fp weights;
  * sampled-continuation divergence under a shared PRNG key (token
    agreement + frame RMS) — the ARTRSampler serving path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.inference.speech.sampler import ARTRSampler
from vae_gslm_tpu.models.speech.lvtr import LVTR

from tests.test_models import N_MELS, TINY_LVTR


def _model(seed: int = 0) -> LVTR:
    return nnx.jit(lambda: LVTR(TINY_LVTR, input_dim=N_MELS,
                                rngs=nnx.Rngs(seed)))()


def _batch(b: int = 4, t: int = 24):
    rng = np.random.RandomState(7)
    toks = rng.randint(0, 11, (b, t, 1)).astype(np.float32)
    mel = rng.randn(b, t, N_MELS).astype(np.float32)
    return Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.asarray([t] * b))


def _prior(b: int = 2, tp: int = 6):
    rng = np.random.RandomState(0)
    toks = rng.randint(0, 11, (b, tp, 1)).astype(np.float32)
    mel = rng.randn(b, tp, N_MELS).astype(np.float32)
    return Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.asarray([tp] * b))


def test_weight_int8_likelihood_budget():
    """Weight-only int8 (per-out-channel scales) moves the
    LikelihoodEstimator score of fixed data by < 0.05 nats/frame at
    tiny dims — the budget that justifies `weight_dtype: "int8"` as a
    serving default."""
    x = _batch()
    key = jax.random.PRNGKey(3)
    ll_fp = np.asarray(_model().likelihood(x, key))
    m8 = _model()
    m8.transformer.quantize_weights_int8()
    ll_w8 = np.asarray(m8.likelihood(x, key))
    assert np.isfinite(ll_w8).all()
    delta = np.abs(ll_w8 - ll_fp).max()
    assert delta < 0.05, f"weight-int8 ΔLL/frame {delta:.4f}"


def test_int8_kv_sampling_budget():
    """int8 KV cache vs fp cache under a shared key: identical token
    stream and small continuous-latent RMS divergence over a 16-step
    continuation (the per-token-scale cache quantization budget)."""
    m = _model()
    prior = _prior()
    key = jax.random.PRNGKey(5)
    kw = dict(temperature=0.8, token_temperature=0.8)
    out_fp = ARTRSampler(m)(16, prior, key, **kw)
    out_q = ARTRSampler(m, kv_dtype=jnp.int8)(16, prior, key, **kw)
    f_fp = np.asarray(out_fp["frames"].value)
    f_q = np.asarray(out_q["frames"].value)
    np.testing.assert_array_equal(f_q[..., 0], f_fp[..., 0])
    rms = np.sqrt(np.mean((f_q[..., 1:] - f_fp[..., 1:]) ** 2))
    ref = np.sqrt(np.mean(f_fp[..., 1:] ** 2)) + 1e-9
    assert rms / ref < 0.02, f"int8-KV frame RMS ratio {rms / ref:.4f}"


def test_full_serving_point_budget():
    """The shipped small-batch serving point (weight-int8 + int8 KV,
    stacked/hybrid-selected decode) against the fp reference path:
    same tokens, bounded latent drift, and a bounded shift in the
    model's own likelihood of the generated frames (quality proxy
    computable without trained weights)."""
    m_fp = _model()
    m_q = _model()
    prior = _prior()
    key = jax.random.PRNGKey(9)
    kw = dict(temperature=0.8, token_temperature=0.8)
    out_fp = ARTRSampler(m_fp)(16, prior, key, **kw)
    out_q = ARTRSampler(m_q, kv_dtype=jnp.int8,
                        quantize_weights=True)(16, prior, key, **kw)
    f_fp = np.asarray(out_fp["frames"].value)
    f_q = np.asarray(out_q["frames"].value)
    assert (f_q[..., 0] == f_fp[..., 0]).mean() > 0.95, \
        "token stream diverged under the full quantization ladder"
    # End-metric: the diffusion-decoded mels (the domain the
    # ReconstructionEvaluator scores) under a shared decode key must
    # stay close — the whole quantization ladder's output-domain
    # budget.
    m_fp2 = np.asarray(out_fp["output"].value)
    m_q2 = np.asarray(out_q["output"].value)
    rms = np.sqrt(np.mean((m_q2 - m_fp2) ** 2))
    ref = np.sqrt(np.mean(m_fp2 ** 2)) + 1e-9
    assert rms / ref < 0.1, f"decoded-mel RMS ratio {rms / ref:.4f}"
