"""Deepest AR-consistency check: LVTR.step (static-cache decode path,
temperature 0, flow-free, token-free config) must reproduce the
teacher-forced prior means position-by-position."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.speech.lvtr import LVTR

HP = Hparams.from_yaml("""
latent_dim: 4
encoder:
    identifier: BottleNeckResNet
    num_layers: 1
    resample_rates: [1]
    resample_ksize: [1]
    init_channel: 16
    out_channels: [16]
    hidden_channels: [32]
    final_norm: true
    layer:
        causal_padding: true
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
decoder:
    diffusion:
        timesteps: 8
        loss_type: l1
        objective: pred_noise
        beta_schedule: {identifier: cosine}
        identifier: ConditionalBottleNeckUNet
    cond_unet:
        unet:
            condition_dim: 8
            num_layers: 1
            resample_rates: [1]
            resample_ksize: [1]
            init_channel: 16
            out_channels: [16]
            hidden_channels: [32]
            conditional: [true]
            final_norm: true
            layer:
                causal_padding: true
                kernel_size: 3
                norm: {identifier: InstanceNorm, eps: 1.0e-6}
                activation: {identifier: SiLU}
                condition_type: concat
        time_embedding:
            dim: 16
            maxpos: 8
            activation: {identifier: SiLU}
transformer:
    bias: false
    rpe: {identifier: ALiBi, maxpos: 64}
    num_layers: 2
    layer:
        ffd_size: 32
        dim: 16
        norm: {identifier: RMSNorm, eps: 1.0e-6}
        activation: {identifier: GELU}
        self_attn: {nheads: 4, causal: true}
""")

N_MELS = 10


def test_step_matches_teacher_forced_prior_means():
    m = LVTR(HP, input_dim=N_MELS, rngs=nnx.Rngs(0))
    assert not m.use_tokens and m.transformer_flow is None
    b, t = 2, 7
    rng = np.random.RandomState(0)
    mel = Masked.full(jnp.asarray(rng.randn(b, t, N_MELS), jnp.float32))
    key = jax.random.PRNGKey(3)
    init_key = jax.random.PRNGKey(9)
    latents = m.encode(mel, key, temperature=0.0)

    # Teacher-forced prior means over [init, z_0..z_{t-2}].
    init = m.initial_state(init_key, b)
    shifted = latents.shift_right(init).apply_mask()
    trunk = m.transformer(shifted)
    prior = m.prior_head(trunk, key, temperature=0.0)
    expected = np.asarray(prior.mean.value)          # (B, t, latent)

    # Static-cache prefill over [init, z_0..z_{t-1}] at temperature 0.
    caches = m.init_cache(b, t + 1, dtype=jnp.float32)
    out, _ = m.step(latents.value, caches, jnp.asarray(0), key,
                    temperature=0.0, push_init_state=True,
                    init_key=init_key)
    got = np.asarray(out)                            # (B, t+1, latent)
    np.testing.assert_allclose(got[:, :t], expected, rtol=1e-4,
                               atol=1e-5)

    # And the incremental single-frame path agrees with prefill.
    caches2 = m.init_cache(b, t + 1, dtype=jnp.float32)
    out2, caches2 = m.step(latents.value[:, :4], caches2,
                           jnp.asarray(0), key, temperature=0.0,
                           push_init_state=True, init_key=init_key)
    np.testing.assert_allclose(np.asarray(out2), got[:, :5], rtol=1e-4,
                               atol=1e-5)
    for i in range(4, t):
        nxt, caches2 = m.step(latents.value[:, i: i + 1], caches2,
                              jnp.asarray(i + 1), key, temperature=0.0)
        np.testing.assert_allclose(np.asarray(nxt), got[:, i + 1: i + 2],
                                   rtol=1e-4, atol=1e-4)


def test_sampler_return_attn_maps():
    """ARTRSampler(return_attn=True) emits per-layer per-step maps
    (B, L, H, steps, max_len) whose rows softmax-normalize over the
    causal prefix (reference trainers/speech/sampler.py declares this
    output but never fills it; we do)."""
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    m = LVTR(HP, input_dim=N_MELS, rngs=nnx.Rngs(0))
    b, tp, length = 2, 5, 4
    rng = np.random.RandomState(1)
    mel = Masked.full(jnp.asarray(rng.randn(b, tp, N_MELS), jnp.float32))
    sampler = ARTRSampler(m)
    out = sampler(length, mel, jax.random.PRNGKey(0), return_attn=True)
    attn = np.asarray(out["attn"])
    max_len = tp + 1 + length
    assert attn.shape == (b, 2, 4, length, max_len)
    # Step s queries absolute position tp+1+s, attending over keys at
    # positions <= tp+1+s: rows sum to 1 over the filled prefix and are
    # exactly zero beyond it.
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=2e-2)
    for s in range(length - 1):
        assert np.abs(attn[..., s, tp + 2 + s:]).max() < 1e-6
    # And the audio output is unchanged vs the windowed no-attn path.
    ref = sampler(length, mel, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["output"].value),
                               np.asarray(ref["output"].value),
                               rtol=1e-3, atol=1e-3)


def test_weight_int8_step_close_and_sampler_runs():
    """Weight-only int8 trunk (serving mode): a temperature-0 step stays
    close to the fp32 trunk, and the full sampler pipeline runs."""
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    m = LVTR(HP, input_dim=N_MELS, rngs=nnx.Rngs(0))
    b, t = 2, 6
    rng = np.random.RandomState(0)
    mel = Masked.full(jnp.asarray(rng.randn(b, t, N_MELS), jnp.float32))
    key = jax.random.PRNGKey(3)
    latents = m.encode(mel, key, temperature=0.0)
    caches = m.init_cache(b, t + 1, dtype=jnp.float32)
    ref, _ = m.step(latents.value, caches, jnp.asarray(0), key,
                    temperature=0.0, push_init_state=True,
                    init_key=jax.random.PRNGKey(9))

    m2 = LVTR(HP, input_dim=N_MELS, rngs=nnx.Rngs(0))
    sampler = ARTRSampler(m2, quantize_weights=True)
    assert m2.transformer.layers[0].self_attn.in_proj.kernel[...].dtype \
        == jnp.int8
    caches = m2.init_cache(b, t + 1, dtype=jnp.float32)
    got, _ = m2.step(latents.value, caches, jnp.asarray(0), key,
                     temperature=0.0, push_init_state=True,
                     init_key=jax.random.PRNGKey(9))
    err = (np.abs(np.asarray(got) - np.asarray(ref)).max()
           / (np.abs(np.asarray(ref)).max() + 1e-9))
    assert err < 0.05, err
    out = sampler(4, mel, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out["output"].value)).all()


def test_sampler_fused_path_matches_per_layer():
    """ARTRSampler with the fused layer-scan decode must reproduce the
    per-layer decode path sample-for-sample (same PRNG contract)."""
    from tests.test_models import TINY_LVTR, N_MELS
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    m = LVTR(TINY_LVTR, input_dim=N_MELS, rngs=nnx.Rngs(3))
    assert m.transformer.supports_stacked_decode()
    rng = np.random.RandomState(0)
    b, tp = 2, 6
    toks = rng.randint(0, 11, (b, tp, 1)).astype(np.float32)
    mel = rng.randn(b, tp, N_MELS).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.asarray([tp, tp]))
    key = jax.random.PRNGKey(5)

    s_fused = ARTRSampler(m, kv_dtype=jnp.int8)
    out_fused = s_fused(8, prior, key, temperature=0.8,
                        token_temperature=0.8)

    s_plain = ARTRSampler(m, kv_dtype=jnp.int8)
    import vae_gslm_tpu.nn.transformer as tr
    orig = tr.TransformerLayerStack.supports_stacked_decode
    tr.TransformerLayerStack.supports_stacked_decode = lambda self: False
    try:
        out_plain = s_plain(8, prior, key, temperature=0.8,
                            token_temperature=0.8)
    finally:
        tr.TransformerLayerStack.supports_stacked_decode = orig

    # int8 KV: the fused step's current-token term skips the int8
    # round-trip, so latents carry ~1e-3 quantization-scale jitter.
    np.testing.assert_allclose(
        np.asarray(out_fused["frames"].value),
        np.asarray(out_plain["frames"].value), rtol=1e-2, atol=5e-3)
    np.testing.assert_array_equal(
        np.asarray(out_fused["frames"].value[..., 0]),
        np.asarray(out_plain["frames"].value[..., 0]))  # same tokens
    np.testing.assert_allclose(
        np.asarray(out_fused["output"].value),
        np.asarray(out_plain["output"].value), rtol=1e-3, atol=1e-3)


def _mega_lvtr_hp():
    """Smallest config the mega kernel accepts (dim % 256 == 0,
    ffd = 4*dim, ALiBi, RMSNorm eps 1e-6, GELU, no bias) with tokens
    + conditional flow to exercise the full step extras."""
    from tests.test_models import TINY_LVTR

    d = TINY_LVTR.to_dict()
    d["transformer"]["rpe"]["maxpos"] = 512
    d["transformer"]["layer"]["dim"] = 256
    d["transformer"]["layer"]["ffd_size"] = 1024
    return Hparams.from_dict(d)


@pytest.mark.parametrize("tp,length", [(130, 12), (6, 200)])
def test_sampler_mega_path_matches_per_layer(monkeypatch, tp, length):
    """The one-kernel-per-step mega decode path (forced via
    VAE_GSLM_MEGA_DECODE=1; kernel in interpret mode on CPU) must
    reproduce the per-layer decode path sample-for-sample — across
    (tp=130) a flushed cold block, and (length=200 ≥ 1.5× the
    128-step flush window, VERDICT r3 item 6) a full in-generation
    merge+flush sequence: ~25 stage merges plus a tail→cold flush at
    step 128.  (A third (6, 20) partial-group rung was dropped for
    suite time: its stage-merge coverage is a strict subset of the
    (6, 200) rung, and the torch-golden mega rollout in
    test_reference_parity.py covers the same cadence independently.)"""
    from tests.test_models import N_MELS
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    hp = _mega_lvtr_hp()
    rng = np.random.RandomState(0)
    b = 2
    toks = rng.randint(0, 11, (b, tp, 1)).astype(np.float32)
    mel = rng.randn(b, tp, N_MELS).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.asarray([tp, tp]))
    key = jax.random.PRNGKey(5)

    monkeypatch.setenv("VAE_GSLM_MEGA_DECODE", "1")
    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "0")
    # Pin the bf16-matmul mega variant: this test asserts the
    # three-tier CACHE mechanics against the per-layer path at
    # int8-jitter tolerance; the s8xs8 (a8) variant's extra
    # activation-quant delta diverges long rollouts past that bound
    # by design and has its own parity tests (test_mega_step) and
    # chip quality rung (quant_quality_b8_a8.txt).
    monkeypatch.setenv("VAE_GSLM_MEGA_A8", "0")
    m = LVTR(hp, input_dim=N_MELS, rngs=nnx.Rngs(3))
    s_mega = ARTRSampler(m, kv_dtype=jnp.int8, quantize_weights=True)
    assert m.transformer.build_mega_decode() is not None
    out_m = s_mega(length, prior, key, temperature=0.8,
                   token_temperature=0.8)

    monkeypatch.setenv("VAE_GSLM_MEGA_DECODE", "0")
    m2 = LVTR(hp, input_dim=N_MELS, rngs=nnx.Rngs(3))
    s_plain = ARTRSampler(m2, kv_dtype=jnp.int8,
                          quantize_weights=True)
    out_p = s_plain(length, prior, key, temperature=0.8,
                    token_temperature=0.8)

    np.testing.assert_array_equal(
        np.asarray(out_m["frames"].value[..., 0]),
        np.asarray(out_p["frames"].value[..., 0]))  # same tokens
    np.testing.assert_allclose(
        np.asarray(out_m["frames"].value),
        np.asarray(out_p["frames"].value), rtol=1e-2, atol=8e-3)
    np.testing.assert_allclose(
        np.asarray(out_m["output"].value),
        np.asarray(out_p["output"].value), rtol=1e-2, atol=1e-2)


def test_sampler_chunked_serving(monkeypatch):
    """Chunked-mega serving mechanics (ARTRSampler._serving_chunk):
    a forced chunk size splits the batch into sequential sub-batch
    runs of the same compiled program and concatenates — batch order,
    uneven tail chunk, Masked lengths, and per-chunk key split all
    preserved.  (The SPEED rationale — 2 x B=32 mega beats the
    one-batch B=64 packed path — is chip-measured; this pins the
    plumbing on any decode path.)"""
    from tests.test_models import TINY_LVTR, N_MELS
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    m = LVTR(TINY_LVTR, input_dim=N_MELS, rngs=nnx.Rngs(3))
    rng = np.random.RandomState(0)
    b, tp, length = 3, 6, 8
    toks = rng.randint(0, 11, (b, tp, 1)).astype(np.float32)
    mel = rng.randn(b, tp, N_MELS).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.asarray([tp, tp, tp - 1]))
    key = jax.random.PRNGKey(5)

    monkeypatch.setenv("VAE_GSLM_MEGA_CHUNK", "2")
    s = ARTRSampler(m, kv_dtype=jnp.int8)
    out = s(length, prior, key, temperature=0.8,
            token_temperature=0.8)
    assert out["frames"].value.shape[0] == b
    assert np.isfinite(np.asarray(out["output"].value)).all()
    np.testing.assert_array_equal(
        np.asarray(out["frames"].lengths),
        np.asarray([tp + length, tp + length, tp - 1 + length]))

    # chunk i must equal a direct run of the sub-batch with the
    # matching split key (same compiled program, same PRNG contract)
    keys = jax.random.split(key, 2)
    sub = Masked(prior.value[2:], prior.lengths[2:], prior.time_axis)
    monkeypatch.setenv("VAE_GSLM_MEGA_CHUNK", "0")
    s2 = ARTRSampler(m, kv_dtype=jnp.int8)
    ref = s2(length, sub, keys[1], temperature=0.8,
             token_temperature=0.8)
    np.testing.assert_allclose(
        np.asarray(out["frames"].value[2:]),
        np.asarray(ref["frames"].value), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("length", [8, 280])
def test_sampler_hybrid_path_matches_per_layer(monkeypatch, length):
    """The hybrid cold/tail Pallas decode path (forced via
    VAE_GSLM_HYBRID_DECODE=1; kernel in interpret mode on CPU) must
    reproduce the per-layer decode path sample-for-sample — length
    280 crosses the 256-step tail→cold flush boundary mid-generation
    (ops/fused_decode.py TAIL; VERDICT r3 item 6)."""
    from tests.test_models import TINY_LVTR, N_MELS
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    hp = TINY_LVTR
    if length > 64:
        from vae_gslm_tpu.hparams.hp import Hparams
        hp = Hparams.from_dict(TINY_LVTR.to_dict())
        hp.transformer.rpe.maxpos = 512
    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "1")
    m = LVTR(hp, input_dim=N_MELS, rngs=nnx.Rngs(3))
    rng = np.random.RandomState(0)
    b, tp = 2, 6
    toks = rng.randint(0, 11, (b, tp, 1)).astype(np.float32)
    mel = rng.randn(b, tp, N_MELS).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.asarray([tp, tp]))
    key = jax.random.PRNGKey(5)

    s_hybrid = ARTRSampler(m, kv_dtype=jnp.int8)
    out_h = s_hybrid(length, prior, key, temperature=0.8,
                     token_temperature=0.8)

    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "0")
    s_plain = ARTRSampler(m, kv_dtype=jnp.int8)
    out_p = s_plain(length, prior, key, temperature=0.8,
                    token_temperature=0.8)

    np.testing.assert_array_equal(
        np.asarray(out_h["frames"].value[..., 0]),
        np.asarray(out_p["frames"].value[..., 0]))  # same tokens
    np.testing.assert_allclose(
        np.asarray(out_h["frames"].value),
        np.asarray(out_p["frames"].value), rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out_h["output"].value),
        np.asarray(out_p["output"].value), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("length", [24, 280])
def test_sampler_packed_cache_matches_per_layer(monkeypatch, length):
    """The lane-packed (T, D, B*H) per-layer cache layout (forced via
    VAE_GSLM_PACKED_CACHE=1; the B=64 serving default on TPU after the
    r4 layout-cliff finding, tools/bench_b64_fold.py) must reproduce
    the base (B, H, T, D) path sample-for-sample, including across the
    segmented-window boundaries at length 280."""
    from tests.test_models import TINY_LVTR, N_MELS
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    hp = TINY_LVTR
    if length > 64:
        from vae_gslm_tpu.hparams.hp import Hparams
        hp = Hparams.from_dict(TINY_LVTR.to_dict())
        hp.transformer.rpe.maxpos = 512
    # per-layer path both times: hybrid + mega off, stacked off via
    # batch>cap is not available at tiny dims, so disable explicitly
    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "0")
    monkeypatch.setenv("VAE_GSLM_MEGA_DECODE", "0")
    monkeypatch.setenv("VAE_GSLM_HYBRID_MAX_BATCH", "0")
    m = LVTR(hp, input_dim=N_MELS, rngs=nnx.Rngs(3))
    rng = np.random.RandomState(0)
    b, tp = 2, 6
    toks = rng.randint(0, 11, (b, tp, 1)).astype(np.float32)
    mel = rng.randn(b, tp, N_MELS).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.asarray([tp, tp]))
    key = jax.random.PRNGKey(5)

    monkeypatch.setenv("VAE_GSLM_PACKED_CACHE", "1")
    out_k = ARTRSampler(m, kv_dtype=jnp.int8)(
        length, prior, key, temperature=0.8, token_temperature=0.8)

    monkeypatch.setenv("VAE_GSLM_PACKED_CACHE", "0")
    out_p = ARTRSampler(m, kv_dtype=jnp.int8)(
        length, prior, key, temperature=0.8, token_temperature=0.8)

    np.testing.assert_array_equal(
        np.asarray(out_k["frames"].value[..., 0]),
        np.asarray(out_p["frames"].value[..., 0]))  # same tokens
    np.testing.assert_allclose(
        np.asarray(out_k["frames"].value),
        np.asarray(out_p["frames"].value), rtol=1e-2, atol=5e-3)


def test_packed_cache_decode_step_matches_base():
    """LayerKVCache packed layout: prefill write + windowed decode
    steps + return_attn weights agree with the base layout to fp
    tolerance (same int8 quantization grid, different einsum/layout)."""
    from vae_gslm_tpu.nn.attention import LayerKVCache
    from vae_gslm_tpu.ops.decode_attention import decode_attention

    b, h, d, t_max = 2, 4, 8, 32
    slopes = -jnp.exp2(-jnp.arange(1, h + 1, dtype=jnp.float32))
    outs = {}
    for packed in (False, True):
        cache = LayerKVCache.zeros(b, t_max, h, d, jnp.int8,
                                   packed=packed)
        rows_k = jnp.asarray(np.random.RandomState(2)
                             .randn(b, 5, h, d) * 0.5, jnp.float32)
        rows_v = jnp.asarray(np.random.RandomState(3)
                             .randn(b, 5, h, d) * 0.5, jnp.float32)
        cache = cache.write(jnp.asarray(0), rows_k, rows_v)
        # single-row decode writes at positions 5..8
        res = []
        for pos in range(5, 9):
            rk = jnp.asarray(np.random.RandomState(10 + pos)
                             .randn(b, 1, h, d) * 0.5, jnp.float32)
            rv = jnp.asarray(np.random.RandomState(20 + pos)
                             .randn(b, 1, h, d) * 0.5, jnp.float32)
            cache = cache.write(jnp.asarray(pos), rk, rv)
            q = jnp.asarray(np.random.RandomState(30 + pos)
                            .randn(b, h, d) * 0.5, jnp.float32)
            out, w = decode_attention(
                q, cache.k, cache.v, jnp.asarray(pos), slopes,
                window=16, k_scale=cache.k_scale,
                v_scale=cache.v_scale, return_weights=True)
            res.append((np.asarray(out), np.asarray(w)))
        outs[packed] = res
        # dense view parity (prefill path)
        kd, vd = cache.dense_kv(h)
        outs[(packed, "dense")] = (np.asarray(kd), np.asarray(vd))
    for (o_b, w_b), (o_p, w_p) in zip(outs[False], outs[True]):
        np.testing.assert_allclose(o_p, o_b, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(w_p, w_b, rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(outs[(False, "dense")][0],
                                  outs[(True, "dense")][0])
    np.testing.assert_array_equal(outs[(False, "dense")][1],
                                  outs[(True, "dense")][1])
