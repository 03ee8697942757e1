import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.attention import SelfAttention, CrossAttention
from vae_gslm_tpu.nn.positions import ALiBi, alibi_slopes, T5RPE, SinCos
from vae_gslm_tpu.nn.transformer import TransformerLayerStack


def rngs(seed=0):
    return nnx.Rngs(seed)


def masked(b=2, t=8, c=16, lengths=(8, 5), seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    return Masked.from_lengths(v, jnp.asarray(lengths))


def attn_hp(causal=True, nheads=4):
    return Hparams(nheads=nheads, causal=causal)


def test_alibi_slopes_match_reference():
    # Power-of-2 closed form from the ALiBi paper.
    s = alibi_slopes(8)
    start = 2 ** (-(2 ** -(math.log2(8) - 3)))
    expect = [start * start ** i for i in range(8)]
    np.testing.assert_allclose(s, expect)
    assert len(alibi_slopes(6)) == 6


def test_alibi_bias_symmetric():
    m = ALiBi(4, 32)
    b = np.asarray(m(5, 5))
    assert b.shape == (4, 5, 5)
    np.testing.assert_allclose(b, np.transpose(b, (0, 2, 1)), atol=1e-7)
    assert np.all(b <= 0)
    np.testing.assert_allclose(b[:, 0, 0], 0.0)


def test_self_attention_matches_torch_sdpa():
    dim, nheads = 16, 4
    m = SelfAttention(dim, attn_hp(), rngs=rngs())
    x = masked(c=dim)
    out = m(x)["output"]
    # Torch reference with identical weights and dense causal+pad mask.
    wq = np.asarray(m.in_proj.kernel[...])  # (dim, 3*dim)
    wo = np.asarray(m.out_proj.kernel[...])
    xv = torch.tensor(np.asarray(x.value))
    qkv = xv @ torch.tensor(wq)
    q, k, v = qkv.chunk(3, -1)
    lengths = [8, 5]
    b, t = 2, 8
    mask = torch.zeros(b, 1, t, t)
    for i, L in enumerate(lengths):
        pad = torch.arange(t)[None, :] < L
        am = pad & (torch.arange(t)[:, None] >= torch.arange(t)[None, :])
        mask[i, 0] = torch.where(am, 0.0, float("-inf"))

    def heads(z):
        return z.view(b, t, nheads, dim // nheads).transpose(1, 2)

    ref = F.scaled_dot_product_attention(heads(q), heads(k), heads(v),
                                         attn_mask=mask)
    ref = ref.transpose(1, 2).reshape(b, t, dim) @ torch.tensor(wo)
    ref = ref.numpy()
    mask_bt = np.arange(t)[None] < np.array(lengths)[:, None]
    ref = ref * mask_bt[..., None]
    np.testing.assert_allclose(np.asarray(out.value), ref, rtol=1e-4,
                               atol=1e-5)


def test_self_attention_alibi_bias_reuse():
    """Dense path (forced via return_attn) still produces and reuses the
    ALiBi bias; the fused path computes it in-kernel instead."""
    dim = 16
    m = SelfAttention(dim, attn_hp(), rngs=rngs())
    rpe = ALiBi(4, 32)
    x = masked(c=dim)
    out = m(x, rpe_pair=("ALiBi", rpe), return_attn=True)
    assert "rpe_bias" in out
    out2 = m(x, rpe_pair=None, rpe_bias=out["rpe_bias"],
             return_attn=True)
    np.testing.assert_allclose(np.asarray(out["output"].value),
                               np.asarray(out2["output"].value),
                               atol=1e-6)
    # fused path agrees with the dense path
    fused = m(x, rpe_pair=("ALiBi", rpe))
    assert "rpe_bias" not in fused
    np.testing.assert_allclose(np.asarray(fused["output"].value),
                               np.asarray(out["output"].value),
                               rtol=1e-4, atol=1e-5)


def test_cross_attention_shapes():
    dim = 16
    m = CrossAttention(dim, Hparams(nheads=4), rngs=rngs())
    q = masked(c=dim, t=4, lengths=(4, 3))
    kv = masked(c=dim, t=8, lengths=(8, 5), seed=1)
    out = m(q, kv, return_attn=True)
    assert out["output"].value.shape == (2, 4, dim)
    attn = np.asarray(out["attn"])
    assert attn.shape == (2, 4, 4, 8)
    # padded kv positions get ~zero attention
    assert attn[1, :, :, 5:].max() < 1e-6


def _stack_hp(num_layers=2, dim=16, causal=True, rpe=True):
    d = dict(
        num_layers=num_layers,
        bias=False,
        layer=dict(
            ffd_size=32, dim=dim,
            norm=dict(identifier="RMSNorm", eps=1e-6),
            activation=dict(identifier="GELU"),
            self_attn=dict(nheads=4, causal=causal),
        ),
    )
    if rpe:
        d["rpe"] = dict(identifier="ALiBi", maxpos=64)
    return Hparams(**d)


def test_transformer_stack_run():
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    x = masked(c=8)
    out = m.run(x, return_kv=True, return_attn=True)
    assert out["output"].value.shape == (2, 8, 16)
    assert len(out["kv"]) == 2
    assert len(out["layers"]) == 3  # 2 layers + final norm
    assert len(out["self_attn"]) == 2


def test_kv_cache_decode_matches_full_run():
    """AR decode with the static cache must bit-match the full forward."""
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t, c = 2, 8, 8
    x = masked(b, t, c, lengths=(t, t))
    full = np.asarray(m(x).value)  # (B, T, 16)

    caches = m.init_cache(b, max_len=t, dtype=jnp.float32)
    outs = []
    # Prompt of 3 frames, then single steps.
    h, caches = m.decode(x.value[:, :3], caches, jnp.asarray(0))
    outs.append(h)
    for i in range(3, t):
        h, caches = m.decode(x.value[:, i:i + 1], caches, jnp.asarray(i))
        outs.append(h)
    dec = np.concatenate([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(dec, full, rtol=1e-4, atol=1e-5)


def test_kv_cache_decode_under_scan():
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t, c = 2, 6, 8
    x = masked(b, t, c, lengths=(t, t))
    full = np.asarray(m(x).value)
    gd, state = nnx.split(m)

    def step(carry, xt):
        caches, pos = carry
        mod = nnx.merge(gd, state)
        h, caches = mod.decode(xt[:, None], caches, pos)
        return (caches, pos + 1), h[:, 0]

    caches = m.init_cache(b, max_len=t, dtype=jnp.float32)
    xs = jnp.swapaxes(x.value, 0, 1)  # (T, B, C)
    (_, _), ys = jax.lax.scan(step, (caches, jnp.asarray(0)), xs)
    dec = np.swapaxes(np.asarray(ys), 0, 1)
    np.testing.assert_allclose(dec, full, rtol=1e-4, atol=1e-5)


def test_past_kv_dynamic_path_matches_full():
    """Reference-style dynamic past_kv concat also matches."""
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t, c = 2, 6, 8
    x = masked(b, t, c, lengths=(t, t))
    full = np.asarray(m(x).value)
    r1 = m.run(Masked.full(x.value[:, :4]), return_kv=True)
    r2 = m.run(Masked.full(x.value[:, 4:]), past_kv=r1["kv"],
               return_kv=True)
    dec = np.concatenate([np.asarray(r1["output"].value),
                          np.asarray(r2["output"].value)], axis=1)
    np.testing.assert_allclose(dec, full, rtol=1e-4, atol=1e-5)


def test_t5rpe_bucket_matches_hf():
    m = T5RPE(4, bidirectional=True, num_buckets=32, max_distance=128,
              rngs=rngs())
    rel = jnp.arange(-20, 21)[None, :] * jnp.ones((1, 1), jnp.int32)
    got = np.asarray(m._bucket(rel))
    # HF implementation
    relative_position = torch.arange(-20, 21)[None, :]
    num_buckets, max_distance = 32, 128
    relative_buckets = 0
    num_buckets //= 2
    relative_buckets += (relative_position > 0).to(torch.long) * num_buckets
    rp = torch.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        torch.log(rp.float() / max_exact) / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)).to(torch.long)
    rp_large = torch.min(rp_large, torch.full_like(rp_large,
                                                   num_buckets - 1))
    relative_buckets += torch.where(is_small, rp, rp_large)
    np.testing.assert_array_equal(got[0], relative_buckets[0].numpy())


def test_sincos_matches_reference():
    m = SinCos(16, maxpos=32)
    p = np.asarray(m.p[...])
    pos, i = 3, 4  # even index -> sin
    expect = math.sin(3 * math.exp(-(math.log(10000.0) / 16) * 4))
    np.testing.assert_allclose(p[pos, i], expect, rtol=1e-5)
    x = jnp.zeros((2, 5, 16))
    y = np.asarray(m(x))
    np.testing.assert_allclose(y[0], p[:5], atol=1e-6)


def test_rotary_sincos_decode_offset_matches_full():
    """Rotary/SinCos must rotate at true absolute positions in the
    KV-cache decode path (offset = pos), matching the full forward."""
    for ident in ("Rotary", "SinCos"):
        hp = _stack_hp(rpe=False)
        hp.rpe = Hparams(identifier=ident, maxpos=64)
        m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
        b, t, c = 2, 8, 8
        x = masked(b, t, c, lengths=(t, t))
        full = np.asarray(m(x).value)

        caches = m.init_cache(b, max_len=t, dtype=jnp.float32)
        h, caches = m.decode(x.value[:, :3], caches, jnp.asarray(0))
        outs = [h]
        for i in range(3, t):
            h, caches = m.decode(x.value[:, i:i + 1], caches,
                                 jnp.asarray(i))
            outs.append(h)
        dec = np.concatenate([np.asarray(o) for o in outs], axis=1)
        np.testing.assert_allclose(dec, full, rtol=1e-4, atol=1e-5,
                                   err_msg=ident)


def test_rotary_xpos_scaling():
    """xpos (position/rotary.py:121-130): q scaled by s^power, k by
    s^-power — scales cancel at equal positions and relative dot
    products match the reference formulation."""
    from vae_gslm_tpu.nn.positions import Rotary

    dim = 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 6, dim), jnp.float32)
    k = jnp.asarray(rng.randn(1, 6, dim), jnp.float32)
    plain = Rotary(dim)
    xpos = Rotary(dim, use_xpos=True, xpos_scale_base=16)
    rq, rk = np.asarray(xpos(q, scale_power=1)), \
        np.asarray(xpos(k, scale_power=-1))
    pq, pk = np.asarray(plain(q)), np.asarray(plain(k))
    # same-position dots: xpos scales cancel exactly
    np.testing.assert_allclose((rq * rk).sum(-1), (pq * pk).sum(-1),
                               rtol=1e-5)
    # cross-position dots: scaled by s^((i-j)/base) per freq (check the
    # torch reference formula directly)
    import torch
    scale = (np.arange(0, dim, 2) + 0.4 * dim) / (1.4 * dim)
    pos = np.arange(6, dtype=np.float32)
    power = (pos - 6 // 2) / 16.0
    s = scale[None, :] ** power[:, None]              # (T, dim/2)
    s2 = np.repeat(s, 2, axis=-1)                     # interleaved
    np.testing.assert_allclose(rq[0], pq[0] * s2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rk[0], pk[0] / s2, rtol=1e-5, atol=1e-6)


def test_rotary_ntk_and_interpolation():
    from vae_gslm_tpu.nn.positions import Rotary

    dim = 8
    base = Rotary(dim)
    interp = Rotary(dim, interpolate_factor=2.0)
    # identical rows: interpolated position idx/2 must equal the base
    # rotation at position idx/2 of the same vector
    row = np.random.RandomState(1).randn(dim).astype(np.float32)
    x = jnp.asarray(np.tile(row, (1, 4, 1)))
    a = np.asarray(interp(x))
    c = np.asarray(base(x))
    np.testing.assert_allclose(a[0, 2], c[0, 1], rtol=1e-5, atol=1e-6)
    # NTK rescale changes theta
    ntk = Rotary(dim, theta_rescale_factor=2.0)
    assert not np.allclose(np.asarray(ntk.freqs[...]),
                           np.asarray(base.freqs[...]))


def _stacked_decode_all(m, x, b, t, c, kv_dtype, window=None,
                        return_attn=False):
    """Prefill 3 frames then single steps via the fused layer-scan."""
    stacked = m.build_stacked_decode()
    assert stacked is not None
    cache = m.init_stacked_cache(b, max_len=t, dtype=kv_dtype)
    outs, attns = [], []
    res = m.decode_stacked(x.value[:, :3], stacked, cache,
                           jnp.asarray(0), window=window,
                           return_attn=return_attn)
    outs.append(res[0])
    cache = res[1]
    if return_attn:
        attns.append(res[2]["self_attn"])
    for i in range(3, t):
        res = m.decode_stacked(x.value[:, i:i + 1], stacked, cache,
                               jnp.asarray(i), window=window,
                               return_attn=return_attn)
        outs.append(res[0])
        cache = res[1]
        if return_attn:
            attns.append(res[2]["self_attn"])
    dec = np.concatenate([np.asarray(o) for o in outs], axis=1)
    return dec, attns


def test_stacked_decode_matches_per_layer_fp32():
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t, c = 2, 8, 8
    x = masked(b, t, c, lengths=(t, t))
    full = np.asarray(m(x).value)
    dec, _ = _stacked_decode_all(m, x, b, t, c, jnp.float32)
    np.testing.assert_allclose(dec, full, rtol=1e-4, atol=1e-5)


def test_stacked_decode_matches_per_layer_int8():
    """int8 stacked cache matches the per-layer int8 decode to within
    the current token's quantization error: the fused step feeds the
    newest key/value into the softmax directly (deferred cache write)
    instead of round-tripping them through int8 like the per-layer
    path — strictly more accurate, ~3e-3 output delta."""
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t, c = 2, 8, 8
    x = masked(b, t, c, lengths=(t, t))

    # per-layer int8 decode
    caches = m.init_cache(b, max_len=t, dtype=jnp.int8)
    outs = []
    h, caches = m.decode(x.value[:, :3], caches, jnp.asarray(0))
    outs.append(h)
    for i in range(3, t):
        h, caches = m.decode(x.value[:, i:i + 1], caches,
                             jnp.asarray(i))
        outs.append(h)
    ref = np.concatenate([np.asarray(o) for o in outs], axis=1)

    dec, _ = _stacked_decode_all(m, x, b, t, c, jnp.int8)
    np.testing.assert_allclose(dec, ref, rtol=2e-2, atol=1e-2)


def test_stacked_decode_window_and_attn():
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t, c = 2, 8, 8
    x = masked(b, t, c, lengths=(t, t))
    full = np.asarray(m(x).value)
    dec, attns = _stacked_decode_all(m, x, b, t, c, jnp.float32,
                                     window=t, return_attn=True)
    np.testing.assert_allclose(dec, full, rtol=1e-4, atol=1e-5)
    # (L, B, H, S, max_len) per call; rows sum to 1 over valid keys
    assert attns[0].shape == (2, 2, 4, 3, t)
    s = np.asarray(attns[-1]).sum(-1)
    np.testing.assert_allclose(s, np.ones_like(s), rtol=1e-5)


def test_stacked_decode_under_scan():
    """The fused path composes with the sampler's step scan."""
    hp = _stack_hp()
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t, c = 2, 6, 8
    x = masked(b, t, c, lengths=(t, t))
    full = np.asarray(m(x).value)
    gd, state = nnx.split(m)

    @jax.jit
    def run(state, xv):
        mod = nnx.merge(gd, state)
        stacked = mod.build_stacked_decode()
        cache = mod.init_stacked_cache(b, max_len=t, dtype=jnp.float32)

        def step(carry, xt):
            cache, pos = carry
            h, cache = mod.decode_stacked(xt[:, None], stacked, cache,
                                          pos)
            return (cache, pos + 1), h[:, 0]

        (_, _), ys = jax.lax.scan(step, (cache, jnp.asarray(0)),
                                  jnp.swapaxes(xv, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    dec = np.asarray(run(state, x.value))
    np.testing.assert_allclose(dec, full, rtol=1e-4, atol=1e-5)


def test_stacked_decode_unsupported_configs():
    # T5 RPE unsupported -> build returns None
    hp = _stack_hp()
    hp.rpe = Hparams(identifier="T5RPE", num_buckets=8,
                 maxpos=32, bidirectional=False,
                 max_distance=32)
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    assert m.build_stacked_decode() is None


def test_hybrid_cache_conversion_and_flush():
    """hybrid_cache_from_prefill + flush_hybrid round-trip: a 300-row
    prefill converts to cold block 0 (first 256 positions, block-major
    transposed) + 44 tail rows; filling the tail and flushing writes
    cold block 1 exactly."""
    from vae_gslm_tpu.ops.fused_decode import BLK, TAIL

    hp = _stack_hp(num_layers=2, dim=256)
    hp.layer.self_attn.nheads = 4          # head_dim 64 (kernel req)
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t = 2, 300
    x = masked(b, t, 8, lengths=(t, t), seed=3)
    cache = m.init_stacked_cache(b, max_len=t, dtype=jnp.int8)
    _, cache = m.decode_stacked(x.value, m.build_stacked_decode(),
                                cache, jnp.asarray(0))

    hyb, flushed = m.hybrid_cache_from_prefill(cache, t, t + 300)
    assert flushed == 256
    # cold block 0 holds positions [0, 256) transposed (Dh, BLK)
    got = np.asarray(hyb["k_cold"])[:, 0]            # (L,B,H,Dh,BLK)
    exp = np.swapaxes(np.asarray(cache.k)[:, :, :, :BLK], 3, 4)
    np.testing.assert_array_equal(got, exp)
    np.testing.assert_array_equal(
        np.asarray(hyb["kc_scale"])[:, 0],
        np.asarray(cache.k_scale)[..., :BLK])
    # tail rows [0, 44) hold positions [256, 300)
    np.testing.assert_array_equal(
        np.asarray(hyb["k_tail"])[:, :, :, :t - BLK],
        np.asarray(cache.k)[:, :, :, BLK:t])

    # fill the remaining tail rows and flush -> cold block 1
    rng_ = np.random.RandomState(0)
    full_tail = jnp.asarray(
        rng_.randint(-127, 128, hyb["k_tail"].shape), jnp.int8)
    hyb["k_tail"] = full_tail
    hyb["v_tail"] = full_tail
    flushed2 = hyb["kt_scale"] + 1.0
    hyb["kt_scale"] = flushed2
    hyb["vt_scale"] = flushed2
    hyb2 = m.flush_hybrid(hyb, flushed)
    np.testing.assert_array_equal(
        np.asarray(hyb2["k_cold"])[:, 1],
        np.swapaxes(np.asarray(full_tail), 3, 4))
    np.testing.assert_array_equal(np.asarray(hyb2["kc_scale"])[:, 1],
                                  np.asarray(flushed2))
    # block 0 untouched
    np.testing.assert_array_equal(np.asarray(hyb2["k_cold"])[:, 0],
                                  exp)


def test_decode_hybrid_cold_path_matches_stacked():
    """decode_hybrid (interpret-mode kernel) with a NON-EMPTY cold
    prefix (prompt 300 > 256) matches decode_stacked on the same
    state — cross-validates the conversion + in-kernel cold DMA loop
    on CPU, which the short-prompt sampler A/B never reaches."""
    hp = _stack_hp(num_layers=2, dim=256)
    hp.layer.self_attn.nheads = 4
    m = TransformerLayerStack(hp, input_dim=8, rngs=rngs())
    b, t = 2, 300
    x = masked(b, t, 8, lengths=(t, t), seed=4)
    stacked = m.build_stacked_decode()
    max_len = t + 4
    cache_s = m.init_stacked_cache(b, max_len, dtype=jnp.int8)
    _, cache_s = m.decode_stacked(x.value, stacked, cache_s,
                                  jnp.asarray(0))
    hyb, flushed = m.hybrid_cache_from_prefill(cache_s, t, max_len)
    assert flushed == 256

    rng_ = np.random.RandomState(5)
    for i in range(2):
        xv = jnp.asarray(rng_.randn(b, 1, 8), jnp.float32)
        h_ref, cache_s = m.decode_stacked(xv, stacked, cache_s,
                                          jnp.asarray(t + i))
        h_hyb, hyb = m.decode_hybrid(xv, stacked, hyb,
                                     jnp.asarray(t + i), flushed,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(h_hyb),
                                   np.asarray(h_ref),
                                   rtol=2e-2, atol=2e-2)
