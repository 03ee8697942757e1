"""Single-call trunk-step mega-kernel v2 (ops/mega_step.py):
interpret-mode validation against a plain-JAX replication of its
exact math, plus the staging-tier cache maintenance helpers
(stage_append / merge_stage / flush_mega) driven over multi-step
sequences."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.transformer import TransformerLayerStack
from vae_gslm_tpu.ops.mega_step import (BLK, STAGE, TAIL,
                                        flush_mega, fused_trunk_step,
                                        fused_trunk_step_reference,
                                        merge_stage, stage_append)

D, H, L = 256, 4, 2


def _stack():
    hp = Hparams.from_yaml(f"""
num_layers: {L}
bias: false
rpe: {{identifier: ALiBi, maxpos: 1024}}
layer:
    ffd_size: {4 * D}
    dim: {D}
    norm: {{identifier: RMSNorm, eps: 1.0e-6}}
    activation: {{identifier: GELU}}
    self_attn: {{nheads: {H}, causal: true}}
""")
    m = TransformerLayerStack(hp, rngs=nnx.Rngs(0))
    m.quantize_weights_int8()
    return m


def _cache(b, nb, seed=1):
    rng = np.random.RandomState(seed)
    dh = D // H
    return {
        "k_cold": jnp.asarray(
            rng.randint(-127, 128, (L, nb, H, b, dh, BLK)), jnp.int8),
        "v_cold": jnp.asarray(
            rng.randint(-127, 128, (L, nb, H, b, dh, BLK)), jnp.int8),
        "kc_scale": jnp.asarray(
            rng.rand(L, nb, H, b, BLK) * 0.02, jnp.float32),
        "vc_scale": jnp.asarray(
            rng.rand(L, nb, H, b, BLK) * 0.02, jnp.float32),
        "k_tail": jnp.asarray(
            rng.randint(-127, 128, (L, H, b, TAIL, dh)), jnp.int8),
        "v_tail": jnp.asarray(
            rng.randint(-127, 128, (L, H, b, TAIL, dh)), jnp.int8),
        "kt_scale": jnp.asarray(
            rng.rand(L, H, b, TAIL) * 0.02, jnp.float32),
        "vt_scale": jnp.asarray(
            rng.rand(L, H, b, TAIL) * 0.02, jnp.float32),
        "k_stage": jnp.asarray(
            rng.randn(L, STAGE, H, b, dh) * 0.3, jnp.bfloat16),
        "v_stage": jnp.asarray(
            rng.randn(L, STAGE, H, b, dh) * 0.3, jnp.bfloat16),
    }


@pytest.mark.parametrize("flushed,pos", [
    (0, 0),          # empty cache
    (0, 5),          # stage-only (ns=5)
    (0, 40),         # tail + stage
    (128, 140),      # one cold block + tail + stage ns=4
    (256, 300),      # two cold blocks
    (256, 384),      # stage empty (ns=0), full tail
])
def test_mega_kernel_matches_reference(flushed, pos):
    m = _stack()
    weights = m.build_mega_decode()
    assert weights is not None
    b = 8
    cache = _cache(b, 2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, D) * 0.3, jnp.float32)
    slopes = m.rpe.slopes[...]
    outs_k = fused_trunk_step(x, weights, cache, jnp.asarray(pos),
                              slopes, flushed=flushed, interpret=True)
    outs_r = fused_trunk_step_reference(x, weights, cache, pos,
                                        slopes, flushed=flushed)
    for name, a, bb in zip(("x", "k_new", "v_new"), outs_k, outs_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=2e-3, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("nslot", [2, 3])
def test_mega_kernel_streamed_slots_match_reference(nslot):
    """Double-buffered cold-slot streaming (nslot < nblk — the
    VMEM-bounded large-batch configuration) must be numerically
    identical to the one-slot-per-block prefetch path."""
    m = _stack()
    weights = m.build_mega_decode()
    b = 8
    flushed, pos = 4 * BLK, 4 * BLK + 30
    cache = _cache(b, 4)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, D) * 0.3, jnp.float32)
    slopes = m.rpe.slopes[...]
    outs_k = fused_trunk_step(x, weights, cache, jnp.asarray(pos),
                              slopes, flushed=flushed, interpret=True,
                              nslot=nslot)
    outs_r = fused_trunk_step_reference(x, weights, cache, pos,
                                        slopes, flushed=flushed)
    for name, a, bb in zip(("x", "k_new", "v_new"), outs_k, outs_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=2e-3, atol=2e-4, err_msg=name)


def test_mega_kernel_chunked_mm_matches_reference():
    """Chunked int8->bf16 weight upconversion (the B>=32 VMEM form;
    mm_chunk below a matrix's dout splits it into column chunks) must
    be numerically identical to the whole-matrix dot."""
    m = _stack()
    weights = m.build_mega_decode()
    b = 8
    flushed, pos = 128, 170
    cache = _cache(b, 1)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, D) * 0.3, jnp.float32)
    slopes = m.rpe.slopes[...]
    outs_k = fused_trunk_step(x, weights, cache, jnp.asarray(pos),
                              slopes, flushed=flushed, interpret=True,
                              mm_chunk=128)
    outs_r = fused_trunk_step_reference(x, weights, cache, pos,
                                        slopes, flushed=flushed)
    for name, a, bb in zip(("x", "k_new", "v_new"), outs_k, outs_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=2e-3, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("flushed,pos", [(0, 40), (128, 140)])
def test_mega_kernel_a8_matches_reference(flushed, pos):
    """The s8 x s8 dense-matmul path (``a8=True``: per-row activation
    quantization, no weight upconversion) must match its plain-JAX
    replication exactly, and stay within the expected int8
    quantization band of the bf16-matmul reference."""
    m = _stack()
    weights = m.build_mega_decode()
    b = 8
    cache = _cache(b, 2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, D) * 0.3, jnp.float32)
    slopes = m.rpe.slopes[...]
    outs_k = fused_trunk_step(x, weights, cache, jnp.asarray(pos),
                              slopes, flushed=flushed, interpret=True,
                              a8=True)
    outs_r = fused_trunk_step_reference(x, weights, cache, pos,
                                        slopes, flushed=flushed,
                                        a8=True)
    for name, a, bb in zip(("x", "k_new", "v_new"), outs_k, outs_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=2e-3, atol=2e-4, err_msg=name)
    # activation quantization vs the bf16 path: bounded relative delta
    outs_b = fused_trunk_step_reference(x, weights, cache, pos,
                                        slopes, flushed=flushed)
    for name, a, bb in zip(("x", "k_new", "v_new"), outs_k, outs_b):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        rel = np.abs(a - bb).max() / (np.abs(bb).max() + 1e-9)
        assert rel < 0.05, f"{name}: a8 vs bf16 rel {rel:.3f}"


@pytest.mark.parametrize("flushed,pos,group", [(0, 40, 128),
                                               (128, 140, 64)])
def test_mega_kernel_w4_matches_reference(flushed, pos, group):
    """The nibble-packed (int4, grouped scales) weight path must
    match its plain-JAX replication exactly, and stay within the
    expected 4-bit quantization band of the int8-weight reference."""
    m = _stack()
    weights = m.build_mega_decode_w4(group=group)
    assert weights is not None
    assert weights["wq"].shape[1] == D // 2      # packed rows
    b = 8
    cache = _cache(b, 2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, D) * 0.3, jnp.float32)
    slopes = m.rpe.slopes[...]
    outs_k = fused_trunk_step(x, weights, cache, jnp.asarray(pos),
                              slopes, flushed=flushed, interpret=True)
    outs_r = fused_trunk_step_reference(x, weights, cache, pos,
                                        slopes, flushed=flushed)
    for name, a, bb in zip(("x", "k_new", "v_new"), outs_k, outs_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=2e-3, atol=2e-4, err_msg=name)
    # 4-bit quantization vs the int8-weight path: bounded rel delta
    w8 = m.build_mega_decode()
    outs_b = fused_trunk_step_reference(x, w8, cache, pos, slopes,
                                        flushed=flushed)
    for name, a, bb in zip(("x", "k_new", "v_new"), outs_k, outs_b):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        rel = np.abs(a - bb).max() / (np.abs(bb).max() + 1e-9)
        assert rel < 0.25, f"{name}: w4 vs int8 rel {rel:.3f}"


def test_stage_merge_flush_roundtrip():
    """Drive stage_append/merge_stage/flush_mega over 2*STAGE rows
    and check the rows land where the kernel's masks expect them."""
    b, dh = 2, D // H
    cache = _cache(b, 2, seed=7)
    flushed = 128
    rng = np.random.RandomState(9)
    rows = jnp.asarray(rng.randn(2 * STAGE, L, H, b, dh) * 0.5,
                       jnp.bfloat16)
    pos0 = flushed + TAIL - 2 * STAGE   # last 2 groups of the tail
    rel0 = pos0 - flushed
    for j in range(2 * STAGE):
        cache = stage_append(cache, rows[j], rows[j],
                             (rel0 + j) % STAGE)
        if (rel0 + j) % STAGE == STAGE - 1:
            cache = merge_stage(cache, ((rel0 + j) // STAGE) * STAGE)
    # both groups quantized into the tail at the right slots
    got = np.asarray(cache["k_tail"][:, :, :, rel0:, :],
                     np.float32)
    sc = np.asarray(cache["kt_scale"][:, :, :, rel0:], np.float32)
    want = np.asarray(jnp.transpose(rows, (1, 2, 3, 0, 4)),
                      np.float32)
    # int8 per-row quantization: |err| <= scale/2 (absolute, not
    # relative) — bound by the largest row scale
    np.testing.assert_allclose(got * sc[..., None], want,
                               atol=float(sc.max()) * 0.51 + 1e-3)
    # flush moves the tail into cold block 1 (time-minor)
    cache2 = flush_mega(cache, flushed)
    np.testing.assert_array_equal(
        np.asarray(cache2["k_cold"][:, 1]),
        np.asarray(jnp.swapaxes(cache["k_tail"], 3, 4)))
    np.testing.assert_array_equal(
        np.asarray(cache2["kc_scale"][:, 1]),
        np.asarray(cache["kt_scale"]))


def test_build_mega_decode_requires_int8():
    hp = Hparams.from_yaml(f"""
num_layers: 1
bias: false
rpe: {{identifier: ALiBi, maxpos: 64}}
layer:
    ffd_size: {4 * D}
    dim: {D}
    norm: {{identifier: RMSNorm, eps: 1.0e-6}}
    activation: {{identifier: GELU}}
    self_attn: {{nheads: {H}, causal: true}}
""")
    m = TransformerLayerStack(hp, rngs=nnx.Rngs(0))
    assert m.build_mega_decode() is None   # not quantized
    m.quantize_weights_int8()
    assert m.build_mega_decode() is not None
