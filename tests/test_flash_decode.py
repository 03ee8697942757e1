"""flash_decode_int8 (experimental Pallas decode kernel) vs the XLA
decode path.  TPU-only: the kernel uses Mosaic DMA primitives with no
interpret-mode fallback, and the test suite pins itself to CPU, so
this is exercised manually on hardware (see ops/flash_decode.py for
the measured numbers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="Pallas decode kernel needs a TPU")


@requires_tpu
@pytest.mark.parametrize("pos", [0, 5, 400, 767])
def test_flash_decode_matches_xla(pos):
    from vae_gslm_tpu.nn.attention import _quantize_i8
    from vae_gslm_tpu.nn.positions import alibi_slopes
    from vae_gslm_tpu.ops.decode_attention import decode_attention
    from vae_gslm_tpu.ops.flash_decode import flash_decode_int8

    rng = np.random.RandomState(0)
    b, h, t, d = 4, 16, 768, 64
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    q = jnp.asarray(rng.randn(b, h, d), jnp.float32)
    k_i8, ks = _quantize_i8(k)
    v_i8, vs = _quantize_i8(v)
    slopes = -jnp.asarray(alibi_slopes(h), jnp.float32)
    p = jnp.asarray(pos, jnp.int32)
    out = np.asarray(flash_decode_int8(q, k_i8, v_i8, ks, vs, p, slopes))
    ref = np.asarray(decode_attention(q, k_i8, v_i8, p, slopes, None,
                                      ks, vs))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2, err
