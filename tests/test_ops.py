import numpy as np
import pytest

from vae_gslm_tpu.ops.kmeans import KMeans, assign, inertia


def test_assign_exact():
    centroids = np.array([[0.0, 0.0], [10.0, 10.0], [-5.0, 5.0]],
                         np.float32)
    x = np.array([[0.1, -0.1], [9.0, 11.0], [-4.0, 4.5], [6.0, 6.0]],
                 np.float32)
    labels = assign(x, centroids)
    assert labels.tolist() == [0, 1, 2, 1]


def test_kmeans_recovers_clusters():
    rng = np.random.RandomState(0)
    centers = np.array([[0, 0], [8, 8], [-8, 8]], np.float32)
    x = np.concatenate([
        centers[i] + 0.3 * rng.randn(200, 2) for i in range(3)
    ]).astype(np.float32)
    km = KMeans(2, 3, niter=25, seed=1)
    km.train(x)
    # every true center has a learned centroid within 0.3
    d = np.linalg.norm(centers[:, None] - km.centroids[None], axis=-1)
    assert d.min(axis=1).max() < 0.3
    labels = km.search(x)
    assert len(np.unique(labels)) == 3
    # inertia close to isotropic noise level: N * d * sigma^2
    assert inertia(x, km.centroids) < 600 * 2 * 0.3 ** 2 * 1.5


def test_kmeans_deterministic_given_seed():
    rng = np.random.RandomState(1)
    x = rng.randn(500, 8).astype(np.float32)
    a = KMeans(8, 10, niter=5, seed=7).train(x)
    b = KMeans(8, 10, niter=5, seed=7).train(x)
    np.testing.assert_array_equal(a, b)


def test_kmeans_matches_scipy_vq_assignment():
    """Our assignment == scipy.cluster.vq for identical centroids."""
    from scipy.cluster.vq import vq
    rng = np.random.RandomState(2)
    x = rng.randn(300, 16).astype(np.float32)
    c = rng.randn(20, 16).astype(np.float32)
    ours = assign(x, c)
    theirs, _ = vq(x, c)
    np.testing.assert_array_equal(ours, theirs)


def test_kmeans_save_load(tmp_path):
    rng = np.random.RandomState(3)
    x = rng.randn(100, 4).astype(np.float32)
    km = KMeans(4, 5, niter=3, seed=0)
    km.train(x)
    p = str(tmp_path / "cent.npy")
    km.save(p)
    km2 = KMeans.load(p)
    np.testing.assert_array_equal(km.centroids, km2.centroids)
    np.testing.assert_array_equal(km.search(x), km2.search(x))


def test_decode_attention_int8_matches_fp32():
    """int8 KV decode (s8xs8 QK matmul + per-token scales) stays within
    ~1% of the fp32 path, windowed or not."""
    import jax.numpy as jnp

    from vae_gslm_tpu.nn.attention import _quantize_i8
    from vae_gslm_tpu.nn.positions import alibi_slopes
    from vae_gslm_tpu.ops.decode_attention import decode_attention

    rng = np.random.RandomState(0)
    b, h, t, d = 4, 8, 96, 16
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    q = jnp.asarray(rng.randn(b, h, d), jnp.float32)
    k_i8, ks = _quantize_i8(k)
    v_i8, vs = _quantize_i8(v)
    slopes = -jnp.asarray(alibi_slopes(h), jnp.float32)
    for pos_i, window in ((0, None), (40, None), (40, 64), (95, None)):
        pos = jnp.asarray(pos_i, jnp.int32)
        ref = np.asarray(decode_attention(q, k, v, pos, slopes, window,
                                          None, None))
        out = np.asarray(decode_attention(q, k_i8, v_i8, pos, slopes,
                                          window, ks, vs))
        err = np.abs(out - ref).max() / np.abs(ref).max()
        assert err < 2e-2, (pos_i, window, err)
