"""Slope-based timing: per-step cost = (T(2N) - T(N)) / N, which
cancels the ~30 ms fixed host/tunnel fetch latency that poisons
short scans.  Re-measures: raw int8 block streaming, mega_step
ablations, full mega_step."""
import functools, time, sys, os
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/tmp")
from flax import nnx
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.transformer import TransformerLayerStack
import importlib.util
# Phase-ablation needs a locally patched kernel copy (see PERFORMANCE
# round-3 notes); fall back to the repo kernel (full phases only).
try:
    spec = importlib.util.spec_from_file_location(
        "mega_abl", "/tmp/mega_abl.py")
    ma = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ma)
    HAVE_ABLATE = True
except Exception:
    from vae_gslm_tpu.ops import mega_step as ma
    HAVE_ABLATE = False
TAIL, BLK, fused_trunk_step = ma.TAIL, ma.BLK, ma.fused_trunk_step

N1, N2 = 128, 384


def slope(mkf, *a, runs=3):
    f1, f2 = mkf(N1), mkf(N2)
    o = f1(*a); np.asarray(o.ravel()[:4])
    o = f2(*a); np.asarray(o.ravel()[:4])
    t1s, t2s = [], []
    for _ in range(runs):
        t0 = time.perf_counter(); o = f1(*a); np.asarray(o.ravel()[:4])
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); o = f2(*a); np.asarray(o.ravel()[:4])
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (N2 - N1)


# ---------------- raw stream: int8 (16, 1024, 12*1024) = 201 MB
L, D = 16, 1024
rng = np.random.RandomState(0)
W12 = jnp.asarray(rng.randint(-127, 128, (L, D, 12 * D)), jnp.int8)


def k_block(w_ref, o_ref):
    o_ref[...] = jnp.sum(
        w_ref[0, :8, :128].astype(jnp.int32),
        axis=0, keepdims=True)[:, :1]


def mk_stream(n):
    @jax.jit
    def f(w):
        def body(c, i):
            o = pl.pallas_call(
                k_block,
                grid=(L,),
                in_specs=[pl.BlockSpec((1, D, 12 * D),
                                       lambda li: (li, 0, 0))],
                out_specs=pl.BlockSpec((1, 1), lambda li: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024,
                    dimension_semantics=("arbitrary",)),
            )(w)
            return c + o[0, 0], ()
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n))
        return c
    return f


t = slope(mk_stream, W12)
print(f"stream int8 201MB blockspec: {t*1e6:7.1f} us/call "
      f"{W12.size/1e9/t:6.0f} GB/s")

# ---------------- mega ablations
H, B = 16, 8
hp = Hparams.from_yaml(f"""
num_layers: {L}
bias: false
rpe: {{identifier: ALiBi, maxpos: 1024}}
layer:
    ffd_size: {4*D}
    dim: {D}
    norm: {{identifier: RMSNorm, eps: 1.0e-6}}
    activation: {{identifier: GELU}}
    self_attn: {{nheads: {H}, causal: true}}
""")
m = nnx.jit(lambda: TransformerLayerStack(hp, rngs=nnx.Rngs(0)))()
m.quantize_weights_int8()
weights = m.build_mega_decode()
dh = D // H
tc = 512
kc = jnp.asarray(rng.randint(-127, 128, (L, H, B, dh, tc)), jnp.int8)
vc = jnp.asarray(rng.randint(-127, 128, (L, H, B, dh, tc)), jnp.int8)
kcs = jnp.asarray(rng.rand(L, H, B, tc) * 0.02, jnp.float32)
vcs = jnp.asarray(rng.rand(L, H, B, tc) * 0.02, jnp.float32)
kt = jnp.asarray(rng.randint(-127, 128, (L, H, B, TAIL, dh)), jnp.int8)
vt = jnp.asarray(rng.randint(-127, 128, (L, H, B, TAIL, dh)), jnp.int8)
kts = jnp.asarray(rng.rand(L, H, B, TAIL) * 0.02, jnp.float32)
vts = jnp.asarray(rng.rand(L, H, B, TAIL) * 0.02, jnp.float32)
x0 = jnp.asarray(rng.randn(B, D) * 0.3, jnp.float32)
slopes = m.rpe.slopes[...]


def mk_mega(ablate, flushed, with_dus):
    def mkf(n):
        @jax.jit
        def scan(weights, kc, vc, kcs, vcs, x0, kt, vt, kts, vts):
            def body(carry, i):
                x, kt, vt, kts, vts = carry
                kw = {"ablate": ablate} if HAVE_ABLATE else {}
                xo, kn, vn, kns, vns = fused_trunk_step(
                    x, weights, kc, vc, kcs, vcs, kt, vt, kts, vts,
                    jnp.asarray(600, jnp.int32) + 0 * i, slopes,
                    flushed=flushed, **kw)
                if with_dus:
                    slot = jnp.asarray(64, jnp.int32) + 0 * i
                    kt = jax.lax.dynamic_update_slice(
                        kt, kn[:, :, :, None, :], (0, 0, 0, slot, 0))
                    vt = jax.lax.dynamic_update_slice(
                        vt, vn[:, :, :, None, :], (0, 0, 0, slot, 0))
                    kts = jax.lax.dynamic_update_slice(
                        kts, kns[..., None], (0, 0, 0, slot))
                    vts = jax.lax.dynamic_update_slice(
                        vts, vns[..., None], (0, 0, 0, slot))
                    xo = xo * 0.1
                else:
                    xo = (xo * 0.1 + kns.sum() * 0 + vns.sum() * 0
                          + kn.astype(jnp.float32).sum() * 0
                          + vn.astype(jnp.float32).sum() * 0)
                return (xo, kt, vt, kts, vts), ()
            carry, _ = jax.lax.scan(
                body, (x0, kt, vt, kts, vts), jnp.arange(n))
            return carry[0]
        return scan
    return mkf


CASES = ([("empty shell, fl=0", "mm,attn", 0, False),
          ("mm only,    fl=0", "attn", 0, False),
          ("attn only,  fl=0", "mm", 0, False)] if HAVE_ABLATE else [])
CASES += [("full,       fl=0", "", 0, False),
          ("full,       fl=512", "", 512, False),
          ("full+DUS,   fl=512", "", 512, True)]
for name, ab, fl, dus in CASES:
    t = slope(mk_mega(ab, fl, dus),
              weights, kc, vc, kcs, vcs, x0, kt, vt, kts, vts)
    print(f"mega {name}: {t*1e6:7.1f} us/step")
