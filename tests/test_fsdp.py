"""FSDP/ZeRO sharding (parallel/fsdp.py) + real DP batch sharding.

Covers the round-3 scale-out additions: ``trainer.fsdp: true`` shards
params and Adam moments over the data axis (XLA SPMD inserts the
all-gathers and turns the grad all-reduce into a reduce-scatter), and
grad-accum-stacked batches shard their BATCH axis (axis 1) instead of
falling back to full replication.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.vocoder.vocoder import HiFiGAN
from vae_gslm_tpu.parallel import fsdp
from vae_gslm_tpu.parallel import mesh as mesh_lib

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


# ------------------------------------------------------------- spec rule
def test_fsdp_spec_largest_divisible_axis():
    assert fsdp.fsdp_spec((16, 32), 8, min_size=2) == P(None, "data")
    assert fsdp.fsdp_spec((32, 16), 8, min_size=2) == P("data", None)
    # indivisible axes skipped
    assert fsdp.fsdp_spec((12, 16), 8, min_size=2) == P(None, "data")
    assert fsdp.fsdp_spec((12, 12), 8, min_size=2) == P(None, None)
    # small tensors stay replicated
    assert fsdp.fsdp_spec((16, 32), 8, min_size=4096) == P(None, None)
    # n_data=1 → no sharding
    assert fsdp.fsdp_spec((16, 32), 1, min_size=2) == P(None, None)


def test_fsdp_spec_composes_with_tp_base():
    # TP already sharded axis 1 → data goes on the largest FREE axis.
    assert fsdp.fsdp_spec((64, 128), 8, base=(None, "model"),
                          min_size=2) == P("data", "model")
    # base longer than needed is preserved as-is when nothing divides
    assert fsdp.fsdp_spec((6, 128), 8, base=(None, "model"),
                          min_size=2) == P(None, "model")


# -------------------------------------------------- stacked batch sharding
@requires_8
def test_shard_batch_axis1_for_stacked_microbatches():
    mesh = mesh_lib.create_mesh(8)
    stacked = {"mel": Masked(np.zeros((2, 16, 10, 4), np.float32),
                             np.full((2, 16), 10, np.int32), 1)}
    out = mesh_lib.shard_batch(stacked, mesh, axis=1)
    assert tuple(out["mel"].value.sharding.spec) == (
        None, "data", None, None)
    assert tuple(out["mel"].lengths.sharding.spec) == (None, "data")
    # indivisible batch falls back to replication
    odd = mesh_lib.shard_batch(
        {"x": np.zeros((2, 10, 3), np.float32)}, mesh, axis=1)
    assert odd["x"].sharding.is_fully_replicated


# ------------------------------------------------------ trainer integration
SR = 16000

VOCODER_HP = """
feature:
    sample_rate: 16000
    n_fft: 513
    win_length: 400
    hop_length: 320
    n_mels: 16
    f_min: 0
    f_max: 8000
    power: 1.0
    log_scale: true
model:
    generator:
        weight_norm: true
        upsample_rates: [5, 4, 4, 2, 2]
        upsample_kernel_sizes: [10, 8, 8, 4, 4]
        upsample_initial_channel: 64
        resblock_kernel_sizes: [3]
        resblock_dilation_sizes:
            - [1, 2]
        in_channels: 16
        kernel_size: 7
"""

TRAIN_HP = """
trainer:
    identifier: "trainers.speech.lvtr.LVTRTrainer"
    total_steps: 10
    distributed: false
    n_devices: 8
    fsdp: {fsdp}
    fsdp_min_size: 32
logging:
    log_dir: "{log_dir}"
    num_samples: 0
    temperature: 1.0
    sample_length: 0.2
    sample_prior_length: 0.1
    plot_attn: false
vocoder: {{path: "{vocoder_dir}"}}
hubert: {{sample_rate: 50}}
model:
    tokens: {{embedding_dim: 8, vocab_size: 16}}
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
            norm: {{identifier: InstanceNorm, eps: 1.0e-6}}
            activation: {{identifier: ReLU}}
    decoder:
        diffusion:
            timesteps: 8
            loss_type: l1
            input_scale: 5.0
            objective: pred_noise
            clamp_range: [-3.0, 1.2]
            beta_schedule: {{identifier: cosine}}
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
                    norm: {{identifier: InstanceNorm, eps: 1.0e-6}}
                    activation: {{identifier: SiLU}}
                    condition_type: concat
            time_embedding:
                dim: 16
                maxpos: 8
                activation: {{identifier: SiLU}}
    transformer:
        bias: false
        rpe: {{identifier: ALiBi, maxpos: 64}}
        num_layers: 1
        layer:
            ffd_size: 32
            dim: 16
            norm: {{identifier: RMSNorm, eps: 1.0e-6}}
            activation: {{identifier: GELU}}
            self_attn: {{nheads: 4, causal: true}}
        flow:
            num_layers: 2
            conditional: true
            layer:
                hidden_dim: 8
                activation: {{identifier: GELU}}
                mean_only: false
                scale_range: [0.5, 2.0]
                norm: {{identifier: LayerNorm, eps: 1.0e-6}}
training:
    gradient_accumulation: 2
    gradient_clip_val: 1.0
    optimizer:
        identifier: AdamW
        lr: 1.0e-4
        beta1: 0.9
        beta2: 0.98
        weight_decay: 0.1
        exclude_norm_and_bias_from_weight_decay: true
    scheduler: {{identifier: cosine, min_lr: 1.0e-5, flat_steps: 1}}
    token_kld_weight: 0.5
    fixed_beta: 0.04
    scale_rec_beta: false
    mel_rescale: {{mean: -1.5, std: 2.0}}
data:
    train:
        path: "unused"
        wavdir: "unused"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 1
        batch_size: 16
        sampler: {{type: standard, shuffle: true}}
    val:
        path: "unused"
        wavdir: "unused"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 1
        batch_size: 16
        sampler: {{type: standard, shuffle: false}}
"""


@pytest.fixture(scope="module")
def vocoder_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fsdp_vocoder")
    hp = Hparams.from_yaml(VOCODER_HP)
    HiFiGAN(hp, rngs=nnx.Rngs(0)).save_pretrained(str(d))
    return d


def _trainer(vocoder_dir, tmp_path, fsdp_on: bool):
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer
    hp = Hparams.from_yaml(TRAIN_HP.format(
        fsdp="true" if fsdp_on else "false",
        log_dir=tmp_path, vocoder_dir=vocoder_dir))
    return LVTRTrainer(hp)


def _batch(accum=2, b=16, t=10, n_mels=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "mel": Masked(rng.randn(accum, b, t, n_mels).astype(np.float32),
                      np.full((accum, b), t, np.int32), 1),
        "tokens": Masked(
            rng.randint(0, 16, (accum, b, t)).astype(np.int64),
            np.full((accum, b), t, np.int32), 1),
        "cropped_mel_utt": Masked(
            rng.randn(accum, b, 6, n_mels).astype(np.float32),
            np.full((accum, b), 6, np.int32), 1),
    }


def _shardings(tree):
    return {
        "/".join(str(p) for p in path): leaf.sharding
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


@requires_8
def test_fsdp_lvtr_step_matches_dp(vocoder_dir, tmp_path):
    dp = _trainer(vocoder_dir, tmp_path / "dp", fsdp_on=False)
    fs = _trainer(vocoder_dir, tmp_path / "fsdp", fsdp_on=True)

    # params actually sharded before the step
    sharded = [s for s in _shardings(fs.params).values()
               if not s.is_fully_replicated]
    assert sharded, "no parameter got an FSDP sharding"
    # Adam moments follow the param shardings
    mu_sh = [s for s in _shardings(fs.opt_state).values()
             if not s.is_fully_replicated]
    assert mu_sh, "optimizer state not sharded"

    m_dp = dp.run_step(_batch())
    m_fs = fs.run_step(_batch())
    for k in m_dp:
        np.testing.assert_allclose(
            float(m_dp[k]), float(m_fs[k]), rtol=5e-5, atol=1e-6,
            err_msg=f"metric {k} diverged between DP and FSDP")

    # output params keep their FSDP shardings (no silent re-replication
    # by sharding propagation) — and a second step still runs
    still = [s for s in _shardings(fs.params).values()
             if not s.is_fully_replicated]
    assert len(still) >= len(sharded)
    fs.global_step += 1
    dp.global_step += 1
    m_fs2 = fs.run_step(_batch(seed=1))
    m_dp2 = dp.run_step(_batch(seed=1))
    for k in m_dp2:
        np.testing.assert_allclose(
            float(m_dp2[k]), float(m_fs2[k]), rtol=5e-5, atol=1e-6)


@requires_8
def test_fsdp_sync_model_gathers(vocoder_dir, tmp_path):
    fs = _trainer(vocoder_dir, tmp_path, fsdp_on=True)
    fs.run_step(_batch())
    fs.sync_model()    # np.asarray on sharded params must gather
    graphdef, params, _ = nnx.split(fs.model, nnx.Param, ...)
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


@requires_8
def test_fsdp_full_state_resume(vocoder_dir, tmp_path):
    fs = _trainer(vocoder_dir, tmp_path / "a", fsdp_on=True)
    m0 = fs.run_step(_batch())
    fs.global_step = 1
    state_dir = str(tmp_path / "full_state")
    fs.save_full_state(state_dir)

    fresh = _trainer(vocoder_dir, tmp_path / "b", fsdp_on=True)
    fresh.resume(state_dir)
    assert fresh.global_step == 1
    # restored params + moments carry FSDP shardings again
    assert any(not s.is_fully_replicated
               for s in _shardings(fresh.params).values())
    assert any(not s.is_fully_replicated
               for s in _shardings(fresh.opt_state).values())
    # restored state continues bit-compatibly with the original
    # (rng is not part of the saved state — align it for the A/B)
    fs.rng = jax.random.PRNGKey(123)
    fresh.rng = jax.random.PRNGKey(123)
    fs_m = fs.run_step(_batch(seed=2))
    fr_m = fresh.run_step(_batch(seed=2))
    for k in fs_m:
        np.testing.assert_allclose(float(fs_m[k]), float(fr_m[k]),
                                   rtol=1e-6, atol=1e-7)


@requires_8
def test_fsdp_shards_params_with_tp_mesh(vocoder_dir, tmp_path):
    """FSDP composes with TP: data goes on the axis TP left free."""
    from vae_gslm_tpu.parallel import tp

    mesh = tp.create_mesh_2d(2, 4)
    m = _trainer(vocoder_dir, tmp_path, fsdp_on=False).model
    _, params, _ = nnx.split(m, nnx.Param, ...)
    placed = fsdp.shard_params(params, mesh, min_size=32)
    specs = {k: s.spec for k, s in _shardings(placed).items()}
    qkv = [s for k, s in specs.items()
           if "in_proj" in k and "kernel" in k]
    assert qkv and all(s == P("data", "model") for s in qkv), qkv


@requires_8
def test_sequence_parallel_lvtr_step_matches_dp(vocoder_dir, tmp_path):
    """trainer.sequence_parallel: true (with model_parallel) reproduces
    the plain-DP metrics — the T-sharded residual-stream constraints
    change the collective schedule, not the math."""
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer

    dp = _trainer(vocoder_dir, tmp_path / "dp", fsdp_on=False)
    hp = Hparams.from_yaml(TRAIN_HP.format(
        fsdp="false", log_dir=tmp_path / "sp", vocoder_dir=vocoder_dir))
    hp.trainer.model_parallel = 2
    hp.trainer.sequence_parallel = True
    sp = LVTRTrainer(hp)
    assert dict(sp.mesh.shape) == {"data": 4, "model": 2}
    assert sp._seq_parallel

    m_dp = dp.run_step(_batch())
    m_sp = sp.run_step(_batch())
    for k in m_dp:
        np.testing.assert_allclose(
            float(m_dp[k]), float(m_sp[k]), rtol=5e-5, atol=1e-6,
            err_msg=f"metric {k} diverged between DP and TP+SP")


@requires_8
def test_flash_mesh_activates_on_data_only_mesh():
    from vae_gslm_tpu.parallel import tp

    mesh = mesh_lib.create_mesh(8)
    with tp.flash_mesh(mesh):
        assert tp.active_flash_mesh(4, 16) == (mesh, "data", None)
        # 4 % 8 != 0 and there's no model axis -> nothing to shard
        assert tp.active_flash_mesh(4, 4) is None
    assert tp.active_flash_mesh(4, 16) is None

    # numeric parity of the shard_mapped flash path on a data-only mesh
    rng = np.random.RandomState(0)
    b, h, t, d = 16, 4, 8, 4
    q = rng.randn(b, h, t, d).astype(np.float32)
    k = rng.randn(b, h, t, d).astype(np.float32)
    v = rng.randn(b, h, t, d).astype(np.float32)
    lengths = np.full((b,), t, np.int32)
    from vae_gslm_tpu.ops.flash_attention import flash_attention
    base = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), None, True))
    got = np.asarray(tp.shard_map_flash(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), None, True, (mesh, "data", None)))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)
