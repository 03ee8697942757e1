import pytest

from vae_gslm_tpu.hparams.hp import Hparams


YAML = """
model:
    latent_dim: 4
    encoder:
        identifier: "BottleNeckResNet"
        out_channels: [512, 512]
        layer:
            norm:
                identifier: "InstanceNorm"
                eps: 0.000001
training:
    lr: 5.0e-4
"""


def test_from_yaml_nested():
    hp = Hparams.from_yaml(YAML)
    assert hp.model.latent_dim == 4
    assert hp.model.encoder.identifier == "BottleNeckResNet"
    assert hp.model.encoder.out_channels == [512, 512]
    assert hp.model.encoder.layer.norm.eps == 1e-6
    assert hp.training.lr == 5e-4


def test_check_arg():
    hp = Hparams.from_yaml(YAML)
    hp.model.check_arg_in_hparams("latent_dim", "encoder")
    with pytest.raises(ValueError):
        hp.model.check_arg_in_hparams("missing_key")


def test_get_has():
    hp = Hparams.from_yaml(YAML)
    assert hp.model.get("latent_dim") == 4
    assert hp.model.get("nope", 7) == 7
    assert hp.model.has("encoder")
    assert not hp.model.has("nope")


def test_merge():
    a = Hparams.from_yaml("x: 1\ny: 2")
    b = Hparams.from_yaml("y: 3\nz: 4")
    c = a.merge(b)
    assert c.x == 1 and c.y == 3 and c.z == 4


def test_setattr_wraps():
    hp = Hparams()
    hp.sub = {"a": 1}
    assert hp.sub.a == 1


def test_roundtrip(tmp_path):
    hp = Hparams.from_yaml(YAML)
    p = tmp_path / "hp.yaml"
    hp.save(str(p))
    hp2 = Hparams.from_yamlfile(str(p))
    assert hp == hp2
    assert hp2.model.encoder.layer.norm.identifier == "InstanceNorm"


def test_reference_configs_parse():
    import glob
    for f in glob.glob("/root/reference/configs/**/*.yaml", recursive=True):
        hp = Hparams.from_yamlfile(f)
        assert isinstance(hp.to_dict(), dict)


def test_driver_configs_build_models():
    """The shipped driver configs must construct their models —
    shape-only via nnx.eval_shape, so the flagship 200M-param LVTR and
    the HiFi-GAN stack build in milliseconds without allocating."""
    import os

    import jax
    import numpy as np
    from flax import nnx

    from vae_gslm_tpu.hparams.hp import Hparams
    from vae_gslm_tpu.models.speech.lvtr import LVTR
    from vae_gslm_tpu.models.vocoder.hfgan import (
        Generator, MultiPeriodDiscriminator,
        MultiResolutionDiscriminator)

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    hp = Hparams.from_yamlfile(
        os.path.join(root, "train", "speech", "vae-gslm.yaml"))
    m = nnx.eval_shape(
        lambda: LVTR(hp.model, input_dim=80, rngs=nnx.Rngs(0)))
    n_params = sum(
        int(np.prod(x.shape)) for x in
        jax.tree_util.tree_leaves(nnx.state(m, nnx.Param)))
    assert 150e6 < n_params < 350e6, n_params
    assert m.use_tokens and m.transformer_flow is not None
    assert m.utterance_net is not None

    voc = Hparams.from_yamlfile(
        os.path.join(root, "train", "vocoder",
                     "hfgan_16k_50hz_librispeech.yaml"))
    g = nnx.eval_shape(
        lambda: Generator(voc.model.generator, rngs=nnx.Rngs(0)))
    up = 1
    for r in voc.model.generator.upsample_rates:
        up *= r
    assert up == voc.feature.hop_length
    assert g.num_upsamples == len(voc.model.generator.upsample_rates)
    nnx.eval_shape(
        lambda: MultiPeriodDiscriminator(voc.model.mpd,
                                         rngs=nnx.Rngs(0)))
    nnx.eval_shape(
        lambda: MultiResolutionDiscriminator(voc.model.mrd,
                                             rngs=nnx.Rngs(0)))

    inf = Hparams.from_yamlfile(
        os.path.join(root, "infer", "speech", "vae-gslm.yaml"))
    assert inf.diffusion.sampling_timesteps == 100
    assert inf.temperature == 0.85
