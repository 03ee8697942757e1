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
