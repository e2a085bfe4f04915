import pytest

from weatherforecastingtoolkit_tpu.utils.config import Config, ConfigError


BASE = {
    "project_name": "wx",
    "optim": {"lr": 1e-3, "weight_decay": 0.01, "beta1": 0.9},
    "dataset": {"batch_size": 8, "seq_len": 25},
    "trainer": {"devices": [0], "limit_train_batches": None},
}


def test_attr_access():
    cfg = Config(BASE)
    assert cfg.optim.lr == 1e-3
    assert cfg.trainer.devices == [0]


def test_dotlist_override_types():
    cfg = Config(BASE).merged_dotlist(
        ["optim.lr=3e-4", "dataset.batch_size=16", "trainer.limit_train_batches=0.5",
         "project_name=other"])
    assert cfg.optim.lr == pytest.approx(3e-4)
    assert cfg.dataset.batch_size == 16
    assert cfg.trainer.limit_train_batches == 0.5
    assert cfg.project_name == "other"
    # base untouched fields survive
    assert cfg.optim.beta1 == 0.9


def test_invalid_override_key_rejected():
    cfg = Config(BASE)
    with pytest.raises(ConfigError):
        cfg.merged_dotlist(["optim.typo_key=1"])
    with pytest.raises(ConfigError):
        cfg.merged_dotlist(["nonexistent.x=1"])


def test_yaml_roundtrip(tmp_path):
    cfg = Config(BASE)
    p = tmp_path / "c.yaml"
    cfg.save(str(p))
    cfg2 = Config.load(str(p))
    assert cfg2.to_dict() == cfg.to_dict()


def test_bool_and_null_parsing():
    cfg = Config({"a": {"flag": False, "opt": 1}})
    cfg = cfg.merged_dotlist(["a.flag=true", "a.opt=null"])
    assert cfg.a.flag is True
    assert cfg.a.opt is None


def test_get_and_set_dotted():
    cfg = Config(BASE)
    assert cfg.get_dotted("optim.lr") == 1e-3
    assert cfg.get_dotted("optim.missing", 42) == 42
    cfg.set_dotted("new.nested.key", 7)
    assert cfg.new.nested.key == 7
