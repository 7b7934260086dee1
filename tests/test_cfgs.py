"""Config-system tests (mirrors reference tests_common/tests_cfgs.py genre)."""

import os
import tempfile

from arcnerf_tpu.utils.cfgs import (
    Obj,
    get_value_from_cfgs_field,
    load_configs,
    obj_to_dict,
    parse_configs,
    remap_value,
    update_configs_by_dotlist,
    valid_key_in_cfgs,
)

YAML = """
name: test
model:
  type: NeRF
  rays:
    n_sample: 64
    bounding_radius: 3.0
optim:
  lr: 5.0e-4
  clip_gradients: 0.0
"""


def _write_yaml(content):
    f = tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False)
    f.write(content)
    f.close()
    return f.name


def test_load_and_attr_access():
    cfgs = load_configs(_write_yaml(YAML))
    assert cfgs.name == "test"
    assert cfgs.model.type == "NeRF"
    assert cfgs.model.rays.n_sample == 64
    assert abs(cfgs.optim.lr - 5e-4) < 1e-12


def test_remap_value():
    assert remap_value("true") is True
    assert remap_value("False") is False
    assert remap_value("none") is None
    assert remap_value("12") == 12
    assert remap_value("1.5") == 1.5
    assert remap_value("1,2,3") == [1, 2, 3]
    assert remap_value("[1.0,2.0]") == [1.0, 2.0]
    assert remap_value("hello") == "hello"


def test_dotlist_override():
    cfgs = load_configs(_write_yaml(YAML))
    update_configs_by_dotlist(cfgs, ["--model.rays.n_sample", "128", "--optim.lr", "0.01", "--new.key", "abc"])
    assert cfgs.model.rays.n_sample == 128
    assert cfgs.optim.lr == 0.01
    assert cfgs.new.key == "abc"


def test_parse_configs_cli():
    path = _write_yaml(YAML)
    cfgs = parse_configs(["--configs", path, "--model.type", "MipNeRF"])
    assert cfgs.model.type == "MipNeRF"


def test_helpers_and_roundtrip():
    cfgs = load_configs(_write_yaml(YAML))
    assert valid_key_in_cfgs(cfgs, "model")
    assert not valid_key_in_cfgs(cfgs, "nothing")
    assert get_value_from_cfgs_field(cfgs.model, "missing", 7) == 7
    assert get_value_from_cfgs_field(cfgs.model, "type") == "NeRF"
    d = obj_to_dict(cfgs)
    assert d["model"]["rays"]["n_sample"] == 64
    assert Obj(d) == cfgs


def test_parent_include():
    parent = _write_yaml(YAML)
    child = _write_yaml("__parent__: {}\nmodel:\n  type: Neus\n".format(parent))
    cfgs = load_configs(child)
    assert cfgs.model.type == "Neus"
    assert cfgs.model.rays.n_sample == 64  # inherited
    os.unlink(parent)
    os.unlink(child)
