"""Config system (avid_cma_tpu/config.py).

The contract: the reference's YAML configs load VERBATIM (reference
loads raw dicts, main-avid.py:50), plus attribute access, deep merge,
and dotted CLI overrides with YAML type coercion.
"""

import os

import pytest

from avid_cma_tpu import config as config_lib
from avid_cma_tpu.config import Config, from_dict, merge

REFERENCE = "/root/reference"


def test_reference_configs_load_verbatim():
    """Every YAML the reference ships parses into the expected schema."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    import glob

    paths = glob.glob(os.path.join(REFERENCE, "configs", "**", "*.yaml"),
                      recursive=True)
    assert len(paths) >= 13
    for p in paths:
        cfg = config_lib.load(p)
        assert "dataset" in cfg and "optimizer" in cfg and "model" in cfg
        assert cfg.model.name  # attribute access through nesting


def test_attribute_access_and_missing_key():
    cfg = from_dict({"a": {"b": 1}})
    assert cfg.a.b == 1
    with pytest.raises(AttributeError):
        _ = cfg.a.nope
    assert cfg.get_path("a.nope", 7) == 7
    assert cfg.get_path("a.b") == 1


def test_overrides_yaml_coercion(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("optimizer:\n  lr:\n    base_lr: 0.0002\n  num_epochs: 10\n")
    cfg = config_lib.load(str(p), overrides=[
        "optimizer.lr.base_lr=1e-4",          # float
        "optimizer.num_epochs=3",             # int
        "dataset.backend=synthetic",          # new nested path, str
        "flag=true",                          # bool
        "optimizer.lr.milestones=[1, 2]",     # list
    ])
    assert cfg.optimizer.lr.base_lr == pytest.approx(1e-4)
    assert cfg.optimizer.num_epochs == 3
    assert isinstance(cfg.optimizer.num_epochs, int)
    assert cfg.dataset.backend == "synthetic"
    assert cfg.flag is True
    assert cfg.optimizer.lr.milestones == [1, 2]


def test_overrides_keep_yaml_string_semantics(tmp_path):
    """Numeric coercion is restricted to the actual YAML 1.1 gap (dot-less
    scientific notation); values YAML treats as strings stay strings."""
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\n")
    cfg = config_lib.load(str(p), overrides=[
        "s1=nan",          # YAML 1.1 string (only '.nan' is a float)
        "s2=1_000",        # YAML 1.1 *int* (underscore numerals) — kept
        "s3=infinity",     # string
        "f1=2e-5",         # the gap being fixed: dot-less sci notation
        "f2=1.5e3",        # YAML already parses this as float
        "i1=-42",
    ])
    assert cfg.s1 == "nan" and isinstance(cfg.s1, str)
    assert cfg.s2 == 1000  # PyYAML implements YAML 1.1 underscore ints
    assert cfg.s3 == "infinity"
    assert cfg.f1 == pytest.approx(2e-5)
    assert cfg.f2 == pytest.approx(1500.0)
    assert cfg.i1 == -42 and isinstance(cfg.i1, int)


def test_deep_merge_preserves_untouched_branches():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    out = merge(base, {"a": {"y": 20}, "c": 4})
    assert out.a.x == 1 and out.a.y == 20 and out.b == 3 and out.c == 4
    assert base["a"]["y"] == 2  # base untouched


def test_to_dict_roundtrip():
    cfg = from_dict({"a": {"b": {"c": 1}}, "d": [1, {"e": 2}]})
    d = cfg.to_dict()
    assert d == {"a": {"b": {"c": 1}}, "d": [1, {"e": 2}]}
    assert not isinstance(d["a"], Config)


def test_cli_entry_parses_and_overrides(tmp_path):
    """main_avid.py's parse layer: --help exits 0 and advertises --set;
    a bad config path fails cleanly (nonzero, mentions the path) rather
    than hanging or tracebacking into an unrelated layer. (--set value
    semantics end-to-end are covered by test_cli.test_main_avid_cli.)"""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "main_avid.py", "--help"],
        capture_output=True, text=True, cwd=repo,
    )
    assert r.returncode == 0
    assert "--set" in r.stdout

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize would force TPU
    r = subprocess.run(
        [sys.executable, "main_avid.py", "/no/such/config.yaml"],
        capture_output=True, text=True, cwd=repo, timeout=120, env=env,
    )
    assert r.returncode != 0
    assert "config.yaml" in (r.stderr + r.stdout)


def test_criterion_registry_extension_point():
    """A criterion registered through CRITERIONS is reachable from
    build_criterion_config (the reference's criterions.__dict__[name]
    extension surface, utils/main_utils.py:231-237)."""
    import dataclasses

    from avid_cma_tpu.config import Config
    from avid_cma_tpu.registry import CRITERIONS
    from avid_cma_tpu.train.builders import build_criterion_config

    @dataclasses.dataclass
    class CustomConfig:
        num_data: int
        embedding_dim: int = 128

        @classmethod
        def from_config(cls, args, embedding_dim=128):
            return cls(embedding_dim=embedding_dim, **args)

    CRITERIONS.register("_TestCustom")(CustomConfig)
    try:
        out = build_criterion_config(
            Config({"name": "_TestCustom", "args": {"num_data": 7}}),
            embedding_dim=64,
        )
        assert isinstance(out, CustomConfig)
        assert out.num_data == 7 and out.embedding_dim == 64
    finally:
        CRITERIONS._entries.pop("_TestCustom", None)
