"""Config system: YAML+CLI merge, dict literals, required-after-merge,
namespace flattening parity."""
import pytest
import yaml

from sign_language_nlp_tpu.config import (ARGUMENTS, load_args, prefix_args,
                                          filter_by_keys)
from sign_language_nlp_tpu.config.namespace import (flatten_args,
                                                    unflatten_args)


def _write_yaml(tmp_path, data):
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(data))
    return str(p)


BASE = {
    "seed": 1, "max_epochs": 5, "batch_size": 4, "test_size": 0.15,
    "model": "transformer", "cv": 5,
}


def test_yaml_provides_required(tmp_path):
    cfg = _write_yaml(tmp_path, BASE)
    args = load_args("t", ARGUMENTS, argv=["--config", cfg])
    assert args["seed"] == 1
    assert args["max_epochs"] == 5
    assert args["test_size"] == 0.15


def test_cli_overrides_yaml(tmp_path):
    cfg = _write_yaml(tmp_path, BASE)
    args = load_args("t", ARGUMENTS, argv=["--config", cfg, "--seed", "42"])
    assert args["seed"] == 42


def test_dict_flag_inline_literal(tmp_path):
    cfg = _write_yaml(tmp_path, BASE)
    args = load_args("t", ARGUMENTS, argv=[
        "--config", cfg, "--dask_args", "{'scheduler': 'tcp://x:1'}"])
    assert args["dask_args"] == {"scheduler": "tcp://x:1"}


def test_missing_required_errors(tmp_path):
    cfg = _write_yaml(tmp_path, {"model": "transformer"})
    with pytest.raises(SystemExit):
        load_args("t", ARGUMENTS, argv=["--config", cfg])


def test_bool_parsing(tmp_path):
    cfg = _write_yaml(tmp_path, BASE)
    args = load_args("t", ARGUMENTS, argv=["--config", cfg,
                                           "--debug", "True"])
    assert args["debug"] is True


def test_mode_options_validated(tmp_path):
    cfg = _write_yaml(tmp_path, BASE)
    with pytest.raises(SystemExit):
        load_args("t", ARGUMENTS, argv=["--config", cfg, "--mode", "bogus"])


def test_prefix_args_nested():
    # Reference helper.py:325-341 behavior: nested dicts flatten with
    # '__' joins; grid mode wraps scalars in lists.
    out = prefix_args("module", embedding_size=128,
                      attn={"heads": 4})
    assert out == {"module__embedding_size": 128, "module__attn__heads": 4}
    out = prefix_args("module", ensure_list=True, lr=0.1, sizes=[1, 2])
    assert out == {"module__lr": [0.1], "module__sizes": [1, 2]}


def test_prefix_args_none_prefix():
    assert prefix_args(None, lr=0.1) == {"lr": 0.1}


def test_filter_by_keys():
    m = {"a": 1, "b": 2, "c": 3}
    assert filter_by_keys(m, ["a", "c"]) == {"a": 1, "c": 3}
    assert filter_by_keys(m, ["a"], not_in=True) == {"b": 2, "c": 3}


def test_flatten_roundtrip():
    nested = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten_args(nested)
    assert flat == {"a__b": 1, "a__c__d": 2, "e": 3}
    assert unflatten_args(flat) == nested


def test_list_flag_accepts_bare_and_csv_strings(tmp_path):
    cfg = _write_yaml(tmp_path, BASE)
    a = load_args("t", ARGUMENTS, argv=["--config", cfg,
                                        "--scoring", "accuracy"])
    assert a["scoring"] == ["accuracy"]
    a = load_args("t", ARGUMENTS, argv=[
        "--config", cfg, "--scoring", "neg_log_loss,accuracy"])
    assert a["scoring"] == ["neg_log_loss", "accuracy"]
    a = load_args("t", ARGUMENTS, argv=[
        "--config", cfg, "--scoring", "['accuracy','f1_weighted']"])
    assert a["scoring"] == ["accuracy", "f1_weighted"]
