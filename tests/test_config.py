"""Config parity with the reference's src/config/config.hpp surface.

The reference ships four production config files (config/config_*.json);
every key they set must land on a typed Config field — only keys the
reference itself disabled (``*_disabled`` suffix) may fall through to
``extra``.  Env overrides and check() behavior are covered too.
"""

import dataclasses
import json
import os

import pytest

from xlayer_prover_tpu.utils.config import Config

REF_CONFIG_DIR = "/root/reference/config"


@pytest.mark.parametrize("name", [
    "config_prover", "config_executor", "config_statedb",
    "config_executor_and_statedb"])
def test_reference_config_loads_fully_typed(name):
    path = os.path.join(REF_CONFIG_DIR, f"{name}.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not present")
    cfg = Config.load(path)
    leftover = [k for k in cfg.extra if not k.endswith("_disabled")]
    assert leftover == [], f"untyped reference config keys: {leftover}"
    cfg.check()


def test_field_surface_size():
    # config.hpp:15-202 declares ~133 members; the typed surface here must
    # stay in that league (not regress to a toy subset)
    n = len(dataclasses.fields(Config)) - 1  # minus `extra`
    assert n >= 130


def test_camelcase_and_env_override(tmp_path, monkeypatch):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "runAggregatorClient": True,
        "aggregatorClientHost": "agg.example",
        "dbNumberOfPoolConnections": 7,
        "stateManagerPurge": False,
        "ECRecoverPrecalcNThreads": 3,
    }))
    monkeypatch.setenv("PROVER_NAME", "env-prover")
    cfg = Config.load(str(p))
    assert cfg.run_aggregator_client is True
    assert cfg.aggregator_client_host == "agg.example"
    assert cfg.db_connections_pool_size == 7
    assert cfg.state_manager_purge is False
    assert cfg.ecrecover_precalc_n_threads == 3
    assert cfg.prover_name == "env-prover"
