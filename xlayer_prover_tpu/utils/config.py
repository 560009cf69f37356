"""Runtime configuration (reference: src/config/config.{hpp,cpp}).

One JSON file -> typed Config dataclass; environment variables override file
values (reference behavior, src/config/README.md); check() validates.
Only the fields the TPU framework consumes are typed; unknown file keys are
preserved in ``extra`` so reference config files load unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional


@dataclasses.dataclass
class Config:
    # services
    run_aggregator_client: bool = False
    run_aggregator_server: bool = False
    run_executor_server: bool = False
    run_hashdb_server: bool = False
    aggregator_client_host: str = "127.0.0.1"
    aggregator_client_port: int = 50081
    aggregator_server_port: int = 50081
    executor_server_port: int = 50071
    hashdb_server_port: int = 50061
    hashdb_url: str = "local"
    # prover
    prover_name: str = "tpu-prover"
    fork_id: int = 9
    save_proofs_dir: str = ""
    input_file: str = ""
    # state
    database_url: str = "local"
    database_file: str = ""
    # proving geometry
    n_bits: int = 23
    blowup_bits: int = 1
    n_queries: int = 32
    # observability
    json_logs: bool = False
    executor_time_statistics: bool = False
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    _ENV_MAP = {
        "run_aggregator_client": "RUN_AGGREGATOR_CLIENT",
        "run_aggregator_server": "RUN_AGGREGATOR_SERVER",
        "run_executor_server": "RUN_EXECUTOR_SERVER",
        "run_hashdb_server": "RUN_HASHDB_SERVER",
        "aggregator_client_host": "AGGREGATOR_CLIENT_HOST",
        "aggregator_client_port": "AGGREGATOR_CLIENT_PORT",
        "hashdb_url": "HASHDB_URL",
        "database_url": "DATABASE_URL",
        "prover_name": "PROVER_NAME",
    }

    # camelCase aliases so reference-style config JSON loads directly
    _JSON_ALIASES = {
        "runAggregatorClient": "run_aggregator_client",
        "runAggregatorServer": "run_aggregator_server",
        "runExecutorServer": "run_executor_server",
        "runHashDBServer": "run_hashdb_server",
        "aggregatorClientHost": "aggregator_client_host",
        "aggregatorClientPort": "aggregator_client_port",
        "aggregatorServerPort": "aggregator_server_port",
        "executorServerPort": "executor_server_port",
        "hashDBServerPort": "hashdb_server_port",
        "hashDBURL": "hashdb_url",
        "databaseURL": "database_url",
        "proverName": "prover_name",
        "forkID": "fork_id",
        "inputFile": "input_file",
        "jsonLogs": "json_logs",
        "executorTimeStatistics": "executor_time_statistics",
    }

    @classmethod
    def load(cls, path: Optional[str] = None) -> "Config":
        cfg = cls()
        if path:
            with open(path) as f:
                data = json.load(f)
            fields = {f.name for f in dataclasses.fields(cls)}
            for k, v in data.items():
                name = cls._JSON_ALIASES.get(k, k)
                if name in fields and name != "extra":
                    setattr(cfg, name, v)
                else:
                    cfg.extra[k] = v
        for attr, env in cls._ENV_MAP.items():
            if env in os.environ:
                cur = getattr(cfg, attr)
                raw = os.environ[env]
                if isinstance(cur, bool):
                    setattr(cfg, attr, raw.lower() in ("1", "true", "yes"))
                elif isinstance(cur, int):
                    setattr(cfg, attr, int(raw))
                else:
                    setattr(cfg, attr, raw)
        return cfg

    def check(self):
        assert 0 < self.n_bits <= 30, "n_bits out of range"
        assert self.blowup_bits >= 1
        assert self.n_queries >= 1
        if self.run_aggregator_client:
            assert self.aggregator_client_host
        return self

    def print(self):
        from .log import zklog
        for f in dataclasses.fields(self):
            if f.name == "extra":
                continue
            zklog.info(f"config.{f.name} = {getattr(self, f.name)}")
