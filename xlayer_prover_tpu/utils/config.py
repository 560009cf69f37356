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
    log_executor_server_input: bool = False
    log_remote_db_reads: bool = False
    db_metrics: bool = False
    # file-driven runs (reference runFileGen* modes, config.hpp:35-63)
    run_file_gen_batch_proof: str = ""
    run_file_gen_aggregated_proof: str = ""
    run_file_gen_final_proof: str = ""
    run_file_process_batch: str = ""
    save_input_to_file: bool = False
    save_output_to_file: bool = False
    save_proof_to_file: bool = False
    save_responses_to_file: bool = False
    output_path: str = "output"
    # executor behavior
    use_main_exec_generated: bool = True      # native fast path (nexec)
    executor_rom_file: str = ""
    process_batch_cache_size: int = 0
    max_executor_threads: int = 20
    full_tracer_enabled: bool = True
    # prover behavior
    max_prover_threads: int = 8
    prover_server_timeout_s: int = 0
    aggregator_client_watchdog_timeout_s: int = 60
    aggregator_client_max_streams: int = 0
    cleaner_polling_period_s: int = 600
    requests_persistence_s: int = 3600
    generate_proof: bool = True
    recursion_queries: int = 8
    # state / database
    db_read_retry_counter: int = 10
    db_read_retry_delay_ms: int = 100
    db_connections_pool_size: int = 30
    db_multiwrite: bool = True
    db_multiwrite_single_query_size: int = 20 << 20
    db_mt_cache_mb: int = 1024
    db_program_cache_mb: int = 512
    hashdb64: bool = False
    kvdb_max_versions: int = 131072
    # proving artifacts (the reference's 75 GB archive slots)
    zkevm_cm_pols_file: str = ""
    zkevm_const_pols_file: str = ""
    zkevm_verkey_file: str = ""
    final_zkey_file: str = ""
    # counters / capacity
    no_counters: bool = False
    max_steps: int = 1 << 23
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
        "executor_server_port": "EXECUTOR_SERVER_PORT",
        "hashdb_server_port": "HASHDB_SERVER_PORT",
        "json_logs": "JSON_LOGS",
        "use_main_exec_generated": "USE_MAIN_EXEC_GENERATED",
        "no_counters": "NO_COUNTERS",
        "max_steps": "MAX_STEPS",
        "final_zkey_file": "FINAL_ZKEY_FILE",
        "output_path": "OUTPUT_PATH",
        "db_multiwrite": "DB_MULTIWRITE",
        "full_tracer_enabled": "FULL_TRACER_ENABLED",
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
        "hashDB64": "hashdb64",
        "kvDBMaxVersions": "kvdb_max_versions",
        "dbMTCacheSize": "db_mt_cache_mb",
        "dbProgramCacheSize": "db_program_cache_mb",
    }

    @classmethod
    def load(cls, path: Optional[str] = None) -> "Config":
        cfg = cls()
        if path:
            with open(path) as f:
                data = json.load(f)
            fields = {f.name for f in dataclasses.fields(cls)}

            def snake(k):
                out = []
                for i, ch in enumerate(k):
                    if ch.isupper():
                        if i and (not k[i - 1].isupper()
                                  or (i + 1 < len(k) and k[i + 1].islower())):
                            out.append("_")
                        out.append(ch.lower())
                    else:
                        out.append(ch)
                return "".join(out)

            for k, v in data.items():
                name = cls._JSON_ALIASES.get(k, k)
                if name not in fields:
                    name = snake(k)
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
