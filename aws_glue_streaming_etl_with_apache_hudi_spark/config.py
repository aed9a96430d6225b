"""Job parameterization (A13) — the reference resolves 8 runtime options
from the CLI via ``getResolvedOptions(sys.argv, [...])``
(glue_job_script.py:17; values Glue_StreamingJob_Hudi_Template.yaml:
265-281). Engine-native equivalent: an explicit typed config resolved
from argv/env with the same semantics (required named args, ``--key
value`` form), minus the Glue service coupling."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def resolve_options(argv: list[str], names: list[str]) -> dict[str, str]:
    """``--key value`` argument resolution; raises KeyError listing any
    missing required names (the Glue behavior callers depend on)."""
    out: dict[str, str] = {}
    i = 0
    while i < len(argv):
        if argv[i].startswith("--"):
            key = argv[i][2:]
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                out[key] = argv[i + 1]
                i += 2
                continue
            out[key] = ""
        i += 1
    missing = [n for n in names if n not in out]
    if missing:
        raise KeyError(f"missing required options: {missing}")
    return {n: out[n] for n in names} | {k: v for k, v in out.items() if k not in names}


@dataclass
class PipelineConfig:
    """The reference job's parameter surface, typed (…Template.yaml:265-281)."""

    table_path: str
    checkpoint_path: str
    record_key: str = "name"
    precombine: str = "date"
    partition_fields: list[str] = field(default_factory=lambda: ["year", "month", "day"])
    window_size: str = "10 seconds"  # --window_size, default per yaml:33
    starting_position: str = "latest"  # --kinesis iterator position, yaml:25-28
    database_name: str = "default"
    table_name: str = "hudi_table"
    quarantine_dir: str | None = None  # JSON dead-letter queue (optional)
    # --bloom_index true: per-partition key blooms (Hudi BLOOM-index
    # analogue) — fresh-key micro-batches append instead of rewriting
    bloom_index: bool = False
    # --table_type cow|mor: the reference's hoodie...write.table.type job
    # parameter (COPY_ON_WRITE pinned at glue_job_script.py:53-54; the
    # CFN template exposes the choice). cow = UpsertTable (read-optimized
    # writes, per-commit touched-partition rewrite); mor =
    # MergeOnReadTable (O(batch) delta appends + policy-scheduled
    # compaction — the 10-second-trigger-friendly shape)
    table_type: str = "cow"

    @classmethod
    def from_argv(cls, argv: list[str]) -> "PipelineConfig":
        opts = resolve_options(argv, ["table_path", "checkpoint_path"])
        kwargs: dict = {
            "table_path": opts["table_path"],
            "checkpoint_path": opts["checkpoint_path"],
        }
        for k in ("record_key", "precombine", "window_size", "starting_position",
                  "database_name", "table_name", "quarantine_dir"):
            if k in opts:
                kwargs[k] = opts[k]
        if "bloom_index" in opts:
            kwargs["bloom_index"] = opts["bloom_index"].lower() == "true"
        if "table_type" in opts:
            tt = opts["table_type"].lower()
            if tt not in ("cow", "mor"):
                raise ValueError(f"--table_type must be cow|mor, got {tt!r}")
            kwargs["table_type"] = tt
        if "partition_fields" in opts:
            # --partition_fields "" = unpartitioned (empty tokens dropped)
            kwargs["partition_fields"] = [
                p for p in opts["partition_fields"].split(",") if p
            ]
        return cls(**kwargs)

    @classmethod
    def from_env(cls, prefix: str = "ENGINE_") -> "PipelineConfig":
        argv = []
        for k, v in os.environ.items():
            if k.startswith(prefix):
                argv += [f"--{k[len(prefix):].lower()}", v]
        return cls.from_argv(argv)
