"""Interleaved A/B of named queries across env-flag configs, in ONE
session (round-robin passes so host noise hits every config equally) —
the r13 optimization round's measurement instrument. Code variants under
test are gated on SPARK_GRAFT_OPT_* env flags read at DataFrame-build
time; each timed iteration rebuilds the DataFrame with the flag set.

Usage:
  python tools_r13/ab_flags.py '<configs-json>' <passes> <query> [query ...]

configs-json: {"name": {"ENV_VAR": "value", ...}, ...}
Example:
  python tools_r13/ab_flags.py '{"old": {"SPARK_GRAFT_OPT_X": "0"},
                                 "new": {"SPARK_GRAFT_OPT_X": "1"}}' 5 dd_lsh_verified_pairs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_datafusion_bridge_spark import get_spark  # noqa: E402
from druid_datafusion_bridge_spark.catalog import build_scan_mirrors  # noqa: E402
from druid_datafusion_bridge_spark.queries import all_queries  # noqa: E402


def main() -> None:
    configs: dict[str, dict[str, str]] = json.loads(sys.argv[1])
    passes = int(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ddbs-ab-flags")
    build_scan_mirrors(spark, sf_dir)
    qs = all_queries()

    def set_cfg(cfg: dict[str, str]) -> None:
        for k, v in cfg.items():
            os.environ[k] = v

    # warm every (config, query) once
    for cname, cfg in configs.items():
        set_cfg(cfg)
        for q in names:
            qs[q](spark, sf_dir).write.mode("overwrite").format("noop").save()

    best: dict[str, dict[str, float]] = {
        c: {q: float("inf") for q in names} for c in configs
    }
    for p in range(passes):
        for cname, cfg in configs.items():
            set_cfg(cfg)
            for q in names:
                df = qs[q](spark, sf_dir)
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                best[cname][q] = min(best[cname][q], time.perf_counter() - t0)
        print(f"pass {p + 1}/{passes} done", file=sys.stderr, flush=True)

    rows = {c: {q: round(v, 3) for q, v in d.items()} for c, d in best.items()}
    totals = {c: round(sum(d.values()), 3) for c, d in rows.items()}
    print(json.dumps({"totals": totals, "queries": rows}))


if __name__ == "__main__":
    main()
