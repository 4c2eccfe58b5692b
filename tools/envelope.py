#!/usr/bin/env python3
"""Write bench_envelope.json from a quiet bench run's BENCH_DETAIL line.

Usage: python3 tools/envelope.py <bench_log_file> [out_json]

Extracts the per-query seconds from the LAST BENCH_DETAIL line in the log
and writes them as the flat name->seconds baseline Bench.loadEnvelope()
reads. Run this only on a QUIET pass (check the line's own `load` field) —
the envelope is the self-heal's definition of normal.
"""
import json, re, sys

log = open(sys.argv[1]).read()
out = sys.argv[2] if len(sys.argv) > 2 else "bench_envelope.json"
lines = [l for l in log.splitlines() if l.startswith("BENCH_DETAIL")]
if not lines:
    sys.exit("no BENCH_DETAIL line found")
detail = json.loads(lines[-1].split(" ", 1)[1])
load = detail.get("load", {})
queries = detail["queries"]
with open(out, "w") as f:
    json.dump(dict(sorted(queries.items())), f, indent=1)
print(f"wrote {out}: {len(queries)} queries "
      f"(run load start={load.get('start')} end={load.get('end')})")
