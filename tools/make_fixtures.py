#!/usr/bin/env python3
"""Regenerate the committed repo fixtures (dev tool only — the shipped
library is pure Scala/Spark; this exists so `fixtures/` is reproducible).

fixtures/queries.parquet — the external retrieval query workload read by
q185 (and by GenData-produced dirs, which carry their own identical
copy). MUST stay equal to Retrieval.ExternalQueryIds; the spec pins the
file content against that literal, and q185's oracle embeds the same ids
as its VALUES workload.

Usage: python3 tools/make_fixtures.py
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

# Retrieval.ExternalQueryIds — keep in sync (spec-pinned)
EXTERNAL_QUERY_IDS = [3, 17, 42, 99, 150, 256, 321, 487]

def main():
    root = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    os.makedirs(root, exist_ok=True)
    t = pa.table({"query_id": pa.array(EXTERNAL_QUERY_IDS, type=pa.int64())})
    out = os.path.join(root, "queries.parquet")
    pq.write_table(t, out)
    print(f"wrote {out}: {t.num_rows} rows")

if __name__ == "__main__":
    main()
