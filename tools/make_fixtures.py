#!/usr/bin/env python3
"""Regenerate the committed repo fixtures (dev tool only — the shipped
library is pure Scala/Spark; this exists so `fixtures/` is reproducible).

fixtures/queries.parquet — the external retrieval query workload read by
q185 (and by GenData-produced dirs, which carry their own identical
copy). The id list is PARSED from Retrieval.ExternalQueryIds in the
Scala source — the single source of truth — so regenerating the fixture
can never diverge from the literal the spec pins and the oracle embeds
(r16 ADVICE: the old hand-copied list had to be kept in sync manually).

Usage: python3 tools/make_fixtures.py
"""
import os
import re
import pyarrow as pa
import pyarrow.parquet as pq

RETRIEVAL = os.path.join(os.path.dirname(__file__), "..",
                         "src/main/scala/graft/queries/Retrieval.scala")

def external_query_ids():
    """Parse `val ExternalQueryIds: Seq[Long] = Seq(3L, 17L, ...)`."""
    src = open(RETRIEVAL).read()
    m = re.search(r"val ExternalQueryIds: Seq\[Long\] = Seq\(([^)]*)\)", src)
    if not m:
        raise SystemExit("ExternalQueryIds literal not found in Retrieval.scala "
                         "— fixture generation refuses to guess")
    ids = [int(x.strip().rstrip("L")) for x in m.group(1).split(",")]
    if not ids:
        raise SystemExit("ExternalQueryIds parsed empty")
    return ids

def main():
    root = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    os.makedirs(root, exist_ok=True)
    t = pa.table({"query_id": pa.array(external_query_ids(), type=pa.int64())})
    out = os.path.join(root, "queries.parquet")
    pq.write_table(t, out)
    print(f"wrote {out}: {t.num_rows} rows")

if __name__ == "__main__":
    main()
