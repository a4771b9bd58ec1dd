#!/usr/bin/env python3
"""Build an Nx replica verification corpus from a testdata sf directory.

Reproduces (and pins in-repo) the ad-hoc corpus the round-4 scale
verification used: the four query-bearing tables are replicated `factor`
times with offset keys; document text gets a per-replica suffix (replica 0
stays byte-identical to the base corpus) so the replicas are near- but not
exact duplicates — the duplicate-heavy regime that stresses every LSH/
banding candidate join. n_chars is recomputed from the suffixed text so
the column stays internally consistent. Row groups are kept small so Spark
parallelizes the single-file outputs. The remaining tables are copied
verbatim.

Usage: python3 tools/replica_corpus.py /root/testdata/sf0.1 /tmp/sfbig 10
"""
import shutil
import sys

import duckdb


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({factor})) AS rep")

    def write(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 50000)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    write("documents", f"""
      WITH base AS (SELECT * FROM read_parquet('{src}/documents.parquet')),
      m AS (SELECT max(doc_id) + 1 AS off FROM base)
      SELECT doc_id + rep * (SELECT off FROM m) AS doc_id,
             CASE WHEN rep = 0 THEN text ELSE text || ' r' || rep END AS text,
             lang, source,
             CAST(length(CASE WHEN rep = 0 THEN text
                              ELSE text || ' r' || rep END) AS BIGINT) AS n_chars
      FROM base, r ORDER BY doc_id""")

    write("embeddings", f"""
      WITH base AS (SELECT * FROM read_parquet('{src}/embeddings.parquet')),
      m AS (SELECT max(vec_id) + 1 AS off FROM base)
      SELECT vec_id + rep * (SELECT off FROM m) AS vec_id, embedding, label
      FROM base, r ORDER BY vec_id""")

    write("events", f"""
      WITH base AS (SELECT * FROM read_parquet('{src}/events.parquet')),
      m AS (SELECT max(event_id) + 1 AS off FROM base)
      SELECT event_id + rep * (SELECT off FROM m) AS event_id,
             ts, user_id, event_type, value, props
      FROM base, r ORDER BY event_id""")

    write("lineitem", f"""
      WITH base AS (SELECT * FROM read_parquet('{src}/lineitem.parquet')),
      m AS (SELECT max(l_orderkey) + 1 AS off FROM base)
      SELECT l_orderkey + rep * (SELECT off FROM m) AS l_orderkey,
             l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM base, r ORDER BY l_orderkey""")

    for t in ("customer", "nation", "orders", "part", "region", "supplier"):
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
