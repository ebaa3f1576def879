#!/usr/bin/env python3
"""Build an sf1-equivalent testdata dir by replicating sf0.1 N times.

Usage: python3 tools/replicate.py [outDir] [mult] [baseDir]

Replication discipline (the ScaleProbe convention):
- Every id key is shifted by replica*OFF so key spaces are disjoint
  (OFF = 1e8, divisible by 16 so graph_components_star chains never
  straddle replicas, and far below the 2^31-1 permutation modulus).
- Foreign keys shift with their primaries (orders.o_custkey,
  lineitem.l_orderkey/l_partkey/l_suppkey, events.user_id), so join
  fanout per key is invariant under replication.
- Free-text content is made replica-disjoint: documents.text gets a
  per-replica suffix on EVERY word (a vocabulary bijection — shingle,
  token, and similarity structure inside a replica is preserved
  exactly), and customer/part/supplier names get a suffix token. This
  keeps dedup/LSH block sizes CONSTANT as the corpus grows — corpus
  volume, not block skew, is the dimension this sweep scales (skew has
  its own probes: ScaleProbe skewpairs/skewcluster/pplskew). It also
  keeps the quadratic-within-block DuckDB oracles linear in mult.
- Dimension tables (region, nation) and bounded-cardinality attribute
  columns (lang, source, mktsegment, brand…) are NOT replicated or
  perturbed: group-by key spaces stay bounded, as at any real scale.

The output parquet is read by BOTH engines (graft.Verify and the
DuckDB oracle), so every comparison stays apples-to-apples.
"""
import sys
from pathlib import Path

import duckdb

OFF = 100_000_000


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir.mkdir(parents=True, exist_ok=True)

    # The graph_components_star permutation is bijective only below its
    # 2^31-1 modulus; shifted keys past it would silently collide.
    assert mult * OFF + 10_000_000 < 2**31 - 1, "mult too large for the MINSTD modulus"

    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def src(t):
        return f"read_parquet('{base}/{t}.parquet')"

    def write(t, union_sql, split=True):
        # A single-file single-row-group parquet caps every Spark scan at
        # ONE task (a <128 MB file is one split); write a DIRECTORY of
        # per-thread files instead — spark.read.parquet reads it as-is,
        # and tools/check.py globs it.
        if split:
            con.execute(
                f"COPY ({union_sql}) TO '{out_dir}/{t}.parquet' "
                f"(FORMAT parquet, PER_THREAD_OUTPUT true, ROW_GROUP_SIZE 30000)"
            )
            path = f"{out_dir}/{t}.parquet/*.parquet"
        else:
            con.execute(
                f"COPY ({union_sql}) TO '{out_dir}/{t}.parquet' (FORMAT parquet)"
            )
            path = f"{out_dir}/{t}.parquet"
        n = con.execute(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        print(f"{t}: {n} rows")

    # Dimensions: single copy, single file.
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}", split=False)

    def repl(t, select_for):
        write(t, " UNION ALL ".join(select_for(i) for i in range(mult)))

    repl("customer", lambda i: f"""
        SELECT c_custkey + {i * OFF} AS c_custkey,
               c_name || ' zz{i}' AS c_name,
               c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}""")
    repl("supplier", lambda i: f"""
        SELECT s_suppkey + {i * OFF} AS s_suppkey,
               s_name || ' zz{i}' AS s_name,
               s_nationkey, s_acctbal FROM {src('supplier')}""")
    repl("part", lambda i: f"""
        SELECT p_partkey + {i * OFF} AS p_partkey,
               p_name || ' zz{i}' AS p_name,
               p_brand, p_type, p_size, p_retailprice FROM {src('part')}""")
    repl("orders", lambda i: f"""
        SELECT o_orderkey + {i * OFF} AS o_orderkey,
               o_custkey + {i * OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}""")
    repl("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * OFF} AS l_orderkey,
               l_partkey + {i * OFF} AS l_partkey,
               l_suppkey + {i * OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}""")
    repl("events", lambda i: f"""
        SELECT event_id + {i * OFF} AS event_id, ts,
               user_id + {i * OFF} AS user_id,
               event_type, value, props FROM {src('events')}""")
    repl("documents", lambda i: f"""
        SELECT doc_id + {i * OFF} AS doc_id,
               regexp_replace(text, '(\\S+)', '\\1zz{i}', 'g') AS text,
               lang, source,
               length(regexp_replace(text, '(\\S+)', '\\1zz{i}', 'g')) AS n_chars
        FROM {src('documents')}""")
    repl("embeddings", lambda i: f"""
        SELECT vec_id + {i * OFF} AS vec_id, embedding, label
        FROM {src('embeddings')}""")


if __name__ == "__main__":
    main()
