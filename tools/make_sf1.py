#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset by replicating the driver's sf0.1
tables 10x with consistently shifted keys (distinct ids, schema and
parquet physical types preserved bit-for-bit via pyarrow — events.ts
stays TIMESTAMP(NANOS), which both the engine's nanosAsLong flag and
DuckDB's TIMESTAMP_NS reader depend on).

The oracle compare stays exact: Verify AND DuckDB read the SAME
generated dir, so every sub-quadratic gate can be certified at 10x the
bench scale. Dimension tables (region, nation) are copied once —
replicated fact rows reference the same dimension keys, which is the
semantically consistent scale-up (more customers per nation, not more
nations).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 -> /root/repo/.tmp/sf1, 10 copies.
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import os

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)


def off(maxv):
    """Next power of 10 above maxv — shifted ids stay readable and the
    vec_id offset stays a multiple of 100 (the query-subset stride)."""
    o = 10
    while o <= maxv:
        o *= 10
    return o


def domain_max(table, col):
    t = pq.read_table(f"{SRC}/{table}.parquet", columns=[col])
    return pc.max(t.column(col)).as_py()


# key domains shared across tables (events.user_id lives in the
# customer-key domain — the stream-table joins must keep matching)
C_OFF = off(max(domain_max("customer", "c_custkey"), domain_max("events", "user_id")))
O_OFF = off(domain_max("orders", "o_orderkey"))
P_OFF = off(domain_max("part", "p_partkey"))
S_OFF = off(domain_max("supplier", "s_suppkey"))
E_OFF = off(domain_max("events", "event_id"))
D_OFF = off(domain_max("documents", "doc_id"))
V_OFF = off(domain_max("embeddings", "vec_id"))
assert V_OFF % 100 == 0, "vec_id offset must preserve the %100 query subset"

SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": C_OFF},
    "supplier": {"s_suppkey": S_OFF},
    "part": {"p_partkey": P_OFF},
    "orders": {"o_orderkey": O_OFF, "o_custkey": C_OFF},
    "lineitem": {"l_orderkey": O_OFF, "l_partkey": P_OFF, "l_suppkey": S_OFF},
    "events": {"event_id": E_OFF, "user_id": C_OFF},
    "documents": {"doc_id": D_OFF},
    "embeddings": {"vec_id": V_OFF},
}

for table, shifts in SHIFTS.items():
    t = pq.read_table(f"{SRC}/{table}.parquet")
    if not shifts:
        out = t
    else:
        parts = []
        for k in range(COPIES):
            cols = []
            for name in t.column_names:
                c = t.column(name)
                if name in shifts and k > 0:
                    # checked add: an overflowing shifted key must raise,
                    # not wrap silently and collide replicated copies
                    c = pc.add_checked(c, pa.scalar(k * shifts[name], type=c.type))
                cols.append(c)
            parts.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{table}.parquet")
    print(f"{table}: {t.num_rows} -> {out.num_rows} rows")
print(f"wrote {DST}")
