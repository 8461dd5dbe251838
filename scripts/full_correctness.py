"""Full-catalog correctness snapshot: ALL catalog queries vs DuckDB.

The driver's per-round gate samples the first 50 ``queries()`` entries;
this runner executes EVERY entry against its oracle at sf0.01 and
writes ``CORRECTNESS_FULL_r{N}.json`` in the driver's row format, so
the between-rounds evidence for the other 80+ queries is a committed
repo artifact instead of a transient pytest run (VERDICT r4 item 1).

Usage:  python3 scripts/full_correctness.py [round_number]

Reuses the exact compare from tests/test_oracle_parity.py (dtype-kind
check included — the HUGEINT-vs-int64 class the driver's value hash
catches) so a green row here means the same thing as a green pytest.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "5"
    sf_dir = os.environ.get("OCR_SPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01")

    import duckdb

    from ocr_spark.queries import ORACLES, QUERIES
    from ocr_spark.session import get_spark
    from tests.conftest import TABLES
    from tests.test_oracle_parity import _canon, _kind

    spark = get_spark(app_name="full_correctness", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    t0 = time.time()
    out, n_green = {}, 0
    for name in QUERIES:
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            s = QUERIES[name](spark, sf_dir).toPandas()
            row["spark_rows"] = len(s)
            o = con.execute(ORACLES[name]).df()
            row["oracle_rows"] = len(o)
            row["rows_match"] = len(s) == len(o)
            row["schema_match"] = sorted(s.columns) == sorted(o.columns)
            kinds_ok = row["schema_match"] and all(
                _kind(s[c].dtype) == _kind(o[c].dtype) for c in s.columns
            )
            row["hash_match"] = (
                row["rows_match"] and kinds_ok and _canon(s) == _canon(o)
            )
        except Exception as e:  # record, keep going — this is a survey
            row["err"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        n_green += ok
        if not ok:
            print(f"  RED {name}: {row}", flush=True)

    wall = time.time() - t0
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"CORRECTNESS_FULL_r{rnd}.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{n_green}/{len(out)} green in {wall:.1f}s -> {dest}")
    con.close()
    return 0 if n_green == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
