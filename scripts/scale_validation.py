"""Distributed-regime validation: run the heavy/serial-gated queries
end-to-end on a multi-split derived dataset (scripts/make_scale_data.py) and
assert the at-scale plan properties that single-file fixtures can't exercise.

Usage: python scripts/scale_validation.py [data_dir] [--no-oracle]
       [--streaming] [name_substr]

Checks, per the r6 verdict's "distributed-regime validation" item:
  1. every serial-plan gate disengages: small_local(dir, t) is False for all
     tables, and no executed plan contains a Coalesce(1)
  2. the distributed plans hold: AQE engaged, filters still pushed to the
     scans, lineitem never a broadcast build in the TPC-H joins
  3. the queries RUN and return sane results at ~10x sf0.1 (exact row
     invariants where the dimensional structure pins them)
  4. (default) DuckDB value-oracle parity on the same multi-split data for
     every selected query whose oracle is tractable at this scale
  5. (--streaming) the ST2 tumbling-window aggregation consumed as a real
     file-source STREAM over the multi-file events directory (several
     micro-batches at maxFilesPerTrigger=8) must produce row-for-row the
     batch q30 result — the streaming path exercised in its distributed
     multi-split regime, not just on one-file fixtures

Prints one JSON line at the end; record the numbers in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectrekker_spark.catalog import TABLES  # noqa: E402
from vectrekker_spark.plans import broadcast_subtrees, formatted_plan  # noqa: E402
from vectrekker_spark.queries import all_specs  # noqa: E402
from vectrekker_spark.queries.util import small_local  # noqa: E402
from vectrekker_spark.session import get_spark  # noqa: E402

# the FULL registry runs distributed — every registered query, not a sample
QUERIES = sorted(all_specs())
# value-oracle skipped where the DuckDB formulation is quadratic-ish at this
# scale (q28's SQL is an all-pairs cross join; d03-style baselines likewise)
NO_ORACLE = {"q28_sim_dedup"}
# d26's oracle is all WITHIN-CELL pairs — ~n²/8 at the fixed 8-cell
# quantizer. Measured (r10): 61 s at 20k embeddings (sf1) — tractable;
# sf3's 60k rows would be ~9x that, so the gate is the measured row count,
# not the query name.
D26_ORACLE_MAX_ROWS = 25_000
# row counts pinned by the dimensional structure (independent of the factor)
EXACT_ROWS = {
    "q03_agg": 6,
    "q11_grouping_sets": 175,
    "q22_topk_nn": 10,
    "t05_local_supplier_volume": 5,
    "t10_returned_items": 20,
}
TPCH_FACT_CHECK = {"q03_agg", "t05_local_supplier_volume", "t10_returned_items"}


def canon(v):
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def streaming_check(spark, data: str) -> tuple[bool, float]:
    """Drain the multi-file events dir through the real ST2 streaming plan
    (file source, several micro-batches) and compare with batch q30."""
    import shutil
    import tempfile

    from vectrekker_spark.queries import all_specs
    from vectrekker_spark.streaming.jobs import (
        read_events_stream,
        run_available_now,
        windowed_counts,
    )

    t0 = time.time()
    ckpt = tempfile.mkdtemp(prefix="scale-stream-ckpt-")
    try:
        stream = windowed_counts(read_events_stream(spark, f"{data}/events.parquet"))
        run_available_now(stream, ckpt, "scale_stream_q30")
        got = {
            tuple(r)
            for r in spark.table("scale_stream_q30").collect()
        }
        want = {
            tuple(r)
            for r in all_specs()["q30_tumbling_window"].spark(spark, data).collect()
        }
        return got == want and len(want) > 0, time.time() - t0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> int:
    flags = {"--no-oracle", "--streaming"}
    out_path = None
    rest = []
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a[len("--out=") :]
        else:
            rest.append(a)
    args = [a for a in rest if a not in flags]
    use_oracle = "--no-oracle" not in rest
    use_streaming = "--streaming" in rest
    data = args[0] if args else "/root/repo/.scale/sf1"
    needle = args[1] if len(args) > 1 else ""

    spark = get_spark(app_name="scale-validation")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true", "AQE off"

    # 1. the gates must disengage on the multi-split layout
    for t in TABLES:
        assert not small_local(data, t), f"small_local wrongly True for {t}"
    print("gates: small_local False for all tables (serial plans disengaged)")

    con = None
    if use_oracle:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            p = f"{data}/{t}.parquet"
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")

    specs = all_specs()
    failures = 0
    timings: dict[str, float] = {}
    for name in QUERIES:
        if needle and needle not in name:
            continue
        s = specs[name]
        t0 = time.time()
        try:
            df = s.spark(spark, data)
            plan = formatted_plan(df)
            rows = df.collect()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK FAIL {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 2)

        ok, msgs = True, []
        # 2. serial artifacts must be absent from the distributed plans
        if "Coalesce 1" in plan or "Coalesce(1)" in plan:
            ok, msgs = False, msgs + ["Coalesce(1) in plan"]
        if name in TPCH_FACT_CHECK:
            for sub in broadcast_subtrees(df):
                if "lineitem" in sub:
                    ok, msgs = False, msgs + ["lineitem broadcast-built"]
        # 3. result sanity
        want = EXACT_ROWS.get(name)
        if want is not None and len(rows) != want:
            ok, msgs = False, msgs + [f"rows {len(rows)} != {want}"]
        if not rows:
            ok, msgs = False, msgs + ["empty result"]
        # 4. value oracle on the same data
        skip_oracle = name in NO_ORACLE
        if name == "d26_semantic_dedup" and con is not None and not skip_oracle:
            n_emb = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
            if n_emb > D26_ORACLE_MAX_ROWS:
                skip_oracle = True
                print(
                    f"{name}: oracle skipped — {n_emb} embeddings exceed the "
                    f"{D26_ORACLE_MAX_ROWS}-row bound for the within-cell-"
                    "quadratic recursive-CTE oracle (61 s at 20k, ~n² growth)"
                )
        if con is not None and s.oracle is not None and not skip_oracle:
            t1 = time.time()
            res = con.execute(s.oracle)
            orows = sorted(tuple(canon(v) for v in r) for r in res.fetchall())
            srows = sorted(tuple(canon(v) for v in r) for r in rows)
            if srows != orows:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
                    min(len(srows), len(orows)),
                )
                ok = False
                msgs.append(
                    f"ORACLE MISMATCH at row {diff}: "
                    f"spark={srows[diff] if diff < len(srows) else '<none>'} "
                    f"duck={orows[diff] if diff < len(orows) else '<none>'}"
                )
            else:
                msgs.append(f"oracle ok ({time.time()-t1:.1f}s)")

        status = "OK" if ok else "FAIL"
        print(f"{name}: {status} rows={len(rows)} {dt:.1f}s {'; '.join(msgs)}")
        if not ok:
            failures += 1

    stream_ok = None
    if use_streaming:
        ok, dt = streaming_check(spark, data)
        stream_ok = bool(ok)
        print(f"streaming ST2 ≡ batch q30: {'OK' if ok else 'FAIL'} ({dt:.1f}s)")
        if not ok:
            failures += 1

    summary = {
        "data": data,
        "queries": len(timings),
        "failures": failures,
        "total_spark_sec": round(sum(timings.values()), 1),
        "streaming_st2_matches_batch": stream_ok,
        "timings": timings,
    }
    print(json.dumps(summary))
    if out_path:
        # tracked artifact (r7 verdict #8): BENCH_sf1-style JSON so
        # round-over-round scale regressions diff like the sf0.1 bench
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
