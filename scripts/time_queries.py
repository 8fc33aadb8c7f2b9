"""Standalone per-query timer: fresh session, warmup + min-of-N collect()
timings, matching bench.py methodology for the named queries.

usage: python scripts/time_queries.py q1 q2 ... [--n 3] [--sf DIR] [--noop]
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    noop = "--noop" in args
    args = [a for a in args if a != "--noop"]
    if "--n" in args:
        i = args.index("--n"); n = int(args[i + 1]); del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf"); sf_dir = args[i + 1]; del args[i:i + 2]
    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.session import build_session
    spark = build_session(app_name="time-queries",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(1000).selectExpr("sum(id)").collect()
    registry = load_all()
    out = {}
    for name in args:
        spec = registry[name]
        spark.sparkContext.setJobDescription(name)
        def run():
            df = spec.build(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                return -1
            return len(df.collect())
        rows = run()  # warmup
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); rows = run(); ts.append(time.perf_counter() - t0)
        out[name] = {"min": round(min(ts), 3), "all": [round(t, 3) for t in ts], "rows": rows}
        print(f"# {name}: min={min(ts):.3f} all={[round(t,3) for t in ts]} rows={rows}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
