"""Capture .explain('formatted') for named queries to plans/<round>/<q>_<tag>.txt."""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    tag = "before"
    rnd = "r10"
    if "--tag" in args:
        i = args.index("--tag"); tag = args[i + 1]; del args[i:i + 2]
    if "--round" in args:
        i = args.index("--round"); rnd = args[i + 1]; del args[i:i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.session import build_session
    spark = build_session(app_name="capture-plans",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    registry = load_all()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    for name in args:
        df = registry[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, Exchange x{n_ex}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
