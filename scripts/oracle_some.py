"""Oracle-check a named subset of registry queries at one or more SF dirs.

usage: python scripts/oracle_some.py q1 q2 ... [--sf DIR ...]
(defaults to sf0.01 and sf0.001)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sfs = []
    while "--sf" in args:
        i = args.index("--sf")
        sfs.append(args[i + 1])
        del args[i : i + 2]
    if not sfs:
        sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    from lakehouse_spain_mobility_spark.oracle import compare
    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.session import build_session

    spark = build_session(extra_conf={"spark.ui.showConsoleProgress": "false"})
    reg = load_all()
    failed = 0
    for sf in sfs:
        for name in args:
            r = compare(spark, reg[name], sf)
            status = "MATCH" if r.match else "MISMATCH"
            print(f"{sf.split('/')[-1]:9s} {name:24s} {status} {r.rows} rows", flush=True)
            if not r.match:
                failed += 1
                print(f"    {r.detail}")
    print(f"\n{len(args) * len(sfs) - failed}/{len(args) * len(sfs)} verified")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
