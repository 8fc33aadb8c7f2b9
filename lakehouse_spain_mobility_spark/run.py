"""Run any registry query from the command line.

``python -m lakehouse_spain_mobility_spark.run <query> [sf_dir]`` — shows
the result (first 50 rows) and, with ``--explain``, the formatted
physical plan. ``python -m lakehouse_spain_mobility_spark.run --list``
enumerates the registry with SURVEY tags.
"""

from __future__ import annotations

import sys


def main() -> int:
    from .queries import load_all
    from .session import build_session

    args = sys.argv[1:]
    reg = load_all()
    if not args or args[0] in ("--list", "-l"):
        for name, spec in sorted(reg.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:24s} [{spec.survey:18s}] ({kind}) {spec.description}")
        return 0

    name = args[0]
    explain = "--explain" in args
    rest = [a for a in args[1:] if not a.startswith("--")]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    if name not in reg:
        print(f"unknown query {name!r}; try --list", file=sys.stderr)
        return 2
    spark = build_session(extra_conf={"spark.ui.showConsoleProgress": "false"})
    df = reg[name].build(spark, sf_dir)
    if explain:
        df.explain("formatted")
    df.show(50, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
