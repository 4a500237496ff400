"""Ad-hoc perf probe for the optimization rounds (guide §1): for each
named contract query, capture `.explain("formatted")` to
plans/<tag>/<name>_<suffix>.txt and time it best-of-N round-robin with
the SAME methodology as bench.py (clearCache between runs, collect() as
the action — results are small, so collect ≈ noop; pass --noop to time
`df.write.format("noop")` instead when isolating compute from result
serialization). Not part of the driver contract; bench.py stays the
canonical artifact producer.

Usage:
  python tools/perf_probe.py --tag r14 --suffix before [--runs 3] \
      [--sf-dir /root/testdata/sf0.1] [--noop] name1 name2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from coolplaydruid_spark import contract  # noqa: E402
from coolplaydruid_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="probe")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--plans-only", action="store_true")
    args = ap.parse_args()

    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="perf_probe")

    if not args.no_warm and not args.plans_only:
        for warm_sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            for name in args.names:
                try:
                    contract.QUERIES[name](spark, warm_sf).collect()
                except Exception:  # noqa: BLE001 - warmup is best-effort
                    pass
            spark.catalog.clearCache()

    # plans first (cheap, no execution)
    for name in args.names:
        df = contract.QUERIES[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{args.suffix}.txt").write_text(plan)
        spark.catalog.clearCache()
    if args.plans_only:
        print(json.dumps({"plans": args.names, "dir": str(out_dir)}))
        return

    runs: dict[str, list] = {n: [] for n in args.names}
    for _ in range(args.runs):
        for name in args.names:
            fn = contract.QUERIES[name]
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "action": "noop" if args.noop else "collect",
        "best": {n: min(r) for n, r in runs.items()},
        "runs": runs,
        "load": os.getloadavg(),
    }, indent=1))


if __name__ == "__main__":
    main()
