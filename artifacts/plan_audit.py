"""Registry-wide physical-plan audit (saved as a repo tool in r8 — earlier
rounds generated plan_audit_r{5,6,7}.txt from an ad-hoc script).

For every registered query, builds the DataFrame at --sf and reports from
the EXECUTED plan string:
- exchange counts (shuffle vs broadcast)
- join strategies (broadcast-hash / sort-merge / shuffle-hash /
  broadcast-NL / cartesian)
- top-k vs global sort
- partial aggregation presence
- python eval nodes (BatchEvalPython / ArrowEvalPython / mapInPandas etc.)
- parquet pushed filters + pruned read schemas

A WARNING line is emitted for cartesian products, non-broadcast nested
loops, and python eval nodes — the scale-killers the 100 TB design bans
(sanctioned exceptions are documented in SCALE.md / VERDICT reviews).

Run:  PYTHONPATH=/root/repo python artifacts/plan_audit.py [--sf DIR] \
          [--only a,b] [--out artifacts/plan_audit_rN.txt]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_one(name: str, df) -> tuple[str, list[str]]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    simple = df._jdf.queryExecution().simpleString()

    def count(pat: str, s: str = plan) -> int:
        return len(re.findall(pat, s))

    shuffles = count(r"Exchange (?:hash|range|Single|RoundRobin)")
    bcasts = count(r"Exchange.*broadcast|BroadcastExchange")
    bhj = count(r"BroadcastHashJoin")
    smj = count(r"SortMergeJoin")
    shj = count(r"ShuffledHashJoin")
    bnl = count(r"BroadcastNestedLoopJoin")
    cart = count(r"CartesianProduct")
    topk = count(r"TakeOrderedAndProject")
    gsort = count(r"Sort \[.*\], true") + count(r"Sort\b.*global=true")
    partial = "partial" in plan.lower() or "partial_" in plan
    pyeval = re.findall(
        r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|"
        r"AggregateInPandas|PythonMapInArrow)", plan
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)

    buf = io.StringIO()
    w = buf.write
    w(f"== {name} ==\n")
    w(f"exchanges           : {shuffles} shuffle, {bcasts} broadcast\n")
    w(
        f"joins               : {bhj} broadcast-hash, {smj} sort-merge, "
        f"{shj} shuffle-hash, {bnl} broadcast-NL, {cart} cartesian\n"
    )
    w(f"top-k / global sort : {topk} TakeOrdered, {gsort} Sort(global)\n")
    w(f"partial aggregation : {partial}\n")
    w(f"python eval nodes   : {', '.join(sorted(set(pyeval))) or 'none'}\n")
    for p in pushed:
        if p.strip():
            w(f"pushed filters      : {p[:120]}\n")
    for s in schemas:
        w(f"read schema         : {s[:160]}\n")

    warnings = []
    if cart:
        warnings.append(f"{name}: {cart} CartesianProduct")
    if bnl:
        warnings.append(f"{name}: {bnl} BroadcastNestedLoopJoin")
    if pyeval:
        warnings.append(f"{name}: python eval {sorted(set(pyeval))}")
    # mapInPandas shows in simpleString for arrow stages; codec queries
    # sanctioned (binary decode IS the operator) — flag for review anyway
    for wmsg in warnings:
        w(f"WARNING             : {wmsg}\n")
    w("\n")
    return buf.getvalue(), warnings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from kinesis_writer_spark import registry
    from kinesis_writer_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    only = set(args.only.split(",")) if args.only else None

    out = io.StringIO()
    all_warnings: list[str] = []
    n = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            df = queries[name](spark, args.sf)
            text, warns = audit_one(name, df)
            out.write(text)
            all_warnings.extend(warns)
            n += 1
        except Exception as exc:  # audit must cover every plan or say why
            out.write(f"== {name} ==\nERROR               : {exc}\n\n")
            all_warnings.append(f"{name}: ERROR {exc}")
    out.write(f"== SUMMARY ==\nplans audited       : {n}\n")
    out.write(f"warnings            : {len(all_warnings)}\n")
    for wmsg in all_warnings:
        out.write(f"  {wmsg}\n")

    text = out.getvalue()
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}: {n} plans, {len(all_warnings)} warnings")
        for wmsg in all_warnings:
            print(" ", wmsg)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
