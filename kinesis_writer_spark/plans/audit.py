"""Physical-plan audit: extract the scale-critical facts from a DataFrame's
formatted plan and flag the antipatterns that break at 100 TB.

The audit answers, per plan: did filters reach the scan (PushedFilters)?
Is the scan column-pruned (ReadSchema)? Which join strategies were picked?
How many shuffles? Any cartesian products, row-at-a-time Python, or global
sorts that should be top-k? ``python -m kinesis_writer_spark.plans.audit
<query> [...]`` prints the audit for any registered query — the feedback
loop used to iterate every operator's plan until it is the plan we want,
not just the first one that passed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text of the DataFrame's physical plan."""
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def single_partition_scan_violations(plan: str) -> list[str]:
    """Node-ids of parquet Scans that feed an ``Exchange SinglePartition``
    without an intervening aggregate — corpus-sized rows funneling through
    ONE task (the global-NTILE anti-shape).

    Walks the formatted-plan tree: for every Exchange whose detail block
    says ``Arguments: SinglePartition``, every Scan leaf in its subtree
    must have a HashAggregate/SortAggregate/ObjectHashAggregate ancestor
    INSIDE that subtree. Collapsed inputs (count tables, 1-row totals)
    pass; raw table rows do not. Enforced registry-wide by
    tests/test_plans.py; reported here so the CLI shows the same fact.
    """
    tree, _, details = plan.partition("\n\n")
    single = set(
        re.findall(
            r"\((\d+)\) Exchange[^\n]*\n(?:[^\n]*\n)??Arguments: SinglePartition",
            details,
        )
    )
    if not single:
        return []
    node_re = re.compile(r"^([:+\-\s]*)(?:\+\-|\:\-)?\s*([A-Za-z][A-Za-z ]*?)\s*\((\d+)\)")
    rows = []
    for line in tree.splitlines():
        m = node_re.match(line)
        if m:
            rows.append((len(m.group(1)), m.group(2).strip(), m.group(3)))
    aggs = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
    violations: list[str] = []
    for i, (d0, name, nid) in enumerate(rows):
        if name != "Exchange" or nid not in single:
            continue
        stack: list[tuple[int, str]] = []
        for d, n, sub_id in rows[i + 1 :]:
            if d <= d0:
                break
            while stack and stack[-1][0] >= d:
                stack.pop()
            if n.startswith("Scan") and not any(a[1].startswith(aggs) for a in stack):
                violations.append(f"scan({sub_id})<-exchange({nid})")
            stack.append((d, n))
    return violations


@dataclass
class PlanAudit:
    """Scale-relevant facts extracted from one physical plan."""

    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    broadcast_nl_joins: int = 0
    cartesian_products: int = 0
    take_ordered: int = 0
    global_sorts: int = 0
    partial_aggs: bool = False
    python_eval_nodes: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    single_task_scans: list[str] = field(default_factory=list)

    @property
    def warnings(self) -> list[str]:
        out = []
        if self.cartesian_products:
            out.append(f"{self.cartesian_products} CartesianProduct node(s): O(n^2) at scale")
        if "BatchEvalPython" in self.python_eval_nodes:
            out.append("row-at-a-time Python UDF (BatchEvalPython): ~10-100x slower than Arrow")
        if self.global_sorts and not self.take_ordered:
            out.append(
                f"{self.global_sorts} global Sort node(s) without TakeOrdered: "
                "full-data range shuffle; verify it is required"
            )
        if self.single_task_scans:
            out.append(
                "raw scan rows funnel through Exchange SinglePartition "
                f"({', '.join(self.single_task_scans)}): single-task sort/window at scale"
            )
        return out

    def render(self) -> str:
        lines = [
            f"exchanges           : {self.n_exchanges} shuffle, {self.n_broadcast_exchanges} broadcast",
            f"joins               : {self.broadcast_hash_joins} broadcast-hash, "
            f"{self.sort_merge_joins} sort-merge, {self.broadcast_nl_joins} broadcast-NL, "
            f"{self.cartesian_products} cartesian",
            f"top-k / global sort : {self.take_ordered} TakeOrdered, {self.global_sorts} Sort(global)",
            f"partial aggregation : {self.partial_aggs}",
            f"python eval nodes   : {self.python_eval_nodes or 'none'}",
        ]
        for pf in self.pushed_filters:
            lines.append(f"pushed filters      : {pf}")
        for pf in self.partition_filters:
            lines.append(f"partition filters   : {pf}")
        for rs in self.read_schemas:
            lines.append(f"read schema         : {rs}")
        for w in self.warnings:
            lines.append(f"WARNING             : {w}")
        return "\n".join(lines)


def audit(df: DataFrame) -> PlanAudit:
    """Audit a DataFrame's physical plan (see :class:`PlanAudit`)."""
    plan = formatted_plan(df)
    # the tree section renders each node once as "* NodeName (id)" /
    # "+- NodeName"; count node names in the tree lines only
    tree = plan.split("\n\n", 1)[0]

    def count(node: str) -> int:
        return len(re.findall(rf"\b{node}\b", tree))

    a = PlanAudit(
        n_exchanges=len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", plan))
        or count("Exchange"),
        n_broadcast_exchanges=count("BroadcastExchange"),
        broadcast_hash_joins=count("BroadcastHashJoin"),
        sort_merge_joins=count("SortMergeJoin"),
        broadcast_nl_joins=count("BroadcastNestedLoopJoin"),
        cartesian_products=count("CartesianProduct"),
        take_ordered=count("TakeOrderedAndProject"),
        partial_aggs="partial_" in plan,
    )
    # "Sort (global)" appears in the detail section as "Sort ... true, 0"
    a.global_sorts = len(re.findall(r"\bSort \[.*\], true,", plan))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        if node in plan:
            a.python_eval_nodes.append(node)
    a.pushed_filters = [
        m.strip() for m in re.findall(r"PushedFilters: \[(.*?)\]", plan) if m.strip()
    ]
    a.partition_filters = [
        m.strip() for m in re.findall(r"PartitionFilters: \[(.*?)\]", plan) if m.strip()
    ]
    a.read_schemas = [m.strip() for m in re.findall(r"ReadSchema: (.*)", plan)]
    a.single_task_scans = single_partition_scan_violations(plan)
    return a


def main(argv: list[str]) -> int:
    from .. import registry
    from ..session import get_spark

    names = argv or sorted(registry.all_queries())
    spark = get_spark("plan-audit")
    qs = registry.all_queries()
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        df = qs[name](spark, sf_dir)
        print(f"== {name} ==")
        print(audit(df).render())
        print()
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
