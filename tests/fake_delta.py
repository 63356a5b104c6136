"""Thin fake of the delta-spark ``DeltaTable.merge`` builder surface.

delta-spark (and its JVM jar) is not installable in this container, so the
lakehouse branch of P2 (`merge_upsert_delta`) cannot run against real Delta.
This fake implements exactly the builder chain the operator touches —
``DeltaTable.forPath → .alias → .merge(source, condition) →
.whenMatchedUpdateAll → .whenNotMatchedInsertAll → .execute`` — recording
the generated clauses for assertion, and executing TEXTBOOK merge semantics
independently of the operator's parquet fallback:

  - a target row matched by a source row is replaced by the source row
    (UPDATE SET *), but only if whenMatchedUpdateAll was registered,
  - a source row matching no target row is inserted (INSERT *), only if
    whenNotMatchedInsertAll was registered,
  - a target row matched by MORE THAN ONE source row raises, mirroring
    Delta's DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE — this
    makes the operator's pre-merge dedup load-bearing in tests, not
    cosmetic.

The "table" is a plain parquet directory (read at execute, rewritten after
materializing, since a real lakehouse's snapshot isolation is what lets it
read and overwrite transactionally).
"""

from __future__ import annotations

import re


class MultipleSourceRowsError(Exception):
    """Stands in for Delta's
    DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE."""


class _MergeBuilder:
    def __init__(self, table: "DeltaTable", source, condition: str):
        self.table = table
        self.source = source
        self.condition = condition
        self.clauses: list[str] = []

    def whenMatchedUpdateAll(self) -> "_MergeBuilder":
        self.clauses.append("whenMatchedUpdateAll")
        return self

    def whenMatchedDelete(self) -> "_MergeBuilder":
        self.clauses.append("whenMatchedDelete")
        return self

    def whenNotMatchedInsertAll(self) -> "_MergeBuilder":
        self.clauses.append("whenNotMatchedInsertAll")
        return self

    def execute(self) -> None:
        spark = self.source.sparkSession
        m = re.fullmatch(
            rf"{self.table.alias_name}\.(\w+) = (\w+)\.(\w+)", self.condition
        )
        if not m or m.group(1) != m.group(3):
            raise ValueError(
                f"fake DeltaTable only models single-key equi-merge "
                f"conditions, got {self.condition!r}"
            )
        key = m.group(1)
        src = self.source
        tgt = spark.read.parquet(self.table.path)
        # Delta's multiple-match restriction applies to UPDATE/full-row
        # clauses (which target row would win?); a pure DELETE of matched
        # rows is well-defined regardless — but duplicate source keys still
        # raise in Delta, so the fake mirrors that for any matched clause.
        dup = (
            src.join(tgt.select(key).distinct(), key, "leftsemi")
            .groupBy(key)
            .count()
            .filter("count > 1")
        )
        has_matched = any(c.startswith("whenMatched") for c in self.clauses)
        if has_matched and dup.take(1):
            raise MultipleSourceRowsError(
                "multiple source rows matched a single target row; Delta "
                "MERGE requires the source be deduplicated on the merge key"
            )
        if "whenMatchedUpdateAll" in self.clauses:
            # matched target rows are replaced by their source rows
            parts = [
                tgt.join(src.select(key), key, "left_anti"),
                src.join(tgt.select(key), key, "leftsemi"),
            ]
        elif "whenMatchedDelete" in self.clauses:
            # matched target rows are dropped
            parts = [tgt.join(src.select(key), key, "left_anti")]
        else:
            parts = [tgt]  # no matched clause: target rows all survive
        if "whenNotMatchedInsertAll" in self.clauses:
            parts.append(src.join(tgt.select(key), key, "left_anti"))
        result = parts[0]
        for p in parts[1:]:
            result = result.unionByName(p)
        # real Delta preserves the TABLE's column order across merges; the
        # USING-key joins above relocate the key to the front, and writing
        # that reordered schema made later reads of the mixed-footer dir
        # (rewritten files + later appends) column-order-NONDETERMINISTIC —
        # the long-standing "spurious test_delta_merge_branch failure"
        result = result.select(*tgt.columns)
        rows = result.collect()  # materialize before overwriting the source dir
        spark.createDataFrame(rows, result.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self.table.path)
        self.table.executed_merges.append(
            {"condition": self.condition, "clauses": list(self.clauses)}
        )


class DeltaTable:
    last: "DeltaTable | None" = None

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.alias_name = "base"
        self.executed_merges: list[dict] = []
        DeltaTable.last = self

    @classmethod
    def forPath(cls, spark, path: str) -> "DeltaTable":
        return cls(spark, path)

    def alias(self, name: str) -> "DeltaTable":
        self.alias_name = name
        return self

    def merge(self, source, condition: str) -> _MergeBuilder:
        return _MergeBuilder(self, source, condition)
